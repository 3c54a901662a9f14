"""Exchange / market / symbol discovery for the REST surface.

Re-expresses the reference UI's discovery routes
(`dl-datalake-ui/backend/routers/ingest.py:238-289`): list supported
exchanges, the market types one exchange trades, and the active
symbols of one market type. The reference calls CCXT directly inside
each route; here discovery is a small injectable object so the API
layer stays framework-thin and tests can plug a fake client — CCXT is
used when importable, with the reference's own fallback behavior
(default market types on probe failure) otherwise.
"""

from __future__ import annotations

from collections.abc import Callable

DEFAULT_MARKET_TYPES = ["future", "spot"]  # reference fallback, ingest.py:262-266


class ExchangeCatalog:
    """Discovery over CCXT-like clients.

    `client_factory(exchange_id)` must return an object with
    `load_markets() -> dict[symbol, {"type": str, "active": bool}]` —
    the CCXT contract. `known_exchanges` seeds the exchange list when
    CCXT itself isn't importable (this sandbox), mirroring the
    reference's `ccxt.exchanges` enumeration (ingest.py:238-243).
    """

    def __init__(
        self,
        client_factory: Callable[[str], object] | None = None,
        known_exchanges: list[str] | None = None,
    ):
        self._factory = client_factory
        self._known = known_exchanges or []

    def exchanges(self) -> list[dict]:
        try:
            import ccxt  # type: ignore

            ids = list(ccxt.exchanges)
        except ImportError:
            ids = list(self._known)
        return [{"id": e, "name": e.capitalize()} for e in ids]

    def _load_markets(self, exchange_id: str) -> dict:
        if self._factory is not None:
            return self._factory(exchange_id).load_markets()
        import ccxt  # type: ignore

        return getattr(ccxt, exchange_id.lower())().load_markets()

    def markets(self, exchange_id: str) -> list[dict]:
        """Unique market types the exchange trades (spot/future/swap…);
        the reference's static fallback on any probe failure."""
        try:
            types = sorted(
                {
                    m.get("type")
                    for m in self._load_markets(exchange_id).values()
                    if m.get("type")
                }
            )
        except Exception:
            types = DEFAULT_MARKET_TYPES
        return [{"id": t, "name": t.capitalize()} for t in types]

    def symbols(self, exchange_id: str, market: str = "spot") -> list[str]:
        """Active symbols of one market type, sorted. Raises on probe
        failure (the reference 500s here rather than fabricating)."""
        markets = self._load_markets(exchange_id)
        return sorted(
            s
            for s, m in markets.items()
            if m.get("active", True) and m.get("type") == market
        )
