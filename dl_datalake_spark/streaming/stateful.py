"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only cross-batch state is the driver-side download
cursor (exchange_connector.py:89-105) and the keep-last upsert
(writer.py:83-92). Here the same "remember across micro-batches"
semantics run inside the engine: per-key state lives in the state
store, scales with the number of keys (not events), and survives
restarts through the checkpoint.

Scale: state is partitioned by the grouping key across executors;
each micro-batch touches only the keys present in that batch. The
Arrow boundary batches rows per key-group — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_STATS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.LongType()),
    ]
)

USER_STATS_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.LongType()),
    ]
)


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last_ts) maintained across
    micro-batches. Input needs columns user_id:long, ts:long,
    value:double; emits one updated row per user per batch.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # worker-side closure: keep self-contained (no module globals) so
        # it runs on sessions whose workers can't import this package
        import pandas as pd

        (user_id,) = key
        if state.exists:
            n, total, last_ts = state.get
        else:
            n, total, last_ts = 0, 0.0, 0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last_ts = max(last_ts, int(pdf["ts"].max()))
        state.update((n, total, last_ts))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [total],
                "last_ts": [last_ts],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_OUTPUT,
        stateStructType=USER_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas: the successor API to
# applyInPandasWithState — typed state primitives (ValueState/ListState/
# MapState), timers, and TTL, backed by the RocksDB state store. Running
# per-symbol VWAP over an OHLCV stream; state is one fixed-width tuple
# per symbol, so store size is O(symbols) no matter how long the stream
# runs.
# ---------------------------------------------------------------------------
VWAP_OUTPUT = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("n_candles", T.LongType()),
        T.StructField("vwap", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
    ]
)

def running_symbol_vwap(candles: DataFrame) -> DataFrame:
    """Per-symbol running VWAP/high/low via transformWithStateInPandas.

    Input columns: symbol string, high/low/close/volume double (the
    exchange_ohlcv source schema). Requires the RocksDB state store
    provider (transformWithState's backing store):

        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")

    The processor class is defined inside this function on purpose:
    cloudpickle ships locally-defined classes BY VALUE, so the worker
    never needs to import this package (same self-containment rule as
    the applyInPandasWithState closure above).

    Dependency gate: transformWithState's state protocol speaks
    protobuf between the JVM and the Python driver worker; environments
    without `google.protobuf` get a clear ImportError here instead of a
    crashed streaming query mid-run (running_user_stats above is the
    protobuf-free fallback on the older applyInPandasWithState API).
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package; "
            "use running_user_stats (applyInPandasWithState) instead"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningVWAP(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "vwap", "n BIGINT, pv DOUBLE, vol DOUBLE, hi DOUBLE, lo DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            prior = self._state.get() if self._state.exists() else None
            n, pv, vol, hi, lo = prior or (0, 0.0, 0.0, float("-inf"), float("inf"))
            for pdf in rows:
                typical = (pdf["high"] + pdf["low"] + pdf["close"]) / 3.0
                n += len(pdf)
                pv += float((typical * pdf["volume"]).sum())
                vol += float(pdf["volume"].sum())
                hi = max(hi, float(pdf["high"].max()))
                lo = min(lo, float(pdf["low"].min()))
            self._state.update((n, pv, vol, hi, lo))
            yield pd.DataFrame(
                {
                    "symbol": [key[0]],
                    "n_candles": [n],
                    "vwap": [pv / vol if vol else 0.0],
                    "high": [hi],
                    "low": [lo],
                }
            )

        def close(self) -> None:
            pass

    return candles.groupBy("symbol").transformWithStateInPandas(
        statefulProcessor=RunningVWAP(),
        outputStructType=VWAP_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


VWAP_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("pv", T.DoubleType()),
        T.StructField("vol", T.DoubleType()),
        T.StructField("hi", T.DoubleType()),
        T.StructField("lo", T.DoubleType()),
    ]
)


def running_symbol_vwap_compat(candles: DataFrame) -> DataFrame:
    """Per-symbol running VWAP/high/low — SAME contract as
    running_symbol_vwap (identical VWAP_OUTPUT schema and semantics),
    carried by applyInPandasWithState instead of
    transformWithStateInPandas.  This is the protobuf-free path: the
    transformWithState state protocol speaks protobuf between JVM and
    Python, so environments without `google.protobuf` run this variant;
    both are state-per-symbol (O(symbols) store) and emit one updated
    row per symbol per micro-batch.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd

        (symbol,) = key
        if state.exists:
            n, pv, vol, hi, lo = state.get
        else:
            n, pv, vol, hi, lo = 0, 0.0, 0.0, float("-inf"), float("inf")
        for pdf in pdfs:
            typical = (pdf["high"] + pdf["low"] + pdf["close"]) / 3.0
            n += len(pdf)
            pv += float((typical * pdf["volume"]).sum())
            vol += float(pdf["volume"].sum())
            hi = max(hi, float(pdf["high"].max()))
            lo = min(lo, float(pdf["low"].min()))
        state.update((n, pv, vol, hi, lo))
        yield pd.DataFrame(
            {
                "symbol": [symbol],
                "n_candles": [n],
                "vwap": [pv / vol if vol else 0.0],
                "high": [hi],
                "low": [lo],
            }
        )

    return candles.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=VWAP_OUTPUT,
        stateStructType=VWAP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_symbol_vwap_auto(candles: DataFrame) -> DataFrame:
    """The VWAP operator on the best available API: Spark 4's
    transformWithStateInPandas when its protobuf dependency is present,
    else the applyInPandasWithState compat path — one contract, two
    carriers, chosen at call time."""
    try:
        import google.protobuf  # noqa: F401

        return running_symbol_vwap(candles)
    except ImportError:
        return running_symbol_vwap_compat(candles)
