"""REST surface tests (Flask test client over DataLakeClient) —
mirrors the reference's HTTP contract tests (tests/client/
test_api_server.py: 200 on good input, 422 on missing params)."""

from __future__ import annotations

import pytest

pytest.importorskip("flask")

from dl_datalake_spark.api import create_app  # noqa: E402
from dl_datalake_spark.client import DataLakeClient  # noqa: E402

CSV = "ts,open,high,low,close,volume\n" + "\n".join(
    f"{1672574400000 + i * 60000},1,2,0.5,1.5,10" for i in range(30)
)


@pytest.fixture()
def app_client(spark, tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text(CSV)
    client = DataLakeClient(spark, str(tmp_path / "base"))
    client.ingest_csv(str(csv), "BINANCE", "SPOT", "BTCUSDT")
    app = create_app(client)
    app.config["TESTING"] = True
    return app.test_client(), client, tmp_path


def test_health_read_and_limit(app_client):
    http, _, _ = app_client
    assert http.get("/health").get_json()["status"] == "ok"

    r = http.get("/read", query_string={"exchange": "BINANCE", "symbol": "BTCUSDT"})
    body = r.get_json()
    assert r.status_code == 200 and body["count"] == 30
    assert body["rows"][0]["close"] == 1.5

    # missing params → 422, bounded limit respected
    assert http.get("/read").status_code == 422
    r2 = http.get(
        "/read",
        query_string={"exchange": "BINANCE", "symbol": "BTCUSDT", "limit": 5},
    )
    assert r2.get_json()["count"] == 5


def test_datasets_preview_symbols(app_client):
    http, _, _ = app_client
    ds = http.get("/datasets").get_json()
    assert ds["total"] >= 1 and ds["entries"][0]["symbol"] == "BTCUSDT"

    pv = http.get(
        "/preview",
        query_string={
            "exchange": "BINANCE",
            "symbol": "BTCUSDT",
            "offset": 10,
            "limit": 5,
        },
    ).get_json()
    assert pv["total"] == 30 and len(pv["rows"]) == 5
    assert pv["rows"][0]["ts"] == 1672574400000 + 10 * 60000

    assert http.get("/symbols").get_json()["symbols"] == ["BTCUSDT"]

    # commit-log audit: the ingest above is commit version 0
    cm = http.get(
        "/datasets/commits",
        query_string={"exchange": "BINANCE", "symbol": "BTCUSDT"},
    ).get_json()
    assert cm["total"] == 1
    assert cm["commits"][0]["version"] == 0
    assert cm["commits"][0]["rows"] == 30
    assert http.get("/datasets/commits").status_code == 422


def test_ingest_export_delete_roundtrip(app_client, tmp_path):
    http, client, base = app_client
    csv2 = base / "more.csv"
    csv2.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{1675252800000 + i * 60000},2,3,1,2.5,20" for i in range(10))
    )
    r = http.post(
        "/ingest/file",
        json={
            "path": str(csv2),
            "exchange": "BINANCE",
            "market": "SPOT",
            "symbol": "ETHUSDT",
        },
    )
    assert r.status_code == 200 and r.get_json()["rows"] == 10
    assert r.get_json()["time_from"] == 1675252800000

    out = base / "export.csv"
    r2 = http.post(
        "/export",
        json={"path": str(out), "exchange": "BINANCE", "symbol": "ETHUSDT"},
    )
    assert r2.status_code == 200 and out.exists()

    # bad ingest → 400 with error message; unfiltered delete refused
    bad = base / "bad.csv"
    bad.write_text("a,b\n1,2\n")
    assert http.post(
        "/ingest/file",
        json={"path": str(bad), "exchange": "E", "market": "M", "symbol": "S"},
    ).status_code == 400
    assert http.delete("/datasets", json={}).status_code == 422
    r3 = http.delete("/datasets", json={"symbol": "ETHUSDT"})
    assert r3.get_json()["deleted"] >= 1


def test_feature_metadata_and_download_routes(app_client):
    http, client, base = app_client
    src = base / "emb.bin"
    payload = b"\x00\x01feature-bytes\x02"
    src.write_bytes(payload)
    dest = client.features.upload_feature(
        str(src), "BINANCE", "SPOT", "BTCUSDT", "embeddings", version="1.2.0"
    )
    entry = http.get("/features").get_json()
    assert "embeddings" in entry["feature_sets"]

    from pyspark.sql import functions as F

    fid = client.manifest.load().where(F.col("path") == dest).first()["id"]
    meta = http.get(f"/features/{fid}").get_json()
    assert meta["data_type"] == "embeddings" and meta["version"] == "1.2.0"

    dl = http.get(f"/features/{fid}/download")
    assert dl.status_code == 200 and dl.data == payload  # byte-exact round-trip

    assert http.get("/features/999999").status_code == 404
    assert http.get("/features/999999/download").status_code == 404


def test_export_batch_route(app_client):
    http, client, base = app_client
    csv2 = base / "more.csv"
    csv2.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{1675252800000 + i * 60000},2,3,1,2.5,20" for i in range(10))
    )
    client.ingest_csv(str(csv2), "BINANCE", "SPOT", "ETHUSDT")

    out_dir = base / "batch_export"
    r = http.post("/export/batch", json={"exchange": "BINANCE", "dir": str(out_dir)})
    body = r.get_json()
    assert r.status_code == 200
    assert body["total_symbols"] == 2 and sorted(body["exported"]) == ["BTCUSDT", "ETHUSDT"]
    assert body["failed"] == []
    import glob

    for sym in ("BTCUSDT", "ETHUSDT"):
        assert glob.glob(str(out_dir / sym / "part-*.csv"))
    assert http.post("/export/batch", json={"exchange": "BINANCE"}).status_code == 422


def test_verify_and_refresh_endpoints(app_client):
    http, client, base = app_client
    rep = http.get(
        "/verify", query_string={"exchange": "BINANCE", "symbol": "BTCUSDT"}
    ).get_json()
    assert rep["rows"] == 30 and rep["monotonic"] is True
    assert http.get("/verify").status_code == 422

    out = http.post(
        "/refresh", json={"exchange": "BINANCE", "target_period": "15m"}
    ).get_json()
    assert out == {"BTCUSDT": 2}  # 30 minutes of 1m -> two 15m buckets


# ---------------------------------------------------------------------------
# async download orchestration routes (reference UI ingest.py:204-289)
# ---------------------------------------------------------------------------
class _GateExchange:
    """fetch_ohlcv blocks on an event so the test can observe the
    pending/running -> completed transition through HTTP."""

    def __init__(self, candles, gate):
        self.candles = candles
        self.gate = gate

    def fetch_ohlcv(self, symbol, timeframe_ms, since, limit):
        self.gate.wait(10)
        return [c for c in self.candles if c[0] >= since][:limit]

    def load_markets(self):
        return {
            "BTC/USDT": {"type": "spot", "active": True},
            "ETH/USDT": {"type": "spot", "active": True},
            "DOGE/USDT": {"type": "spot", "active": False},
            "BTC/USDT:USDT": {"type": "swap", "active": True},
        }


@pytest.fixture()
def download_app(spark, tmp_path):
    import threading

    from dl_datalake_spark.sources.catalog import ExchangeCatalog
    from dl_datalake_spark.sources.download_manager import DownloadManager
    from dl_datalake_spark.sources.rest_connector import (
        ConnectorConfig,
        ExchangeConnector,
    )

    gate = threading.Event()
    candles = [[i * 60000, 1.0, 2.0, 0.5, 1.5, 10.0] for i in range(5)]
    fake = _GateExchange(candles, gate)
    client = DataLakeClient(spark, str(tmp_path / "base"))
    mgr = DownloadManager(
        connector_factory=lambda ex: ExchangeConnector(
            spark, client.writer, fake, ConnectorConfig(sleep=lambda s: None)
        ),
        max_workers=4,
    )
    catalog = ExchangeCatalog(
        client_factory=lambda ex: fake, known_exchanges=["binance", "kraken"]
    )
    app = create_app(client, download_manager=mgr, catalog=catalog)
    app.config["TESTING"] = True
    yield app.test_client(), client, gate, mgr
    gate.set()
    mgr.shutdown()


def test_download_lifecycle_over_http(download_app):
    http, client, gate, mgr = download_app
    r = http.post(
        "/ingest/download",
        json={
            "exchange": "BINANCE",
            "symbol": "BTCUSDT",
            "timeframe_ms": 60000,
            "start_ms": 0,
            "end_ms": 5 * 60000,
        },
    )
    assert r.status_code == 200
    tid = r.get_json()["task_id"]

    # before the gate opens the task is queued or mid-download
    st = http.get("/ingest/status", query_string={"task_id": tid}).get_json()
    assert st["status"] in ("pending", "running")

    gate.set()
    assert mgr.get_task(tid).wait(timeout=30)
    st = http.get("/ingest/status", query_string={"task_id": tid}).get_json()
    assert st["status"] == "completed" and st["rows"] == 5
    assert client.reader.read_range("BINANCE", "BTCUSDT", "raw").count() == 5

    # registry snapshot lists the task; unknown id -> 404
    snap = http.get("/ingest/status").get_json()
    assert tid in snap
    assert http.get("/ingest/status", query_string={"task_id": "nope"}).status_code == 404
    # missing field -> 422
    assert http.post("/ingest/download", json={"exchange": "BINANCE"}).status_code == 422


def test_bulk_download_over_http(download_app):
    http, client, gate, mgr = download_app
    gate.set()
    r = http.post(
        "/ingest/bulk-download",
        json={
            "exchange": "BINANCE",
            "symbols": ["AAAUSDT", "BBBUSDT"],
            "timeframe_ms": 60000,
            "start_ms": 0,
            "end_ms": 5 * 60000,
        },
    )
    assert r.status_code == 200
    tasks = r.get_json()["tasks"]
    assert len(tasks) == 2
    for t in tasks:
        assert mgr.get_task(t["task_id"]).wait(timeout=30)
    for sym in ("AAAUSDT", "BBBUSDT"):
        assert client.reader.read_range("BINANCE", sym, "raw").count() == 5

    # invalid requests are rejected BEFORE anything is queued: a 422 must
    # not leave half the symbol list silently downloading
    before = len(mgr.list_tasks())
    assert http.post("/ingest/bulk-download", json={"symbols": ["X"]}).status_code == 422
    assert (
        http.post(
            "/ingest/bulk-download", json={"exchange": "BINANCE", "symbols": []}
        ).status_code
        == 422
    )
    assert (
        http.post(
            "/ingest/bulk-download",
            json={"exchange": "BINANCE", "symbols": ["X"], "start_ms": "soon"},
        ).status_code
        == 422
    )
    assert len(mgr.list_tasks()) == before


def test_exchange_discovery_routes(download_app):
    http, _, _, _ = download_app
    ex = http.get("/exchanges").get_json()["exchanges"]
    assert {"id": "binance", "name": "Binance"} in ex

    mk = http.get("/exchanges/binance/markets").get_json()["markets"]
    assert {"id": "spot", "name": "Spot"} in mk and {"id": "swap", "name": "Swap"} in mk

    syms = http.get("/exchanges/binance/symbols").get_json()["symbols"]
    assert syms == ["BTC/USDT", "ETH/USDT"]  # active spot only
    swap = http.get(
        "/exchanges/binance/symbols", query_string={"market": "swap"}
    ).get_json()["symbols"]
    assert swap == ["BTC/USDT:USDT"]


def test_download_routes_503_when_unconfigured(app_client):
    http, _, _ = app_client
    assert http.post("/ingest/download", json={}).status_code == 503
    assert http.get("/ingest/status").status_code == 503
    assert http.get("/exchanges").status_code == 503


def test_exchange_catalog_fallbacks():
    """No CCXT in this sandbox: exchanges come from the seeded list;
    a failing market probe falls back to the reference's static types;
    a failing symbol probe raises (the route 500s)."""
    from dl_datalake_spark.sources.catalog import ExchangeCatalog

    def boom(ex):
        raise ConnectionError("probe failed")

    cat = ExchangeCatalog(client_factory=boom, known_exchanges=["kraken"])
    assert cat.exchanges() == [{"id": "kraken", "name": "Kraken"}]
    assert cat.markets("kraken") == [
        {"id": "future", "name": "Future"},
        {"id": "spot", "name": "Spot"},
    ]
    import pytest as _pytest

    with _pytest.raises(Exception):
        cat.symbols("kraken")


def test_delete_rows_route(app_client):
    http, client, _ = app_client
    start = 1672574400000
    # range form: partition-pruned delete of the first 10 minutes
    r = http.delete(
        "/datasets/rows",
        json={
            "exchange": "BINANCE", "symbol": "BTCUSDT",
            "start_ms": start, "end_ms": start + 9 * 60000,
        },
    )
    assert r.status_code == 200
    assert r.get_json() == {"deleted": 10, "partitions": [[2023, 1]]}
    assert client.read_ohlc("BINANCE", "BTCUSDT").count() == 20

    # predicate form
    r2 = http.delete(
        "/datasets/rows",
        json={"exchange": "BINANCE", "symbol": "BTCUSDT",
              "where": f"ts = {start + 10 * 60000}"},
    )
    assert r2.get_json()["deleted"] == 1

    # both / neither selector -> 422
    assert http.delete(
        "/datasets/rows", json={"exchange": "BINANCE", "symbol": "BTCUSDT"}
    ).status_code == 422
    assert http.delete(
        "/datasets/rows",
        json={"exchange": "BINANCE", "symbol": "BTCUSDT",
              "where": "1=1", "start_ms": 0, "end_ms": 1},
    ).status_code == 422
    assert http.delete("/datasets/rows", json={"symbol": "BTCUSDT"}).status_code == 422


def test_update_rows_route(app_client):
    http, client, _ = app_client
    start = 1672574400000
    r = http.post(
        "/datasets/rows/update",
        json={
            "exchange": "BINANCE", "symbol": "BTCUSDT",
            "where": f"ts = {start}", "set": {"close": "close + 1000"},
        },
    )
    assert r.status_code == 200
    assert r.get_json()["updated"] == 1
    got = client.read_ohlc("BINANCE", "BTCUSDT")
    assert got.where("close > 1000").count() == 1

    # dv strategy over HTTP
    r2 = http.post(
        "/datasets/rows/update",
        json={
            "exchange": "BINANCE", "symbol": "BTCUSDT",
            "where": f"ts = {start + 60000}", "set": {"close": "close + 2000"},
            "strategy": "dv",
        },
    )
    assert r2.status_code == 200 and r2.get_json()["updated"] == 1
    assert client.read_ohlc("BINANCE", "BTCUSDT").where("close > 2000").count() == 1

    # missing set -> 422; bad column -> 422
    assert http.post(
        "/datasets/rows/update",
        json={"exchange": "BINANCE", "symbol": "BTCUSDT", "where": "1=1"},
    ).status_code == 422
    assert http.post(
        "/datasets/rows/update",
        json={"exchange": "BINANCE", "symbol": "BTCUSDT",
              "where": "1=1", "set": {"symbol": "'X'"}},
    ).status_code == 422


def test_change_feed_route(spark, tmp_path):
    """CDF over HTTP: rows per commit with change types; a non-CDF
    commit in range surfaces as 409 (loud gap), never a silent hole."""
    csv = tmp_path / "in.csv"
    csv.write_text(CSV)
    client = DataLakeClient(spark, str(tmp_path / "base"), emit_cdf=True)
    client.ingest_csv(str(csv), "BINANCE", "SPOT", "BTCUSDT")  # v0: 30 inserts
    client.delete_rows(
        "BINANCE", "BTCUSDT", start_ms=1672574400000, end_ms=1672574400000 + 4 * 60000
    )  # v1: 5 deletes
    app = create_app(client)
    app.config["TESTING"] = True
    http = app.test_client()

    r = http.get(
        "/datasets/change-feed",
        query_string={"exchange": "BINANCE", "symbol": "BTCUSDT"},
    )
    body = r.get_json()
    assert r.status_code == 200 and body["cursor"] == 1 and body["n"] == 35
    kinds = {(c["commit_version"], c["_change_type"]) for c in body["changes"]}
    assert kinds == {(0, "insert"), (1, "delete")}

    # cursor advance: only the delete slice
    r2 = http.get(
        "/datasets/change-feed",
        query_string={"exchange": "BINANCE", "symbol": "BTCUSDT", "after_version": 0},
    )
    assert r2.get_json()["n"] == 5

    # a plain (non-CDF) writer creates a gap → 409 with a clear error
    plain = DataLakeClient(spark, str(tmp_path / "base"))
    pcsv = tmp_path / "more.csv"
    pcsv.write_text(
        "ts,open,high,low,close,volume\n"
        + f"{1672574400000 + 60 * 60000},1,2,0.5,1.5,10"
    )
    plain.ingest_csv(str(pcsv), "BINANCE", "SPOT", "BTCUSDT")  # v2 without CDF
    r3 = http.get(
        "/datasets/change-feed",
        query_string={"exchange": "BINANCE", "symbol": "BTCUSDT"},
    )
    assert r3.status_code == 409
    assert "no row-level change data" in r3.get_json()["error"]

    # missing params → 422
    assert http.get("/datasets/change-feed").status_code == 422


def test_read_at_and_read_multi_routes(app_client, spark):
    http, client, _ = app_client
    # a second commit so two versions exist
    df2 = spark.createDataFrame(
        [(1672574400000 + i * 60000, 9.0, 10.0, 8.5, 9.5, 10.0) for i in range(5)],
        "ts long, open double, high double, low double, close double, volume double",
    )
    client.writer.write_ohlc(df2, __import__(
        "dl_datalake_spark.lake.paths", fromlist=["DatasetKey"]
    ).DatasetKey("BINANCE", "SPOT", "BTCUSDT", "raw", "1m"))

    r0 = http.get(
        "/read-at",
        query_string={"exchange": "BINANCE", "symbol": "BTCUSDT", "version": 0},
    )
    assert r0.status_code == 200
    assert all(row["open"] == 1.0 for row in r0.get_json()["rows"])
    r1 = http.get(
        "/read-at",
        query_string={"exchange": "BINANCE", "symbol": "BTCUSDT", "version": 1},
    )
    assert any(row["open"] == 9.0 for row in r1.get_json()["rows"])
    # nonexistent version and missing params are client errors
    assert http.get(
        "/read-at",
        query_string={"exchange": "BINANCE", "symbol": "BTCUSDT", "version": 99},
    ).status_code == 422
    assert http.get("/read-at").status_code == 422

    rm = http.get(
        "/read-multi",
        query_string={"exchange": "BINANCE", "symbols": "BTCUSDT"},
    )
    assert rm.status_code == 200
    assert len(rm.get_json()["symbols"]["BTCUSDT"]) == 30
    assert http.get("/read-multi").status_code == 422


def test_column_lifecycle_routes(app_client):
    """rename-column / drop-column / schema over HTTP (column mapping,
    lake/schema.py): metadata-only rename serves the new name, schema
    endpoint presents head and historical contracts, drop retires."""
    http, client, _ = app_client
    r = http.post(
        "/datasets/columns/rename",
        json={"exchange": "BINANCE", "symbol": "BTCUSDT",
              "from": "close", "to": "close_px"},
    )
    assert r.status_code == 200 and r.get_json()["renamed"] == {"close": "close_px"}
    got = client.read_ohlc("BINANCE", "BTCUSDT")
    assert "close_px" in got.columns and "close" not in got.columns

    s = http.get("/datasets/schema", query_string={
        "exchange": "BINANCE", "symbol": "BTCUSDT"})
    assert s.status_code == 200 and "close_px" in s.get_json()["schema"]
    s0 = http.get("/datasets/schema", query_string={
        "exchange": "BINANCE", "symbol": "BTCUSDT", "version": 0})
    assert "close" in s0.get_json()["schema"]

    d = http.delete(
        "/datasets/columns",
        json={"exchange": "BINANCE", "symbol": "BTCUSDT", "column": "volume"},
    )
    assert d.status_code == 200 and d.get_json()["dropped"] == "volume"
    assert "volume" not in client.read_ohlc("BINANCE", "BTCUSDT").columns
    # contract violations map to 422
    bad = http.post(
        "/datasets/columns/rename",
        json={"exchange": "BINANCE", "symbol": "BTCUSDT",
              "from": "nope", "to": "x"},
    )
    assert bad.status_code == 422
