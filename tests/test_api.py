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
