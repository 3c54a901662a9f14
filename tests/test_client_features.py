"""Client facade round-trip + feature store versioning — mirrors
reference tests/client/* and tests/features/* intents."""

from __future__ import annotations

import pytest

from dl_datalake_spark.client import DataLakeClient


@pytest.fixture()
def client(spark, tmp_path):
    return DataLakeClient(spark, str(tmp_path / "lake"))


def _csv(tmp_path, n=30, start=1672574400000):
    p = tmp_path / "in.csv"
    p.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{start + i*60000},1,2,0.5,1.5,10" for i in range(n))
    )
    return str(p)


def test_ingest_read_roundtrip(client, tmp_path):
    res = client.ingest_csv(_csv(tmp_path), "binance", "spot", "BTCUSDT")
    assert res.rows == 30
    df = client.read_ohlc("binance", "BTCUSDT", "2023-01-01", "2023-01-02")
    assert df.count() == 30
    assert client.list_symbols() == ["BTCUSDT"]
    rep = client.verify("binance", "BTCUSDT")
    assert rep.monotonic and rep.gap_count == 0


def test_aggregate_writes_agg_dataset(client, tmp_path):
    client.ingest_csv(_csv(tmp_path, n=45), "binance", "spot", "BTCUSDT")
    res = client.aggregate_ohlc("binance", "spot", "BTCUSDT", "1m", "15m")
    assert res.rows == 3  # 45 minutes → 3 buckets
    entries = client.manifest.list_entries(data_type="agg")
    assert entries.count() == 1


def test_refresh_rollup_incremental_matches_full_recompute(client, tmp_path):
    # Seed 40 minutes -> 15m rollup has 2 full buckets + 1 partial.
    client.ingest_csv(_csv(tmp_path, n=40), "binance", "spot", "BTCUSDT")
    client.aggregate_ohlc("binance", "spot", "BTCUSDT", "1m", "15m")

    # New raw data arrives: 35 more minutes, overlapping nothing but
    # extending past the partial bucket.
    p2 = tmp_path / "in2.csv"
    start = 1672574400000 + 40 * 60000
    p2.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{start + i*60000},2,3,1.5,2.5,{20 + i}" for i in range(35))
    )
    client.ingest_csv(str(p2), "binance", "spot", "BTCUSDT")

    res = client.refresh_rollup("binance", "spot", "BTCUSDT", "1m", "15m")
    assert res is not None and res.rows >= 1

    from dl_datalake_spark.lake.paths import DatasetKey

    got = (
        client.reader.read_dataset(DatasetKey("binance", "agg", "BTCUSDT", "agg", "15m"))
        .select("ts", "open", "high", "low", "close", "volume")
        .orderBy("ts")
        .collect()
    )
    # Oracle: full recompute from all raw data.
    from dl_datalake_spark.operators.resample import resample_ohlcv

    raw = client.reader.read_dataset(DatasetKey("binance", "spot", "BTCUSDT", "raw", "1m"))
    want = (
        resample_ohlcv(raw, "15m")
        .select("ts", "open", "high", "low", "close", "volume")
        .orderBy("ts")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 5  # 75 minutes -> 5 fifteen-minute buckets
    # The once-partial third bucket (minutes 30-44) now covers its full
    # 15 minutes: 10 old rows at vol=10 plus 5 new rows at vol 20..24.
    b3 = got[2]
    assert b3["volume"] == 10 * 10 + sum(range(20, 25))


def test_feature_store_versions(client, tmp_path):
    f = tmp_path / "feat.bin"
    f.write_bytes(b"weights-v1")
    p1 = client.features.upload_feature(str(f), "binance", "spot", "BTCUSDT", "momentum", "1.0.0")
    f.write_bytes(b"weights-v2")
    client.features.upload_feature(str(f), "binance", "spot", "BTCUSDT", "momentum", "1.1.0")
    assert "momentum/1.0.0" in p1
    assert client.features.latest_version("BTCUSDT", "momentum") == "1.1.0"
    sets = client.features.list_feature_sets()
    assert sets == {"momentum": ["1.1.0", "1.0.0"]}
    # checksum recorded
    e = client.manifest.list_entries(data_type="momentum").collect()[0]
    assert len(e["checksum"]) == 64


def test_feature_missing_source_raises(client):
    with pytest.raises(FileNotFoundError):
        client.features.upload_feature("/nope/missing.bin", "b", "s", "X", "fs")


def test_audit_detects_orphans_and_dead_links(client, tmp_path):
    import os

    client.ingest_csv(_csv(tmp_path), "binance", "spot", "BTCUSDT")
    # orphan: a parquet dir on disk not in the manifest
    orphan = os.path.join(client.base_path, "exchange=FAKE")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "x.parquet"), "wb") as fh:
        fh.write(b"")
    # dead link: manifest row whose path is gone
    client.manifest.add_entry("gone", "spot", "GONE", "/nonexistent/path", "raw")
    rep = client.audit()
    assert any("FAKE" in p for p in rep["orphan_files"])
    assert "/nonexistent/path" in rep["dead_links"]


def test_export_terminal_csv(spark, tmp_path, ohlc_df):
    import csv as csvmod
    import glob

    from dl_datalake_spark.lake.export import export_terminal_csv

    out_dir = tmp_path / "export"
    export_terminal_csv(ohlc_df, str(out_dir), ticker="BTCUSDT", period="1m")
    files = glob.glob(str(out_dir / "part-*.csv"))
    assert len(files) == 1  # single_file default coalesces
    with open(files[0]) as fh:
        rows = list(csvmod.reader(fh))
    assert rows[0] == [
        "<TICKER>", "<PER>", "<DATE>", "<TIME>",
        "<OPEN>", "<HIGH>", "<LOW>", "<CLOSE>", "<VOL>",
    ]
    # first candle: 2023-01-01T12:00:00Z
    assert rows[1][0] == "BTCUSDT" and rows[1][1] == "1m"
    assert rows[1][2] == "20230101" and rows[1][3] == "120000"
    assert len(rows) == 1 + ohlc_df.count()

    # aggregated variant: 100 one-minute candles -> 7 fifteen-minute rows
    out2 = tmp_path / "export15"
    export_terminal_csv(ohlc_df, str(out2), ticker="BTCUSDT", period="1m", resample_to="15m")
    with open(glob.glob(str(out2 / "part-*.csv"))[0]) as fh:
        rows15 = list(csvmod.reader(fh))
    assert len(rows15) == 1 + 7 and rows15[1][1] == "15m"


def test_client_sql_over_registered_view(spark, tmp_path):
    client = DataLakeClient(spark, str(tmp_path / "lake"))
    csv = tmp_path / "in.csv"
    csv.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{i*60000},1,2,0.5,{1.0+i},10" for i in range(10))
    )
    client.ingest_csv(str(csv), "binance", "spot", "BTCUSDT")
    client.register_view("btc", "binance", "BTCUSDT")
    out = client.sql(
        "SELECT COUNT(*) AS n, MAX(close) AS mx FROM btc WHERE ts >= 120000"
    ).collect()[0]
    assert out["n"] == 8 and out["mx"] == 10.0


def test_vacuum_reclaims_orphans_and_dead_links(client, tmp_path):
    import os

    from dl_datalake_spark.lake.maintenance import vacuum

    client.ingest_csv(_csv(tmp_path), "binance", "spot", "BTCUSDT")
    orphan = os.path.join(client.base_path, "exchange=FAKE")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "x.parquet"), "wb") as fh:
        fh.write(b"")
    client.manifest.add_entry("gone", "spot", "GONE", "/nonexistent/path", "raw")

    # dry run reports but touches nothing
    rep = vacuum(client.spark, client.base_path, client.manifest, dry_run=True)
    assert any("FAKE" in p for p in rep["orphan_files"])
    assert os.path.exists(orphan)

    rep2 = vacuum(client.spark, client.base_path, client.manifest, dry_run=False)
    assert not os.path.exists(orphan)
    assert "/nonexistent/path" in rep2["dead_links"]
    # catalog row dropped, real dataset untouched
    assert client.manifest.list_entries(path="/nonexistent/path").count() == 0
    assert client.read_ohlc("binance", "BTCUSDT").count() == 30
    # post-vacuum audit is clean
    after = vacuum(client.spark, client.base_path, client.manifest, dry_run=True)
    assert after == {"orphan_files": [], "dead_links": []}


def test_refresh_rollup_cdc_catches_old_month_backfill(client, tmp_path, spark):
    """The commit-log-driven refresh sees a correction upserted into an
    OLD month — the case the rollup-watermark path structurally misses —
    and rebuilds exactly that month's buckets."""
    from pyspark.sql import functions as F

    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.operators.resample import resample_ohlcv

    jan = 1672574400000  # 2023-01-01T12:00Z
    mar = 1677660000000  # 2023-03-01T08:40Z... march either way
    client.ingest_csv(_csv(tmp_path, n=30, start=jan), "binance", "spot", "BTCUSDT")
    p2 = tmp_path / "mar.csv"
    p2.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{mar + i*60000},2,3,1.5,2.5,20" for i in range(30))
    )
    client.ingest_csv(str(p2), "binance", "spot", "BTCUSDT")

    # initial CDC refresh consumes both commits
    res = client.refresh_rollup_cdc("binance", "spot", "BTCUSDT", "1m", "15m")
    assert res is not None
    agg_key = DatasetKey("binance", "agg", "BTCUSDT", "agg", "15m")
    before = {r["ts"]: r["close"] for r in client.reader.read_dataset(agg_key).collect()}

    # caught up: no-op
    assert client.refresh_rollup_cdc("binance", "spot", "BTCUSDT", "1m", "15m") is None

    # backfill-correct JANUARY (old month) while march stays untouched
    p3 = tmp_path / "fix.csv"
    p3.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{jan + i*60000},9,9,9,9,90" for i in range(5))
    )
    client.ingest_csv(str(p3), "binance", "spot", "BTCUSDT")

    # the WATERMARK path misses it: its watermark sits in march, so it
    # re-reads only the newest bucket boundary onward — january's
    # corrected rows never reach the rollup
    client.refresh_rollup("binance", "spot", "BTCUSDT", "1m", "15m")
    jan_bucket = (jan // 900000) * 900000
    stale = client.reader.read_dataset(agg_key).where(F.col("ts") == jan_bucket).collect()[0]
    assert stale["open"] == 1.0  # still the pre-correction value

    # the CDC path rebuilds january's buckets
    res2 = client.refresh_rollup_cdc("binance", "spot", "BTCUSDT", "1m", "15m")
    assert res2 is not None
    got = client.reader.read_dataset(agg_key)
    jan_first = got.where(F.col("ts") == (jan // 900000) * 900000).collect()[0]
    # minutes 0-4 were corrected (open comes from minute 0, high from
    # the max); minute 14 still owns the close
    assert jan_first["open"] == 9.0 and jan_first["high"] == 9.0

    # full-recompute oracle over all raw data agrees bucket-for-bucket
    raw = client.reader.read_dataset(DatasetKey("binance", "spot", "BTCUSDT", "raw", "1m"))
    oracle = {
        r["ts"]: (r["open"], r["high"], r["low"], r["close"], r["volume"])
        for r in resample_ohlcv(raw, "15m").collect()
    }
    final = {
        r["ts"]: (r["open"], r["high"], r["low"], r["close"], r["volume"])
        for r in got.collect()
    }
    assert final == oracle
    # march buckets kept their pre-correction values (untouched month)
    for ts, close in before.items():
        if ts >= mar:
            assert final[ts][3] == close


def test_refresh_rollup_cdc_propagates_deletes(client, tmp_path, spark):
    """A row-level delete that EMPTIES a source bucket must remove that
    bucket from the rollup on the next CDC refresh — the upsert-only
    path would leave the stale aggregate row in place forever."""
    from pyspark.sql import functions as F

    from dl_datalake_spark.lake.paths import DatasetKey

    jan = 1672574400000  # 2023-01-01T12:00Z, a 15m bucket boundary
    client.ingest_csv(_csv(tmp_path, n=30, start=jan), "binance", "spot", "BTCUSDT")
    assert client.refresh_rollup_cdc("binance", "spot", "BTCUSDT", "1m", "15m") is not None
    agg_key = DatasetKey("binance", "agg", "BTCUSDT", "agg", "15m")
    buckets = {r["ts"] for r in client.reader.read_dataset(agg_key).select("ts").collect()}
    assert len(buckets) == 2  # 30 minutes -> two 15m buckets

    # delete the ENTIRE second bucket and 5 minutes of the first
    raw_key = DatasetKey("binance", "spot", "BTCUSDT", "raw", "1m")
    res = client.writer.delete_range(raw_key, jan + 10 * 60000, jan + 29 * 60000)
    assert res.rows == 20

    out = client.refresh_rollup_cdc("binance", "spot", "BTCUSDT", "1m", "15m")
    assert out is not None
    agg = client.reader.read_dataset(agg_key)
    rows = {r["ts"]: r for r in agg.collect()}
    # the emptied bucket is GONE, not stale
    assert set(rows) == {jan}
    # the partially-affected bucket was recomputed from the 10 survivors
    assert rows[jan]["volume"] == 100.0  # 10 minutes x volume 10

    # caught up afterwards
    assert client.refresh_rollup_cdc("binance", "spot", "BTCUSDT", "1m", "15m") is None

    # deleting EVERYTHING empties the rollup too (cursor still advances)
    client.writer.delete_range(raw_key, jan, jan + 9 * 60000)
    client.refresh_rollup_cdc("binance", "spot", "BTCUSDT", "1m", "15m")
    assert client.reader.read_dataset(agg_key).where(F.col("ts").isNotNull()).count() == 0
    assert client.refresh_rollup_cdc("binance", "spot", "BTCUSDT", "1m", "15m") is None


def test_gdpr_purge_end_to_end_lake_rollup_and_ann_index(client, tmp_path, spark):
    """The composed compliance story the individual contracts only cover
    piecewise: ingest → rollup (CDC) + ANN index over the same ids →
    row-level delete_where purge → CDC refresh + index delete → the
    purged rows leave NO trace in the raw lake, the rollup, or vector
    search, and every consistency check comes back clean."""
    from pyspark.sql import functions as F

    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.operators.ivf_index import (
        delete_from_ivf_index,
        fsck_ivf_index,
        search_ivf_index,
        train_ivf,
        write_ivf_index,
    )

    jan = 1672574400000  # 2023-01-01T12:00Z, 15m bucket boundary
    client.ingest_csv(_csv(tmp_path, n=30, start=jan), "binance", "spot", "BTCUSDT")
    assert client.refresh_rollup_cdc("binance", "spot", "BTCUSDT", "1m", "15m") is not None
    raw_key = DatasetKey("binance", "spot", "BTCUSDT", "raw", "1m")
    agg_key = DatasetKey("binance", "agg", "BTCUSDT", "agg", "15m")

    # every raw row has an embedding in the ANN index, keyed by its ts
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("vec_id") < 30)
        .select((F.lit(jan) + F.col("vec_id") * 60000).alias("vec_id"), "embedding")
    )
    ivf_path = str(tmp_path / "ivf")
    write_ivf_index(emb, train_ivf(emb, num_cells=4, iters=2), ivf_path)

    # GDPR request: purge minutes 10..29 (the whole second bucket + the
    # tail of the first) from lake AND index
    purge_ids = [jan + i * 60000 for i in range(10, 30)]
    purged_emb = emb.where(F.col("vec_id") == purge_ids[0]).first()["embedding"]
    res = client.writer.delete_range(raw_key, purge_ids[0], purge_ids[-1])
    assert res.rows == 20
    assert client.refresh_rollup_cdc("binance", "spot", "BTCUSDT", "1m", "15m") is not None
    assert delete_from_ivf_index(spark, purge_ids, ivf_path) == 20

    # raw lake: only the 10 survivors
    assert client.reader.read_dataset(raw_key).count() == 10
    # rollup: the emptied bucket is GONE, the partial one recomputed
    rows = {r["ts"]: r for r in client.reader.read_dataset(agg_key).collect()}
    assert set(rows) == {jan}
    assert rows[jan]["volume"] == 100.0  # 10 surviving minutes x 10
    # ANN search: a query AT a purged vector never gets it (or any
    # purged id) back, while survivors still serve
    q = spark.createDataFrame(
        [(999999, purged_emb)], "vec_id long, embedding array<double>"
    )
    hits = search_ivf_index(spark, q, ivf_path, k=30, nprobe=4).collect()
    assert hits and not any(r["c_id"] in set(purge_ids) for r in hits)
    assert fsck_ivf_index(spark, ivf_path).count() == 0

    # both purge paths are idempotent replays (crash-safety contract)
    assert client.refresh_rollup_cdc("binance", "spot", "BTCUSDT", "1m", "15m") is None
    assert delete_from_ivf_index(spark, purge_ids, ivf_path) == 0


def test_purge_rows_skips_incompatible_datasets(client, tmp_path, spark):
    """A heterogeneous catalog must not block the GDPR purge: datasets
    the DV delete cannot serve — legacy (no commit-pinned listing) or
    lacking a predicate column — are pre-filtered into ``skipped`` with
    a reason, and the epoch still lands atomically on the rest."""
    from pyspark.sql import functions as F

    from dl_datalake_spark.lake.paths import DatasetKey

    # dataset 1: ticks with a `price` column — purgeable
    k1 = DatasetKey("binance", "spot", "AAA", "ticks", "1m")
    rows = spark.createDataFrame(
        [(1672574400000 + i * 60000, float(i)) for i in range(10)],
        "ts long, price double",
    )
    client.writer.write_ticks(rows, k1, mode="append")
    # dataset 2: OHLC — NO `price` column, predicate cannot resolve
    client.ingest_csv(_csv(tmp_path), "binance", "spot", "BBB")
    # dataset 3: legacy — raw parquet + manifest row, no commit log
    legacy_key = DatasetKey("binance", "spot", "CCC", "raw", "1m")
    legacy_path = client.writer.dataset_path(legacy_key)
    rows.write.parquet(legacy_path)
    client.manifest.add_entry(
        "binance", "spot", "CCC", legacy_path, data_type="raw",
        metadata={"timeframe": "1m"},
    )

    out = client.purge_rows("price >= 5.0")
    assert out["txid"] is not None
    from dl_datalake_spark.lake.paths import dataset_rel_path

    assert out["deleted"].get(dataset_rel_path(k1.normalized())) == 5
    skipped = out["skipped"]
    assert "no commit-pinned listing" in skipped[dataset_rel_path(legacy_key.normalized())]
    bbb = DatasetKey("binance", "spot", "BBB", "raw", "1m")
    assert "does not resolve" in skipped[dataset_rel_path(bbb.normalized())]
    # the purge actually landed on the eligible dataset
    got = client.reader.read_dataset(k1)
    assert got.count() == 5 and got.agg(F.max("price")).first()[0] == 4.0
