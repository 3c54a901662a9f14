"""CLI end-to-end (init → ingest → read/symbols → aggregate → export →
audit → delete) and skew-mitigation operators."""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

from dl_datalake_spark.cli import main
from dl_datalake_spark.operators.skew import salted_agg, salted_join


def test_cli_roundtrip(spark, tmp_path, capsys):
    base = str(tmp_path / "lake")
    csv = tmp_path / "in.csv"
    csv.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{1672574400000 + i*60000},1,2,0.5,1.5,10" for i in range(30))
    )

    assert main(["--base", base, "init"]) == 0
    assert main([
        "--base", base, "ingest", str(csv),
        "--exchange", "binance", "--symbol", "BTC/USDT",
    ]) == 0
    out = capsys.readouterr().out
    assert '"rows": 30' in out

    assert main(["--base", base, "symbols"]) == 0
    assert "BTC_USDT" in capsys.readouterr().out

    assert main([
        "--base", base, "aggregate",
        "--exchange", "binance", "--symbol", "BTC/USDT",
        "--source-period", "1m", "--target-period", "15m",
    ]) == 0
    assert json.loads(capsys.readouterr().out)["rows"] == 2  # 30min → 2 buckets

    exp = str(tmp_path / "exp")
    assert main([
        "--base", base, "export",
        "--exchange", "binance", "--symbol", "BTC/USDT", "--out", exp,
    ]) == 0
    capsys.readouterr()
    part = glob.glob(exp + "/part-*.csv")
    assert part and open(part[0]).readline().startswith("<TICKER>")

    assert main(["--base", base, "audit"]) == 0
    audit = json.loads(capsys.readouterr().out)
    assert audit["orphan_files"] == [] and audit["dead_links"] == []

    assert main(["--base", base, "delete", "--symbol", "BTC/USDT"]) == 0
    assert json.loads(capsys.readouterr().out)["deleted"] >= 1


def test_salted_agg_matches_plain(spark):
    # one hot key (90% of rows) + a long tail
    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    salted = {
        (r["k"],): (r["sum_v"], r["count_v"], r["max_v"])
        for r in salted_agg(
            df, ["k"], [("v", "sum"), ("v", "count"), ("v", "max")], salt_buckets=8
        ).collect()
    }
    plain = {
        (r["k"],): (r["s"], r["c"], r["m"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"), F.max("v").alias("m"))
        .collect()
    }
    assert len(salted) == len(plain)
    for k, (s, c, m) in plain.items():
        ss, sc, sm = salted[k]
        assert abs(ss - s) < 1e-6 and sc == c and sm == m


def test_salted_join_matches_plain(spark):
    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 4 != 3, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lid"),
    )
    right = spark.range(0, 50).select(F.col("id").alias("k"), (F.col("id") * 2).alias("rv"))
    salted = salted_join(left, right, "k", salt_buckets=4).orderBy("lid")
    plain = left.join(right, "k").orderBy("lid")
    assert [tuple(r) for r in salted.collect()] == [tuple(r) for r in plain.collect()]


def test_cli_sql_and_pipeline(spark, tmp_path, monkeypatch):
    import dl_datalake_spark.cli as cli

    monkeypatch.setattr(cli, "get_spark", lambda name=None: spark)
    base = str(tmp_path / "lake")
    csv = tmp_path / "p.csv"
    csv.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{i*60000},1,2,0.5,1.5,10" for i in range(60))
    )
    assert cli.main(["--base", base, "pipeline", "--source", str(csv),
                     "--exchange", "binance", "--symbol", "BTCUSDT"]) == 0
    assert cli.main(["--base", base, "sql", "--view", "btc=binance/BTCUSDT",
                     "SELECT COUNT(*) AS n FROM btc"]) == 0


def test_cli_backfill(spark, tmp_path, capsys):
    base = str(tmp_path / "lake2")
    assert main([
        "--base", base, "backfill",
        "--symbols", "BTC_USDT,ETH_USDT",
        "--start-ms", "0", "--end-ms", "3600000",
    ]) == 0
    out = capsys.readouterr().out
    import json as _json

    counts = _json.loads(out.strip().splitlines()[-1])
    assert counts == {"BTC_USDT": 60, "ETH_USDT": 60}


def test_cli_refresh_rollups(spark, tmp_path, capsys):
    base = str(tmp_path / "lake3")
    assert main([
        "--base", base, "backfill",
        "--symbols", "BTC_USDT",
        "--start-ms", "0", "--end-ms", "3600000",
    ]) == 0
    capsys.readouterr()
    assert main(["--base", base, "refresh", "--exchange", "SYNTH"]) == 0
    import json as _json

    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"BTC_USDT": 4}  # four 15m buckets from one hour


def test_cli_index_build_and_search(spark, tmp_path, capsys):
    import json as _json

    from dl_datalake_spark.cli import main

    idx = str(tmp_path / "ivf_idx")
    vecs = "/root/testdata/sf0.001/embeddings.parquet"
    rc = main(
        ["--base", str(tmp_path / "lake"), "index", "build",
         "--vectors", vecs, "--index", idx, "--cells", "4", "--iters", "1"]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["cells"] == 4 and out["vectors"] > 0

    rc = main(
        ["--base", str(tmp_path / "lake"), "index", "search",
         "--vectors", vecs, "--index", idx, "--k", "3", "--nprobe", "2",
         "--query-ids", "0,1"]
    )
    assert rc == 0
    shown = capsys.readouterr().out
    assert "cos_sim" in shown and "rank" in shown


def test_cli_expect_command(spark, tmp_path, capsys):
    import json as _json

    from dl_datalake_spark.cli import main

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, 5.0), (2, -3.0), (None, 1.0)], "ts long, px double"
    ).write.parquet(path)
    rules = '[{"type":"not_null","col":"ts"},{"type":"range","col":"px","lo":0,"hi":10},{"type":"unique","cols":["ts"]}]'
    rc = main(["--base", str(tmp_path / "lake"), "expect", "--path", path, "--rules", rules])
    assert rc == 0
    rep = {r["name"]: r["violations"] for r in _json.loads(capsys.readouterr().out.strip().splitlines()[-1])}
    assert rep == {"not_null_ts": 1, "range_px": 1, "unique_ts": 0}


def test_cli_history_and_skew_commands(spark, tmp_path, capsys):
    import json as _json
    import time

    from dl_datalake_spark.cli import main
    from dl_datalake_spark.lake.manifest import ManifestManager

    base = str(tmp_path / "lake")
    m = ManifestManager(spark, base + "_manifest")
    m.add_entry("binance", "spot", "BTCUSDT", "/lake/x", "raw", 0, 10, version="1")
    assert main(["--base", base, "history"]) == 0
    snaps = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # CLI's client uses <base>/_manifest too; one snapshot from our write
    assert snaps and all(isinstance(x, int) for x in snaps)

    assert main(["--base", base, "history", "--at", str(int(time.time() * 1e6))]) == 0
    assert "BTCUSDT" in capsys.readouterr().out

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a")] * 8 + [(2, "b")] * 2, "k long, v string"
    ).write.parquet(path)
    assert main(["--base", base, "skew", "--path", path, "--keys", "k"]) == 0
    out = capsys.readouterr().out
    assert "share" in out and "x_mean" in out


def test_cli_curate_end_to_end(spark, tmp_path, capsys):
    """curate: documents parquet -> deduped/filtered/split/sharded
    training parquet + JSON summary."""
    base = str(tmp_path / "lake")
    out = str(tmp_path / "curated")
    docs = str(tmp_path / "docs_in")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(docs)

    assert main([
        "--base", base, "curate", "--docs", docs, "--out", out, "--shards", "4",
    ]) == 0
    summary = json.loads(capsys.readouterr().out)
    assert summary["n_kept"] > 0 and summary["n_kept"] < summary["n_in"]

    curated = spark.read.parquet(out)
    # splits + shards materialized as partition dirs; text survives
    assert set(r["split"] for r in curated.select("split").distinct().collect()) <= {
        "train", "val", "test"
    }
    assert curated.where(F.col("shard") >= 4).count() == 0
    assert "text" in curated.columns and "quality" in curated.columns
    assert curated.count() == summary["n_kept"]
    # deterministic: re-running lands the identical corpus
    out2 = str(tmp_path / "curated2")
    assert main([
        "--base", base, "curate", "--docs", docs, "--out", out2, "--shards", "4",
    ]) == 0
    a = sorted(r["doc_id"] for r in curated.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in spark.read.parquet(out2).select("doc_id").collect())
    assert a == b


def test_cli_maintain_compact_and_vacuum(spark, tmp_path, capsys):
    base = str(tmp_path / "lake")
    csv = tmp_path / "m.csv"
    csv.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{1672574400000 + i*60000},1,2,0.5,1.5,10" for i in range(20))
    )
    assert main(["--base", base, "init"]) == 0
    capsys.readouterr()
    assert main([
        "--base", base, "ingest", str(csv),
        "--exchange", "binance", "--symbol", "BTCUSDT",
    ]) == 0
    capsys.readouterr()

    assert main(["--base", base, "maintain", "compact"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["compacted"]

    assert main(["--base", base, "maintain", "vacuum"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["dry_run"] is True
    # a healthy lake reports nothing to reclaim
    assert rep.get("orphan_dirs", []) == [] and rep.get("dead_links", []) == []

    # data intact after compaction
    assert spark.read.option("basePath", base).parquet(
        base + "/exchange=BINANCE/market=SPOT/symbol=BTCUSDT/data_type=raw/period=1m"
    ).count() == 20


def test_cli_delete_rows_range_and_where(spark, tmp_path, capsys):
    import json as _json

    from dl_datalake_spark.cli import main

    base = str(tmp_path / "lake")
    csv = tmp_path / "in.csv"
    start = 1672574400000
    csv.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{start + i*60000},1,2,0.5,1.5,10" for i in range(30))
    )
    assert main(["--base", base, "ingest", str(csv), "--exchange", "BINANCE",
                 "--market", "SPOT", "--symbol", "BTCUSDT"]) == 0
    capsys.readouterr()

    # range form (partition-pruned probe)
    assert main(["--base", base, "delete-rows", "--exchange", "BINANCE",
                 "--symbol", "BTCUSDT", "--start-ms", str(start),
                 "--end-ms", str(start + 9 * 60000)]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"deleted": 10, "partitions": [[2023, 1]]}

    # predicate form
    assert main(["--base", base, "delete-rows", "--exchange", "BINANCE",
                 "--symbol", "BTCUSDT", "--where", f"ts = {start + 10*60000}"]) == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["deleted"] == 1

    from dl_datalake_spark.client import DataLakeClient
    client = DataLakeClient(spark, base)
    assert client.read_ohlc("BINANCE", "BTCUSDT").count() == 19


def test_cli_read_at_time_travel(spark, tmp_path, monkeypatch, capsys):
    from dl_datalake_spark import cli

    monkeypatch.setattr(cli, "get_spark", lambda name=None: spark)
    base = str(tmp_path / "lake_tt")
    csv = tmp_path / "tt.csv"
    csv.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{1672574400000 + i*60000},1,2,0.5,1.5,10" for i in range(10))
    )
    assert cli.main(["--base", base, "pipeline", "--source", str(csv),
                     "--exchange", "binance", "--symbol", "BTCUSDT"]) == 0
    capsys.readouterr()
    assert cli.main(["--base", base, "read-at", "--exchange", "BINANCE",
                     "--symbol", "BTCUSDT", "--version", "0", "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "1.5" in out  # the v0 close price printed


def test_cli_maintain_recluster_and_fold_multilog(spark, tmp_path, capsys):
    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.writer import LakeWriter

    base = str(tmp_path / "lake_m")
    w = LakeWriter(spark, base)
    key = DatasetKey("BINANCE", "SPOT", "BTC_USDT", "ticks", "1m")
    df = spark.createDataFrame(
        [(1672574400000 + i * 60000, float((i * 7) % 50)) for i in range(40)],
        "ts long, price double",
    )
    w.write_ticks(df, key)
    ds = w.dataset_path(key)

    assert main([
        "--base", base, "maintain", "recluster",
        "--path", ds, "--cols", "ts,price",
    ]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["files_after"] >= 1
    assert w.commit_log(key).col_stats("price")

    assert main(["--base", base, "maintain", "fold-multilog"]) == 0
    rep2 = json.loads(capsys.readouterr().out)
    assert rep2["folded"] == 0  # nothing resolved-and-old yet: a no-op


def test_cli_restore_roundtrip(spark, tmp_path, capsys):
    base = str(tmp_path / "lake_r")
    csv = tmp_path / "r.csv"
    csv.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{1672574400000 + i*60000},1,2,0.5,1.5,10" for i in range(10))
    )
    assert main(["--base", base, "ingest", str(csv),
                 "--exchange", "binance", "--symbol", "BTC/USDT"]) == 0
    csv2 = tmp_path / "r2.csv"
    csv2.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{1672574400000 + i*60000},9,9,9,9,9" for i in range(10, 20))
    )
    assert main(["--base", base, "ingest", str(csv2),
                 "--exchange", "binance", "--symbol", "BTC/USDT"]) == 0
    capsys.readouterr()
    assert main(["--base", base, "restore",
                 "--exchange", "binance", "--symbol", "BTC/USDT",
                 "--version", "0"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep == {"restored_to": 0, "rows": 10, "partitions": [[2023, 1]]}
