"""Scalar-function surface (functions/, SURVEY §2.8 F1-F11)."""

from __future__ import annotations

from pyspark.sql import functions as F

import dl_datalake_spark.functions as fn


def test_scalar_function_surface(spark):
    df = spark.createDataFrame(
        [(1704067200000, "2024-01-01", '{"timeframe":"1m"}',
          "base/EX/SPOT/BTC/raw/1m/2024/01/x.parquet", "abc")],
        "ts long, iso string, meta string, path string, txt string",
    )
    row = df.select(
        fn.epoch_ms_to_ts("ts").alias("t"),
        fn.ts_to_epoch_ms(fn.epoch_ms_to_ts("ts")).alias("ms"),
        fn.ts_to_date(fn.epoch_ms_to_ts("ts")).alias("d"),
        fn.strftime_col(fn.epoch_ms_to_ts("ts")).alias("ymd"),
        fn.trunc_month(fn.epoch_ms_to_ts("ts")).alias("m"),
        fn.iso_to_epoch_ms_col("iso").alias("iso_ms"),
        fn.json_get("meta", "$.timeframe").alias("tf"),
        fn.path_timeframe("path").alias("ptf"),
        fn.sha256_hex("txt").alias("h"),
        fn.lit_tag("BTC").alias("tag"),
    ).collect()[0]
    assert row["ms"] == 1704067200000
    assert str(row["d"]) == "2024-01-01"
    assert row["ymd"] == "20240101"
    assert row["iso_ms"] == 1704067200000
    assert row["tf"] == "1m"
    assert row["ptf"] == "1m"
    assert row["h"] == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    assert row["tag"] == "BTC"
    assert fn.sanitize_symbol("btc/usdt:x y") == "BTC_USDT_X_Y"
    # ts_diff: lag-style arithmetic
    d2 = spark.createDataFrame([(10, 3)], "a long, ts long")
    assert d2.select(fn.ts_diff("a").alias("d")).collect()[0]["d"] == 7
