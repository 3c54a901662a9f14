"""Z-order clustering: correctness of the Morton key and the actual
data-skipping payoff measured from parquet footer stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from dl_datalake_spark.lake.clustering import (
    file_skip_fraction,
    morton_interleave,
    zorder_key,
    zorder_rewrite,
)


def test_morton_interleave_bit_placement(spark):
    # x=0b11, y=0b01 with 2 bits -> z bits: x0@0, y0@1, x1@2, y1@3
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    z = df.select(
        morton_interleave([F.col("x"), F.col("y")], bits=2)
    ).first()[0]
    assert z == 0b0111  # x0=1, y0=1, x1=1, y1=0


def test_zorder_key_buckets_cover_space(spark):
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"),
        (F.pmod(F.xxhash64("id"), F.lit(64))).alias("y"),
    )
    keyed = zorder_key(df, ["x", "y"], bits=4)
    stats = keyed.agg(
        F.min("zval"), F.max("zval"), F.countDistinct("zval")
    ).first()
    # 4+4 bits -> key space [0, 256); equi-depth buckets should touch
    # most of it for uniform inputs
    assert 0 <= stats[0] and stats[1] < 256
    assert stats[2] > 128


def test_zorder_rewrite_skips_on_both_columns(spark, tmp_path):
    # two independent uniform columns; a linear sort on x gives y no
    # locality, z-order gives both columns tight per-file ranges
    n = 200_000
    df = spark.range(0, n).select(
        F.pmod(F.xxhash64("id"), F.lit(100_000)).cast("double").alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000)).cast("double").alias("y"),
    )
    linear = str(tmp_path / "linear")
    zordered = str(tmp_path / "zorder")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zorder_rewrite(df, ["x", "y"], zordered, num_files=16, bits=4)

    # narrow predicate on the NON-leading column
    lo, hi = 10_000.0, 15_000.0
    skip_linear = file_skip_fraction(linear, "y", lo, hi)
    skip_z = file_skip_fraction(zordered, "y", lo, hi)
    # linear-by-x layout cannot skip on y at all; z-order must skip most
    assert skip_linear <= 0.1
    assert skip_z >= 0.5
    # and the z-ordered files still skip on x too (a 5% x-slab)
    assert file_skip_fraction(zordered, "x", 10_000.0, 15_000.0) >= 0.5

    # rewrite preserves the data exactly
    a = spark.read.parquet(linear).agg(F.sum("x"), F.sum("y"), F.count("*")).first()
    b = spark.read.parquet(zordered).agg(F.sum("x"), F.sum("y"), F.count("*")).first()
    assert a == b


def test_cli_cluster_command(spark, tmp_path, capsys):
    from dl_datalake_spark.cli import main

    src = str(tmp_path / "src")
    out = str(tmp_path / "clustered")
    spark.range(0, 10_000).select(
        F.col("id").cast("double").alias("a"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double").alias("b"),
    ).write.parquet(src)
    assert main(
        ["--base", str(tmp_path / "lake"), "cluster",
         "--path", src, "--out", out, "--cols", "a,b", "--files", "8"]
    ) == 0
    import json

    rep = json.loads(capsys.readouterr().out)
    assert rep["cols"] == ["a", "b"]
    assert spark.read.parquet(out).count() == 10_000


def test_cli_query_command(spark, tmp_path, capsys):
    from dl_datalake_spark.cli import main

    assert main(["--base", str(tmp_path / "lake"), "query", "list"]) == 0
    import json

    names = json.loads(capsys.readouterr().out)
    assert "q1_pricing_summary" in names and len(names) >= 100

    assert main(
        ["--base", str(tmp_path / "lake"), "query", "region_nation_list",
         "--sf-dir", "/root/testdata/sf0.001", "--limit", "5"]
    ) == 0
    assert "r_name" in capsys.readouterr().out
