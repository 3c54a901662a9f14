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


# ---------------------------------------------------------------------------
# persistent IVF index: train -> write -> pruned search
# ---------------------------------------------------------------------------
def _load_emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ivf_index_roundtrip_pruning_and_recall(spark, tmp_path):
    from dl_datalake_spark.operators.ivf_index import (
        read_ivf_index,
        search_ivf_index,
        train_ivf,
        write_ivf_index,
    )
    from dl_datalake_spark.operators.similarity import cosine

    emb = _load_emb(spark)
    cents = train_ivf(emb, num_cells=8, iters=2)
    assert cents.count() == 8

    path = str(tmp_path / "ivf")
    write_ivf_index(emb, cents, path)
    cents2, vectors = read_ivf_index(spark, path)
    assert cents2.count() == 8
    assert vectors.count() == emb.count()

    # partition pruning: the cell predicate must land in the scan's
    # PartitionFilters (directory-level skipping), not a post-scan Filter
    one_cell = vectors.where(F.col("cell") == 0)
    plan = one_cell._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cell" in pf[0], f"no partition filter in plan:\n{plan[:800]}"

    queries = emb.where(F.col("vec_id") < 5)
    res = search_ivf_index(spark, queries, path, k=5, nprobe=3)
    got = res.groupBy("q_id").count().collect()
    assert len(got) == 5 and all(r["count"] == 5 for r in got)

    # recall floor vs exact brute force: nprobe=3/8 should keep most
    # true neighbors for clusterable synthetic data
    q = queries.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv"))
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("s"), F.asc("c_id"))
    exact = (
        q.crossJoin(c)
        .where(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
    )
    truth = {(r["q_id"], r["c_id"]) for r in exact.collect()}
    found = {(r["q_id"], r["c_id"]) for r in res.collect()}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.5, f"IVF recall {recall} below floor"


def test_ivf_training_is_deterministic(spark, tmp_path):
    from dl_datalake_spark.operators.ivf_index import train_ivf

    emb = _load_emb(spark)
    a = {r["cell"]: r["cv"] for r in train_ivf(emb, num_cells=4, iters=2).collect()}
    b = {r["cell"]: r["cv"] for r in train_ivf(emb, num_cells=4, iters=2).collect()}
    assert set(a) == set(b)
    for cell in a:
        assert [round(x, 9) for x in a[cell]] == [round(x, 9) for x in b[cell]]


def test_ivf_full_probe_equals_brute_force(spark, tmp_path):
    """nprobe == num_cells must degrade EXACTLY to brute-force top-k —
    the graceful-degradation contract of the inverted file."""
    from pyspark.sql import Window

    from dl_datalake_spark.operators.ivf_index import (
        search_ivf_index,
        train_ivf,
        write_ivf_index,
    )
    from dl_datalake_spark.operators.similarity import cosine

    emb = _load_emb(spark)
    cents = train_ivf(emb, num_cells=4, iters=1)
    path = str(tmp_path / "ivf_full")
    write_ivf_index(emb, cents, path)

    queries = emb.where(F.col("vec_id") < 3)
    res = search_ivf_index(spark, queries, path, k=4, nprobe=4)
    found = {(r["q_id"], r["c_id"], r["rank"]) for r in res.collect()}

    q = queries.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("cv"))
    w = Window.partitionBy("q_id").orderBy(F.desc("s"), F.asc("c_id"))
    exact = (
        q.crossJoin(c)
        .where(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("s"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 4)
    )
    truth = {(r["q_id"], r["c_id"], r["rank"]) for r in exact.collect()}
    assert found == truth


def test_ivf_index_incremental_upsert(spark, tmp_path):
    """Daily-batch maintenance: new vectors land in their cells via
    dynamic partition overwrite of ONLY the touched cells; re-inserts
    dedupe; untouched cells' files are not rewritten."""
    import os

    from pyspark.sql import functions as F

    from dl_datalake_spark.operators.ivf_index import (
        read_ivf_index,
        search_ivf_index,
        train_ivf,
        upsert_ivf_index,
        write_ivf_index,
    )

    emb = _load_emb(spark)
    base = emb.where(F.col("vec_id") < 80)
    cents = train_ivf(base, num_cells=4, iters=2)
    path = str(tmp_path / "ivf_up")
    write_ivf_index(base, cents, path)
    _, vectors = read_ivf_index(spark, path)
    n0 = vectors.count()
    assert n0 == 80

    # snapshot per-cell file mtimes to prove untouched cells survive
    vdir = os.path.join(path, "vectors")
    def cell_files():
        out = {}
        for d in os.listdir(vdir):
            if d.startswith("cell="):
                full = os.path.join(vdir, d)
                out[d] = sorted(os.listdir(full))
        return out
    before = cell_files()

    batch = emb.where((F.col("vec_id") >= 80) & (F.col("vec_id") < 100))
    upsert_ivf_index(spark, batch, path)
    _, vectors = read_ivf_index(spark, path)
    assert vectors.count() == 100
    # every new id present exactly once
    news = vectors.where(F.col("vec_id") >= 80)
    assert news.count() == 20
    assert news.select("vec_id").distinct().count() == 20

    # touched cells = the batch's assigned cells; other cells untouched
    touched = {f"cell={r['cell']}" for r in news.select("cell").distinct().collect()}
    after = cell_files()
    for d, files in before.items():
        if d not in touched:
            assert after[d] == files, f"untouched {d} was rewritten"

    # idempotent re-upsert: same batch again -> no duplicates
    upsert_ivf_index(spark, batch, path)
    _, vectors = read_ivf_index(spark, path)
    assert vectors.count() == 100

    # search serves the new vectors (a new vector is its own best hit's
    # neighborhood; just assert k results per query from probed cells)
    res = search_ivf_index(spark, batch.limit(3), path, k=3, nprobe=2)
    got = res.groupBy("q_id").count().collect()
    assert len(got) == 3 and all(r["count"] == 3 for r in got)


def test_ivf_changed_vector_fsck_search_and_repair(spark, tmp_path):
    """The documented staleness hole, now enforced: re-inserting a
    vec_id with a CHANGED vector leaves the old copy in its former cell;
    fsck flags it, search returns only the newest copy, and repair
    removes the stale one (rewriting only the affected cells)."""
    import os

    from pyspark.sql import functions as F

    from dl_datalake_spark.operators.ivf_index import (
        fsck_ivf_index,
        read_ivf_index,
        repair_ivf_index,
        search_ivf_index,
        train_ivf,
        upsert_ivf_index,
        write_ivf_index,
    )

    emb = _load_emb(spark)
    base = emb.where(F.col("vec_id") < 80)
    cents = train_ivf(base, num_cells=4, iters=2)
    path = str(tmp_path / "ivf_stale")
    write_ivf_index(base, cents, path)
    assert fsck_ivf_index(spark, path).count() == 0  # clean index

    # pick a vec_id and replace its embedding with another cell's vector
    # (guaranteed cell change: use the embedding of a vector in a
    # different cell)
    _, vectors = read_ivf_index(spark, path)
    two = vectors.select("vec_id", "cell").orderBy("cell", "vec_id").collect()
    victim = two[0]
    donor = next(r for r in two if r["cell"] != victim["cell"])
    donor_emb = (
        vectors.where(F.col("vec_id") == donor["vec_id"]).select("embedding").first()[0]
    )
    changed = spark.createDataFrame(
        [(victim["vec_id"], donor_emb)], "vec_id long, embedding array<double>"
    )
    upsert_ivf_index(spark, changed, path)

    # stale copy exists: fsck flags exactly the victim
    bad = fsck_ivf_index(spark, path).collect()
    assert [r["vec_id"] for r in bad] == [victim["vec_id"]]
    assert bad[0]["n_copies"] == 2
    assert bad[0]["live_cell"] == donor["cell"]  # newest copy in donor's cell

    # search with full probe sees both copies but returns ONLY the new
    # one (keep-latest per candidate id)
    q = spark.createDataFrame([(999999, donor_emb)], "vec_id long, embedding array<double>")
    res = search_ivf_index(spark, q, path, k=80, nprobe=4).collect()
    hits = [r for r in res if r["c_id"] == victim["vec_id"]]
    assert len(hits) == 1  # not two copies
    assert hits[0]["cos_sim"] == 1.0  # it's the NEW (donor-equal) vector

    # repair removes exactly the stale row, touching only its cell
    vdir = os.path.join(path, "vectors")
    untouched = f"cell={donor['cell']}"
    files_before = sorted(os.listdir(os.path.join(vdir, untouched)))
    removed = repair_ivf_index(spark, path)
    assert removed == 1
    assert fsck_ivf_index(spark, path).count() == 0
    _, vectors2 = read_ivf_index(spark, path)
    assert vectors2.count() == 80  # no row lost, one duplicate gone
    assert sorted(os.listdir(os.path.join(vdir, untouched))) == files_before

    # idempotent: second repair is a no-op
    assert repair_ivf_index(spark, path) == 0


def test_ivf_index_delete_purges_vectors_and_stale_copies(spark, tmp_path):
    """GDPR-purge mirror of the lake's row-level delete: delete_from_ivf_index
    removes every copy of the given ids (stale superseded copies in other
    cells included), rewrites only the touched cells, drops an emptied
    cell's directory, and search never returns a deleted id again."""
    import os

    from pyspark.sql import functions as F

    from dl_datalake_spark.operators.ivf_index import (
        delete_from_ivf_index,
        fsck_ivf_index,
        read_ivf_index,
        search_ivf_index,
        train_ivf,
        upsert_ivf_index,
        write_ivf_index,
    )

    emb = _load_emb(spark)
    base = emb.where(F.col("vec_id") < 80)
    cents = train_ivf(base, num_cells=4, iters=2)
    path = str(tmp_path / "ivf_del")
    write_ivf_index(base, cents, path)
    _, vectors = read_ivf_index(spark, path)
    rows = vectors.select("vec_id", "cell").collect()
    victim = rows[0]

    # give the victim a STALE second copy: upsert it with another cell's
    # embedding so the live copy moves cell, old copy stays on disk
    donor = next(r for r in rows if r["cell"] != victim["cell"])
    donor_emb = (
        vectors.where(F.col("vec_id") == donor["vec_id"]).select("embedding").first()[0]
    )
    upsert_ivf_index(
        spark,
        spark.createDataFrame(
            [(victim["vec_id"], donor_emb)], "vec_id long, embedding array<double>"
        ),
        path,
    )
    assert fsck_ivf_index(spark, path).count() == 1  # stale copy exists

    vdir = os.path.join(path, "vectors")
    untouched_cells = {
        r["cell"]
        for r in read_ivf_index(spark, path)[1]
        .where(~F.col("vec_id").isin(victim["vec_id"], donor["vec_id"]))
        .select("cell").distinct().collect()
    } - {victim["cell"], donor["cell"]}
    files_before = {
        c: sorted(os.listdir(os.path.join(vdir, f"cell={c}"))) for c in untouched_cells
    }

    # purge BOTH copies of the victim plus the donor in one batch
    removed = delete_from_ivf_index(spark, [victim["vec_id"], donor["vec_id"]], path)
    assert removed == 3  # victim live + victim stale + donor

    _, after = read_ivf_index(spark, path)
    assert after.count() == 78
    assert after.where(F.col("vec_id").isin(victim["vec_id"], donor["vec_id"])).count() == 0
    assert fsck_ivf_index(spark, path).count() == 0  # no ghost for repair

    # search with full probe never returns the deleted ids
    q = spark.createDataFrame([(999999, donor_emb)], "vec_id long, embedding array<double>")
    res = search_ivf_index(spark, q, path, k=80, nprobe=4).collect()
    assert not any(r["c_id"] in (victim["vec_id"], donor["vec_id"]) for r in res)

    # untouched cells' files were not rewritten
    for c, before in files_before.items():
        assert sorted(os.listdir(os.path.join(vdir, f"cell={c}"))) == before

    # deleting the same ids again is a clean no-op (no transaction residue)
    assert delete_from_ivf_index(spark, [victim["vec_id"], donor["vec_id"]], path) == 0

    # commit log recorded the purge
    from dl_datalake_spark.operators.ivf_index import _index_log

    hist = _index_log(path, spark).history()
    assert hist[-2]["op"] == "delete" and hist[-2]["removed"] == 3
    assert hist[-1]["op"] == "delete" and hist[-1]["removed"] == 0


def test_ivf_index_delete_drops_emptied_cell_dir(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from dl_datalake_spark.operators.ivf_index import (
        delete_from_ivf_index,
        read_ivf_index,
        search_ivf_index,
        train_ivf,
        write_ivf_index,
    )

    emb = _load_emb(spark)
    base = emb.where(F.col("vec_id") < 60)
    cents = train_ivf(base, num_cells=4, iters=2)
    path = str(tmp_path / "ivf_del_empty")
    write_ivf_index(base, cents, path)
    _, vectors = read_ivf_index(spark, path)
    by_cell = {}
    for r in vectors.select("vec_id", "cell").collect():
        by_cell.setdefault(r["cell"], []).append(r["vec_id"])
    # wipe out one whole cell via a DataFrame id list
    cell, ids = sorted(by_cell.items(), key=lambda kv: len(kv[1]))[0]
    ids_df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    removed = delete_from_ivf_index(spark, ids_df, path)
    assert removed == len(ids)
    assert not os.path.exists(os.path.join(path, "vectors", f"cell={cell}"))
    _, after = read_ivf_index(spark, path)
    assert after.count() == 60 - len(ids)
    # the index still serves searches over the remaining cells
    any_emb = after.select("embedding").first()[0]
    q = spark.createDataFrame([(999999, any_emb)], "vec_id long, embedding array<double>")
    assert search_ivf_index(spark, q, path, k=5, nprobe=4).count() > 0


def test_ivf_drift_report_flags_skewed_upserts(spark, tmp_path):
    """The retrain trigger: a balanced fresh index reports ~uniform cell
    load and high member-centroid cosine; a skewed upsert batch (one
    region of space) shows up as load_vs_mean growth on its cell."""
    from pyspark.sql import functions as F

    from dl_datalake_spark.operators.ivf_index import (
        ivf_drift_report,
        read_ivf_index,
        train_ivf,
        upsert_ivf_index,
        write_ivf_index,
    )

    emb = _load_emb(spark)
    base = emb.where(F.col("vec_id") < 80)
    cents = train_ivf(base, num_cells=4, iters=2)
    path = str(tmp_path / "ivf_drift")
    write_ivf_index(base, cents, path)

    before = {r["cell"]: r for r in ivf_drift_report(spark, path).collect()}
    assert sum(r["n_vectors"] for r in before.values()) == 80
    assert abs(sum(r["share"] for r in before.values()) - 1.0) < 1e-5
    assert all(-1.0 <= r["mean_centroid_sim"] <= 1.0 for r in before.values())

    # skewed batch: 20 copies of ONE existing vector's embedding under
    # new ids — they all land in that vector's cell
    _, vectors = read_ivf_index(spark, path)
    donor = vectors.select("vec_id", "cell", "embedding").orderBy("vec_id").first()
    batch = spark.createDataFrame(
        [(1000 + i, donor["embedding"]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    upsert_ivf_index(spark, batch, path)

    after = {r["cell"]: r for r in ivf_drift_report(spark, path).collect()}
    assert sum(r["n_vectors"] for r in after.values()) == 100
    hot = after[donor["cell"]]
    assert hot["n_vectors"] == before[donor["cell"]]["n_vectors"] + 20
    assert hot["load_vs_mean"] > before[donor["cell"]]["load_vs_mean"]
    # untouched cells keep their counts
    for cell, r in before.items():
        if cell != donor["cell"]:
            assert after[cell]["n_vectors"] == r["n_vectors"]
