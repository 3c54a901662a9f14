"""Unit tests for the temporal join operators (as-of, banded range
count) and the IVF / near-dup similarity additions."""

from __future__ import annotations

from pyspark.sql import functions as F

from dl_datalake_spark.operators.joins import asof_join, range_count_join
from dl_datalake_spark.operators.similarity import (
    cosine_near_dup_pairs,
    ivf_topk,
    label_centroids,
)


def test_asof_join_backward(spark):
    clicks = spark.createDataFrame(
        [(1, 100, "c1"), (1, 250, "c2"), (2, 50, "c3"), (1, 200, "c4")],
        "user_id long, ts long, click string",
    ).repartition(3)
    purchases = spark.createDataFrame(
        [(1, 90, 10.0), (1, 200, 20.0), (2, 60, 30.0)],
        "user_id long, ts long, amount double",
    ).repartition(2)
    out = {
        r["click"]: r
        for r in asof_join(
            clicks, purchases, on="ts", by=["user_id"], value_cols=["amount"]
        ).collect()
    }
    assert out["c1"]["amount"] == 10.0 and out["c1"]["ts_right"] == 90
    # exact-timestamp match counts (>= semantics)
    assert out["c4"]["amount"] == 20.0 and out["c4"]["ts_right"] == 200
    assert out["c2"]["amount"] == 20.0
    # no purchase at or before ts=50 for user 2
    assert out["c3"]["amount"] is None and out["c3"]["ts_right"] is None


def test_asof_join_forward_nearest_tolerance(spark):
    clicks = spark.createDataFrame(
        [(1, 100, "c1"), (1, 196, "c2"), (1, 205, "c3"), (2, 50, "c4")],
        "user_id long, ts long, click string",
    ).repartition(3)
    purchases = spark.createDataFrame(
        [(1, 90, 10.0), (1, 200, 20.0), (1, 300, 30.0)],
        "user_id long, ts long, amount double",
    ).repartition(2)

    def run(**kw):
        return {
            r["click"]: r
            for r in asof_join(
                clicks, purchases, on="ts", by=["user_id"], value_cols=["amount"], **kw
            ).collect()
        }

    fwd = run(direction="forward")
    assert fwd["c1"]["amount"] == 20.0 and fwd["c1"]["ts_right"] == 200
    assert fwd["c3"]["amount"] == 30.0  # 200 is in the past, earliest ahead is 300
    assert fwd["c4"]["amount"] is None  # user 2 has no purchases

    near = run(direction="nearest")
    assert near["c1"]["amount"] == 10.0  # |100-90| < |200-100|
    assert near["c2"]["amount"] == 20.0  # forward 200 closer than backward 90
    assert near["c3"]["amount"] == 20.0  # backward 200 closer than forward 300

    # equidistant: backward wins (pandas.merge_asof semantics)
    mid = spark.createDataFrame([(1, 145, "m")], "user_id long, ts long, click string")
    tie = {
        r["click"]: r
        for r in asof_join(
            mid, purchases, on="ts", by=["user_id"], value_cols=["amount"],
            direction="nearest",
        ).collect()
    }
    assert tie["m"]["ts_right"] == 90 and tie["m"]["amount"] == 10.0

    # tolerance nulls far matches without dropping left rows
    tol = run(direction="nearest", tolerance=10)
    assert tol["c1"]["amount"] == 10.0
    assert tol["c2"]["amount"] == 20.0
    assert tol["c4"]["amount"] is None
    back_tol = run(tolerance=5)  # backward with tight tolerance
    assert back_tol["c1"]["amount"] is None and back_tol["c3"]["amount"] == 20.0


def test_range_count_join_buckets(spark):
    left = spark.createDataFrame(
        [(1, 0, "a"), (1, 95, "b"), (2, 0, "c")], "user_id long, ts long, k string"
    )
    right = spark.createDataFrame(
        # for window width 100: "a" sees 0,50,99 (3); "b" sees 99,100,150 (3)
        [(1, 0), (1, 50), (1, 99), (1, 100), (1, 150), (1, 400), (2, 101)],
        "user_id long, ts long",
    )
    out = {
        r["k"]: r["match_count"]
        for r in range_count_join(
            left, right, on="ts", by=["user_id"], lower=0, upper=100
        ).collect()
    }
    assert out == {"a": 3, "b": 3, "c": 0}


def test_label_centroids_and_ivf(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.8, 0.2], 0),
        (2, [0.0, 1.0], 1),
        (3, [0.1, 0.9], 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    cents = {r["label"]: r["cv"] for r in label_centroids(emb).collect()}
    assert abs(cents[0][0] - 0.9) < 1e-6 and abs(cents[1][1] - 0.95) < 1e-6

    q = emb.where(F.col("vec_id") == 0)
    hits = ivf_topk(q, emb, k=2).collect()
    # query 0 lands in cell 0 and only sees its cell-mates (vec 1)
    assert [(r["q_id"], r["c_id"], r["cell"]) for r in hits] == [(0, 1, 0)]


def test_cosine_near_dup_pairs(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.999, 0.01]),
        (2, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = cosine_near_dup_pairs(emb, threshold=0.95).collect()
    assert [(r["a_id"], r["b_id"]) for r in pairs] == [(0, 1)]


def test_cosine_near_dup_blas_matches_fold(spark):
    from dl_datalake_spark.operators.similarity import cosine_near_dup_pairs_blas

    rows = [(i, [float((i * 7 + j * 3) % 13) for j in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    fold = sorted(map(tuple, cosine_near_dup_pairs(emb, 0.8).collect()))
    blas = sorted(map(tuple, cosine_near_dup_pairs_blas(emb, 0.8).collect()))
    assert fold == blas and len(fold) > 0


def test_connected_components(spark):
    from dl_datalake_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        # two chains (1-2-3, 10-11) and an isolated edge pair (20, 21)
        [(2, 1), (2, 3), (10, 11), (21, 20)],
        "id_a long, id_b long",
    )
    out = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_paths_agree(spark):
    """Driver union-find and distributed pointer-jump propagation must
    produce identical labelings — including on a long chain (high
    diameter, the case pointer jumping exists for)."""
    import random

    from dl_datalake_spark.operators.components import connected_components

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(40)]  # 41-node chain, diameter 40
    nodes = list(range(100, 160))
    rng.shuffle(nodes)
    for a, b in zip(nodes[::2], nodes[1::2]):  # 30 random 2-cliques
        edges.append((a, b))
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")

    fast = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    dist = {
        r["node"]: r["component"]
        for r in connected_components(pairs, max_driver_edges=0).collect()
    }
    assert fast == dist and len(fast) == 41 + 60
    assert all(fast[n] == 0 for n in range(41))  # chain resolves to min id
