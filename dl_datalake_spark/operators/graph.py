"""Distributed graph operators over edge DataFrames.

Spark has no built-in graph surface; these operators express the
standard iterative-relational forms (the GraphX/Pregel recipes redone
as DataFrame plans, public-knowledge algorithms):

- degrees / contribution joins are hash aggs + broadcastable joins
  keyed by vertex id — they shard at any scale;
- each PageRank iteration is the SAME plan re-applied, with
  ``localCheckpoint`` pinning the rank table so the lineage does not
  grow with the iteration count (the classic iterative-Spark trap);
- connected components live in ``operators/components.py`` (driver
  union-find fast path + pointer-jumping fallback) — this module adds
  the rank family.

The oracle-checked single-step shape is
``queries/relational6.py:part_copurchase_pagerank_step``; this module
generalizes it to N damped iterations with float ranks (cross-engine
exactness is only pinned for the single step — iteration compounds
float error, so the registry keeps the integer-exact step as the
contract and tests pin iteration properties instead: rank-mass
conservation and convergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Out-degree per source vertex of a (src, dst) edge table."""
    return edges.groupBy(src).agg(F.count(F.lit(1)).alias("out_degree"))


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Damped PageRank over a directed edge list; returns
    (vertex, rank).

    Per iteration: contribution join (rank/out_degree shipped to each
    out-neighbor) + per-vertex hash agg + dangling/teleport fold — two
    keyed shuffles, no window, no driver state beyond the loop counter.
    The rank table is localCheckpoint-ed each round so plan depth stays
    O(1) regardless of `iters`.

    Ranks use the normalized convention rank = (1-d) + d*Σ in-contrib
    (mean rank 1.0 over vertices with edges); dangling vertices (no
    out-edges) redistribute uniformly, conserving total rank mass —
    pinned by test.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    verts = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(1.0))
    deg = degrees(e)
    ranks = verts.withColumn("rank", F.lit(1.0)).localCheckpoint(eager=True)
    for _ in range(iters):
        with_deg = ranks.join(
            deg, ranks["vertex"] == deg["src"], "left"
        ).select("vertex", "rank", "out_degree")
        # dangling mass: vertices with no out-edges spread their rank
        # over every vertex (one-row agg, broadcast into the fold)
        dangling = (
            with_deg.where(F.col("out_degree").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            .collect()[0]["dm"]
        )
        contribs = (
            e.join(with_deg.where(F.col("out_degree").isNotNull()),
                   e["src"] == with_deg["vertex"])
            .select(
                F.col("dst").alias("vertex"),
                (F.col("rank") / F.col("out_degree")).alias("c"),
            )
            .groupBy("vertex")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            verts.join(contribs, "vertex", "left")
            .select(
                "vertex",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_sum"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
