"""Iterative graph operators: PageRank properties that a single
oracle-checked step cannot pin — mass conservation under damping +
dangling redistribution, convergence, and agreement with the
integer-exact one-step registry query's ranking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dl_datalake_spark.operators.graph import degrees, pagerank


@pytest.fixture()
def chain_with_hub(spark):
    # 1->2->3->1 cycle plus hub 4 pointed at by everyone; 5 dangling-in
    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4), (3, 4), (5, 4)]
    return spark.createDataFrame(edges, "src long, dst long")


def test_degrees(spark, chain_with_hub):
    d = {r["src"]: r["out_degree"] for r in degrees(chain_with_hub).collect()}
    assert d == {1: 2, 2: 2, 3: 2, 5: 1}


def test_pagerank_mass_conserved_and_hub_wins(spark, chain_with_hub):
    pr = pagerank(chain_with_hub, iters=12)
    rows = {r["vertex"]: r["rank"] for r in pr.collect()}
    assert len(rows) == 5
    # total rank mass == n (normalized convention, dangling redistributed)
    assert abs(sum(rows.values()) - 5.0) < 1e-6
    # the vertex everyone points at out-ranks all others
    assert rows[4] == max(rows.values())
    # the vertex nobody points at bottoms out near the teleport floor
    assert rows[5] == min(rows.values())


def test_pagerank_converges(spark, chain_with_hub):
    a = {r["vertex"]: r["rank"] for r in pagerank(chain_with_hub, iters=20).collect()}
    b = {r["vertex"]: r["rank"] for r in pagerank(chain_with_hub, iters=21).collect()}
    assert max(abs(a[v] - b[v]) for v in a) < 1e-4


def test_pagerank_matches_single_step_ranking(spark):
    """One float iteration from uniform ranks orders vertices exactly
    like the integer-exact registry step (same contribution formula)."""
    edges = spark.createDataFrame(
        [(1, 2), (3, 2), (1, 3), (2, 1), (3, 1), (2, 4)], "src long, dst long"
    )
    pr = pagerank(edges, iters=1)
    got = [r["vertex"] for r in pr.orderBy(F.desc("rank"), F.asc("vertex")).collect()]
    # manual: deg 1->2, 2->2, 3->2; in(1)={2,3}, in(2)={1,3}, in(3)={1}, in(4)={2}
    # contribs: 1: .5+.5=1, 2: .5+.5=1, 3: .5, 4: .5 (no dangling)
    # ranks: 1,2: .15+.85 = 1.0 ; 3,4: .575 → order 1,2,3,4
    assert got == [1, 2, 3, 4]


def test_pagerank_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert pagerank(e, iters=3).count() == 0
