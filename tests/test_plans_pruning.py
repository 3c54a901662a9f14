"""Manifest range widening + manifest-driven scan pruning
(plans/manifest_pruning.py, SURVEY §4.2 item 1)."""

from __future__ import annotations

from dl_datalake_spark.client import DataLakeClient
from dl_datalake_spark.plans import prune_files, read_pruned

MIN = 60000


def _csv(tmp_path, name, n, start=0):
    p = tmp_path / name
    p.write_text(
        "ts,open,high,low,close,volume\n"
        + "\n".join(f"{start + i*MIN},1,2,0.5,1.5,10" for i in range(n))
    )
    return str(p)


def test_manifest_range_widens_across_writes(spark, tmp_path):
    client = DataLakeClient(spark, str(tmp_path / "lake"))
    client.ingest_csv(_csv(tmp_path, "w1.csv", 10, start=0), "binance", "spot", "BTCUSDT")
    client.ingest_csv(
        _csv(tmp_path, "w2.csv", 10, start=100 * MIN), "binance", "spot", "BTCUSDT"
    )
    entry = client.manifest.list_entries(symbol="BTCUSDT").collect()[0]
    assert entry["time_from"] == 0  # first write's start survives the upsert
    assert entry["time_to"] == 109 * MIN


def test_prune_and_read(spark, tmp_path):
    client = DataLakeClient(spark, str(tmp_path / "lake"))
    client.ingest_csv(_csv(tmp_path, "a.csv", 10, start=0), "binance", "spot", "AAAUSDT")
    client.ingest_csv(
        _csv(tmp_path, "b.csv", 10, start=1000 * MIN), "binance", "spot", "BBBUSDT"
    )

    # a query window overlapping only AAAUSDT schedules only that dataset
    paths = prune_files(client.manifest, time_from=0, time_to=9 * MIN)
    assert len(paths) == 1 and "AAAUSDT" in paths[0]
    # a window overlapping neither schedules nothing
    assert prune_files(client.manifest, time_from=500 * MIN, time_to=600 * MIN) == []

    df = read_pruned(spark, client.manifest, time_from=0, time_to=9 * MIN)
    assert df is not None and df.count() == 10
    assert read_pruned(spark, client.manifest, time_from=500 * MIN, time_to=600 * MIN) is None


def test_client_read_window(spark, tmp_path):
    client = DataLakeClient(spark, str(tmp_path / "lake"))
    client.ingest_csv(_csv(tmp_path, "c1.csv", 5, start=0), "binance", "spot", "AAAUSDT")
    client.ingest_csv(_csv(tmp_path, "c2.csv", 5, start=2 * MIN), "binance", "spot", "BBBUSDT")
    df = client.read_window(time_from=0, time_to=10 * MIN)
    assert df.count() == 10  # both symbols, one window
    assert df.select("symbol").distinct().count() == 2


def test_refresh_rollup_all_multi_symbol(spark, tmp_path):
    """One-job multi-symbol rollup refresh: both symbols' 15m rollups
    materialize from a single resample, and a second refresh with new
    raw data extends them incrementally."""
    from dl_datalake_spark.client import DataLakeClient
    from dl_datalake_spark.flows import backfill_flow
    from dl_datalake_spark.lake.paths import DatasetKey

    client = DataLakeClient(spark, str(tmp_path / "base"))
    HOUR = 3_600_000
    backfill_flow(
        client, ["AAA_USD", "BBB_USD"], timeframe_ms=60_000,
        start_ms=0, end_ms=HOUR, exchange="SYNTH",
    )
    out = client.refresh_rollup_all("SYNTH", target_period="15m")
    assert set(out) == {"AAA_USD", "BBB_USD"}

    def agg_count(sym):
        key = DatasetKey("SYNTH", "agg", sym, "agg", "15m")
        return client.reader.read_dataset(key).count()

    assert agg_count("AAA_USD") == 4  # one hour of 1m -> four 15m buckets
    assert agg_count("BBB_USD") == 4

    # extend raw by another hour; refresh adds only the new buckets
    backfill_flow(
        client, ["AAA_USD", "BBB_USD"], timeframe_ms=60_000,
        end_ms=2 * HOUR, exchange="SYNTH",
    )
    out2 = client.refresh_rollup_all("SYNTH", target_period="15m")
    assert set(out2) == {"AAA_USD", "BBB_USD"}
    assert agg_count("AAA_USD") == 8
    assert agg_count("BBB_USD") == 8


def test_topk_rewrites_compile_to_take_ordered(spark):
    """The two former whole-dataset row_number windows (IVF seeding,
    Zipf top-1000) must plan as TakeOrderedAndProject — per-partition
    heaps — with no Window over the full input."""
    from dl_datalake_spark.queries.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    zipf_plan = (
        QUERIES["docs_zipf_fit"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in zipf_plan

    from pyspark.sql import functions as F

    from dl_datalake_spark.operators.ivf_index import _seed_centroids

    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    cents_plan = (
        _seed_centroids(emb, 4)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in cents_plan


def test_pareto_prefix_sum_has_no_corpus_global_window(spark):
    """orders_pareto_share's cumulative sum must partition by bucket —
    the only unpartitioned window allowed is over the tiny per-bucket
    offsets table, never over the per-customer rows."""
    from dl_datalake_spark.queries.registry import QUERIES

    df = QUERIES["orders_pareto_share"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the per-customer running-sum window must carry the bucket column
    # in its partition spec; the only unpartitioned windows allowed run
    # over the per-bucket offsets aggregate (they mention _bs/_bc)
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert windows, "expected window operators in the plan"
    per_row = [ln for ln in windows if "rev_c" in ln]
    assert per_row and all("windowspecdefinition(_b#" in ln for ln in per_row), per_row


def test_round6_flagship_plan_shapes(spark):
    """Plan pins for the round-6 flagships: the top-30 vocabulary
    bound must arrive as a broadcast (pair space capped at C(30,2)),
    the cell-balance centroid fan-out must be a broadcast NLJ over the
    tiny centroid table (never CartesianProduct), and the retention
    cohort pipeline must stay pure hash aggregation — no global sort."""
    from dl_datalake_spark.queries.registry import QUERIES

    sf = "/root/testdata/sf0.001"

    cooc = (
        QUERIES["docs_top_token_cooccurrence"](spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in cooc  # top-vocab semi-join broadcast
    assert "CartesianProduct" not in cooc

    bal = (
        QUERIES["emb_ivf_cell_balance"](spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in bal  # centroids fan out broadcast
    assert "CartesianProduct" not in bal

    coh = (
        QUERIES["events_weekly_retention_cohorts"](spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" in coh
    assert "CartesianProduct" not in coh
    # the per-(user, week) dedup + cohort join never globally sorts rows
    assert "Sort [wk" not in coh and "Sort [cohort_week" not in coh

    sweep = (
        QUERIES["events_concurrent_sessions_peak"](spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the global running sum is over SESSION BOUNDARIES (2 rows per
    # session), fed by per-user session windows — both window kinds
    # must be present, with the per-user one partition-specced
    windows = [ln for ln in sweep.splitlines() if "Window [" in ln]
    assert any("windowspecdefinition(user_id" in ln for ln in windows)
