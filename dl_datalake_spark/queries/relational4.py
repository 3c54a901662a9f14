"""Round-out operator coverage: generated time-grid gap filling,
unpivot/melt, lateral explode (word frequencies), width_bucket
histograms, and bucketed levenshtein fuzzy matching.

These exercise Spark surface the rest of the registry doesn't touch —
`F.sequence` + `explode` (generator / lateral view), `DataFrame.unpivot`
(Expand-based melt, no shuffle until the downstream agg),
`F.width_bucket`, and `F.levenshtein` inside a bucketed self-join (the
fuzzy analogue of the LSH band join in `operators/dedup.py`).

Reference parity: the reference's gap detection (pipeline.py:180-196)
only *finds* holes; `events_gap_fill` additionally materializes the
dense grid — the shape a downstream resample/training pipeline needs.
All events math stays in the integer µs domain (see queries/events.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dl_datalake_spark.queries.registry import ratio_round, ratio_round_sql, register
from dl_datalake_spark.tables import load_table, with_tsu

US_PER_HOUR = 3_600_000_000


# ---------------------------------------------------------------------------
# dense time-grid gap fill: per event_type, every hour between that
# type's first and last event, zero-filled where no events landed.
# Spark: sequence() + explode builds the grid distributed (one row per
# type -> explode fans out); no driver-side loop, no cross join.
# ---------------------------------------------------------------------------
@register(
    "events_gap_fill",
    sql=f"""
WITH t AS (
  SELECT event_type, epoch_us(ts) // {US_PER_HOUR} AS hb, value FROM events
),
h AS (
  SELECT event_type, hb, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
  FROM t GROUP BY 1, 2
),
b AS (SELECT event_type, MIN(hb) AS lo, MAX(hb) AS hi FROM t GROUP BY 1),
g AS (SELECT event_type, unnest(generate_series(lo, hi)) AS hb FROM b)
SELECT g.event_type, g.hb,
       COALESCE(h.n, 0) AS n,
       COALESCE(h.sum_value, 0.0) AS sum_value
FROM g LEFT JOIN h ON g.event_type = h.event_type AND g.hb = h.hb
""",
)
def events_gap_fill(spark: SparkSession, sf_dir: str):
    ev = with_tsu(load_table(spark, sf_dir, "events")).withColumn(
        "hb", F.expr(f"tsu DIV {US_PER_HOUR}")
    )
    hourly = ev.groupBy("event_type", "hb").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    grid = (
        ev.groupBy("event_type")
        .agg(F.min("hb").alias("lo"), F.max("hb").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("hb"),
        )
    )
    return grid.join(hourly, ["event_type", "hb"], "left").select(
        "event_type",
        "hb",
        F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"),
        F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# unpivot / melt: lineitem's four measures into (metric, val) rows, then
# aggregate per (linestatus, metric). Spark compiles unpivot to Expand —
# rows multiply map-side, the only shuffle is the final partial/final agg.
# ---------------------------------------------------------------------------
@register(
    "lineitem_unpivot_metrics",
    sql="""
WITH m AS (
  SELECT l_linestatus, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_linestatus, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_linestatus, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_linestatus, 'l_tax', l_tax FROM lineitem
)
SELECT l_linestatus, metric,
       COUNT(*) AS n,
       ROUND(SUM(val), 2) AS total,
       ((2 * CAST(SUM(CAST(ROUND(val * 100) AS BIGINT)) AS BIGINT) * 1000000 + CAST(100 * COUNT(*) AS BIGINT)) // (2 * CAST(100 * COUNT(*) AS BIGINT))) / 1000000.0 AS mean
FROM m GROUP BY 1, 2
""",
)
def lineitem_unpivot_metrics(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ["l_linestatus"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    return melted.groupBy("l_linestatus", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("val"), 2).alias("total"),
        ratio_round(
            F.sum(F.round(F.col("val") * 100).cast("long")),
            F.count(F.lit(1)) * 100,
        ).alias("mean"),
    )


# ---------------------------------------------------------------------------
# lateral explode word frequencies: top-50 words (>= 4 chars) across the
# corpus. Tokenization is a literal single-space split, identical in
# both engines; ties cut deterministically by (n DESC, word).
# ---------------------------------------------------------------------------
@register(
    "docs_word_topk",
    sql="""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
WHERE LENGTH(word) >= 4
GROUP BY word
ORDER BY n DESC, word
LIMIT 50
""",
)
def docs_word_topk(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where(F.length("word") >= 4)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# width_bucket histogram of order prices (40 equal 25k bins over
# [0, 1e6), wide enough that no row lands in the overflow bucket — the
# oracle reproduces width_bucket's floor((x-lo)/step)+1 arithmetic).
# ---------------------------------------------------------------------------
@register(
    "orders_price_histogram",
    sql="""
SELECT CAST(FLOOR(o_totalprice / 25000) AS INTEGER) + 1 AS bucket,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS bucket_revenue
FROM orders
GROUP BY 1
""",
)
def orders_price_histogram(spark: SparkSession, sf_dir: str):
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(1_000_000.0), F.lit(40))
            .cast("int")
            .alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("bucket_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# bucketed fuzzy match: near-identical part names within a
# (brand, size) bucket by edit distance. The equi-keys bound the
# candidate pairs (the levenshtein only runs inside each bucket), the
# same blocking idea as the LSH band join — this is the pattern for
# fuzzy entity resolution at 100 TB: block first, edit-distance second.
# ---------------------------------------------------------------------------
@register(
    "part_fuzzy_name_pairs",
    sql="""
SELECT a.p_brand, a.p_size,
       COUNT(*) AS n_close,
       CAST(MIN(levenshtein(a.p_name, b.p_name)) AS INTEGER) AS min_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 12
GROUP BY 1, 2
""",
)
def part_fuzzy_name_pairs(spark: SparkSession, sf_dir: str):
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_name"
    )
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .where(dist <= 12)
        .groupBy(F.col("a.p_brand").alias("p_brand"), F.col("a.p_size").alias("p_size"))
        .agg(
            F.count(F.lit(1)).alias("n_close"),
            F.min(dist).alias("min_dist"),
        )
    )


# ---------------------------------------------------------------------------
# dynamic pivot: order counts per month x priority
# ---------------------------------------------------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "orders_priority_pivot",
    sql="""
SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER) AS ym,
       CAST(COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS urgent,
       CAST(COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS high,
       CAST(COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS medium,
       CAST(COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS notspec,
       CAST(COUNT(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS low
FROM orders GROUP BY 1
""",
)
def orders_priority_pivot(spark: SparkSession, sf_dir: str):
    """True relational pivot (`groupBy().pivot()`), not a CASE ladder:
    one hash-agg keyed (ym, priority) under the hood, columns fanned at
    plan time. The explicit value list matters at scale — omitting it
    makes Spark run a distinct scan FIRST to discover pivot columns
    (an extra job over the fact table); pinning the 5 knowns keeps it
    one pass.
    """
    orders = load_table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int")
    pv = (
        orders.groupBy(ym.alias("ym"))
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    renames = dict(zip(_PRIORITIES, ["urgent", "high", "medium", "notspec", "low"]))
    out = pv
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    # pivot leaves missing cells null; the oracle's FILTER counts give 0
    return out.select(
        "ym",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in renames.values()],
    )


# ---------------------------------------------------------------------------
# exact money arithmetic: DECIMAL aggregation needs no rounding at all
# ---------------------------------------------------------------------------
@register(
    "agg_decimal_money",
    sql="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS gross_cents,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)
         AS net_e4,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_decimal_money(spark: SparkSession, sf_dir: str):
    """Money math in DECIMAL, matched WITHOUT any rounding: every other
    float aggregate in this registry rounds before comparing because
    double summation is partition-order dependent; casting to
    DECIMAL(18,2) first makes the sum exact and order-independent in
    BOTH engines — the accounting-grade path.

    The *computation* stays DECIMAL (exact, associative), but the
    *output* crosses the comparison boundary as scaled integers
    (gross_cents = gross*100, net_e4 = net*10000, both BIGINT): two
    rounds of driver hashing showed that even Arrow-type-identical
    DECIMAL values canonicalize differently across engines (Spark
    parquet FIXED_LEN_BYTE_ARRAY(16) vs DuckDB int128), while the
    registry's integer-units discipline has never mismatched.  sf0.1
    gross tops out ~1.06e9 → 1.06e11 cents, far inside int64.
    """
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        (F.sum(price) * 100).cast("long").alias("gross_cents"),
        (F.sum(price * disc) * 10000).cast("long").alias("net_e4"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# null semantics: three-valued logic pinned cross-engine
# ---------------------------------------------------------------------------
@register(
    "scalar_null_semantics",
    sql="""
WITH t AS (
  SELECT l_orderkey,
         CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE l_quantity END AS a,
         CASE WHEN l_linenumber % 2 = 0 THEN NULL ELSE l_quantity END AS b
  FROM lineitem WHERE l_orderkey <= 100
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(a) AS BIGINT) AS a_non_null,
       CAST(SUM(CASE WHEN a IS NOT DISTINCT FROM b THEN 1 ELSE 0 END) AS BIGINT)
         AS null_safe_eq,
       CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS plain_eq,
       CAST(SUM(CASE WHEN COALESCE(a, b, -1) = -1 THEN 1 ELSE 0 END) AS BIGINT)
         AS both_null,
       CAST(COUNT(NULLIF(a, b)) AS BIGINT) AS nullif_distinct,
       ((2 * CAST(SUM(CAST(a AS BIGINT)) AS BIGINT) * 1000000 + CAST(COUNT(a) AS BIGINT)) // (2 * CAST(COUNT(a) AS BIGINT))) / 1000000.0 AS avg_skips_nulls
FROM t
""",
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str):
    """Three-valued logic pinned across engines: null-safe equality
    (<=> / IS NOT DISTINCT FROM) vs plain = (which never matches a
    null), COALESCE fallthrough, NULLIF, COUNT(col) vs COUNT(*), and
    AVG's null-skipping — the semantics every filter and join in this
    engine silently relies on, made an explicit contract.
    """
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 100)
    a = F.when(F.col("l_linenumber") % 3 == 0, None).otherwise(F.col("l_quantity"))
    b = F.when(F.col("l_linenumber") % 2 == 0, None).otherwise(F.col("l_quantity"))
    t = li.select(a.alias("a"), b.alias("b"))
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("a").alias("a_non_null"),
        F.sum(F.col("a").eqNullSafe(F.col("b")).cast("long")).alias("null_safe_eq"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0)).alias("plain_eq"),
        F.sum((F.coalesce(F.col("a"), F.col("b"), F.lit(-1)) == -1).cast("long")).alias(
            "both_null"
        ),
        F.count(F.nullif(F.col("a"), F.col("b"))).alias("nullif_distinct"),
        ratio_round(F.sum(F.col("a").cast("long")), F.count("a")).alias(
            "avg_skips_nulls"
        ),
    )


# ---------------------------------------------------------------------------
# referential-integrity audit: FK orphan counts across the star edges
# ---------------------------------------------------------------------------
@register(
    "audit_referential_integrity",
    sql="""
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    AS orphan_orders,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    AS orphan_lineitems,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
   WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
    AS orphan_part_refs,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
   WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    AS orphan_customers
""",
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str):
    """Data-level fsck: orphan counts across the star schema's FK edges
    (the row-level sibling of maintenance.audit's file-level
    anti-joins). Each edge is a left-anti join counted — dims
    broadcast, the two fact edges shuffle on their join key once. A
    healthy lake reports zeros; any non-zero is the first number an
    ingest incident review asks for.
    """
    t = {n: load_table(spark, sf_dir, n) for n in ("orders", "lineitem", "customer", "part", "nation")}

    def orphans(fact, dim, fk, pk, out):
        return (
            t[fact]
            .join(t[dim].select(F.col(pk).alias(fk)), fk, "left_anti")
            .agg(F.count(F.lit(1)).alias(out))
        )

    # one lazy plan: four 1-row anti-join aggregates cross-joined —
    # no driver-side counts, the whole audit is a single job
    return (
        orphans("orders", "customer", "o_custkey", "c_custkey", "orphan_orders")
        .crossJoin(orphans("lineitem", "orders", "l_orderkey", "o_orderkey", "orphan_lineitems"))
        .crossJoin(orphans("lineitem", "part", "l_partkey", "p_partkey", "orphan_part_refs"))
        .crossJoin(orphans("customer", "nation", "c_nationkey", "n_nationkey", "orphan_customers"))
    )
