"""Deduplication queries over `documents` with DuckDB oracles:
exact hash dedup, MinHash+LSH candidate pairs, n-gram Jaccard pairs,
SimHash banded near-dup pairs.

Shared SQL fragments mirror the operators in operators/dedup.py exactly
(same shingling, same salted-md5 min-hash, same banding) so both engines
produce identical pair sets.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from dl_datalake_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    word_shingles,
)
from dl_datalake_spark.queries.registry import ratio_round, ratio_round_sql, register
from dl_datalake_spark.tables import load_table

NUM_BANDS = 8
SHINGLE_N = 3
JACCARD_N = 3
JACCARD_THRESHOLD = 0.1
MAX_DF_FRAC = 0.2  # stop-shingle cap: fraction of corpus, scale-adaptive
SIMHASH_BITS = 32
SIMHASH_BANDS = 4
SIMHASH_MAX_HAMMING = 2

# shingle CTE shared by minhash/jaccard oracles (n parameterized)
def _shingle_cte(n: int) -> str:
    concat = "||' '||".join(f"words[i+{j}]" if j else "words[i]" for j in range(n))
    return rf"""
w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
sh_all AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(words)-{n - 1}, 0)),
                               i -> {concat})) AS shingle
  FROM w
),
freq AS (SELECT shingle, COUNT(*) AS df FROM sh_all GROUP BY shingle),
sh AS (SELECT s.doc_id, s.shingle FROM sh_all s JOIN freq f ON s.shingle = f.shingle
       WHERE f.df <= GREATEST(5.0, (SELECT COUNT(*) FROM documents) * {MAX_DF_FRAC}))
"""


# ---------------------------------------------------------------------------
# exact dedup stats
# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    sql="""
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(text)) AS n_unique,
       CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_redundant
FROM documents
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str):
    # spread="bytes" (r13): one md5 per doc is byte-light — the 32-way
    # fan-out was pure task overhead (interleaved: 0.454 -> 0.270 s).
    # The shingle-exploding dedups below keep spread=True: their per-row
    # JVM work measured clearly worth the fan-out (minhash 1.69 vs 2.67).
    docs = load_table(spark, sf_dir, "documents", spread="bytes")
    groups = exact_dedup(docs)
    return groups.agg(
        F.sum("group_size").alias("n_docs"),
        F.count(F.lit(1)).alias("n_unique"),
        (F.sum("group_size") - F.count(F.lit(1))).alias("n_redundant"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH candidate pairs
# ---------------------------------------------------------------------------
def _minhash_sql() -> str:
    # mirror operators/dedup.minhash_signatures: md5 per salt, four
    # independent 8-hex-char (32-bit) chunks per md5
    mins = ", ".join(
        f"MIN(substr(md5('{b // 4}:' || shingle), {(b % 4) * 8 + 1}, 8)) AS mh{b}"
        for b in range(NUM_BANDS)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, mh{b} AS sig FROM m" for b in range(NUM_BANDS)
    )
    return rf"""
WITH {_shingle_cte(SHINGLE_N)},
m AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
b AS ({bands})
SELECT a.doc_id AS id_a, b2.doc_id AS id_b
FROM b a JOIN b b2 ON a.band = b2.band AND a.sig = b2.sig AND a.doc_id < b2.doc_id
GROUP BY 1, 2
"""


@register("dedup_minhash_lsh", sql=_minhash_sql())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return minhash_lsh_pairs(
        docs,
        shingle_n=SHINGLE_N,
        num_bands=NUM_BANDS,
        max_df_frac=MAX_DF_FRAC,
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity pairs
# ---------------------------------------------------------------------------
def _jaccard_sql() -> str:
    return rf"""
WITH {_shingle_cte(JACCARD_N)},
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter,
       ROUND(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter JOIN sizes sa ON id_a = sa.doc_id
           JOIN sizes sb ON id_b = sb.doc_id
WHERE ROUND(inter / (sa.sz + sb.sz - inter), 6) >= {JACCARD_THRESHOLD}
"""


@register("dedup_ngram_jaccard", sql=_jaccard_sql())
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return ngram_jaccard_pairs(
        docs,
        shingle_n=JACCARD_N,
        threshold=JACCARD_THRESHOLD,
        max_df_frac=MAX_DF_FRAC,
    )


# ---------------------------------------------------------------------------
# SimHash banded near-dup pairs
# ---------------------------------------------------------------------------
def _simhash_sql(max_hamming: int = SIMHASH_MAX_HAMMING) -> str:
    votes = []
    for i in range(SIMHASH_BITS):
        j = i // 4 + 1
        k = i % 4
        votes.append(
            f"SUM(CASE WHEN ((strpos('0123456789abcdef', substr(hh, {j}, 1)) - 1) >> {k}) & 1 = 1 "
            f"THEN 1 ELSE -1 END) AS v{i}"
        )
    fp_terms = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    width = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << width) - 1
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * width}) & {mask} AS bval FROM fp"
        for b in range(SIMHASH_BANDS)
    )
    return rf"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
),
h AS (SELECT doc_id, md5(tok) AS hh FROM tok),
votes AS (SELECT doc_id, {", ".join(votes)} FROM h GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({fp_terms} AS BIGINT) AS simhash FROM votes),
bands AS ({bands})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
GROUP BY 1, 2, 3
HAVING CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) <= {max_hamming}
"""


@register("dedup_simhash", sql=_simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return simhash_pairs(
        docs,
        bits=SIMHASH_BITS,
        bands=SIMHASH_BANDS,
        max_hamming=SIMHASH_MAX_HAMMING,
    )


# ---------------------------------------------------------------------------
# dedup group resolution: connected components over minhash pairs
# ---------------------------------------------------------------------------
def _components_sql() -> str:
    # transitive closure by recursive CTE; component = min reachable id.
    # Fine at oracle scale (closure is |V|·|cluster| rows); the Spark
    # side uses iterative min-label propagation instead.
    pairs_body = _minhash_sql().strip()
    return rf"""
WITH RECURSIVE
pairs AS ({pairs_body}),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT src AS node, src AS r FROM edges
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
)
SELECT node, MIN(r) AS component
FROM reach GROUP BY node
"""


@register("dedup_groups", sql=_components_sql())
def dedup_groups(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.components import connected_components

    pairs = dedup_minhash_lsh(spark, sf_dir)
    return connected_components(pairs)


# ---------------------------------------------------------------------------
# keeper election: one row per duplicate group — keep the longest doc
# (ties → smallest id), the final step that turns near-dup groups into
# a pruned training corpus
# ---------------------------------------------------------------------------
def _keeper_sql() -> str:
    return rf"""
WITH comp AS ({_components_sql().strip()})
SELECT component,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(CASE WHEN rn = 1 THEN node END) AS keeper_id,
       MAX(n_chars) AS max_chars
FROM (
  SELECT comp.component, comp.node, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY comp.component
                            ORDER BY d.n_chars DESC, comp.node) AS rn
  FROM comp JOIN documents d ON d.doc_id = comp.node
)
GROUP BY component
"""


@register("dedup_cluster_keeper", sql=_keeper_sql())
def dedup_cluster_keeper(spark: SparkSession, sf_dir: str):
    """Group resolution → keeper election in one aggregation: keeper =
    min(struct(-n_chars, node)) per component, so the longest document
    wins and equal lengths break to the smallest id. No window over the
    full corpus — one hash-agg over the (tiny) labeled-dup set."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labeled = dedup_groups(spark, sf_dir).join(
        docs, F.col("node") == F.col("doc_id")
    )
    return labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.struct((-F.col("n_chars")).alias("neg"), F.col("node").alias("id")))[
            "id"
        ].alias("keeper_id"),
        F.max("n_chars").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# dedup observability: near-dup rate per source domain — the dashboard
# metric a curation run watches to spot a crawler dumping template spam
# ---------------------------------------------------------------------------
def _dup_rate_sql() -> str:
    return rf"""
WITH pairs AS ({_minhash_sql().strip()}),
dup_docs AS (
  SELECT id_a AS doc_id FROM pairs UNION SELECT id_b FROM pairs
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(dd.doc_id) AS BIGINT) AS n_dup_docs,
       ((2 * CAST(COUNT(dd.doc_id) AS BIGINT) * 1000000 + CAST(COUNT(*) AS BIGINT)) // (2 * CAST(COUNT(*) AS BIGINT))) / 1000000.0 AS dup_rate
FROM documents d LEFT JOIN dup_docs dd ON d.doc_id = dd.doc_id
GROUP BY d.source
"""


@register("docs_dup_rate_by_source", sql=_dup_rate_sql())
def docs_dup_rate_by_source(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents", spread=True)
    pairs = dedup_minhash_lsh(spark, sf_dir)
    dup_docs = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        docs.select("doc_id", "source")
        .join(dup_docs, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("is_dup").alias("n_dup_docs"),
            ratio_round(F.count("is_dup"), F.count(F.lit(1))).alias("dup_rate"),
        )
    )


# ---------------------------------------------------------------------------
# LSH candidate quality audit: the exact-Jaccard distribution of the
# MinHash band candidates — how many candidates are real near-dups vs
# band-collision noise. This is the dial you read before moving the
# (bands, rows-per-band) threshold at scale; precision = share of
# candidates landing in buckets >= the target similarity.
# ---------------------------------------------------------------------------
def _minhash_precision_sql() -> str:
    mins = ", ".join(
        f"MIN(substr(md5('{b // 4}:' || shingle), {(b % 4) * 8 + 1}, 8)) AS mh{b}"
        for b in range(NUM_BANDS)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, mh{b} AS sig FROM m" for b in range(NUM_BANDS)
    )
    return rf"""
WITH {_shingle_cte(SHINGLE_N)},
m AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
b AS ({bands}),
cand AS (
  SELECT a.doc_id AS id_a, b2.doc_id AS id_b
  FROM b a JOIN b b2 ON a.band = b2.band AND a.sig = b2.sig AND a.doc_id < b2.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT c.id_a, c.id_b,
         ROUND(COALESCE(i.inter, 0) /
               (sa.sz + sb.sz - COALESCE(i.inter, 0)), 6) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
  JOIN sizes sa ON c.id_a = sa.doc_id
  JOIN sizes sb ON c.id_b = sb.doc_id
)
SELECT CAST(LEAST(FLOOR(jaccard * 10), 9) AS INTEGER) AS jaccard_decile,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM scored GROUP BY 1
"""


@register("dedup_minhash_precision", sql=_minhash_precision_sql())
def dedup_minhash_precision(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents", spread=True)
    cand = minhash_lsh_pairs(
        docs, shingle_n=SHINGLE_N, num_bands=NUM_BANDS, max_df_frac=MAX_DF_FRAC
    )
    # threshold 0 → every co-shingle pair with its exact jaccard; the
    # candidate join then keeps only the LSH survivors
    exact = ngram_jaccard_pairs(
        docs, shingle_n=SHINGLE_N, threshold=0.0, max_df_frac=MAX_DF_FRAC
    ).select("id_a", "id_b", "jaccard")
    scored = cand.join(exact, ["id_a", "id_b"], "left").withColumn(
        "jaccard", F.coalesce(F.col("jaccard"), F.lit(0.0))
    )
    return scored.groupBy(
        F.least(F.floor(F.col("jaccard") * 10), F.lit(9)).cast("int").alias("jaccard_decile")
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


# ---------------------------------------------------------------------------
# exact duplicated-substring detection (run-level dedup)
# ---------------------------------------------------------------------------
RUN_K = 8  # run length in tokens; production substring dedup uses ~50


def _substring_sql() -> str:
    n = RUN_K
    concat = "||' '||".join(f"words[i+{j}]" if j else "words[i]" for j in range(n))
    return rf"""
WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
runs AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(words)-{n - 1}, 0)),
                               i -> {concat})) AS run
  FROM w
),
dup AS (SELECT run, COUNT(*) AS n_docs FROM runs GROUP BY run HAVING COUNT(*) >= 2),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS dup_runs,
                 CAST(MAX(n_docs) AS BIGINT) AS max_run_docs,
                 CAST(SUM(n_docs) AS BIGINT) AS dup_slots
          FROM dup),
aff AS (SELECT CAST(COUNT(DISTINCT r.doc_id) AS BIGINT) AS affected_docs
        FROM runs r JOIN dup d USING (run))
SELECT * FROM stats, aff
"""


@register("dedup_exact_substring", sql=_substring_sql())
def dedup_exact_substring(spark: SparkSession, sf_dir: str):
    """Exact duplicated-substring detection ("Deduplicating Training Data
    Makes Language Models Better", Lee et al. 2022): two documents are
    substring-duplicates when they share any verbatim k-token run. The
    distributed shape replaces the paper's suffix array with a sliding
    run index — every k-token window per doc, hash-aggregated by run —
    which is one narrow explode + one equi-key shuffle, no all-pairs
    step anywhere.

    Scale: at 100 TB group on xxhash64(run) (word_shingles hashed=True)
    so the shuffle key is 8 bytes, and feed `dup` into a semi-join to
    drop/clip affected spans; the string key here is only for exact
    DuckDB oracle parity. The dup-run table is tiny relative to the
    index (HAVING >= 2 prunes the long unique tail), so the back-join
    is a broadcast/semi under AQE.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    runs = word_shingles(docs, n=RUN_K)  # distinct (doc_id, shingle)
    dup = (
        runs.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
    )
    stats = dup.agg(
        F.count(F.lit(1)).alias("dup_runs"),
        F.max("n_docs").alias("max_run_docs"),
        F.sum("n_docs").alias("dup_slots"),
    )
    aff = runs.join(dup.select("shingle"), "shingle", "semi").agg(
        F.countDistinct("doc_id").alias("affected_docs")
    )
    return stats.crossJoin(aff)


# ---------------------------------------------------------------------------
# MinHash LSH recall audit: which true near-dup pairs the bands catch
# ---------------------------------------------------------------------------
RECALL_THRESHOLD = 0.5  # the banding design point: b=8, r=4 → s* ≈ 0.56


def _minhash_recall_sql() -> str:
    mins = ", ".join(
        f"MIN(substr(md5('{b // 4}:' || shingle), {(b % 4) * 8 + 1}, 8)) AS mh{b}"
        for b in range(NUM_BANDS)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, mh{b} AS sig FROM m" for b in range(NUM_BANDS)
    )
    return rf"""
WITH {_shingle_cte(SHINGLE_N)},
m AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
b AS ({bands}),
cand AS (
  SELECT a.doc_id AS id_a, b2.doc_id AS id_b
  FROM b a JOIN b b2 ON a.band = b2.band AND a.sig = b2.sig AND a.doc_id < b2.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.id_a, i.id_b,
         ROUND(i.inter / (sa.sz + sb.sz - i.inter), 6) AS jaccard
  FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id
               JOIN sizes sb ON i.id_b = sb.doc_id
  WHERE ROUND(i.inter / (sa.sz + sb.sz - i.inter), 6) >= {RECALL_THRESHOLD}
)
SELECT CAST(LEAST(FLOOR(t.jaccard * 10), 9) AS INTEGER) AS jaccard_decile,
       CAST(COUNT(*) AS BIGINT) AS n_true,
       CAST(COUNT(c.id_a) AS BIGINT) AS n_found,
       ((2 * CAST(COUNT(c.id_a) AS BIGINT) * 1000000 + CAST(COUNT(*) AS BIGINT)) // (2 * CAST(COUNT(*) AS BIGINT))) / 1000000.0 AS recall
FROM truth t LEFT JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b
GROUP BY 1
"""


@register("dedup_minhash_recall", sql=_minhash_recall_sql())
def dedup_minhash_recall(spark: SparkSession, sf_dir: str):
    """Recall side of the LSH quality contract (precision audit above):
    of the TRUE near-dup pairs at the banding design point (Jaccard >=
    0.5; b=8 bands x r=4 rows -> threshold ~(1/b)^(1/r) ~ 0.56), what
    fraction did the banded candidate join surface? Dropping a band
    or widening rows silently trades recall for cost — this query
    turns that dial into an oracle-checked number per jaccard decile.

    Both sides run from the SAME capped shingle set, so the audit
    measures the banding itself, not shingling differences. The truth
    side is the inverted-index exact join (bounded by the stop-shingle
    cap); at 100 TB you'd sample doc pairs for the audit rather than
    enumerate, keeping the same two-sided shape.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    cand = minhash_lsh_pairs(
        docs, shingle_n=SHINGLE_N, num_bands=NUM_BANDS, max_df_frac=MAX_DF_FRAC
    ).withColumn("found", F.lit(1))
    truth = ngram_jaccard_pairs(
        docs, shingle_n=SHINGLE_N, threshold=RECALL_THRESHOLD, max_df_frac=MAX_DF_FRAC
    ).select("id_a", "id_b", "jaccard")
    j = truth.join(cand.select("id_a", "id_b", "found"), ["id_a", "id_b"], "left")
    return j.groupBy(
        F.least(F.floor(F.col("jaccard") * 10), F.lit(9)).cast("int").alias("jaccard_decile")
    ).agg(
        F.count(F.lit(1)).alias("n_true"),
        F.count("found").alias("n_found"),
        ratio_round(F.count("found"), F.count(F.lit(1))).alias("recall"),
    )


# ---------------------------------------------------------------------------
# novelty contribution: which sources add unique content
# ---------------------------------------------------------------------------
def _novelty_sql() -> str:
    n = SHINGLE_N
    concat = "||' '||".join(f"words[i+{j}]" if j else "words[i]" for j in range(n))
    return rf"""
WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
sh_all AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(words)-{n - 1}, 0)),
                               i -> {concat})) AS shingle
  FROM w
),
first AS (SELECT shingle, MIN(doc_id) AS fd FROM sh_all GROUP BY 1),
per_doc AS (
  SELECT s.doc_id,
         CAST(COUNT(*) AS BIGINT) AS total,
         CAST(SUM(CASE WHEN f.fd = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS novel
  FROM sh_all s JOIN first f ON s.shingle = f.shingle GROUP BY 1
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(novel) AS BIGINT) AS novel_shingles,
       CAST(SUM(total) AS BIGINT) AS total_shingles,
       ((2 * CAST(SUM(novel) AS BIGINT) * 1000000 + CAST(SUM(total) AS BIGINT)) // (2 * CAST(SUM(total) AS BIGINT))) / 1000000.0 AS novelty
FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
GROUP BY 1
"""


@register("docs_novelty_by_source", sql=_novelty_sql())
def docs_novelty_by_source(spark: SparkSession, sf_dir: str):
    """Novelty contribution per source: a shingle is NOVEL in the
    corpus's canonical order when this doc_id is its first occurrence
    (min doc_id); a source whose docs are mostly non-novel shingles is
    re-serving content other sources already contributed — the metric
    behind source-level dedup budgeting ("should we keep crawling this
    domain?").

    Shape: shingle index → min-per-shingle hash agg → equi-join back →
    per-doc counts → per-source rollup. Every join is on the hashed
    shingle or doc_id — no all-pairs anywhere; at 100 TB the min-agg
    and back-join shard by shingle hash exactly like the substring
    dedup above.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    sh = word_shingles(docs, n=SHINGLE_N)  # distinct (doc_id, shingle)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("fd"))
    per_doc = (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum((F.col("fd") == F.col("doc_id")).cast("long")).alias("novel"),
        )
    )
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("novel").alias("novel_shingles"),
            F.sum("total").alias("total_shingles"),
            ratio_round(F.sum("novel"), F.sum("total")).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# end-to-end dedup: exact + near-dup keeper election -> surviving corpus
# ---------------------------------------------------------------------------
def _survivors_sql() -> str:
    return rf"""
WITH comp AS ({_components_sql().strip()}),
ranked AS (
  SELECT comp.component, comp.node,
         ROW_NUMBER() OVER (PARTITION BY comp.component
                            ORDER BY d.n_chars DESC, comp.node) AS rn
  FROM comp JOIN documents d ON d.doc_id = comp.node
),
near_drop AS (SELECT node AS doc_id FROM ranked WHERE rn > 1),
exact_drop AS (
  SELECT doc_id FROM (
    SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn > 1
),
drops AS (SELECT doc_id FROM near_drop UNION SELECT doc_id FROM exact_drop)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) - COUNT(dr.doc_id) AS BIGINT) AS n_survivors,
       CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN d.n_chars ELSE 0 END) AS BIGINT)
         AS surviving_chars
FROM documents d LEFT JOIN drops dr ON d.doc_id = dr.doc_id
GROUP BY d.source
"""


@register("dedup_survivors", sql=_survivors_sql())
def dedup_survivors(spark: SparkSession, sf_dir: str):
    """The full dedup pipeline composed end-to-end: exact dedup (md5
    keep-min-id) UNION near-dup keeper election (MinHash LSH pairs →
    connected components → longest-doc-wins) → the surviving corpus,
    reported per source. This is the query a training-data run actually
    executes before tokenization; the per-stage queries above are its
    audit views.

    Plan: the drop set is TINY relative to the corpus (only docs in
    some duplicate relation), so the final membership test is a
    broadcast left-join against the fact scan; everything upstream is
    the already-audited LSH banding + label propagation. No stage
    touches all-pairs.
    """
    from dl_datalake_spark.operators.components import connected_components

    docs = load_table(spark, sf_dir, "documents", spread=True)
    pairs = minhash_lsh_pairs(
        docs, shingle_n=SHINGLE_N, num_bands=NUM_BANDS, max_df_frac=MAX_DF_FRAC
    )
    comp = connected_components(pairs)
    ranked = comp.join(
        docs.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("component").orderBy(
                F.desc("n_chars"), F.asc("node")
            )
        ),
    )
    near_drop = ranked.where(F.col("rn") > 1).select(F.col("node").alias("doc_id"))
    exact_drop = (
        docs.select("doc_id", F.md5("text").alias("h"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
        )
        .where(F.col("rn") > 1)
        .select("doc_id")
    )
    drops = near_drop.union(exact_drop).distinct().withColumn("dropped", F.lit(1))
    return (
        docs.select("doc_id", "source", "n_chars")
        .join(F.broadcast(drops), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.count(F.lit(1)) - F.count("dropped")).alias("n_survivors"),
            F.sum(
                F.when(F.col("dropped").isNull(), F.col("n_chars")).otherwise(0)
            ).alias("surviving_chars"),
        )
    )


# ---------------------------------------------------------------------------
# incremental dedup: a NEW batch screened against the HISTORICAL corpus
# ---------------------------------------------------------------------------
def _incremental_sql() -> str:
    n = SHINGLE_N
    concat = "||' '||".join(f"words[i+{j}]" if j else "words[i]" for j in range(n))
    mins = ", ".join(
        f"MIN(substr(md5('{b // 4}:' || shingle), {(b % 4) * 8 + 1}, 8)) AS mh{b}"
        for b in range(NUM_BANDS)
    )

    def side(name: str, pred: str) -> str:
        bands = "\nUNION ALL\n".join(
            f"SELECT doc_id, {b} AS band, mh{b} AS sig FROM m_{name}"
            for b in range(NUM_BANDS)
        )
        return f"""
{name}_docs AS (SELECT * FROM documents WHERE {pred}),
w_{name} AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
             FROM {name}_docs),
sh_{name} AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(words)-{n - 1}, 0)),
                               i -> {concat})) AS shingle
  FROM w_{name}
),
m_{name} AS (SELECT doc_id, {mins} FROM sh_{name} GROUP BY doc_id),
b_{name} AS ({bands})"""

    return f"""
WITH {side("old", "doc_id % 5 <> 4")},
{side("new", "doc_id % 5 = 4")},
near AS (SELECT DISTINCT nb.doc_id FROM b_new nb
         JOIN b_old ob ON nb.band = ob.band AND nb.sig = ob.sig),
exact AS (SELECT DISTINCT nd.doc_id FROM new_docs nd
          JOIN old_docs od ON md5(nd.text) = md5(od.text)),
drops AS (SELECT doc_id FROM near UNION SELECT doc_id FROM exact)
SELECT nd.source,
       CAST(COUNT(*) AS BIGINT) AS n_new,
       CAST(COUNT(e.doc_id) AS BIGINT) AS drop_exact,
       CAST(COUNT(nr.doc_id) AS BIGINT) AS drop_near,
       CAST(COUNT(d.doc_id) AS BIGINT) AS drop_total
FROM new_docs nd
LEFT JOIN exact e ON nd.doc_id = e.doc_id
LEFT JOIN near nr ON nd.doc_id = nr.doc_id
LEFT JOIN drops d ON nd.doc_id = d.doc_id
GROUP BY nd.source
"""


@register("dedup_incremental_new_batch", sql=_incremental_sql())
def dedup_incremental_new_batch(spark: SparkSession, sf_dir: str):
    """Incremental dedup — the PRODUCTION shape: a new crawl batch
    (doc_id % 5 = 4 stands in for the arriving partition) is screened
    against the historical corpus without ever re-pairing history with
    itself. Exact screen = md5 semi-join; near screen = the new batch's
    min-hash bands probed against the historical band index (old x new
    only — no old x old candidates).

    At 100 TB the historical band index (b_old) is a PERSISTED table
    keyed (band, sig) — exactly what write_ivf_index does for vectors —
    so each arriving batch costs O(batch) shingling plus one equi-join
    against the index, not a corpus rescan. Uncapped signatures here
    (no stop-shingle filter) keep the oracle exact; production layers
    the same cap as minhash_lsh_pairs.
    """
    from dl_datalake_spark.operators.dedup import minhash_signatures

    docs = load_table(spark, sf_dir, "documents", spread=True)
    old = docs.where(F.col("doc_id") % 5 != 4)
    new = docs.where(F.col("doc_id") % 5 == 4)

    def bands(side):
        sh = word_shingles(side, n=SHINGLE_N, distinct=False)
        sig = minhash_signatures(sh, num_hashes=NUM_BANDS)
        return sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("band"), F.col(f"mh{b}").alias("sig"))
                        for b in range(NUM_BANDS)
                    ]
                )
            ).alias("bs"),
        ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))

    near = (
        bands(new)
        .join(bands(old).select("band", "sig").distinct(), ["band", "sig"], "semi")
        .select("doc_id")
        .distinct()
        .withColumn("near", F.lit(1))
    )
    exact = (
        new.select("doc_id", F.md5("text").alias("h"))
        .join(old.select(F.md5("text").alias("h")).distinct(), "h", "semi")
        .select("doc_id")
        .withColumn("ex", F.lit(1))
    )
    return (
        new.select("doc_id", "source")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.count("ex").alias("drop_exact"),
            F.count("near").alias("drop_near"),
            F.count(F.coalesce(F.col("ex"), F.col("near"))).alias("drop_total"),
        )
    )


# ---------------------------------------------------------------------------
# candidate-graph degree histogram: log2-bucketed distribution of how
# many LSH candidate pairs each document participates in. THE skew
# audit for distributed dedup — a fat top bucket means hot nodes whose
# pair lists (and the later connected-components propagation) will
# straggle; it is the dial behind dedup_minhash_lsh's max_bucket_docs
# cap. Buckets come from length(bin(deg))-1 — integer floor(log2) with
# no float log in either engine.
# ---------------------------------------------------------------------------
def _degree_hist_sql() -> str:
    return rf"""
WITH pairs AS ({_minhash_sql().strip()}),
deg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT id_a AS doc_id FROM pairs UNION ALL SELECT id_b AS doc_id FROM pairs)
  GROUP BY doc_id)
SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(deg) AS BIGINT) AS min_deg,
       CAST(MAX(deg) AS BIGINT) AS max_deg
FROM deg GROUP BY bucket ORDER BY bucket
"""


@register("dedup_graph_degree_histogram", sql=_degree_hist_sql())
def dedup_graph_degree_histogram(spark: SparkSession, sf_dir: str):
    pairs = dedup_minhash_lsh(spark, sf_dir)
    deg = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        deg.select(F.expr("length(bin(deg)) - 1").cast("long").alias("bucket"), "deg")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("deg").alias("min_deg"),
            F.max("deg").alias("max_deg"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# quality x duplication calibration: near-dup rate per quality-score
# decile — the cross-signal audit that tells you whether your quality
# filter and your dedup stage are removing the SAME documents (wasted
# compute) or complementary ones. Buckets are fixed 0.1-wide quality
# bands (floor(quality*10) on the 6-digit-rounded score — identical
# doubles on both engines), never a data-dependent NTILE.
# ---------------------------------------------------------------------------
def _quality_dup_sql() -> str:
    from dl_datalake_spark.queries.textops import _STOP_EN

    return rf"""
WITH pairs AS ({_minhash_sql().strip()}),
dup_docs AS (SELECT id_a AS doc_id FROM pairs UNION SELECT id_b AS doc_id FROM pairs),
t AS (
  SELECT doc_id,
         CAST(LENGTH(text) AS INTEGER) AS n_chars,
         CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
         CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INTEGER) AS punct_count,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                              w -> lower(w) IN {_STOP_EN})) AS INTEGER) AS stop_hits
  FROM documents),
q AS (
  SELECT doc_id,
         CASE WHEN n_tokens < 5 THEN 0.0
              ELSE ROUND(0.4 * LEAST(n_tokens / 100.0, 1.0)
                       + 0.3 * (1.0 - LEAST(punct_count / GREATEST(n_chars, 1), 1.0))
                       + 0.3 * LEAST(stop_hits / GREATEST(n_tokens, 1) * 10, 1.0), 6)
         END AS quality
  FROM t)
SELECT CAST(floor(q.quality * 10) AS BIGINT) AS q_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(dd.doc_id) AS BIGINT) AS n_dups,
       ((2 * CAST(COUNT(dd.doc_id) AS BIGINT) * 1000000 + CAST(COUNT(*) AS BIGINT)) // (2 * CAST(COUNT(*) AS BIGINT))) / 1000000.0 AS dup_rate
FROM q LEFT JOIN dup_docs dd USING (doc_id)
GROUP BY q_bucket ORDER BY q_bucket
"""


@register("docs_quality_dup_calibration", sql=_quality_dup_sql())
def docs_quality_dup_calibration(spark: SparkSession, sf_dir: str):
    from dl_datalake_spark.operators.text import with_quality_score

    docs = load_table(spark, sf_dir, "documents", spread=True)
    q = with_quality_score(docs).select("doc_id", "quality")
    pairs = dedup_minhash_lsh(spark, sf_dir)
    dup_docs = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        q.join(dup_docs, "doc_id", "left")
        .groupBy(F.floor(F.col("quality") * 10).cast("long").alias("q_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("is_dup").alias("n_dups"),
            ratio_round(F.count("is_dup"), F.count(F.lit(1))).alias("dup_rate"),
        )
        .orderBy("q_bucket")
    )
