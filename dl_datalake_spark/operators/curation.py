"""Training-data curation operators: deterministic sampling, splits,
and token-budget packing.

What a 100 TB pretraining pipeline needs between "raw documents" and
"training shards": reproducible per-language mixing ratios, a stable
train/val/test assignment, and packing documents into fixed token
budgets — all as pure Column expressions so they run JVM-side at any
scale with no Python in the loop and no RNG (re-running on new data
never reshuffles old assignments; the hash IS the random source).

Hash discipline: the sampling/split key is the first hex chars of
md5(id). Hex strings compare lexicographically identically in every
engine (0-9 < a-f in ASCII), so a cutoff like `< 'cc'` (= 204/256 ≈
79.7%) is exact, engine-portable, and needs no integer conversion —
the same trick the DuckDB oracles replay verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_key(id_col: str, nchars: int = 2):
    """Deterministic uniform [0,16^nchars) bucket as a hex string."""
    return F.substring(F.md5(F.col(id_col).cast("string")), 1, nchars)


def stratified_sample(
    df: DataFrame, strata_col: str, cutoffs: dict[str, str], id_col: str = "doc_id"
) -> DataFrame:
    """Keep rows whose hash key falls under the stratum's hex cutoff.

    cutoffs maps stratum value → 2-hex-char cutoff ('40' = 25%,
    'cc' ≈ 80%); missing strata default to keeping nothing ('00').
    Filter is a pure per-row predicate: fully parallel, no shuffle.
    """
    key = hash_key(id_col)
    cut = F.lit("00")
    for value, hexcut in cutoffs.items():
        cut = F.when(F.col(strata_col) == value, F.lit(hexcut)).otherwise(cut)
    return df.where(key < cut)


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_cut: str = "cc",
    val_cut: str = "e6",
) -> DataFrame:
    """Stable train/val/test assignment (~80/10/10 by md5 range)."""
    key = hash_key(id_col)
    return df.withColumn(
        "split",
        F.when(key < train_cut, "train").when(key < val_cut, "val").otherwise("test"),
    )


def pack_token_budget(
    df: DataFrame,
    budget: int,
    shard_col: str = "lang",
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign each document to a fixed-token-budget training window.

    window_id = floor(cumulative_tokens_before_doc / budget) within a
    shard, documents in stable `order_col` order. One window function
    per shard partition — the shuffle is by shard key only, which is
    how you'd build shards on a cluster anyway (each shard's packing
    is independent and order-deterministic).
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w).cast("long")
    # integer DIV, not float division: cumulative token counts at 100 TB
    # can exceed double's 2^53 mantissa
    return df.withColumn("_cum_before", cum - F.col(tokens_col)).withColumn(
        "window_id", F.expr(f"_cum_before DIV {int(budget)}")
    ).drop("_cum_before")


def shard_for_training(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic global shuffle into N training shards.

    shard = xxhash64(id, seed) mod N; within-shard order = the hash
    itself. The (shard, order) pair is a pure function of (id, seed),
    so the SAME corpus always shards identically — on one machine or a
    thousand executors — and changing the seed gives an independent
    permutation. That determinism is what makes training runs
    reproducible and resumable mid-epoch; a rand()-based shuffle gives
    neither. At scale this is one hash-partitioned shuffle, no global
    sort (each shard sorts locally).
    """
    h = F.xxhash64(F.col(id_col), F.lit(seed))
    return (
        df.withColumn("shard", F.pmod(h, F.lit(n_shards)).cast("int"))
        .withColumn("shard_order", h)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_order")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> None:
    """Materialize the deterministic shuffle as shard=N parquet
    directories, each internally ordered by the shuffle hash."""
    sharded = shard_for_training(df, n_shards, id_col, seed)
    sharded.write.partitionBy("shard").mode("overwrite").parquet(path)


def apply_mix_weights(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    base_rate: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted downsampling: keep a row iff a uniform
    hash of its id falls under base_rate × weight(group), clamped to 1.

    The applying half of the mix-weight computation (docs_domain_mix):
    weights > 1 keep everything (upsampling happens at the data-loader
    level, not by duplicating rows in the lake), weights < 1 thin the
    over-represented group. Pure hash sampling — same corpus, same
    seed, same sample, on any cluster; no rand(), no state.
    """
    m = 1 << 32
    u = F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.lit(m)) / m
    rate = F.coalesce(
        *(
            [F.when(F.col(group_col) == g, F.lit(min(1.0, base_rate * w))) for g, w in weights.items()]
            + [F.lit(min(1.0, base_rate))]
        )
    )
    return df.where(u < rate)


def iter_training_shard(path: str, shard: int, batch_rows: int = 1024):
    """Ordered record-batch iterator over one training shard.

    Consumer side of write_training_shards: a data-loader worker owns
    shard N and streams it in shard_order without Spark — the shards
    are plain partitioned parquet, so the training job needs only
    pyarrow. Batches preserve the deterministic shuffle order."""
    import pyarrow.dataset as ds

    dataset = ds.dataset(f"{path}/shard={shard}", format="parquet")
    table = dataset.to_table()
    order = table.column("shard_order")
    import pyarrow.compute as pc

    table = table.take(pc.sort_indices(order))
    for batch in table.to_batches(max_chunksize=batch_rows):
        yield batch


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    max_rep_micros: int = 200_000,
    sample_cutoff: str = "cc",
) -> DataFrame:
    """End-to-end curation in one lazy plan: exact dedup (md5 keeper) →
    quality floor → repetition cap (distinct/total word-3-gram ratio,
    exact integer micros) → deterministic md5 downsample →
    train/val/test split. Returns the kept documents with text intact
    plus (n_tokens, quality, split) — ready for write_training_shards.

    Every stage is a hash agg or semi-join over the doc_id key; the
    whole pipeline is the oracled docs_curation_pipeline shape
    (queries/curation.py) with the rows kept instead of summarized.
    """
    from pyspark.sql import functions as F

    from dl_datalake_spark.functions.exact import ratio_units
    from dl_datalake_spark.operators.dedup import exact_dedup, word_shingles
    from dl_datalake_spark.operators.text import with_quality_score

    q = with_quality_score(docs)
    sh = word_shingles(docs.select("doc_id", "text"), n=3, distinct=False)
    rep = sh.groupBy("doc_id").agg(
        (
            F.lit(1_000_000)
            - ratio_units(F.countDistinct("shingle"), F.count(F.lit(1)))
        ).alias("rep_micros")
    )
    keepers = exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    kept = (
        q.join(rep, "doc_id", "left")
        .join(keepers, "doc_id", "leftsemi")
        .where(
            (F.col("quality") >= min_quality)
            & (F.coalesce(F.col("rep_micros"), F.lit(0)) <= max_rep_micros)
            & (hash_key("doc_id") < F.lit(sample_cutoff))
        )
        .drop("rep_micros", "punct_count", "mean_token_len")
    )
    return assign_split(kept)
