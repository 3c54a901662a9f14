"""Round-9 (second wave): streaming CDF -> incremental MinHash-LSH
dedup index.  The throwaway-lake pattern (wave11-13) over the
`documents` table: every input and transform is reconstructable in
plain SQL so the DuckDB oracle pins the streamed index content
bit-for-bit."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dl_datalake_spark.queries.registry import register
from dl_datalake_spark.queries.wave13 import _bucket_cents
from dl_datalake_spark.tables import load_table

_JAN = 1672574400000  # 2023-01-01T12:00Z (ms)

_NB = 8  # bands (one 32-bit min-hash each, r=1 — operators/dedup.py)


def _stream_lsh_sql() -> str:
    # mirror operators/dedup.minhash_signatures over the FINAL corpus
    # the CDF ops leave behind: base docs (doc_id < 40) minus the
    # mod-5 deletes, with the mod-8 docs' text updated
    concat3 = "words[i]||' '||words[i+1]||' '||words[i+2]"
    mins = ", ".join(
        f"MIN(substr(md5('{b // 4}:' || shingle), {(b % 4) * 8 + 1}, 8)) AS mh{b}"
        for b in range(_NB)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, mh{b} AS sig FROM m" for b in range(_NB)
    )
    return rf"""
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
fin AS (
  SELECT doc_id,
         CASE WHEN doc_id % 8 = 0 THEN text || ' updated' ELSE text END AS text
  FROM base WHERE doc_id % 5 <> 0
),
w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM fin),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(words)-2, 0)),
                               i -> {concat3})) AS shingle
  FROM w
),
m AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id)
SELECT doc_id, band, sig FROM ({bands})
"""


@register("docs_stream_cdf_lsh", sql=_stream_lsh_sql())
def docs_stream_cdf_lsh(spark: SparkSession, sf_dir: str):
    """Incremental dedup-index maintenance, end to end
    (`streaming.ingest.stream_cdf_into_lsh` +
    `operators.lsh_index.apply_cdf_to_lsh`): a document lake goes
    through append -> upsert (late inserts + text updates) -> DV
    delete; the LSH band index subscribes to the change feed and
    follows exactly-once.  After a CHECKPOINT WIPE the full replay is
    skipped via the index's txn tags, and the final band table must
    equal the salted-md5 min-hash arithmetic over the surviving corpus
    in plain SQL — i.e. the streamed index is bit-identical to a
    from-scratch rebuild.  This is the dedup twin of
    `emb_stream_cdf_ivf`: new training data arrives, the near-dup
    index keeps up at O(batch), never O(corpus)."""
    import shutil
    import tempfile

    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.writer import LakeWriter
    from dl_datalake_spark.operators.lsh_index import read_lsh_index, write_lsh_index
    from dl_datalake_spark.streaming.ingest import stream_cdf_into_lsh

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    key = DatasetKey("SIM", "SPOT", "LSHDOCS", "ticks", "1m")
    tmp = tempfile.mkdtemp(prefix="dl_lsh_lake_")
    try:
        w = LakeWriter(spark, tmp, emit_cdf=True)
        ds = w.dataset_path(key)
        idx = f"{tmp}/lsh_index"

        def _ticks(df):
            return df.select(
                (F.lit(_JAN) + F.col("doc_id") * 60000).cast("long").alias("ts"),
                "doc_id",
                "text",
            )

        w.write_ticks(_ticks(docs.where(F.col("doc_id") % 4 != 3)), key)   # v0
        late = docs.where(F.col("doc_id") % 4 == 3)
        upd = docs.where(F.col("doc_id") % 8 == 0).withColumn(
            "text", F.concat(F.col("text"), F.lit(" updated"))
        )
        w.write_ticks(_ticks(late.unionByName(upd)), key)                  # v1
        w.delete_where(key, F.col("doc_id") % 5 == 0, strategy="dv")       # v2

        write_lsh_index(
            spark,
            spark.createDataFrame([], "doc_id long, text string"),
            idx,
            num_bands=_NB,
            n_buckets=8,
        )
        for run in (0, 1):
            q = stream_cdf_into_lsh(
                spark, ds, idx, f"{tmp}/ckpt", app_id="lsh-oracle"
            )
            q.awaitTermination(300)
            if run == 0:
                shutil.rmtree(f"{tmp}/ckpt")  # wipe: the replay must skip

        rows = (
            read_lsh_index(spark, idx)
            .select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("band").cast("int").alias("band"),
                F.col("sig").cast("string").alias("sig"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "doc_id long, band int, sig string")


@register(
    "events_stream_appends",
    sql=f"""
WITH v AS (
  SELECT user_id % 16 AS b, CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events WHERE event_type = 'view' GROUP BY 1),
k AS (
  SELECT user_id % 16 AS b, CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events WHERE event_type = 'click' GROUP BY 1)
SELECT CAST({_JAN} + b * 60000 AS BIGINT) AS ts, c AS price_cents,
       CAST(0 AS BIGINT) AS commit_version FROM v
UNION ALL
SELECT CAST({_JAN} + (100 + b) * 60000 AS BIGINT), c, 1 FROM k
""",
)
def events_stream_appends(spark: SparkSession, sf_dir: str):
    """The lake as an APPEND streaming source without CDF
    (sources/append_source.py — Delta's files-added streaming
    semantics on the commit log): two append commits drain through
    `spark.readStream.format("lake_appends")` with per-commit
    attribution, and the emitted rows must equal the bucket arithmetic
    in plain SQL.  Offsets are commit versions, so the checkpoint owns
    the cursor and availableNow replay equals batch — the same
    contract the CDF source pins, now available to emit_cdf=False
    writers."""
    import shutil
    import tempfile

    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.writer import LakeWriter
    from dl_datalake_spark.sources.append_source import stream_appends

    ev = load_table(spark, sf_dir, "events")
    views = _bucket_cents(ev, "view", buckets=16)
    clicks = _bucket_cents(ev, "click", buckets=16)

    def _ticks(df, offset):
        return df.select(
            (F.lit(_JAN) + (F.col("b") + offset) * 60000).cast("long").alias("ts"),
            F.col("c").cast("double").alias("price"),
        )

    key = DatasetKey("SIM", "SPOT", "APPQ", "ticks", "1m")
    tmp = tempfile.mkdtemp(prefix="dl_app_lake_")
    try:
        w = LakeWriter(spark, tmp)
        w.write_ticks(_ticks(views, 0), key, mode="append")    # v0
        w.write_ticks(_ticks(clicks, 100), key, mode="append")  # v1
        ds = w.dataset_path(key)
        out: list = []

        def _collect(batch_df, _bid):
            out.extend(
                batch_df.select("ts", "price", "commit_version").collect()
            )

        q = (
            stream_appends(spark, ds)
            .writeStream.foreachBatch(_collect)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = [
            (int(r["ts"]), int(r["price"]), int(r["commit_version"])) for r in out
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "ts long, price_cents long, commit_version long"
    )


def _index_pairs_sql() -> str:
    concat3 = "words[i]||' '||words[i+1]||' '||words[i+2]"
    mins = ", ".join(
        f"MIN(substr(md5('{b // 4}:' || shingle), {(b % 4) * 8 + 1}, 8)) AS mh{b}"
        for b in range(_NB)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, mh{b} AS sig FROM m" for b in range(_NB)
    )
    return rf"""
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM base),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(words)-2, 0)),
                               i -> {concat3})) AS shingle
  FROM w
),
m AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
b AS ({bands})
SELECT a.doc_id AS id_a, b2.doc_id AS id_b
FROM b a JOIN b b2 ON a.band = b2.band AND a.sig = b2.sig AND a.doc_id < b2.doc_id
GROUP BY 1, 2
"""


@register("docs_lsh_index_pairs", sql=_index_pairs_sql())
def docs_lsh_index_pairs(spark: SparkSession, sf_dir: str):
    """Candidate near-dup pairs from the PERSISTED LSH index
    (`operators.lsh_index.write_lsh_index` + `lsh_index_pairs`): the
    (band, sig) self-equi-join runs on stored state with zero signature
    recomputation — the read path an incremental dedup deployment uses
    between CDF catch-ups.  Verified against the full salted-md5
    min-hash band arithmetic in plain SQL."""
    import shutil
    import tempfile

    from dl_datalake_spark.operators.lsh_index import (
        lsh_index_pairs,
        write_lsh_index,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    tmp = tempfile.mkdtemp(prefix="dl_lshp_")
    try:
        idx = f"{tmp}/idx"
        write_lsh_index(spark, docs, idx, num_bands=_NB, n_buckets=8)
        rows = (
            lsh_index_pairs(spark, idx)
            .select(
                F.col("id_a").cast("long").alias("id_a"),
                F.col("id_b").cast("long").alias("id_b"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "id_a long, id_b long")


@register(
    "events_delete_multi",
    sql=f"""
WITH v AS (
  SELECT user_id % 16 AS b, CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events WHERE event_type = 'view' GROUP BY 1),
k AS (
  SELECT user_id % 16 AS b, CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events WHERE event_type = 'click' GROUP BY 1)
SELECT 'AAA_USD' AS symbol, CAST({_JAN} + b * 60000 AS BIGINT) AS ts, c AS price_cents
FROM v WHERE b % 3 <> 0
UNION ALL
SELECT 'BBB_USD', CAST({_JAN} + b * 60000 AS BIGINT), c
FROM k WHERE b % 3 <> 0
""",
)
def events_delete_multi(spark: SparkSession, sf_dir: str):
    """ATOMIC multi-dataset row-level DELETE (writer.delete_where_multi
    — the real GDPR purge shape): one predicate removed from TWO
    datasets as a single multilog epoch, merge-on-read (deletion
    vectors, zero rewrite).  Both datasets' read-back must equal the
    WHERE NOT arithmetic in plain SQL, and the query asserts the
    shared txid replays a CONSISTENT post-purge cut through
    `read_datasets_at` — committed-or-invisible, never a mix."""
    import shutil
    import tempfile

    from dl_datalake_spark.lake.paths import DatasetKey
    from dl_datalake_spark.lake.reader import LakeReader
    from dl_datalake_spark.lake.writer import LakeWriter

    ev = load_table(spark, sf_dir, "events")
    views = _bucket_cents(ev, "view", buckets=16)
    clicks = _bucket_cents(ev, "click", buckets=16)

    def _ticks(df):
        return df.select(
            (F.lit(_JAN) + F.col("b") * 60000).cast("long").alias("ts"),
            F.col("c").cast("double").alias("price"),
        )

    ka = DatasetKey("SIM", "SPOT", "AAA_USD", "ticks", "1m")
    kb = DatasetKey("SIM", "SPOT", "BBB_USD", "ticks", "1m")
    tmp = tempfile.mkdtemp(prefix="dl_dmulti_lake_")
    try:
        w = LakeWriter(spark, tmp)
        w.write_ticks(_ticks(views), ka)
        w.write_ticks(_ticks(clicks), kb)
        out = w.delete_where_multi(
            [ka, kb], F.expr(f"((ts - {_JAN}) DIV 60000) % 3 = 0")
        )
        txid = next(iter({res.txid for res in out.values()}))
        r = LakeReader(spark, tmp)
        cut = r.read_datasets_at([ka, kb], txid)
        rows = []
        for sym in ("AAA_USD", "BBB_USD"):
            live = r.read_dataset(
                DatasetKey("SIM", "SPOT", sym, "ticks", "1m")
            )
            # the live head and the txid cut must agree (consistent epoch)
            if live.count() != cut[sym].count():
                raise AssertionError(f"txid cut and live head disagree for {sym}")
            rows.extend(
                (sym, int(x["ts"]), int(x["price"]))
                for x in live.select("ts", "price").collect()
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "symbol string, ts long, price_cents long")
