"""Empirical scaling check for the corpus-level operators.

Builds a K× copy of sf0.1's documents table (copies are token-suffixed
per replica so replica sets don't become near-duplicates of each other
— the dup structure WITHIN each replica matches the original corpus,
so correct near-dup output scales ~K×), then times the heaviest
corpus queries at 1× and K× and reports the observed scaling exponent
log(t_K/t_1)/log(K). Near 1.0 = linear (what the LSH/bucket-join
design promises); >>1 would flag a quadratic candidate explosion.

Usage: python scripts/scale_experiment.py [K] [workdir]
Writes K× parquet under workdir (default /tmp/dl_scale_exp) and prints
one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_UNDER_TEST = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_groups",
    "dedup_cluster_keeper",
    "docs_boilerplate_coverage",
    "docs_curation_pipeline",
    "docs_domain_mix",
    "dedup_exact_substring",
    "docs_novelty_by_source",
]

# embedding operators: replicas get a per-replica deterministic sign
# pattern applied elementwise — cosine within a replica is invariant
# (both vectors flip the same coordinates), cross-replica similarity
# collapses toward 0, so correct near-dup output scales ~K×.
EMB_QUERIES = [
    "dedup_emb_cosine",
    "emb_semantic_dedup_drops",
]

# event-stream operators: replicas get disjoint user_id/event_id spaces
# (same timestamps), so per-user windows/sessions/joins see K× more
# keys with the original per-key history — the partitioning axis that
# matters for window/as-of scaling.
EVENT_QUERIES = [
    "events_sessionize",
    "events_asof_join",
    "events_range_join",
    "events_tumbling_hourly",
    "events_keep_last",
]


def build_corpus(src_dir: str, out_dir: str, k: int) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT COUNT(*) FROM '{src_dir}/documents.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""
COPY (
  SELECT d.doc_id + {n_docs} * r.i AS doc_id,
         CASE WHEN r.i = 0 THEN d.text
              ELSE array_to_string(
                     list_transform(str_split(d.text, ' '),
                                    w -> w || '~' || r.i), ' ')
         END AS text,
         d.lang, d.source, d.n_chars
  FROM '{src_dir}/documents.parquet' d,
       (SELECT unnest(generate_series(0, {k - 1})) AS i) r
) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
"""
    )
    con.close()


# Small-aggregate queries MUST be collect()ed: under count() Catalyst
# legitimately prunes the unused aggregate expressions and eliminates
# the non-multiplying left joins feeding them — you end up timing a
# skeleton plan, not the operator. Everything else goes through the
# noop sink (bench.py rationale): it consumes every output column, so
# windows/projections can't be pruned the way they are under count().
COLLECT_QUERIES = {
    "docs_boilerplate_coverage",
    "docs_domain_mix",
    "docs_curation_pipeline",
}


def build_events(src_dir: str, out_dir: str, k: int) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    n_ev, n_users = con.execute(
        f"SELECT COUNT(*), MAX(user_id) + 1 FROM '{src_dir}/events.parquet'"
    ).fetchone()
    con.execute(
        f"""
COPY (
  SELECT e.event_id + {n_ev} * r.i AS event_id,
         e.ts,
         e.user_id + {n_users} * r.i AS user_id,
         e.event_type, e.value, e.props
  FROM '{src_dir}/events.parquet' e,
       (SELECT unnest(generate_series(0, {k - 1})) AS i) r
) TO '{out_dir}/events.parquet' (FORMAT PARQUET)
"""
    )
    con.close()


def build_embeddings(src_dir: str, out_dir: str, k: int) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    n_vec = con.execute(
        f"SELECT COUNT(*) FROM '{src_dir}/embeddings.parquet'"
    ).fetchone()[0]
    # per-replica elementwise sign flips: cos(s⊙a, s⊙b) == cos(a, b)
    # within a replica; cross-replica cosines decorrelate
    con.execute(
        f"""
COPY (
  SELECT e.vec_id + {n_vec} * r.i AS vec_id,
         CASE WHEN r.i = 0 THEN e.embedding
              ELSE list_transform(
                     list_zip(e.embedding,
                              list_transform(generate_series(1, len(e.embedding)),
                                             j -> CAST(hash(r.i * 131 + j) % 2 AS INTEGER)))::
                       STRUCT(a FLOAT, b INTEGER)[],
                     p -> CASE WHEN p.b = 0 THEN p.a ELSE -p.a END)
         END AS embedding,
         e.label
  FROM '{src_dir}/embeddings.parquet' e,
       (SELECT unnest(generate_series(0, {k - 1})) AS i) r
) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)
"""
    )
    con.close()


def time_queries(spark, sf_dir: str, names) -> dict[str, float]:
    from dl_datalake_spark.queries import QUERIES

    out = {}
    for name in names:
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            if name in COLLECT_QUERIES:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dl_scale_exp"
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    build_corpus(src, workdir, k)

    from dl_datalake_spark.session import get_spark

    spark = get_spark("scale-experiment")
    # warm workers
    spark.range(0, 64).mapInPandas(lambda it: it, schema="id long").count()

    build_embeddings(src, workdir, k)
    build_events(src, workdir, k)
    names = QUERIES_UNDER_TEST + EMB_QUERIES + EVENT_QUERIES
    t1 = time_queries(spark, src, names)
    tk = time_queries(spark, workdir, names)
    report = {
        "k": k,
        "t1_sec": t1,
        "tk_sec": tk,
        "scaling_exponent": {
            name: round(math.log(max(tk[name], 1e-3) / max(t1[name], 1e-3)) / math.log(k), 3)
            for name in names
        },
    }
    print(json.dumps(report))
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
