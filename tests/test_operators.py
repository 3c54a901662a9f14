"""Operator unit tests: resample, gap detection, sessionize, keep-last,
dedup family, text analysis, similarity."""

from __future__ import annotations

from pyspark.sql import functions as F

from dl_datalake_spark.lake.maintenance import find_gaps, modal_interval, verify_integrity, with_ts_diff
from dl_datalake_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from dl_datalake_spark.operators.resample import resample_ohlcv
from dl_datalake_spark.operators.similarity import cosine_topk
from dl_datalake_spark.operators.text import with_lang_id, with_quality_score, with_token_count
from dl_datalake_spark.operators.windows import keep_last, sessionize


def test_resample_deterministic_first_last(spark):
    # two 1m candles per 15m bucket, values chosen so first/last matter
    rows = [
        (0, 10.0, 12.0, 9.0, 11.0, 1.0),
        (60_000, 11.0, 15.0, 10.0, 14.0, 2.0),
        (900_000, 20.0, 22.0, 19.0, 21.0, 3.0),
        (960_000, 21.0, 30.0, 18.0, 25.0, 4.0),
    ]
    df = spark.createDataFrame(
        rows, "ts long, open double, high double, low double, close double, volume double"
    ).repartition(4)  # scramble physical order: results must not change
    out = {r["ts"]: r for r in resample_ohlcv(df, "15m").collect()}
    assert out[0]["open"] == 10.0 and out[0]["close"] == 14.0
    assert out[0]["high"] == 15.0 and out[0]["low"] == 9.0 and out[0]["volume"] == 3.0
    assert out[900_000]["open"] == 20.0 and out[900_000]["close"] == 25.0


def test_gap_detection_modal_interval(spark):
    # 1m series with a 5-minute hole and one duplicate ts
    ts = [0, 60_000, 120_000, 420_000, 480_000, 480_000]
    df = spark.createDataFrame([(t, 1.0) for t in ts], "ts long, v double")
    d = with_ts_diff(df, partition_cols=[])
    assert modal_interval(d) == 60_000
    gaps = find_gaps(df)
    assert gaps.count() == 1  # the 300k jump
    rep = verify_integrity(df)
    assert rep.gap_count == 1
    assert rep.overlap_count == 1  # duplicate ts → diff == 0
    assert rep.rows == 6


def test_sessionize_and_keep_last(spark):
    rows = [
        (1, 0, "a"),
        (1, 1_000, "b"),
        (1, 10_000_000_000, "c"),  # new session after big gap
        (2, 500, "d"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, tag string")
    sess = sessionize(df, gap=1_000_000)
    got = {(r["user_id"], r["ts"]): r["session_seq"] for r in sess.collect()}
    assert got[(1, 0)] == 1 and got[(1, 1_000)] == 1 and got[(1, 10_000_000_000)] == 2
    assert got[(2, 500)] == 1

    kl = keep_last(df, keys=["user_id"])
    assert {(r["user_id"], r["ts"]) for r in kl.collect()} == {(1, 10_000_000_000), (2, 500)}


def test_exact_dedup_and_shingles(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")], "doc_id long, text string"
    )
    groups = exact_dedup(df)
    assert groups.count() == 2
    dup = groups.where(F.col("group_size") == 2).collect()[0]
    assert dup["keep_id"] == 1

    sh = word_shingles(df, n=3).where(F.col("doc_id") == 1).collect()
    assert {r["shingle"] for r in sh} == {"a b c", "b c d"}
    # doc shorter than n → no shingles
    short = spark.createDataFrame([(9, "one two")], "doc_id long, text string")
    assert word_shingles(short, n=3).count() == 0


def test_minhash_and_jaccard_find_near_dups(spark):
    near_a = "the quick brown fox jumps over the lazy dog again and again today"
    near_b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    other = "completely different words appear in this sentence about spark engines"
    df = spark.createDataFrame(
        [(1, near_a), (2, near_b), (3, other)], "doc_id long, text string"
    )
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(df).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs

    j = ngram_jaccard_pairs(df, shingle_n=2, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in j} == {(1, 2)}
    assert all(0 < r["jaccard"] <= 1 for r in j)

    fp = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    ham_ab = bin(fp[1] ^ fp[2]).count("1")
    ham_ac = bin(fp[1] ^ fp[3]).count("1")
    assert ham_ab < ham_ac  # near-dups closer in hamming space


def test_text_analysis(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog went to the park, happily!"), (2, "uno dos")],
        "doc_id long, text string",
    )
    t = with_token_count(df).collect()
    assert {r["doc_id"]: r["n_tokens"] for r in t} == {1: 10, 2: 2}

    q = {r["doc_id"]: r for r in with_quality_score(df).collect()}
    assert q[2]["quality"] == 0.0  # too short
    assert 0 < q[1]["quality"] <= 1
    assert q[1]["punct_count"] == 2

    lang = {r["doc_id"]: r["pred_lang"] for r in with_lang_id(df).collect()}
    assert lang[1] == "en"


def test_cosine_topk(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = cosine_topk(df, [1.0, 0.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in top] == [1, 2]
    assert top[0]["cos_sim"] == 1.0


def test_curation_split_sample_pack(spark):
    from dl_datalake_spark.operators.curation import (
        assign_split,
        pack_token_budget,
        stratified_sample,
    )

    rows = [(i, "en" if i % 2 == 0 else "de", (i % 7) + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens int")

    # split: deterministic (same assignment on re-run), full coverage, ~80/10/10
    s1 = {r["doc_id"]: r["split"] for r in assign_split(df).collect()}
    s2 = {r["doc_id"]: r["split"] for r in assign_split(df).collect()}
    assert s1 == s2
    counts = {v: sum(1 for x in s1.values() if x == v) for v in ("train", "val", "test")}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert sum(counts.values()) == 400

    # stratified sample: subset, en rate < de rate under these cutoffs
    samp = stratified_sample(df, "lang", {"en": "20", "de": "cc"}).collect()
    by_lang = {"en": 0, "de": 0}
    for r in samp:
        by_lang[r["lang"]] += 1
    assert by_lang["de"] > by_lang["en"]
    assert all(r["doc_id"] in s1 for r in samp)

    # packing: window token sums stay under budget + max single doc;
    # windows are contiguous in doc_id order per shard
    packed = pack_token_budget(df, budget=50).collect()
    from collections import defaultdict

    sums = defaultdict(int)
    for r in packed:
        sums[(r["lang"], r["window_id"])] += r["n_tokens"]
    assert all(s < 50 + 7 for s in sums.values())
    for lang in ("en", "de"):
        seq = sorted((r["doc_id"], r["window_id"]) for r in packed if r["lang"] == lang)
        wids = [w for _, w in seq]
        assert wids == sorted(wids)  # monotone windows in pack order


def test_scrub_pii_redacts_and_counts(spark):
    from dl_datalake_spark.operators.text import scrub_pii

    rows = [
        (1, "mail me at jane.doe+x@example.co.uk or call +1 555-123-4567"),
        (2, "server at 10.0.12.9 responded"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert "[EMAIL]" in out[1]["text_scrubbed"] and "[PHONE]" in out[1]["text_scrubbed"]
    assert "jane" not in out[1]["text_scrubbed"]
    assert out[2]["n_ipv4"] == 1 and "[IPV4]" in out[2]["text_scrubbed"]
    assert out[3]["n_pii"] == 0 and out[3]["text_scrubbed"] == "nothing sensitive here"


def test_quantize_int8_roundtrip_error_bounded(spark):
    from dl_datalake_spark.operators.similarity import dequantize_error, quantize_int8

    rows = [
        (1, [1.0, -0.5, 0.25, 0.125]),
        (2, [100.0, 0.0, -100.0, 50.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector: epsilon scale, zero codes
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in dequantize_error(quantize_int8(df)).collect()}
    # codes bounded to [-127, 127]; max element maps to exactly +/-127
    assert out[1]["q_codes"][0] == 127 and out[2]["q_codes"][2] == -127
    # reconstruction error bounded by scale/(2*127) per element
    for vid in (1, 2):
        bound = out[vid]["q_scale"] / (2 * 127) + 1e-9
        assert out[vid]["q_abs_err"] <= bound
    assert out[3]["q_codes"] == [0, 0, 0, 0] and out[3]["q_abs_err"] == 0.0


def test_minhash_ml_agrees_with_banded_on_clear_dups(spark):
    from dl_datalake_spark.operators.dedup import minhash_lsh_pairs_ml

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " extra"),            # near-dup of 1
        (3, "completely different words about spark query engines here now"),
        (4, "completely different words about spark query engines here now ok"),  # near-dup of 3
        (5, "unrelated singleton text with its own vocabulary entirely alone"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs_ml(df, jaccard_threshold=0.5).collect()
    }
    assert (1, 2) in pairs and (3, 4) in pairs
    assert all(p in {(1, 2), (3, 4)} for p in pairs)


def test_ivf_full_probe_equals_brute_force(spark):
    """nprobe == #cells must reproduce exact brute-force top-k — the
    recall dial degrades gracefully to exhaustive search."""
    from dl_datalake_spark.operators.similarity import cosine_topk, ivf_topk

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = emb.where(F.col("vec_id") < 5)
    ivf = ivf_topk(q, emb, k=3, nprobe=3)
    brute = {}
    for qrow in q.collect():
        got = cosine_topk(
            emb.where(F.col("vec_id") != qrow["vec_id"]), qrow["embedding"], k=3
        ).collect()
        brute[qrow["vec_id"]] = [r["vec_id"] for r in got]
    for r in ivf.collect():
        assert brute[r["q_id"]][r["rank"] - 1] == r["c_id"]


def test_training_shards_deterministic_and_balanced(spark, tmp_path):
    from dl_datalake_spark.operators.curation import (
        shard_for_training,
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(500)], "doc_id long, text string"
    )
    a = shard_for_training(docs, 8, seed=1).select("doc_id", "shard", "shard_order")
    b = shard_for_training(docs.repartition(7), 8, seed=1).select(
        "doc_id", "shard", "shard_order"
    )
    assert sorted(a.collect()) == sorted(b.collect())  # partitioning-invariant

    sizes = {r["shard"]: r["n"] for r in a.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert len(sizes) == 8
    assert max(sizes.values()) < 2.2 * min(sizes.values())  # hash-balanced

    # different seed → different permutation
    c = shard_for_training(docs, 8, seed=2).select("doc_id", "shard")
    moved = a.select("doc_id", "shard").exceptAll(c).count()
    assert moved > 100

    out = str(tmp_path / "shards")
    write_training_shards(docs, out, 4, seed=1)
    back = spark.read.parquet(out)
    assert back.count() == 500
    assert back.select("shard").distinct().count() == 4


def test_ann_variants_recall_floor(spark):
    """IVF (nprobe=2) and hyperplane-LSH ANN must recover a healthy
    fraction of the exact top-5 on real-ish clustered vectors —
    approximate is only useful if recall is measurable and high."""
    import random

    from dl_datalake_spark.operators.similarity import (
        ann_lsh_topk,
        deterministic_planes as _deterministic_planes,
        ivf_topk,
    )

    rng = random.Random(11)
    # 3 gaussian-ish clusters so labels correlate with geometry
    centers = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(3)]
    rows = []
    for i in range(300):
        lab = i % 3
        rows.append(
            (i, [c + rng.gauss(0, 0.25) for c in centers[lab]], lab)
        )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = emb.where(F.col("vec_id") < 15)

    from dl_datalake_spark.operators.similarity import cosine_topk

    exact = {}
    for qrow in q.collect():
        got = cosine_topk(
            emb.where(F.col("vec_id") != qrow["vec_id"]), qrow["embedding"], k=5
        ).collect()
        exact[qrow["vec_id"]] = {r["vec_id"] for r in got}

    def recall(df, qcol="q_id", ccol="c_id"):
        hits = tot = 0
        got: dict[int, set] = {}
        for r in df.collect():
            got.setdefault(r[qcol], set()).add(r[ccol])
        for qid, want in exact.items():
            hits += len(want & got.get(qid, set()))
            tot += len(want)
        return hits / tot

    r_ivf = recall(ivf_topk(q, emb, k=5, nprobe=2))
    assert r_ivf >= 0.8, r_ivf
    planes = _deterministic_planes(num_planes=2, dim=16)
    r_lsh = recall(ann_lsh_topk(q, emb, planes, k=5))
    assert r_lsh >= 0.5, r_lsh

    # knn-join guard: above max_broadcast_rows the plan must route
    # through the bucket equi-join — no full-corpus theta broadcast
    from dl_datalake_spark.operators.similarity import pairwise_topk_join

    guarded = pairwise_topk_join(q, emb, k=5, max_broadcast_rows=10, planes=planes)
    plan = guarded._jdf.queryExecution().optimizedPlan().toString()
    assert "bucket" in plan  # LSH candidate join key present
    r_guard = recall(guarded)
    assert r_guard >= 0.5, r_guard
    exact_join = pairwise_topk_join(q, emb, k=5)  # under the guard: exact
    assert recall(exact_join) == 1.0


def test_rolling_fingerprint_is_order_sensitive(spark):
    from dl_datalake_spark.operators.text import with_rolling_fingerprint

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),   # identical -> same fp
        (3, "delta gamma beta alpha"),   # same tokens, new order -> differs
        (4, "alpha beta gamma"),         # prefix -> differs
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r["doc_id"]: r["rolling_fp"] for r in with_rolling_fingerprint(df).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3] and fp[1] != fp[4]
    assert all(0 <= v < 2_147_483_647 for v in fp.values())
    # partitioning-invariant (pure function of the token sequence)
    again = {
        r["doc_id"]: r["rolling_fp"]
        for r in with_rolling_fingerprint(df.repartition(3)).collect()
    }
    assert again == fp


def test_apply_mix_weights_deterministic_rates(spark):
    from dl_datalake_spark.operators.curation import apply_mix_weights

    docs = spark.createDataFrame(
        [(i, "heavy" if i % 2 else "light") for i in range(4000)],
        "doc_id long, source string",
    )
    kept = apply_mix_weights(docs, {"heavy": 0.25, "light": 1.0}, seed=3)
    counts = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["light"] == 2000  # weight 1 keeps all
    assert 400 <= counts["heavy"] <= 600  # ~25% of 2000
    # deterministic under reshuffling
    again = apply_mix_weights(docs.repartition(7), {"heavy": 0.25, "light": 1.0}, seed=3)
    assert sorted(kept.collect()) == sorted(again.collect())
    # unknown groups fall back to base_rate
    extra = spark.createDataFrame([(99999, "new")], "doc_id long, source string")
    assert apply_mix_weights(extra, {"heavy": 0.5}, base_rate=1.0).count() == 1


def test_iter_training_shard_ordered_roundtrip(spark, tmp_path):
    from dl_datalake_spark.operators.curation import (
        iter_training_shard,
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(300)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, 4, seed=5)
    seen = []
    orders = []
    for shard in range(4):
        for batch in iter_training_shard(out, shard, batch_rows=32):
            pdf = batch.to_pandas()
            seen.extend(pdf["doc_id"].tolist())
            orders.append(pdf["shard_order"].tolist())
    assert sorted(seen) == list(range(300))  # full coverage, no dups
    for o in orders:
        assert o == sorted(o)  # deterministic order inside each batch


def test_lang_id_predicts_dominant_stopword_language(spark):
    from dl_datalake_spark.operators.text import LANG_STOPWORDS, with_lang_id

    rows = [
        (i, " ".join(LANG_STOPWORDS[lang] * 3 + ["xyz", "qqq"]), lang)
        for i, lang in enumerate(sorted(LANG_STOPWORDS))
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["lang"]: r["pred_lang"] for r in with_lang_id(df).collect()}
    # es/fr share stopwords ("la") but each language's full signature wins
    for lang in LANG_STOPWORDS:
        assert out[lang] == lang, (lang, out[lang])


def test_minhash_hot_bucket_cap(spark):
    # 12 identical boilerplate docs form one giant band bucket; two
    # genuine near-dups are distinct from it. The cap drops the
    # boilerplate cluster's quadratic bucket but keeps the small pair.
    boiler = [(i, "the same boilerplate text repeated again and again here") for i in range(12)]
    near = [
        (100, "a genuinely unique document about spark lsh banding guards"),
        (101, "a genuinely unique document about spark lsh banding guard"),
    ]
    df = spark.createDataFrame(boiler + near, "doc_id long, text string")
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, max_df_frac=None).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, max_df_frac=None, max_bucket_docs=5).collect()
    }
    assert (100, 101) in uncapped and (100, 101) in capped
    assert any(a < 12 and b < 12 for a, b in uncapped)  # boiler pairs present
    assert not any(a < 12 and b < 12 for a, b in capped)  # dropped by the cap
    assert capped <= uncapped
