"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup over a document
table — the operators a 100 TB pretraining-data pipeline needs. The
reference lake's only dedup is keep-last-per-ts upsert
(`storage/writer.py:92`); these generalize to content-level near-dup at
scale.

Design constraints honored throughout:
- Everything is hash-agg + equi-join — shapes Catalyst/AQE optimize;
  no crossJoin anywhere (pair generation is always bucket-join on a
  band/shingle key, the LSH trick that keeps candidate generation
  near-linear at 100 TB).
- Hashing is md5 (JVM built-in, whole-stage codegen) rather than
  murmur3 so a DuckDB oracle can reproduce results bit-for-bit;
  min() over md5 hex strings is the "min-hash" (lexicographic min is a
  valid uniform order statistic on the hash space).
- High-document-frequency shingles are dropped before the pair join
  (stop-shingle cap, relative to corpus size) — the standard skew
  guard: without it one common shingle joins quadratically. The cap is
  a FRACTION of the corpus, not an absolute count, so the operator's
  cost stays near-linear at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

TOKEN_SPLIT = r"\s+"


def _pin(df: DataFrame) -> DataFrame:
    """Persist an intermediate that the downstream DAG reads 2+ times.

    Shingle tables and signature tables each feed a self-join (both
    sides) plus frequency/size aggregates; without a persist Spark
    recomputes the whole explode+hash lineage per consumer. At 100 TB
    the same persist is what you'd do on a cluster: signatures are
    ~1000× smaller than the text they summarize. MEMORY_AND_DISK spills
    instead of OOMing; eviction just falls back to recompute.
    """
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def tokens(col: str = "text"):
    return F.split(F.trim(F.col(col)), TOKEN_SPLIT)


def shingle_array(w, n: int):
    """Array of word n-gram shingles from an already-split token-array
    Column — the row-local core of `word_shingles`, exposed so callers
    that only need per-document set statistics (distinct-shingle
    counts, repetition ratios) can compute them as pure projections
    with array_distinct/size instead of explode → shuffle → agg →
    join-back (guide §2: remove the shuffle outright)."""
    head = F.slice(w, 1, F.greatest(F.size(w) - (n - 1), F.lit(0)))
    return F.transform(
        head,
        lambda _, i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)]),
    )


def _ordered_pairs(ids):
    """All i<j combinations of a SORTED id array as array<struct<id_a,id_b>>.

    The pair-emission half of bucket enumeration: equivalent to the
    classic banded self-equi-join with `a.id < b.id`, but evaluated on
    the grouped bucket array so the upstream lineage runs once."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


def word_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hashed: bool = False,
    distinct: bool = True,
) -> DataFrame:
    """Word n-gram shingles per document (distinct by default).

    distinct=False skips the dedup shuffle — correct whenever the
    consumer is duplicate-insensitive (min-hash: min over a multiset
    equals min over its set); set consumers (Jaccard intersections)
    need the default.

    Array-native: split once into `w`, then transform indexes with
    element_at + explode — no Python in the loop, one narrow projection
    then explode. element_at over the shared array beats per-shingle
    slice+copy by ~2.3× (measured sf0.1); the split happens once per
    doc, not once per shingle.

    hashed=True replaces the shingle string with xxhash64(shingle)
    before the distinct: when downstream only needs set semantics
    (Jaccard intersection counts, stop-shingle filtering), an 8-byte
    long shuffles and compares far cheaper than a trigram string.
    Collisions are ~n²/2⁶⁴ — negligible even at billions of shingles.
    Keep strings (default) when downstream hashes the shingle content
    itself (min-hash signatures need md5 of the exact string for
    oracle parity).
    """
    base = df.select(F.col(id_col), tokens(text_col).alias("w"))
    out = base.select(
        F.col(id_col), F.explode(shingle_array(F.col("w"), n)).alias("shingle")
    )
    if hashed:
        out = out.select(F.col(id_col), F.xxhash64("shingle").alias("shingle"))
    if distinct:
        out = out.distinct()
    return out


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group identical texts by md5; keeper = min id per group."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def minhash_signatures(
    shingles: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    as_long: bool = True,
) -> DataFrame:
    """num_hashes min-hashes per doc, one hash-agg pass.

    md5 is 128 bits = four independent 32-bit (8-hex-char) chunks, so
    ceil(num_hashes/4) salted md5 calls per shingle are enough — 4×
    less hashing than one md5 per band. The min of each chunk is a
    valid uniform order statistic; 32-bit chunks keep min-collisions
    negligible even for billion-shingle corpora (min ≈ U(0, 2^32/n)).

    as_long=True (default) aggregates each chunk as its numeric value
    — MIN over fixed-width lowercase hex strings is the same ordering
    as MIN over conv(chunk, 16, 10) longs, but min(string) buffers a
    variable-length UTF8String, which disqualifies HashAggregate and
    forces a SortAggregate fallback: the whole shingle table gets
    SORTED by doc_id (twice, once per side of the band self-join)
    before aggregating. Long buffers keep the agg a HashAggregate and
    shrink every downstream band-join key from 8 chars to one word.
    Pass as_long=False where the hex form is a persisted/oracle
    contract (the LSH index stores hex sigs on disk); equality joins
    and bucket counts are identical either way because the conversion
    is a bijection on 8-hex-char chunks.
    """
    salts = (num_hashes + 3) // 4
    hashed = shingles.select(
        F.col(id_col),
        *[
            F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle"))).alias(f"h{s}")
            for s in range(salts)
        ],
    )

    def chunk(b: int):
        c = F.substring(F.col(f"h{b // 4}"), (b % 4) * 8 + 1, 8)
        return F.conv(c, 16, 10).cast("long") if as_long else c

    aggs = [F.min(chunk(b)).alias(f"mh{b}") for b in range(num_hashes)]
    return hashed.groupBy(id_col).agg(*aggs)


def drop_stop_shingles(
    sh: DataFrame,
    df: DataFrame,
    id_col: str,
    max_df_frac: float,
    distinct_input: bool = True,
) -> DataFrame:
    """Drop shingles present in more than `max_df_frac` of documents.

    The threshold is computed from the corpus itself (broadcast
    single-row count — no driver round-trip), so the same operator is
    correct at sf0.01 and at 100 TB. An absolute floor of 5 documents
    keeps tiny corpora intact (0.2×3 docs would otherwise drop every
    shingle).

    Cost shape (measured ~2× over the naive form at sf0.1):
    - The document-frequency agg runs on `xxhash64(shingle)` longs, not
      the shingle strings — an 8-byte shuffle key. Collisions merge two
      shingles' DF counts with probability ~n²/2⁶⁴; flipping the stop
      threshold through one is negligible at any realistic corpus (and
      the hash only gates the FILTER — downstream consumers still see
      the exact shingle strings).
    - Multiset inputs are reduced with distinct-then-count rather than
      countDistinct (the two-phase Expand agg planned for countDistinct
      measured ~20% slower).
    - No persist: both consumers of the shingle lineage hash-partition
      on the same key, so Spark's ReusedExchange serves the second
      consumer from the first one's shuffle files — caching the
      (much wider) shingle table was strictly slower.
    - Join only the STOP set, not the full frequency table: stop
      shingles are a tiny, corpus-size-independent head of the DF
      distribution (each appears in >max_df_frac of all documents), so
      the filter is a shuffle-free broadcast anti-join.
    """
    shingle_type = dict(sh.dtypes).get("shingle")
    key = F.col("shingle") if shingle_type == "bigint" else F.xxhash64("shingle")
    keyed = sh.withColumn("_h", key)
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    pairs = keyed.select(id_col, "_h")
    if not distinct_input:
        pairs = pairs.distinct()  # DF = number of DOCUMENTS per shingle
    stop = (
        pairs.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(total))
        .where(F.col("_df") > F.greatest(F.lit(5.0), F.col("_n") * max_df_frac))
        .select("_h")
    )
    return keyed.join(F.broadcast(stop), "_h", "left_anti").select(id_col, "shingle")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_bands: int = 8,
    max_df_frac: float | None = 0.2,
    max_bucket_docs: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on ≥1 min-hash band.

    shingle → salted min-hash per band → melt to (band, sig) →
    self-equi-join on (band, sig). Join key cardinality ≈ #docs×bands,
    so the shuffle is linear in corpus size; band agreement is the LSH
    bucket join (r=1 rows/band).

    max_bucket_docs caps the size of any one (band, sig) bucket: a
    bucket of m docs emits m² pairs, so one templated/boilerplate
    cluster of 10⁶ docs would produce 10¹² candidates regardless of
    the stop-shingle guard. Capped buckets are DROPPED (their docs are
    near-identical to each other and still meet through their other
    bands' smaller buckets, or are better handled by exact_dedup
    first) — the standard large-corpus LSH guard. None (default)
    keeps exact oracle-checkable semantics.
    """
    # multiset shingles: min-hash is duplicate-insensitive, so the
    # distinct shuffle is pure cost here (jaccard still needs it)
    #
    # NOTE (r12, negative result): computing the stop-shingle DF from a
    # row-local `explode(array_distinct(transform(arr, xxhash64)))` —
    # the ngram_jaccard_pairs trick — to remove drop_stop_shingles'
    # (doc_id, hash) distinct exchange measured 2.4 -> 9.2 s min in a
    # 6-rep interleaved A/B at sf0.1: the HOF transform + array_distinct
    # subtree leaves whole-stage codegen, and unlike ngram (where the
    # SAME hashed array also feeds the posting-list agg, so the HOF cost
    # buys out three shuffles) the signature path here still needs the
    # raw string explode, so the HOF pass was pure added CPU. Kept the
    # exchange.
    sh = word_shingles(df, id_col, text_col, shingle_n, distinct=False)
    if max_df_frac is not None:
        sh = drop_stop_shingles(sh, df, id_col, max_df_frac, distinct_input=False)
    # no persist — r13 correction of the r12 note here: with bucket
    # enumeration there is NO ReusedExchange between the stop-DF branch
    # and the signature branch (they exchange on different keys), so the
    # scan→explode lineage does run twice. That is deliberate: r13
    # measured pinning the exploded table (min 1.599 vs 1.603, med
    # 1.887 vs 1.721), pinning a repartition("doc_id") that satisfies
    # both aggs' clustering (1.472/1.888), and an unpinned shared
    # repartition (1.529/1.635 and 1.381/1.768 across two sessions) —
    # all within noise or worse locally, and the repartition variants
    # shuffle shingle STRINGS where this shape shuffles 16-byte
    # (id, hash) pairs (guide §2.3), so they lose at corpus scale too.
    # The duplicated lineage is a cheap columnar scan + explode; the
    # narrow exchanges are the scarce resource.
    sig = minhash_signatures(sh, id_col, num_bands)
    melted = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"mh{b}").alias("sig"))
                    for b in range(num_bands)
                ]
            )
        ).alias("bs"),
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    # Bucket ENUMERATION instead of a banded self-equi-join (r12): the
    # a⋈b form physically computed the whole scan→shingle→stop-filter→
    # signature lineage TWICE — the planner broadcast one side (small
    # estimated size at bench SF), so there was no shuffled Exchange
    # for the other side to reuse, and each side owned a full copy of
    # the pipeline (plans/r12/dedup_minhash_lsh_before.txt: 14
    # Exchanges, 6 parquet scans, 0 ReusedExchange). Grouping each
    # (band, sig) bucket once and emitting its ordered pairs from the
    # collected id array evaluates the lineage exactly once, costs ONE
    # exchange where the join needed two-plus-broadcast, and makes the
    # hot-bucket cap a free size(ids) predicate instead of a separate
    # count agg + anti-join. Pair semantics are identical: sorted
    # bucket members, i<j combinations, global distinct.
    buckets = melted.groupBy("band", "sig").agg(
        F.array_sort(F.collect_list(F.col(id_col))).alias("_ids")
    )
    if max_bucket_docs is not None:
        buckets = buckets.where(F.size("_ids") <= max_bucket_docs)
    return (
        buckets.where(F.size("_ids") > 1)
        .select(F.explode(_ordered_pairs(F.col("_ids"))).alias("_p"))
        .select(F.col("_p.id_a").alias("id_a"), F.col("_p.id_b").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.1,
    max_df_frac: float | None = 0.2,
) -> DataFrame:
    """Exact Jaccard over word-n-gram shingle sets, inverted-index join.

    |A∩B| comes from the shingle self-join (only docs sharing a shingle
    ever meet — near-linear with the stop-shingle cap), |A|/|B| from a
    per-doc count, Jaccard = inter/(|A|+|B|-inter).

    Shingle size matters for cost: with a small vocabulary, bigrams are
    shared by most of the corpus (the self-join goes quadratic) while
    trigrams stay rare — measured 26× cheaper at sf0.1. Default n=3.
    The inverted index carries xxhash64(shingle) longs, not strings —
    intersection counts are identical, the shuffle is ~4× narrower.
    """
    # Bucket-enumeration inverted index (r12, guide §2/§3). Three
    # shuffles the old shape paid are gone:
    # - the per-doc DISTINCT exchange: the shingle set is built
    #   row-locally (array_distinct over the hashed shingle array);
    # - the self-join's two exchanges of the shingle table by shingle:
    #   ONE groupBy(shingle) collects each posting list, and the i<j
    #   pair emission happens on the collected array;
    # - the separate stop-shingle DF agg + broadcast anti-join: the
    #   document frequency IS size(_ids) of the posting list, so the
    #   stop cap becomes a free predicate on the same agg.
    # Posting lists are bounded by that cap (≤ max(5, n·max_df_frac)
    # docs): any corpus where pair generation is feasible at all keeps
    # buckets << √(pair budget), so the collect_list buffer is small by
    # construction. Pair semantics identical: sorted members, i<j.
    base = df.select(F.col(id_col), tokens(text_col).alias("w"))
    hashed = F.array_distinct(
        F.transform(shingle_array(F.col("w"), shingle_n), lambda s: F.xxhash64(s))
    )
    sh = base.select(F.col(id_col), F.explode(hashed).alias("shingle"))
    buckets = sh.groupBy("shingle").agg(
        F.array_sort(F.collect_list(F.col(id_col))).alias("_ids")
    )
    if max_df_frac is not None:
        total = df.agg(F.count(F.lit(1)).alias("_n"))
        buckets = (
            buckets.crossJoin(F.broadcast(total))
            .where(F.size("_ids") <= F.greatest(F.lit(5.0), F.col("_n") * max_df_frac))
            .select("_ids")
        )
    buckets = _pin(buckets)  # feeds the sizes agg AND the pair emission
    sizes = (
        buckets.select(F.explode("_ids").alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    inter = (
        buckets.where(F.size("_ids") > 1)
        .select(F.explode(_ordered_pairs(F.col("_ids"))).alias("_p"))
        .groupBy(F.col("_p.id_a").alias("id_a"), F.col("_p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "jaccard")
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """SimHash over whitespace tokens (occurrence-weighted).

    Each hex digit of md5(token) contributes 4 bits; per bit we sum
    ±1 votes across tokens, sign gives the fingerprint bit. One explode
    + one hash-agg; builds to a single BIGINT column.
    """
    assert bits % 4 == 0 and bits <= 64
    # NOTE (r13, negative result): a SWAR-packed vote aggregation
    # (replicate each 16-bit half of hv once via shift|or, 16 masked
    # ANDs -> 16 sum buffers + count; per-row expression count ~96 ->
    # ~22; fingerprints verified bit-identical on all docs) measured
    # FLAT in two interleaved sessions (fingerprint stage min
    # 0.823->0.806 then 1.066->1.108) — unlike r12's packed-counter
    # attempt it did remove the per-row extracts, and it still didn't
    # move: the explode + md5 and the downstream candidate join
    # dominate, not this agg. Kept the straightforward 32-sum form.
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    # Hoist ONE hash per token into a projection: the first bits/4 hex
    # chars of md5(tok) as a single integer. Putting md5 inside each of
    # the `bits` aggregate expressions would hash every token `bits`
    # times — the projection makes the aggs pure bit-shifts on a long.
    # Past 56 bits conv()'s decimal string overflows a signed long
    # cast, so wide fingerprints assemble from two conv halves — the
    # shiftleft wrap reproduces the same bit pattern, and the
    # arithmetic-shift + AND-1 bit extraction below is wrap-safe.
    ndig = bits // 4
    if ndig <= 14:
        hv_expr = F.conv(
            F.substring(F.md5(F.col("tok")), 1, ndig), 16, 10
        ).cast("long")
    else:
        hv_expr = F.shiftleft(
            F.conv(F.substring(F.md5(F.col("tok")), 1, ndig - 8), 16, 10)
            .cast("long"),
            32,
        ).bitwiseOR(
            F.conv(F.substring(F.md5(F.col("tok")), ndig - 7, 8), 16, 10)
            .cast("long")
        )
    hv = tok.select(F.col(id_col), hv_expr.alias("hv"))
    vote_aggs = []
    for i in range(bits):
        j = i // 4 + 1  # hex digit index, 1-based (leftmost = high bits)
        k = i % 4
        # bit k of hex digit j == bit (bits/4 - j)*4 + k of the packed int
        shift = (bits // 4 - j) * 4 + k
        bit = F.shiftright(F.col("hv"), shift).bitwiseAND(F.lit(1))
        vote_aggs.append(F.sum(bit * 2 - 1).alias(f"v{i}"))
    votes = hv.groupBy(id_col).agg(*vote_aggs)
    fp = None
    for i in range(bits):
        # bitwiseOR, not +: ANSI mode (the driver session default)
        # throws on the signed wrap a 64th-bit power literal needs
        term = F.when(
            F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp.bitwiseOR(term)
    return votes.select(F.col(id_col), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int | None = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: banded bucket join + hamming filter.

    With `bands` bands over `bits` bits, any pair within hamming
    distance < bands shares ≥1 exact band (pigeonhole) — so the
    bucket join finds all pairs with distance ≤ bands-1 without a
    cross join.

    THE SCALE KNOB IS THE BAND WIDTH: the bucket key space is
    bands·2^(bits/bands), a CONSTANT — once the corpus outgrows it,
    expected bucket occupancy n/2^width grows linearly and the bucket
    self-join's candidate count grows QUADRATICALLY (measured: the
    sf1→sf10 decade at fixed bits=32/width=8 runs at exponent 1.22,
    the width-16 rerun at 0.89 — artifacts/DEDUP_sf10_round12.json).
    `bits=None` (adaptive) counts the corpus and picks the narrowest
    width keeping expected occupancy ≤ ~4 docs (clamped to [8, 16]
    bits, i.e. 64-bit fingerprints at ≥ 2^18 docs), so the default
    stays pigeonhole-sound for `max_hamming < bands` while candidate
    growth stays linear until ~10^7 docs per 2^16-bucket band; at
    100 TB scale pass bands=6..8 with width 16 to push the linear
    range further (recall guarantee then covers hamming ≤ bands-1).
    Explicit `bits` pins the fingerprint exactly (the oracled queries
    do, for cross-engine reproducibility).
    """
    if bits is None:
        import math

        n = df.count()
        width = min(16, max(8, math.ceil(math.log2(max(n, 16) / 4))))
        # bits = bands*width must divide by 4 (md5 hex digits) and fit
        # in 64; bump width to the next size whose product divides by
        # 4, then clamp to the largest such width fitting 64 bits
        while (bands * width) % 4:
            width += 1
        cap = 64 // bands
        while cap > 0 and (bands * cap) % 4:
            cap -= 1
        if cap <= 0:
            raise ValueError(
                f"adaptive simhash cannot fit {bands} bands in a 64-bit "
                "fingerprint with 4-bit-aligned total width — pass an "
                "explicit `bits`"
            )
        width = min(width, cap)
        bits = bands * width
    assert bits % bands == 0
    width = bits // bands
    # NOTE (r12): bucket enumeration (collect_list per (band, bval) +
    # i<j emission, as in minhash_lsh_pairs) was tried here and
    # REVERTED — interleaved A/B at sf0.1 measured it consistently
    # slower (min 2.9 → 5.2 s): the fingerprint table is tiny (one
    # long per doc) and PINNED, so both join sides read the cache and
    # the banded join is nearly free, while the struct collect_list +
    # pair explode pays ObjectHashAggregate cost for no saved lineage.
    # Unlike minhash, there is no scale hazard to remove: at corpus
    # scale the cached fingerprint join becomes a sort-merge join on
    # the band key, never a rebuild of the token-vote lineage.
    fp = _pin(simhash(df, id_col, text_col, bits))
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bval"),
            )
            for b in range(bands)
        ]
    )
    melted = fp.select(id_col, "simhash", F.explode(band_arr).alias("bs")).select(
        id_col, "simhash", F.col("bs.band").alias("band"), F.col("bs.bval").alias("bval")
    )
    a, b = melted.alias("a"), melted.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)


def minhash_lsh_pairs_ml(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hash_tables: int = 8,
    jaccard_threshold: float = 0.5,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Candidate near-dup pairs via Spark ML's MinHashLSH — the
    built-in alternative to the md5-banded implementation above.

    Pipeline: shingles → HashingTF sparse vectors (set semantics,
    binary=True) → MinHashLSH.approxSimilarityJoin, whose output
    distance is (1 - estimated Jaccard). Kept as an operator (tested
    against the hand-rolled banding for overlap) rather than an
    oracle query: MinHashLSH's hash family is JVM-seeded, so DuckDB
    cannot reproduce the candidate set bit-for-bit, which is exactly
    why the oracle path uses md5 banding instead.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = word_shingles(df, id_col, text_col, shingle_n, distinct=True)
    docs = sh.groupBy(id_col).agg(F.collect_list("shingle").alias("shingles"))
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(docs).where(F.expr("size(shingles) > 0"))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, threshold=1.0 - jaccard_threshold, distCol="jaccard_dist"
    )
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("a_id"),
            F.col(f"datasetB.{id_col}").alias("b_id"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("est_jaccard"),
        )
        .where(F.col("a_id") < F.col("b_id"))
    )
