"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All pure Column expressions (JVM-side, whole-stage codegen) — no Python
UDFs: at 100 TB these run inside the scan stage at parquet speed, and a
DuckDB oracle can reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dl_datalake_spark.operators.dedup import tokens

# tiny per-language stopword signatures for the n-gram heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "和"],
}

PUNCT_CLASS = "[.,!?;:]"


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(tokens(text_col)))


# GPT-2-style pre-tokenizer shape, constrained to RE2-compatible syntax
# (no lookaheads — DuckDB's regex engine lacks them, and the oracle
# must reproduce counts exactly): a leading-space word run, digit run,
# or punctuation run per match. Counts approximate BPE pre-token counts
# the way pretraining token-budget estimates do.
BPE_TOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def with_bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token-budget estimator: count BPE-ish pre-tokens with one
    regexp_count — scan-stage, no explode, no UDF."""
    return df.withColumn(
        "n_bpe_tokens", F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_PATTERN))
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword heuristics → quality in [0,1].

    Mirrors the shape of published pretraining-quality filters
    (length bounds, symbol ratio, stopword presence) with a
    deterministic closed-form score.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    mean_tok_len = F.round((n_chars - (n_tokens - 1)) / n_tokens, 6)
    stop_hits = F.size(
        F.filter(toks, lambda w: F.lower(w).isin(*LANG_STOPWORDS["en"]))
    )
    score = (
        F.when(n_tokens < 5, F.lit(0.0))
        .otherwise(
            F.round(
                0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
                + 0.3 * (F.lit(1.0) - F.least(punct / F.greatest(n_chars, F.lit(1)), F.lit(1.0)))
                + 0.3 * F.least(stop_hits / F.greatest(n_tokens, F.lit(1)) * 10, F.lit(1.0)),
                6,
            )
        )
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("punct_count", punct)
        .withColumn("mean_token_len", mean_tok_len)
        .withColumn("quality", score)
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: argmax over per-language hit counts.

    Ties break alphabetically (deterministic). greatest() over the
    per-language struct(score, lang) does the argmax in one expression.
    """
    toks = tokens(text_col)

    def hits_for(words: list[str]):
        # NB: a plain `lambda w, lang=lang: ...` breaks here — Spark
        # treats a 2-arg lambda as (element, index) and would bind the
        # index Column to the default arg. Use a closure factory.
        return F.size(F.filter(toks, lambda w: F.lower(w).isin(*words)))

    scored = []
    for lang in sorted(LANG_STOPWORDS):
        hits = hits_for(LANG_STOPWORDS[lang])
        scored.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # greatest over structs compares hits first, then lang string;
    # invert lang for ties by choosing max hits then MIN lang:
    arr = F.array(*scored)
    max_hits = F.array_max(F.transform(arr, lambda s: s["hits"]))
    pred = F.array_min(
        F.transform(F.filter(arr, lambda s: s["hits"] == max_hits), lambda s: s["lang"])
    )
    return df.withColumn("pred_lang", pred).withColumn("lang_score", max_hits)


def normalize_text(text_col: str = "text"):
    """Canonical text normalization: lower-case, strip punctuation,
    collapse whitespace runs to a single space. Pure Column expression
    (scan-stage, codegen); DuckDB reproduces it with the same two
    regexp_replace calls."""
    return F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), PUNCT_CLASS, ""),
        r"\s+",
        " ",
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalization-invariant document fingerprint: md5 of
    lower-cased, whitespace-collapsed, punctuation-stripped text."""
    return df.withColumn("fingerprint", F.md5(normalize_text(text_col)))


# PII patterns, deliberately conservative (precision over recall —
# at pretraining scale a false positive deletes good text forever,
# a false negative is caught by the next pipeline pass). Java-regex
# syntax kept RE2-compatible so any engine can reproduce the scrub.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IPV4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "PHONE": r"\+?\d[\d\- ()]{7,}\d",
}


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / phone-like digit runs with typed
    placeholders; report per-type hit counts.

    Column-expression only (regexp_replace / regexp_count chain runs in
    whole-stage codegen inside the scan stage — the scrub is free at
    100 TB relative to the read). Order matters: emails first so their
    digits aren't half-eaten by the phone rule.
    """
    scrubbed = F.col(text_col)
    for tag in ("EMAIL", "IPV4", "PHONE"):
        pat = PII_PATTERNS[tag]
        df = df.withColumn(f"n_{tag.lower()}", F.regexp_count(scrubbed, F.lit(pat)))
        scrubbed = F.regexp_replace(scrubbed, pat, f"[{tag}]")
    return df.withColumn("text_scrubbed", scrubbed).withColumn(
        "n_pii",
        F.col("n_email") + F.col("n_ipv4") + F.col("n_phone"),
    )


ROLL_BASE = 131
ROLL_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne): products stay << 2^63


def with_rolling_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive polynomial rolling hash over the token stream:
    h = (h·B + hash(tok)) mod M, folded left-to-right with
    F.aggregate — the Rabin-Karp fingerprint, all JVM-side.

    Complements the md5 `with_fingerprint` (content-set identity): the
    rolling hash changes when token ORDER changes, the property
    incremental/streaming fingerprinting and chunk-boundary detection
    rely on. Modulus 2^31-1 keeps every intermediate well inside long
    range under ANSI arithmetic.
    """
    toks = tokens(text_col)
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * ROLL_BASE + F.pmod(F.xxhash64(t), F.lit(ROLL_MOD)))
        % ROLL_MOD,
    )
    return df.withColumn("rolling_fp", fp)
