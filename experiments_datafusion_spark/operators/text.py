"""Text analysis for large-scale training-data pipelines: tokenization,
quality scoring, language ID, fingerprinting (north-star extension —
SURVEY.md §2B last row).

Everything is built from JVM-side Column expressions (split / higher-order
list functions / regexp) — no Python UDFs — so the hot path stays inside
whole-stage codegen and scales linearly with executors. The same constants
(stopword lists, regexes, hash recipe) are exported for oracle-SQL
generation so DuckDB computes bit-identical results.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# --- shared constants (Spark + oracle SQL) ---------------------------------

WS_SPLIT = r"\s+"
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks
BPE_TOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT = r"[^A-Za-z0-9\s]"
DIGIT = r"[0-9]"

# tiny public stopword lists; the *heuristic* is what matters, not the lists
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "it", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"),
    "es": ("el", "la", "los", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "les", "des", "et", "une", "est", "que", "pour", "dans", "sur"),
}
LANG_ORDER = tuple(sorted(STOPWORDS))  # deterministic argmax tie-break

SHINGLE_K = 3  # 3-word shingles for fingerprint/dedup


def words(col) -> Column:
    """Whitespace tokens, empty strings removed."""
    return F.filter(F.split(col, WS_SPLIT), lambda w: w != "")


def token_count(col) -> Column:
    return F.size(words(col))


def bpe_token_count(col) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / punct)."""
    return F.regexp_count(col, F.lit(BPE_TOKEN))


def char_count(col) -> Column:
    return F.length(col)


def avg_word_len(col) -> Column:
    w = words(col)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(w) > 0, total.cast("double") / F.size(w)).otherwise(F.lit(0.0))


def punct_ratio(col) -> Column:
    n_punct = F.length(col) - F.length(F.regexp_replace(col, PUNCT, ""))
    return F.when(F.length(col) > 0, n_punct.cast("double") / F.length(col)).otherwise(0.0)


def digit_ratio(col) -> Column:
    n_dig = F.length(col) - F.length(F.regexp_replace(col, DIGIT, ""))
    return F.when(F.length(col) > 0, n_dig.cast("double") / F.length(col)).otherwise(0.0)


def stopword_ratio(col, lang: str = "en") -> Column:
    w = words(col)
    hits = F.size(F.filter(w, lambda x: F.lower(x).isin(*STOPWORDS[lang])))
    return F.when(F.size(w) > 0, hits.cast("double") / F.size(w)).otherwise(0.0)


def quality_score(col) -> Column:
    """Composite quality heuristic in [0,1]: rewards mid-length documents
    and prose-like stopword density, penalizes punctuation/digit noise.
    (Shape follows public quality-filter heuristics: length + symbol-ratio
    + stopword checks.)"""
    length_score = F.least(token_count(col).cast("double") / 100.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(col, "en") * 5.0, F.lit(1.0))
    noise = F.least(punct_ratio(col) * 5.0 + digit_ratio(col) * 2.0, F.lit(1.0))
    return F.round(0.4 * length_score + 0.4 * stop_score + 0.2 * (1.0 - noise), 6)


def lang_scores(col) -> dict[str, Column]:
    """Per-language stopword-hit ratio (the n-gram-ish language-ID
    heuristic: vote by function words)."""
    return {lang: stopword_ratio(col, lang) for lang in LANG_ORDER}


def lang_id(col) -> Column:
    """argmax over lang_scores with deterministic alphabetical tie-break;
    'und' (undetermined) when no stopword hits at all."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values()) if len(scores) > 1 else next(iter(scores.values()))
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):  # earlier langs win ties -> apply last
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def normalized(col) -> Column:
    """Canonical text form for exact-dup detection: lowercase, strip
    punctuation, collapse whitespace."""
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(col), PUNCT, ""), WS_SPLIT, " "))


def fingerprint_md5(col) -> Column:
    """Whole-document fingerprint of the normalized text."""
    return F.md5(normalized(col))


def shingles(col, k: int = SHINGLE_K) -> Column:
    """Distinct k-word shingles (the MinHash/Jaccard unit).

    Built from k aligned slices combined with zip_with — O(k*n) per doc.
    (The obvious transform(sequence, i -> slice(w, i, k)) is O(n^2): one
    array copy per window position; at ~60us/posting that was the single
    hottest expression in the dedup pipelines.)

    Short docs (< k words) short-circuit to an empty array: Spark's
    sequence/slice semantics differ from DuckDB's generate_series there."""
    w = words(col)
    m = F.size(w) - (k - 1)  # number of windows
    parts = [F.slice(w, i + 1, m) for i in range(k)]
    joined = parts[0]
    for p in parts[1:]:
        joined = F.zip_with(joined, p, lambda acc, x: F.concat(acc, F.lit(" "), x))
    return F.when(F.size(w) >= k, F.array_distinct(joined)).otherwise(
        F.array().cast("array<string>")
    )


def hash64(col) -> Column:
    """Portable 60-bit hash: first 15 hex digits of md5 as int64. Identical
    in DuckDB: CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fast_hash64(col) -> Column:
    """Production 64-bit hash: xxhash64 — a JVM intrinsic that stays inside
    whole-stage codegen with no hex string round-trip.  ~40% faster than
    hash64 on the fingerprint tier (BENCH_NOTES.md winnowing A/B) but NOT
    replayable in DuckDB, so oracled keys keep hash64; the `*_fast` twins
    ship this one and are pinned to identical pair recall in
    tests/test_hash_knob.py."""
    return F.xxhash64(col)


def rolling_fingerprint(col, k: int = SHINGLE_K) -> Column:
    """Content-sensitive 64-bit fingerprint: min shingle hash (a 1-function
    MinHash) — stable under small reorderings, cheap to compare at scale."""
    return F.array_min(F.transform(shingles(col, k), hash64))
