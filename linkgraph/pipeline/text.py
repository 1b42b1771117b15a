"""Text analysis over a documents table — all JVM-side Catalyst exprs.

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length/punctuation/stopword ratios), n-gram-heuristic language ID,
document fingerprinting (normalized md5 + polynomial rolling hash).
Every function takes ``(df, id_col, text_col)`` and returns a DataFrame
keyed by ``id_col`` — composable as pipeline stages that preserve the
sha256(content) row invariant (they never rewrite the text column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-ish pretokenizer: word pieces, numbers, or single non-space symbols
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

# tiny deterministic marker lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "los", "que"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "les", "des", "est"),
}


def _words(text_col: str):
    return F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != "")


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, ws_tokens, bpe_tokens)."""
    return df.select(
        F.col(id_col),
        F.size(_words(text_col)).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), F.lit(0)))
        .cast("long")
        .alias("bpe_tokens"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_words, avg_word_len, punct_ratio, stopword_ratio, quality).

    quality ∈ [0,1]: simple monotone mix of length and cleanliness, the
    standard pre-training filter shape (public heuristics: word count in
    range, low punctuation density, some stopwords present).
    """
    words = _words(text_col)
    n_chars = F.length(F.col(text_col)).cast("long")
    n_words = F.size(words).cast("long")
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    avg_wl = F.when(n_words > 0, (F.length(F.regexp_replace(F.col(text_col), r"\s+", "")) / n_words)).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    quality = (
        F.when(n_words >= 20, F.lit(0.4)).otherwise(n_words / 50.0)
        + F.when(punct_ratio < 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.least(stop_ratio * 3.0, F.lit(0.3))
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        avg_wl.cast("double").alias("avg_word_len"),
        punct_ratio.cast("double").alias("punct_ratio"),
        stop_ratio.cast("double").alias("stopword_ratio"),
        quality.cast("double").alias("quality"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, lang_pred) — marker-word-count heuristic, deterministic.

    Ties resolve in the fixed order en > es > de > fr > unknown.
    """
    words = F.transform(_words(text_col), lambda w: F.lower(w))
    structs = []
    for i, (lang, markers) in enumerate(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
        structs.append(
            F.struct(score.alias("s"), F.lit(-i).alias("p"), F.lit(lang).alias("lang"))
        )
    best = F.array_max(F.array(*structs))  # lexicographic: score, then priority
    return df.select(
        F.col(id_col),
        F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("unknown")).alias("lang_pred"),
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, norm_md5, roll_hash).

    norm_md5: md5 of lowercase text with punctuation stripped and
    whitespace collapsed — near-dup-canonical form. roll_hash:
    polynomial rolling hash over word hashes modulo the Mersenne prime
    2^31-1 (acc·31 + (xxhash64(word) mod M), all mod M) computed with
    ``F.aggregate`` — no Python, and no long overflow under ANSI mode
    (acc < 2^31 so acc·31 + h < 2^36).
    """
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col(text_col)), r"[^\w\s]", ""), r"\s+", " ")
    )
    M = F.lit(2147483647).cast("long")  # 2^31 - 1
    roll = F.aggregate(
        _words(text_col),
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(acc * F.lit(31).cast("long") + F.pmod(F.xxhash64(w), M), M),
    )
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("norm_md5"),
        roll.alias("roll_hash"),
    )
