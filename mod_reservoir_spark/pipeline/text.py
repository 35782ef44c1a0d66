"""Text analysis operators for large-scale training-data pipelines.

All of these are pure Spark column expressions (JVM-side, whole-stage
codegen — no Python in the hot path) and each has an exact ANSI-SQL
equivalent so the DuckDB oracle can pin the semantics.

Cross-engine exactness: every ratio is emitted as integer
**parts-per-million** computed with exact long arithmetic
(`(n*1_000_000 - mod) / d`), never as a rounded double — Spark rounds
HALF_UP, DuckDB half-even, so emitting doubles would make value-hash
comparison flaky on exact halves. Counts are longs; fingerprints are
md5 hex strings.

Operators: tokenization + token stats, quality scoring, language ID
(stopword-vote heuristic), document fingerprinting (normalized md5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Stopword votes per language for the language-ID heuristic. Tiny on
# purpose: the operator contract is "deterministic votes over a fixed
# table", not linguistic accuracy; swap in a real profile table for
# production use.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "un"),
    "fr": ("le", "la", "de", "et", "que", "des", "un"),
    "de": ("der", "die", "das", "und", "zu", "ein", "ist"),
    "zh": ("de", "shi", "le", "zai", "he", "you", "wo"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text; empty tokens dropped.
    SQL equivalent: list_filter(regexp_split_to_array(lower(x),'\\s+'),
    t -> t <> '')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def ppm(n: Column, d: Column) -> Column:
    """Exact floor(n * 1e6 / d) using only long ops (no FP division).
    SQL equivalent: n * 1000000 // d (DuckDB integer division)."""
    scaled = n.cast("long") * F.lit(1000000).cast("long")
    d = d.cast("long")
    return ((scaled - (scaled % d)) / d).cast("long")


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics (token counting operator)."""
    t = tokens(text_col)
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        F.length(text_col).alias("n_chars_measured"),
        ppm(
            F.length(F.concat_ws("", t)), F.greatest(F.size(t), F.lit(1))
        ).alias("avg_token_len_ppm"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, punctuation density, stopword ratio,
    repetition (distinct/total tokens) — the usual pretraining quality
    filters; all ratios as exact ppm longs."""
    t = tokens(text_col)
    n_tokens = F.size(t)
    stop = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop, x)))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    distinct_ppm = ppm(
        F.size(F.array_distinct(t)), F.greatest(n_tokens, F.lit(1))
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        ppm(n_punct, F.greatest(F.length(text_col), F.lit(1))).alias(
            "punct_ppm"
        ),
        ppm(n_stop, F.greatest(n_tokens, F.lit(1))).alias("stopword_ppm"),
        distinct_ppm.alias("distinct_ppm"),
        ((F.length(text_col) >= 100) & (distinct_ppm > 200000)).alias(
            "passes_quality"
        ),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: for each candidate language, count
    tokens in its stopword list; argmax wins, ties broken by language
    code ascending (deterministic). Pure expressions — the per-language
    scores become a struct array sorted by (-score, lang)."""
    t = tokens(text_col)
    entries = []
    for lang in sorted(LANG_STOPWORDS):
        stop = F.array([F.lit(w) for w in LANG_STOPWORDS[lang]])
        score = F.size(F.filter(t, lambda x: F.array_contains(stop, x)))
        entries.append(F.struct((-score).alias("neg"), F.lit(lang).alias("lang")))
    best = F.array_sort(F.array(*entries)).getItem(0)
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        best["lang"].alias("lang_detected"),
        (-best["neg"]).cast("long").alias("vote_count"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the whitespace-normalized
    lowercased text — the cheap exact-dedup key. (The reference's
    600-char match-value truncation applies upstream if fingerprints
    feed the clustering edge table.)"""
    normalized = F.concat_ws(" ", tokens(text_col))
    return docs.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        F.length(normalized).alias("n_chars_normalized"),
    )
