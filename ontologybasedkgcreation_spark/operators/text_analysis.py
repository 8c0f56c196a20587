"""Text-analysis operators: language-ID, quality scoring, token stats,
document fingerprinting.  All pure ``pyspark.sql.functions`` — whole-stage
codegen, zero Python.  These run ahead of KG extraction in a web-scale
ingest (the language gate of FIXTURES.md §1 uses lang_id when the source
table lacks a lang column)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = [
    "the", "a", "an", "of", "and", "to", "in", "that", "it", "is", "was",
    "for", "on", "with", "as", "by", "at", "from",
]


def _tokens(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )


def lang_id(
    df: DataFrame, id_col: str, text_col: str, en_threshold: float = 0.05
) -> DataFrame:
    """n-gram/stopword heuristic language ID: fraction of tokens that are
    English stopwords.  >= threshold -> 'en', else 'unk' (a real deployment
    plugs a fastText-style model into the same column contract)."""
    toks = _tokens(text_col)
    sw = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    hits = F.size(
        F.filter(toks, lambda t: F.array_contains(sw, t))
    )
    ratio = hits / F.greatest(F.size(toks), F.lit(1))
    return df.select(
        F.col(id_col),
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when(ratio >= en_threshold, F.lit("en"))
        .otherwise(F.lit("unk"))
        .alias("lang_pred"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length / punctuation / word-shape quality features + a composite
    keep/drop score (the Gopher-style rule family, computed columnar)."""
    toks = _tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    mean_word_len = n_chars / F.greatest(n_tokens, F.lit(1))
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    sw = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / F.greatest(
        n_tokens, F.lit(1)
    )
    keep = (
        (n_tokens >= 10)
        & (mean_word_len >= 2)
        & (mean_word_len <= 12)
        & (punct_ratio <= 0.3)
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        keep.cast("int").alias("keep"),
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace + BPE-ish token counts per document.  The BPE-ish count is
    the standard chars/4 upper bound refined by a word/punct regex — a
    deterministic proxy for tokenizer load estimation."""
    toks = _tokens(text_col)
    bpe_ish = F.size(
        F.filter(
            F.split(F.col(text_col), r"(?=[^\w])|(?<=[^\w])"),
            lambda t: F.trim(t) != "",
        )
    )
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_ws_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        bpe_ish.alias("n_bpeish_tokens"),
    )


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set — cheap bag-of-words identity for cross-snapshot dedup."""
    toks = _tokens(text_col)
    return df.select(
        F.col(id_col),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
        ).alias("fingerprint"),
    )
