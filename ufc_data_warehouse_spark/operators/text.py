"""Text-analysis operators for training-data curation.

All pure Column expressions (split/regexp/agg) — JVM-side, shuffle-free
per-document map work except the explicitly-noted aggregations. Outputs are
integer/string-typed wherever possible so cross-engine hash comparison is
exact (no float-accumulation-order sensitivity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text, tokens

# Tiny English function-word list for the n-gram-free language heuristic.
EN_STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "on"]


def token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc token counts: (id, n_tokens, n_unique_tokens, n_chars_norm).

    Token counting = whitespace split of the normalized text; a BPE-ish
    subword estimate is ``n_chars_norm / 4`` (byte-pair piece length ≈ 4
    chars for English) — kept as the raw char count so consumers pick
    their own divisor. Map-only: no shuffle.
    """
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.length(normalized_text(F.col(text_col))).alias("n_chars_norm"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-ratio language heuristic: (id, n_tokens, stop_tokens,
    lang_guess). ``en`` when ≥5%% of tokens are English function words,
    else ``und``. Integer arithmetic → engine-exact."""
    toks = tokens(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    stop_count = F.size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        stop_count.alias("stop_tokens"),
        F.when(stop_count * 20 >= F.size(toks), "en").otherwise("und").alias("lang_guess"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Integer quality score 0-3: (id, len_ok, diversity_ok, alpha_ok,
    quality). One point each for: length in [100, 20000] chars; unique
    token ratio ≥ 20%%; alphabetic-char ratio ≥ 60%%. All ratio tests use
    cross-multiplied integer comparisons (no float rounding)."""
    norm = normalized_text(F.col(text_col))
    toks = tokens(F.col(text_col))
    n_chars = F.length(norm)
    n_alpha = F.length(F.regexp_replace(norm, r"[^a-z]", ""))
    len_ok = F.when((n_chars >= 100) & (n_chars <= 20000), 1).otherwise(0)
    div_ok = F.when(F.size(F.array_distinct(toks)) * 5 >= F.size(toks), 1).otherwise(0)
    alpha_ok = F.when(n_alpha * 5 >= n_chars * 3, 1).otherwise(0)
    return df.select(
        F.col(id_col).alias("id"),
        len_ok.alias("len_ok"),
        div_ok.alias("diversity_ok"),
        alpha_ok.alias("alpha_ok"),
        (len_ok + div_ok + alpha_ok).alias("quality"),
    )
