"""Text-analysis operators: language ID, quality scoring, token stats,
document fingerprinting.  All pure built-in Catalyst expressions (no
Python in the row path) — they run inside whole-stage codegen and scale
to any corpus size with zero shuffle (narrow, per-row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language marker-word lists for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "value", "table", "data", "fast"],
    "de": ["der", "die", "und", "nicht", "wert"],
    "fr": ["le", "la", "et", "les", "valeur"],
}


def _tokens(col: Column) -> Column:
    return F.split(F.lower(col), r"\s+")


def language_id(df: DataFrame, text_col: str = "text",
                out_col: str = "pred_lang") -> DataFrame:
    """Stopword-overlap language ID: argmax over marker-hit ratios.

    Vectorized as array-intersection sizes — one pass, no UDF.
    """
    toks = _tokens(F.col(text_col))
    scores = [
        (lang,
         F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
         / F.greatest(F.size(toks), F.lit(1)))
        for lang, words in _LANG_MARKERS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    pred = F.when(best <= 0, F.lit("unknown"))
    for lang, s in scores:
        pred = pred.when(s == best, F.lit(lang))
    return df.withColumn(out_col, pred)


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (words + punctuation marks + digit groups via regexp counts)."""
    toks = _tokens(F.col(text_col))
    return (df
            .withColumn("n_tokens", F.size(toks))
            .withColumn("n_distinct_tokens", F.size(F.array_distinct(toks)))
            .withColumn("n_subwords",
                        F.size(toks)
                        + F.length(F.regexp_replace(F.col(text_col),
                                                    r"[^.,;:!?]", ""))
                        + F.size(F.split(F.col(text_col), r"\d+")) - 1))


def quality_score(df: DataFrame, text_col: str = "text",
                  out_col: str = "quality") -> DataFrame:
    """Quality heuristic in [0,1]: length band + lexical diversity +
    low punctuation density (the usual pretraining-filter features)."""
    toks = _tokens(F.col(text_col))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    diversity = F.size(F.array_distinct(toks)) / n_tok
    punct = (F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?#@<>{}]", ""))
             / F.greatest(F.length(text_col), F.lit(1)))
    len_ok = F.when((F.length(text_col) >= 20)
                    & (F.length(text_col) <= 100_000), 1.0).otherwise(0.2)
    score = (0.4 * len_ok + 0.4 * diversity + 0.2 * (1 - F.least(punct * 5, F.lit(1.0))))
    return df.withColumn(out_col, F.round(score, 4))


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fingerprint") -> DataFrame:
    """Content-defined document fingerprint: md5 of the sorted distinct
    token set — whitespace/order-insensitive duplicate detector."""
    toks = F.array_sort(F.array_distinct(_tokens(F.col(text_col))))
    return df.withColumn(out_col, F.md5(F.array_join(toks, " ")))
