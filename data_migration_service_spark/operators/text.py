"""Text-analysis operators for corpus pipelines: token counting, quality
scoring, language ID, document fingerprinting.

All pure `pyspark.sql.functions` expressions (whole-stage codegen; no Python
on the hot path) with exact ANSI-SQL twins for the oracle. Heuristics are
deliberately simple + deterministic — the point is the distributed plumbing
and engine/oracle agreement, not linguistic accuracy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (space-delimited match)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "y"],
}
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def tokens(text_col) -> F.Column:
    c = text_col if not isinstance(text_col, str) else F.col(text_col)
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy: ceil(chars/4) subword estimate."""
    return df.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("n_tokens"),
        F.ceil(F.length(text_col) / 4).cast("long").alias("n_subwords_est"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length / punctuation / stopword / repetition signals -> one score.

    score = 0.4*len_norm + 0.3*(1-punct_ratio) + 0.3*stopword_ratio, rounded
    to 4 decimals (float portability with the oracle).
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = F.size(tokens(text_col))
    punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.filter(tokens(text_col), lambda tok: F.lower(tok).isin(EN_STOPWORDS))
    )
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    len_norm = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        # +1e-9 before rounding: Spark rounds the double's shortest decimal
        # repr HALF_UP while other engines round the exact binary value —
        # exact .XXXX5 ties would diverge; the epsilon breaks ties identically
        F.round(punct_ratio + 1e-9, 4).alias("punct_ratio"),
        F.round(stop_ratio + 1e-9, 4).alias("stopword_ratio"),
        F.round(0.4 * len_norm + 0.3 * (1 - punct_ratio) + 0.3 * stop_ratio + 1e-9, 4)
        .alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word vote: language with the most marker hits (ties + zero ->
    'unk'). Deterministic and SQL-portable."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        score_cols.append(
            F.size(F.filter(toks, lambda t: t.isin(markers))).alias(f"score_{lang}")
        )
    scored = df.select(F.col(id_col), *score_cols)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    n_best = sum(
        [F.when(F.col(f"score_{l}") == best, 1).otherwise(0) for l in langs]
    )
    guess = F.when((best > 0) & (n_best == 1), F.coalesce(
        *[F.when(F.col(f"score_{l}") == best, F.lit(l)) for l in langs]
    )).otherwise(F.lit("unk"))
    return scored.select(F.col(id_col), guess.alias("lang_guess"))


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """Winnowing-style fingerprint: min sha256 over character k-grams — a
    1-hash MinHash; stable under small edits away from the minimum shingle."""
    from data_migration_service_spark.operators.dedup import shingles

    sh = shingles(df, id_col, text_col, k)
    return sh.groupBy(id_col).agg(
        F.min(F.sha2(F.col("shingle"), 256)).alias("fingerprint")
    )
