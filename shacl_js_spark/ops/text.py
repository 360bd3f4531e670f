"""Text analysis operators over the `documents` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.  All pure
Column expressions (whole-stage codegen; zero Python in the row path)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-"language" marker lexicons for the n-gram/stopword-ratio heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "fast", "slow", "small"],
    "sql": ["join", "filter", "query", "table", "scan", "merge", "sort", "group", "order"],
    "data": ["spark", "stream", "batch", "row", "data", "value", "key", "hash", "window"],
}

STOPWORDS = ["the", "a", "of", "and"]


def token_stats(df: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    return df.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: t != "")).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        # BPE-ish subword proxy: ceil(chars/4) is the classic rule of thumb
        F.ceil(F.length("text") / 4).cast("long").alias("n_tokens_bpe_est"),
    )


def _ratio(toks, members: list[str]):
    return F.size(F.filter(toks, lambda t: t.isin(members))) / F.greatest(
        F.size(toks), F.lit(1)
    )


def quality_score(df: DataFrame) -> DataFrame:
    """Length/punct/stopword heuristics -> quality in [0,1] (rounded)."""
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(F.filter(toks, lambda t: t != ""))
    avg_len = F.length("text") / F.greatest(n_tok, F.lit(1))
    stop_ratio = _ratio(toks, STOPWORDS)
    alpha_ratio = F.length(F.regexp_replace("text", "[^a-zA-Z ]", "")) / F.greatest(
        F.length("text"), F.lit(1)
    )
    score = (
        0.4 * F.least(n_tok / F.lit(64.0), F.lit(1.0))
        + 0.2 * F.least(avg_len / F.lit(8.0), F.lit(1.0))
        + 0.2 * (1 - F.least(stop_ratio * 4, F.lit(1.0)))
        + 0.2 * alpha_ratio
    )
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(df: DataFrame) -> DataFrame:
    """Marker-lexicon ratio heuristic; argmax over LANG_MARKERS with
    deterministic key tiebreak."""
    toks = F.split(F.col("text"), " ")
    scores = {lang: _ratio(toks, words) for lang, words in LANG_MARKERS.items()}
    pred = None
    # argmax via chained CASE (stable: earlier key wins ties in sorted order)
    for lang in sorted(scores):
        cond = None
        for other in sorted(scores):
            if other == lang:
                continue
            c = scores[lang] >= scores[other] if other > lang else scores[lang] > scores[other]
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return df.select(
        "doc_id",
        pred.otherwise(F.lit("unk")).alias("lang_pred"),
        *[F.round(scores[lang], 6).alias(f"score_{lang}") for lang in sorted(scores)],
    )


def fingerprint(df: DataFrame) -> DataFrame:
    """Deterministic content fingerprint: md5 over the normalized text
    (lowercase, collapsed whitespace) + a 64-bit polynomial-style prefix."""
    norm = F.regexp_replace(F.lower(F.col("text")), "\\s+", " ")
    return df.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("decimal(20,0)").cast("string").alias("fp_int"),
    )
