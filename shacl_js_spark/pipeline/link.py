"""Entity-link scoring: mention -> best candidate entity.

Deterministic scoring, fully vectorized (Column expressions; the candidate
dictionary is an explicit broadcast join):

    score = prior + 0.2 * doc_affinity(doc_id, entity_id)

where doc_affinity is a stable hash-derived value in [0,1) — a deterministic
stand-in for a context-similarity model that still exercises the real
plumbing (broadcast candidate fan-out, per-mention argmax window).

Argmax per mention via a window over (doc_id, span_idx, token_idx) ordered by
(score desc, entity_id) — the tiebreak makes results reproducible at any
parallelism.  Window partitions by doc_id-derived keys, so skew from hot
surfaces stays bounded by documents-per-partition, not surface frequency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .synth import lexicon_df


def link_entities(spark: SparkSession, mentions: DataFrame) -> DataFrame:
    """-> links(doc_id, span_idx, token_idx, surface, offset, entity_id, score)."""
    cands = lexicon_df(spark)
    scored = mentions.join(F.broadcast(cands), "surface", "inner").withColumn(
        "score",
        F.col("prior")
        + 0.2 * (F.pmod(F.xxhash64("doc_id", "entity_id"), F.lit(1000)) / 1000.0),
    )
    w = Window.partitionBy("doc_id", "span_idx", "token_idx").orderBy(
        F.col("score").desc(), F.col("entity_id")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "prior")
    )
