"""Entity-link scoring: mention -> best candidate entity.

Deterministic scoring, fully vectorized (Column expressions; the candidate
dictionary is an explicit broadcast join):

    score = prior + 0.2 * doc_affinity(doc_id, entity_id)

where doc_affinity is a stable hash-derived value in [0,1) — a deterministic
stand-in for a context-similarity model that still exercises the real
plumbing (broadcast candidate fan-out, per-mention argmax window).

Argmax per mention via max(struct(score, entity_id)) aggregation — a single
hash aggregation with map-side partial combine (no per-mention window sort;
at 10^12 docs a row_number window over billions of 2-row partitions is pure
shuffle+sort overhead).  Ties resolve to the larger entity_id —
deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.dedup import md5_int
from .synth import lexicon_df


def doc_affinity(doc_col, ent_col):
    """Deterministic [0,1) affinity from a PORTABLE hash (md5 prefix — same
    value computable in DuckDB/any engine, unlike xxhash64), so the full
    pipeline output is oracle-checkable end to end."""
    return md5_int(F.concat_ws("|", doc_col, ent_col)) % 1000 / 1000.0


def link_entities(spark: SparkSession, mentions: DataFrame) -> DataFrame:
    """-> links(doc_id, span_idx, token_idx, surface, offset, entity_id, score)."""
    cands = lexicon_df(spark)
    scored = mentions.join(F.broadcast(cands), "surface", "inner").withColumn(
        "score",
        F.col("prior") + 0.2 * doc_affinity(F.col("doc_id"), F.col("entity_id")),
    )
    best = scored.groupBy("doc_id", "span_idx", "token_idx", "surface", "offset").agg(
        F.max(F.struct(F.col("score"), F.col("entity_id"))).alias("_best")
    )
    return best.select(
        "doc_id", "span_idx", "token_idx", "surface", "offset",
        F.col("_best.entity_id").alias("entity_id"),
        F.col("_best.score").alias("score"),
    )
