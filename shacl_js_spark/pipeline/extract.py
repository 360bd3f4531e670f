"""Mention detection over interleaved span sequences.

Vectorized, JVM-side: posexplode spans -> tokenize text spans -> broadcast
semi-join against the entity lexicon.  Emits one row per lexicon token
occurrence with full provenance (doc_id, span_idx, token_idx, offset) so the
span-sequence invariant is verifiable at every stage.

At 10^12-doc scale: documents are range-partitioned by doc_id; this stage is
embarrassingly parallel (narrow after the scan), and the lexicon join is an
explicit broadcast (KB-sized dictionary vs TB-sized corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .synth import lexicon_grouped_df


def explode_spans(docs: DataFrame) -> DataFrame:
    """documents(doc_id, spans[]) -> one row per span, order-preserving."""
    return docs.select(
        "doc_id",
        F.posexplode("spans").alias("span_idx", "span"),
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def extract_mentions(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """-> mentions(doc_id, span_idx, token_idx, surface, offset)."""
    spans = explode_spans(docs)
    tokens = (
        spans.filter(F.col("kind") == "text")
        .select(
            "doc_id",
            "span_idx",
            "offset",
            F.posexplode(F.split(F.col("text"), " ")).alias("token_idx", "surface"),
        )
        .filter(F.col("surface") != "")
    )
    # surfaces are dict keys — unique by construction; a .distinct() here
    # would put a pointless hash exchange under the broadcast
    lex = lexicon_grouped_df(spark).select("surface")
    return tokens.join(F.broadcast(lex), "surface", "left_semi").select(
        "doc_id", "span_idx", "token_idx", "surface", "offset"
    )
