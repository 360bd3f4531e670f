"""Entity-link scoring: mention -> best candidate entity.

Deterministic scoring, fully vectorized (Column expressions; the candidate
dictionary is an explicit broadcast join):

    score = prior + 0.2 * doc_affinity(doc_id, entity_id)

where doc_affinity is a stable hash-derived value in [0,1) — a deterministic
stand-in for a context-similarity model that still exercises the real
plumbing (broadcast candidate fan-out, per-mention argmax window).

Argmax per mention via array_max over the per-surface candidate array — the
candidate dictionary is broadcast GROUPED by surface (surface -> [(entity,
prior)]), so scoring + argmax run entirely MAP-SIDE inside the broadcast
join's project: zero shuffle in the whole stage.  (The previous shape —
row-per-candidate fan-out + max(struct) hash aggregation — shuffled the
corpus-sized scored frame once; at 10^12 docs that exchange dominates the
stage.)  array_max on struct(score, entity_id) compares score first, then
entity_id, so ties resolve to the larger entity_id — deterministic at any
parallelism, and identical to the old aggregation's semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.dedup import md5_int
from .synth import lexicon_grouped_df


def doc_affinity(doc_col, ent_col):
    """Deterministic [0,1) affinity from a PORTABLE hash (md5 prefix — same
    value computable in DuckDB/any engine, unlike xxhash64), so the full
    pipeline output is oracle-checkable end to end."""
    return md5_int(F.concat_ws("|", doc_col, ent_col)) % 1000 / 1000.0


def link_entities(spark: SparkSession, mentions: DataFrame) -> DataFrame:
    """-> links(doc_id, span_idx, token_idx, surface, offset, entity_id, score)."""
    cands = lexicon_grouped_df(spark)
    joined = mentions.join(F.broadcast(cands), "surface", "inner")
    best = F.array_max(
        F.transform(
            F.col("_cands"),
            lambda c: F.struct(
                (c["prior"] + 0.2 * doc_affinity(F.col("doc_id"), c["entity_id"])).alias(
                    "score"
                ),
                c["entity_id"].alias("entity_id"),
            ),
        )
    )
    return joined.select(
        "doc_id", "span_idx", "token_idx", "surface", "offset",
        best["entity_id"].alias("entity_id"),
        best["score"].alias("score"),
    )
