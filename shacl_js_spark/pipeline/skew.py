"""Explicit hot-key salting (north rule: "explicit salting for hot-entity
skew").  AQE skew-join handles moderate imbalance at runtime; these utilities
are the explicit pre-planned treatment for keys KNOWN to be pathological —
e.g. one entity mentioned in 10% of 10^12 documents, or rdf:type as a join
key.

Two primitives:

* salted_agg — two-phase aggregation: rows are spread over
  (key, salt ∈ [0, buckets)) for the shuffle-heavy partial aggregation, then
  the per-salt partials combine in a second (tiny) aggregation on key alone.
  Works for any algebraic aggregate (count/sum/min/max here).

* salted_join — broadcast-free skew equi-join: the skewed (big, hot-keyed)
  side gets a deterministic salt column; the other side is replicated
  `buckets`× so every (key, salt) pair finds its partner.  Use when the
  build side is too big to broadcast AND the probe side has hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], buckets: int) -> Column:
    # deterministic per-row spreading: hash all non-key columns (falls back
    # to spark_partition_id + monotonically_increasing_id when none given)
    if cols:
        return F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("int")
    return F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).cast("int")


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict,
    buckets: int = 16,
    spread_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation over skewed keys.

    aggs: {out_col: (agg_kind, in_col)} with agg_kind in
    count|sum|min|max. Example:
        salted_agg(links, ["entity_id"], {"n_docs": ("count", "*")})
    """
    spread = spread_cols if spread_cols is not None else [
        c for c in df.columns if c not in key_cols
    ]
    salted = df.withColumn("_salt", _salt(spread, buckets))

    partial_aggs, final_aggs = [], []
    for out, (kind, col) in aggs.items():
        p = f"_p_{out}"
        if kind == "count":
            partial_aggs.append(F.count("*" if col == "*" else col).alias(p))
            final_aggs.append(F.sum(p).alias(out))
        elif kind == "sum":
            partial_aggs.append(F.sum(col).alias(p))
            final_aggs.append(F.sum(p).alias(out))
        elif kind == "min":
            partial_aggs.append(F.min(col).alias(p))
            final_aggs.append(F.min(p).alias(out))
        elif kind == "max":
            partial_aggs.append(F.max(col).alias(p))
            final_aggs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"unsupported agg {kind}")
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `skewed` has hot values of `on`: salt the skewed side,
    replicate `other` across all salt values, join on (on, _salt)."""
    spread = [c for c in skewed.columns if c != on]
    s = skewed.withColumn("_salt", _salt(spread, buckets))
    replicated = other.crossJoin(
        F.broadcast(
            s.sparkSession.range(buckets).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = s.join(replicated, [on, "_salt"], how)
    return out.drop("_salt")


def entity_mention_counts(links: DataFrame, buckets: int = 16) -> DataFrame:
    """Hot-entity frequency over the corpus — the canonical skewed aggregate
    (stopword-like surfaces concentrate on few entity ids)."""
    return salted_agg(
        links.select("entity_id", "doc_id"),
        ["entity_id"],
        {"n_mentions": ("count", "*")},
        buckets=buckets,
        spread_cols=["doc_id"],
    )
