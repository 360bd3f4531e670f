"""Approximate-nearest-neighbor search over the `embeddings` table
(array<float> column).

* brute-force cosine top-k — the exact baseline: one pass over the corpus
  per query batch, dot products via zip_with/aggregate (JVM, codegen)
* IVF (inverted-file) top-k — the scale path: vectors are assigned to their
  nearest centroid once (the "index build" = one crossjoin vs K centroids,
  K ≪ corpus, broadcast); a query probes only its centroid's bucket, cutting
  scanned vectors by ~K at equal recall for clustered data.

Centroids: deterministic seeds (vec_id < K) refined by Lloyd iterations in
pure DataFrame ops (assign -> per-dimension mean -> repeat).  Means are
rounded to 6 decimals each round so the trained centroids — and therefore
the bucket assignment — are engine-independent (the DuckDB oracle replays
the same iterations).  Per iteration: one broadcast crossjoin (corpus x K)
+ one (centroid, dim) aggregation — both map-side-combinable, no
corpus-sized shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine


def brute_force_topk(emb: DataFrame, query_vec_id: int, k: int = 10) -> DataFrame:
    """Top-k cosine neighbors of a stored vector (excluding itself)."""
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe")
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_vec_id)
        .withColumn("cos", F.round(cosine(F.col("embedding"), F.col("qe")), 6))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .select("vec_id", "cos")
        .limit(k)
    )


def _nearest(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, embedding, centroid_id): fully MAP-SIDE argmax.

    The K centroids are packed into ONE broadcast row holding an
    array<struct<centroid_id, ce>>; each vector scores all K inside a
    `transform` lambda and `array_max` picks the winner (csim desc, then
    centroid_id asc via the negated-id struct field — same tie-break as an
    ORDER BY csim DESC, centroid_id).  No K-fold row blowup, no shuffle, no
    window sort: at 10^9 vectors the assignment stage stays embarrassingly
    parallel, which a Window.partitionBy(vec_id) over a crossJoin-expanded
    corpus is not."""
    packed = F.broadcast(
        cents.agg(F.collect_list(F.struct("centroid_id", "ce")).alias("_cents"))
    )
    scored = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            F.round(cosine(F.col("embedding"), c["ce"]), 6).alias("csim"),
            (-c["centroid_id"]).alias("_neg_id"),
            c["centroid_id"].alias("centroid_id"),
        ),
    )
    return (
        emb.crossJoin(packed)
        .select(
            "vec_id", "embedding",
            F.array_max(scored)["centroid_id"].alias("centroid_id"),
        )
    )


def kmeans_centroids(emb: DataFrame, n_centroids: int = 16, iters: int = 2) -> DataFrame:
    """(centroid_id, ce) after `iters` Lloyd rounds from deterministic seeds
    (vec_id < K).  Per-dimension means rounded to 6 dp for cross-engine
    reproducibility; empty clusters drop out naturally."""
    cents = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    for _ in range(iters):
        assigned = _nearest(emb, cents)
        dims = assigned.select(
            "centroid_id", F.posexplode(F.col("embedding")).alias("pos", "val")
        )
        cents = (
            dims.groupBy("centroid_id", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("ce")
            )
        )
    return cents


def ivf_assign(emb: DataFrame, n_centroids: int = 16, iters: int = 2) -> DataFrame:
    """Assign every vector to its nearest k-means centroid."""
    return _nearest(emb, kmeans_centroids(emb, n_centroids, iters))


def ivf_topk(emb: DataFrame, query_vec_id: int, k: int = 10, n_centroids: int = 16) -> DataFrame:
    """Bucket-pruned cosine top-k: probe only the query's IVF bucket."""
    assigned = ivf_assign(emb, n_centroids)
    q = assigned.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe"), F.col("centroid_id").alias("qc")
    )
    return (
        assigned.join(F.broadcast(q), F.col("centroid_id") == F.col("qc"))
        .filter(F.col("vec_id") != query_vec_id)
        .withColumn("cos", F.round(cosine(F.col("embedding"), F.col("qe")), 6))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .select("vec_id", "cos")
        .limit(k)
    )
