"""Approximate-nearest-neighbor search over the `embeddings` table
(array<float> column).

* brute-force cosine top-k — the exact baseline: one pass over the corpus
  per query batch, dot products via zip_with/aggregate (JVM, codegen)
* IVF (inverted-file) top-k — the scale path: vectors are assigned to their
  nearest centroid once (the "index build" = one crossjoin vs K centroids,
  K ≪ corpus, broadcast); a query probes only its centroid's bucket, cutting
  scanned vectors by ~K at equal recall for clustered data.

Centroids here are taken deterministically (vec_id < K) instead of k-means —
the plumbing (broadcast centroids, argmin assignment, bucket-pruned search)
is the part that matters for the 100 TB plan shape.
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


def ivf_assign(emb: DataFrame, n_centroids: int = 16) -> DataFrame:
    """Assign every vector to its nearest centroid (centroid = vec_id < K)."""
    cents = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("centroid_id"))
    return (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("csim", F.round(cosine(F.col("embedding"), F.col("ce")), 6))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )


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
