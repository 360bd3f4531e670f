"""Round-6 candidate-optimization experiments (inline variants, library untouched)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(name, fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {name}: {round(best, 3)}s", flush=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from shacl_js_spark.ops.dedup import (
        MINHASH_P, N_HASHES, LSH_BANDS, hash_params, md5_int, shingles,
        minhash_signatures, lsh_candidate_pairs, ngram_jaccard_pairs,
    )
    from shacl_js_spark.graph import ordered_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # --- E1: map-side shingles --------------------------------------------
    def shingles_new(df, n=3, text_col="text"):
        toks = F.split(F.col(text_col), " ")
        sh = F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
        arr = F.array_distinct(F.filter(sh, lambda s: s != ""))
        return df.select("doc_id", F.explode(arr).alias("shingle"))

    def minhash_new(df, shingles_df):
        sh = shingles_df.withColumn("h", md5_int(F.col("shingle")))
        aggs = []
        for i in range(N_HASHES):
            a, b = hash_params(i)
            aggs.append(F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(MINHASH_P))).alias(f"mh_{i}"))
        return sh.groupBy("doc_id").agg(*aggs)

    t("minhash OLD", lambda: noop(minhash_signatures(docs)))
    t("minhash NEW", lambda: noop(minhash_new(docs, shingles_new(docs))))
    # verify identical
    old = minhash_signatures(docs)
    new = minhash_new(docs, shingles_new(docs))
    assert old.exceptAll(new).isEmpty() and new.exceptAll(old).isEmpty(), "minhash mismatch"
    print("  minhash rows equal OK", flush=True)

    t("lsh OLD", lambda: noop(lsh_candidate_pairs(minhash_signatures(docs))))
    t("lsh NEW", lambda: noop(lsh_candidate_pairs(minhash_new(docs, shingles_new(docs)))))

    # --- E2: ngram single-shuffle restructure ------------------------------
    def ngram_new(df, n=3, threshold=0.3, max_df=None):
        from pyspark.sql import Window

        if max_df is None:
            max_df = max(50, df.count() // 100)
        toks = F.split(F.col("text"), " ")
        sh_arr = F.array_distinct(F.filter(F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ), lambda s: s != ""))
        sh = df.select("doc_id", F.size(sh_arr).alias("n"), F.explode(sh_arr).alias("shingle"))
        w = Window.partitionBy("shingle")
        counted = sh.withColumn("_df", F.count("*").over(w))
        rare = counted.filter(F.col("_df") <= max_df)
        docs_per_shingle = rare.groupBy("shingle").agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("docs")
        )
        pair = F.explode(ordered_pairs("docs", "a", "b"))
        shared = (
            docs_per_shingle.select(pair.alias("p"))
            .groupBy(
                F.col("p.a.doc_id").alias("a"), F.col("p.b.doc_id").alias("b"),
                F.col("p.a.n").alias("na"), F.col("p.b.n").alias("nb"),
            )
            .agg(F.count("*").alias("inter"))
        )
        return (
            shared
            .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard")
        )

    t("ngram OLD", lambda: noop(ngram_jaccard_pairs(docs, n=3, threshold=0.3, max_df=None)))
    t("ngram NEW", lambda: noop(ngram_new(docs)))
    o = ngram_jaccard_pairs(docs, n=3, threshold=0.3, max_df=None)
    nn = ngram_new(docs)
    assert o.exceptAll(nn).isEmpty() and nn.exceptAll(o).isEmpty(), "ngram mismatch"
    print("  ngram rows equal OK", flush=True)

    # --- E7: region revenue hints ------------------------------------------
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o_ = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n_ = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))).cast("decimal(38,4)")

    def region(o_side, c_side):
        return (
            li.join(o_side, li["l_orderkey"] == o_["o_orderkey"])
            .join(c_side, o_["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n_), c["c_nationkey"] == n_["n_nationkey"])
            .join(F.broadcast(r), n_["n_regionkey"] == r["r_regionkey"])
            .groupBy("r_name")
            .agg(F.sum(rev).cast("decimal(38,4)").cast("string").alias("revenue"),
                 F.count("*").cast("bigint").alias("n_items"))
        )

    t("region OLD (smj)", lambda: region(o_, c).count())
    t("region shuffle_hash", lambda: region(o_.hint("shuffle_hash"), c.hint("shuffle_hash")).count())

    spark.stop()


if __name__ == "__main__":
    main()
