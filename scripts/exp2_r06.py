"""Round-6 experiments, part 2: parallel scan + map-side shingles for dedup."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


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
        MINHASH_P, N_HASHES, hash_params, md5_int,
        minhash_signatures, lsh_candidate_pairs, ngram_jaccard_pairs,
    )
    from shacl_js_spark.graph import ordered_pairs

    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    docs = docs0.repartition(par)

    def shingles_new(df, n=3, text_col="text"):
        toks = F.split(F.col(text_col), " ")
        sh = F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
        arr = F.array_distinct(F.filter(sh, lambda s: s != ""))
        return df.select("doc_id", F.size(arr).alias("_n_sh"), F.explode(arr).alias("shingle"))

    def minhash_new(df):
        sh = shingles_new(df).withColumn("h", md5_int(F.col("shingle")))
        aggs = []
        for i in range(N_HASHES):
            a, b = hash_params(i)
            aggs.append(F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(MINHASH_P))).alias(f"mh_{i}"))
        return sh.groupBy("doc_id").agg(*aggs)

    # bench action is count over select-casted columns
    t("minhash OLD count", lambda: minhash_signatures(docs0).count())
    t("minhash NEW count (repart)", lambda: minhash_new(docs).count())
    t("lsh OLD count", lambda: lsh_candidate_pairs(minhash_signatures(docs0)).count())
    t("lsh NEW count (repart)", lambda: lsh_candidate_pairs(minhash_new(docs)).count())

    def ngram_new2(df, n=3, threshold=0.3, max_df=None):
        if max_df is None:
            max_df = max(50, df.count() // 100)
        sh = shingles_new(df, n)
        df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        rare = sh.join(df_counts.filter(F.col("df") <= max_df), "shingle", "left_semi")
        docs_per_shingle = rare.groupBy("shingle").agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "_n_sh"))).alias("docs")
        )
        pair = F.explode(ordered_pairs("docs", "a", "b"))
        shared = (
            docs_per_shingle.select(pair.alias("p"))
            .groupBy(
                F.col("p.a.doc_id").alias("a"), F.col("p.b.doc_id").alias("b"),
                F.col("p.a._n_sh").alias("na"), F.col("p.b._n_sh").alias("nb"),
            )
            .agg(F.count("*").alias("inter"))
        )
        return (
            shared
            .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard")
        )

    t("ngram OLD count", lambda: ngram_jaccard_pairs(docs0, n=3, threshold=0.3, max_df=None).count())
    t("ngram NEW2 count (repart)", lambda: ngram_new2(docs).count())
    o = ngram_jaccard_pairs(docs0, n=3, threshold=0.3, max_df=None)
    nn = ngram_new2(docs)
    assert o.exceptAll(nn).isEmpty() and nn.exceptAll(o).isEmpty(), "ngram mismatch"
    print("  ngram rows equal OK", flush=True)

    lo = lsh_candidate_pairs(minhash_signatures(docs0))
    ln = lsh_candidate_pairs(minhash_new(docs))
    assert lo.exceptAll(ln).isEmpty() and ln.exceptAll(lo).isEmpty(), "lsh mismatch"
    print("  lsh rows equal OK", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
