"""Round-6 experiments, part 3: ngram variants."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from shacl_js_spark.graph import cut_lineage, ordered_pairs  # noqa: E402
from shacl_js_spark.ops.dedup import ngram_jaccard_pairs  # noqa: E402


def t(name, fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {name}: {round(best, 3)}s", flush=True)


def shingle_arr(n=3, text_col="text"):
    toks = F.split(F.col(text_col), " ")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(F.filter(sh, lambda s: s != ""))


def ngram_new3(df, n=3, threshold=0.3, max_df=None, persist_sh=False):
    if max_df is None:
        max_df = max(50, df.count() // 100)
    arr = shingle_arr(n)
    sh = df.select("doc_id", F.explode(arr).alias("shingle"))
    if persist_sh:
        sh = sh.persist()
    sizes = df.select("doc_id", F.size(arr).alias("n"))
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    rare = sh.join(df_counts.filter(F.col("df") <= max_df), "shingle", "left_semi")
    docs_per_shingle = rare.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc_id")).alias("docs"))
    pair = F.explode(ordered_pairs("docs"))
    shared = (
        docs_per_shingle.select(pair.alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    out = (
        shared.join(na.hint("shuffle_hash"), "a").join(nb.hint("shuffle_hash"), "b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    if persist_sh:
        out = cut_lineage(out)
        sh.unpersist()
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    docs = docs0.repartition(par)

    t("ngram OLD", lambda: ngram_jaccard_pairs(docs0, n=3, threshold=0.3, max_df=None).count())
    t("ngram OLD+repart", lambda: ngram_jaccard_pairs(docs, n=3, threshold=0.3, max_df=None).count())
    t("ngram NEW3 lazy", lambda: ngram_new3(docs).count())
    t("ngram NEW3 eager-persist", lambda: ngram_new3(docs, persist_sh=True).count())

    o = ngram_jaccard_pairs(docs0, n=3, threshold=0.3, max_df=None)
    for name, nn in [("lazy", ngram_new3(docs)), ("eager", ngram_new3(docs, persist_sh=True))]:
        assert o.exceptAll(nn).isEmpty() and nn.exceptAll(o).isEmpty(), f"ngram {name} mismatch"
        print(f"  ngram {name} rows equal OK", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
