"""Round-6 micro-profiler: emit/link/canonicalize sub-plan timings."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(name, fn):
    t0 = time.time()
    r = fn()
    print(f"  {name}: {round(time.time() - t0, 3)}s", flush=True)
    return r


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rep = int(os.environ.get("REP", "20"))
    spark = build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")

    from shacl_js_spark.pipeline.extract import extract_mentions
    from shacl_js_spark.pipeline.link import link_entities, doc_affinity
    from shacl_js_spark.pipeline.emit import emit_triples, EX
    from shacl_js_spark.pipeline.synth import (
        raw_to_interleaved, replicate_docs, lexicon_grouped_df,
    )
    from shacl_js_spark.pipeline.canonicalize import (
        alias_edges, connected_components, canonicalize_triples,
    )
    from shacl_js_spark.graph import ordered_pairs

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    par = spark.sparkContext.defaultParallelism
    raw_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(par)
    raw_docs = replicate_docs(spark, raw_docs, rep)
    docs = raw_to_interleaved(raw_docs).persist()
    t("docs noop (cold persist)", lambda: noop(docs))

    mentions = extract_mentions(spark, docs)
    t("mentions noop", lambda: noop(mentions))
    t("mentions noop2", lambda: noop(mentions))
    print("  mentions rows:", mentions.count(), flush=True)

    # link sub-steps
    cands = lexicon_grouped_df(spark)
    joined = mentions.join(F.broadcast(cands), "surface", "inner")
    t("mentions+cands join only", lambda: noop(joined.select("doc_id", "surface", "entity_id_list".replace("entity_id_list", "_cands"))))
    links = link_entities(spark, mentions)
    t("links noop", lambda: noop(links))
    links = links.persist()
    t("links noop (persist)", lambda: noop(links))

    # emit branches
    grouped = links.select("doc_id", "entity_id").groupBy("doc_id").agg(
        F.sort_array(F.collect_set("entity_id")).alias("ents"))
    t("grouped (groupBy collect_set)", lambda: noop(grouped))
    doc_ents = grouped.select("doc_id", F.explode("ents").alias("entity_id"))
    t("doc_ents", lambda: noop(doc_ents))
    pairs = grouped.select(
        "doc_id", F.explode(ordered_pairs("ents", "ea", "eb")).alias("pair")
    ).select(F.col("pair.ea").alias("ea"), F.col("pair.eb").alias("eb")).distinct()
    t("pairs explode+distinct", lambda: noop(pairs))
    ents = links.select("entity_id", "surface").distinct()
    t("ents distinct", lambda: noop(ents))
    media = (
        docs.select("doc_id", F.explode("spans").alias("span"))
        .filter(F.col("span.kind") != "text")
        .select("doc_id", F.col("span.media_ref").alias("media_ref"),
                F.initcap(F.col("span.kind")).alias("media_kind"))
    )
    t("media explode", lambda: noop(media))

    raw = emit_triples(spark, docs, links)
    t("emit noop", lambda: noop(raw))
    t("emit count", lambda: raw.count())

    mapping = t("cc eager", lambda: connected_components(spark, alias_edges(spark)))
    triples = canonicalize_triples(spark, raw, mapping, EX + "entity/")
    t("canon count", lambda: triples.count())
    t("canon count2", lambda: triples.count())
    # dedup-only cost over raw (no canon joins)
    t("raw dedup count", lambda: raw.dropDuplicates(["s", "p", "o"]).count())
    spark.stop()


if __name__ == "__main__":
    main()
