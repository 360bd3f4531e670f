"""Round-6 profiling harness (guide §1): per-query noop-sink timings +
.explain("formatted") captures, and a per-stage breakdown of the kg pipeline.

Does NOT touch bench.py (frozen).  Writes plans to plans/r06/<q>_<tag>.txt.

Usage:
    python scripts/profile_r06.py [--tag before] [--queries q1,q2,...]
    python scripts/profile_r06.py --stages          # kg pipeline stage split
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark, kg_pipeline_triples  # noqa: E402

BENCH_QUERIES = [
    "shacl_mincount", "shacl_class", "shacl_range",  # = shacl_validate
    "dedup_minhash", "dedup_lsh_pairs", "dedup_ngram_jaccard",
    "ann_topk", "ann_ivf_assign", "text_quality",
    "events_hourly", "events_sessions", "tpch_q1", "tpch_region_revenue",
    "rdf_bgp", "rdf_path_zero_or_more", "kg_cooccur",
]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import __spark_entry__ as entry

    qs = entry.queries()
    os.makedirs("plans/r06", exist_ok=True)

    # same warmup as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10).count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        kg_pipeline_triples(spark, warm_dir)

    out: dict[str, list[float]] = {}

    if args.stages:
        # stage-by-stage split of the kg pipeline (noop sink per stage)
        from pyspark.sql import functions as F
        from shacl_js_spark.pipeline.canonicalize import (
            alias_edges, canonicalize_triples, connected_components,
        )
        from shacl_js_spark.pipeline.emit import EX, emit_triples
        from shacl_js_spark.pipeline.extract import extract_mentions
        from shacl_js_spark.pipeline.link import link_entities
        from shacl_js_spark.pipeline.synth import raw_to_interleaved, replicate_docs

        for rep in (1, 20):
            par = sc.defaultParallelism
            raw_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(par)
            raw_docs = replicate_docs(spark, raw_docs, rep)

            def stage(name, fn):
                sc.setJobDescription(f"r06 stage[{rep}x]: {name}")
                t0 = time.time()
                r = fn()
                dt = round(time.time() - t0, 3)
                out[f"stage_{rep}x_{name}"] = [dt]
                print(f"  [{rep}x] {name}: {dt}s", flush=True)
                sc.setJobDescription(None)
                return r

            docs = raw_to_interleaved(raw_docs).persist()
            stage("docs_build+persist", lambda: noop(docs))
            mentions = extract_mentions(spark, docs)
            stage("extract_mentions", lambda: noop(mentions))
            links = link_entities(spark, mentions).persist()
            stage("link_entities+persist", lambda: noop(links))
            raw = emit_triples(spark, docs, links)
            stage("emit_triples", lambda: noop(raw))
            mapping = stage("connected_components",
                            lambda: connected_components(spark, alias_edges(spark)))
            triples = canonicalize_triples(spark, raw, mapping, EX + "entity/")
            stage("canonicalize+count", lambda: triples.count())
            # end-to-end for reference
            sc.setJobDescription(f"r06 stage[{rep}x]: end_to_end")
            t0 = time.time()
            kg_pipeline_triples(spark, sf_dir, replicate=rep)
            out[f"stage_{rep}x_end_to_end"] = [round(time.time() - t0, 3)]
            print(f"  [{rep}x] end_to_end: {out[f'stage_{rep}x_end_to_end'][0]}s", flush=True)
            docs.unpersist()
            links.unpersist()
    else:
        names = args.queries.split(",") if args.queries else BENCH_QUERIES
        for name in names:
            df = qs[name](spark, sf_dir)
            # capture the plan once
            plan_path = f"plans/r06/{name}_{args.tag}.txt"
            with open(plan_path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            samples = []
            for t in range(args.trials):
                sc.setJobDescription(f"r06 {name} trial{t}")
                t0 = time.time()
                qs[name](spark, sf_dir).count()  # same action bench.py times
                samples.append(round(time.time() - t0, 3))
                sc.setJobDescription(None)
            out[name] = samples
            print(f"  {name}: {samples}", flush=True)

    print(json.dumps({"tag": args.tag, "sf_dir": sf_dir, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
