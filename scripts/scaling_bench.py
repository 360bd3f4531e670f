"""Two-cluster-size scaling evidence (BASELINE.json north rule, sandbox proxy
per BASELINE.md): run the SAME KG-construction job on the SAME input at
local[8] and local[32] (N vs 4N cores), report throughput at both plus
efficiency = (thr_32 / thr_8) / 4.

The corpus is the sf0.1 documents table replicated REPLICATE× with distinct
doc_ids (deterministic), sized so the job is compute-bound (>=60s at
local[8]).  shuffle.partitions scales with cores (protocol step 3).

Usage:
    python scripts/scaling_bench.py            # runs both, prints JSON + md row
    python scripts/scaling_bench.py --worker 8 # internal: one measurement
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALE_REP", "12"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_job(cpus: int) -> dict:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from shacl_js_spark.pipeline.canonicalize import (
        alias_edges,
        canonicalize_triples,
        connected_components,
    )
    from shacl_js_spark.pipeline.emit import EX, emit_triples
    from shacl_js_spark.pipeline.extract import extract_mentions
    from shacl_js_spark.pipeline.link import link_entities
    from shacl_js_spark.pipeline.synth import raw_to_interleaved

    raw_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = spark.range(REPLICATE).select(F.col("id").alias("rep"))
    big = raw_docs.crossJoin(rep).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    ).repartition(cpus * 4)

    t0 = time.time()
    docs = raw_to_interleaved(big).persist()
    mentions = extract_mentions(spark, docs)
    links = link_entities(spark, mentions).persist()
    raw = emit_triples(spark, docs, links)
    mapping = connected_components(spark, alias_edges(spark))
    triples = canonicalize_triples(spark, raw, mapping, EX + "entity/")
    n = triples.count()
    wall = time.time() - t0
    spark.stop()
    return {"cpus": cpus, "wall_sec": round(wall, 2), "triples": n,
            "triples_per_sec": round(n / wall, 1), "replicate": REPLICATE,
            "sf_dir": SF_DIR}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        print("RESULT " + json.dumps(run_job(int(sys.argv[2]))))
        return
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(out.stdout[-2000:], out.stderr[-2000:])
            raise SystemExit(f"worker {cpus} failed")
        results[cpus] = json.loads(line[-1][7:])
        print(json.dumps(results[cpus]))
    thr8, thr32 = results[8]["triples_per_sec"], results[32]["triples_per_sec"]
    eff = round((thr32 / thr8) / 4, 3)
    summary = {
        "metric": "kg-construction scaling efficiency N->4N cores",
        "thr_local8": thr8,
        "thr_local32": thr32,
        "speedup": round(thr32 / thr8, 2),
        "efficiency": eff,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
