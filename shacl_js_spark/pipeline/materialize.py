"""Stage materialization with per-partition lineage + metrics and idempotent
resume (north rule: "resumable from checkpoint with per-partition lineage +
metrics").

Layout under ``out_dir``:
    <stage>/            parquet output of the stage
    _lineage/           parquet: one row per (stage, partition_id) with
                        output_rows, checksum, wall_ms, status, run_id
    _metrics/           parquet: one row per stage with totals

Resume contract: a stage whose _lineage rows all say SUCCESS and whose output
directory exists is NOT recomputed — ``run()`` reads the committed parquet
back instead.  Partition-level checksums (sum of xxhash64 over all columns)
make cross-run equality auditable without re-reading inputs.

Written as plain parquet directories; on a cluster these map 1:1 onto Iceberg
tables (atomic snapshot commit replaces the _SUCCESS-marker protocol).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class PipelineRunner:
    def __init__(self, spark: SparkSession, out_dir: str, run_id: str = "r0"):
        self.spark = spark
        self.out_dir = out_dir
        self.run_id = run_id
        os.makedirs(out_dir, exist_ok=True)

    # ------------------------------------------------------------- lineage
    def _lineage_path(self, stage: str) -> str:
        return os.path.join(self.out_dir, "_lineage", stage)

    def _stage_path(self, stage: str) -> str:
        return os.path.join(self.out_dir, stage)

    def stage_committed(self, stage: str) -> bool:
        lp = self._lineage_path(stage)
        sp = self._stage_path(stage)
        if not (os.path.isdir(lp) and os.path.isdir(sp)):
            return False
        try:
            lin = self.spark.read.parquet(lp)
            n_bad = lin.filter(F.col("status") != "SUCCESS").limit(1).count()
            n_all = lin.limit(1).count()
            return n_all > 0 and n_bad == 0
        except Exception:
            return False

    def run(self, stage: str, build, force: bool = False) -> DataFrame:
        """Execute `build() -> DataFrame` unless the stage is already
        committed; returns the committed DataFrame either way."""
        sp = self._stage_path(stage)
        if not force and self.stage_committed(stage):
            return self.spark.read.parquet(sp)
        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(sp)
        wall_ms = int((time.time() - t0) * 1000)
        out = self.spark.read.parquet(sp)
        cols = out.columns
        per_part = (
            out.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(
                F.count("*").alias("output_rows"),
                # decimal accumulator: overflow-safe at any row count (ANSI mode)
                F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).cast("string").alias("checksum"),
            )
            .select(
                F.lit(stage).alias("stage"),
                F.col("_pid").alias("partition_id"),
                "output_rows",
                "checksum",
                F.lit(wall_ms).alias("wall_ms"),
                F.lit("SUCCESS").alias("status"),
                F.lit(self.run_id).alias("run_id"),
            )
        )
        per_part.write.mode("overwrite").parquet(self._lineage_path(stage))
        metrics = per_part.groupBy("stage").agg(
            F.sum("output_rows").alias("output_rows"),
            F.sum(F.col("checksum").cast("decimal(38,0)")).cast("string").alias("checksum"),
            F.max("wall_ms").alias("wall_ms"),
        ).withColumn("run_id", F.lit(self.run_id))
        metrics.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, "_metrics", stage)
        )
        return out

    def lineage(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._lineage_path(stage))

    def metrics(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.out_dir, "_metrics", stage))


def write_bucketed_triples(
    spark: SparkSession, triples: DataFrame, table: str, buckets: int = 64
) -> None:
    """Materialize a triples table bucketed+sorted by subject: self-joins and
    path hops on `s` become shuffle-free on the bucketed side (SURVEY §4
    partitioning design: hash-partition triples by s so focus-joins are
    cheap).  Maps to Iceberg `bucket(N, s)` partition transforms on a real
    cluster."""
    (
        triples.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "s")
        .sortBy("s")
        .saveAsTable(table)
    )


# SHACL shapes applied to the materialized graph (validate stage): every
# entity needs >=1 rdfs:label, IRIs must be under the kg namespace, every
# document mentions only Entity-typed nodes (sh:class via broadcast type
# closure), and media nodes must be typed.
KG_SHAPES_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <http://example.org/kg#> .

ex:EntityShape a sh:NodeShape ;
  sh:targetClass ex:Entity ;
  sh:property [ sh:path rdfs:label ; sh:minCount 1 ; sh:datatype xsd:string ] ;
  sh:property [ sh:path ex:coOccursWith ; sh:nodeKind sh:IRI ] .

ex:DocumentShape a sh:NodeShape ;
  sh:targetClass ex:Document ;
  sh:property [ sh:path ex:language ; sh:minCount 1 ; sh:maxCount 1 ] ;
  sh:property [ sh:path ex:mentions ; sh:class ex:Entity ] ;
  sh:property [ sh:path ex:hasMedia ; sh:nodeKind sh:IRI ] .
"""


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    validate: bool = True,
    snapshots: bool = False,
):
    """Full north-rule pipeline; returns dict of stage DataFrames + report.

    snapshots=True materializes each stage through the Iceberg-style
    SnapshotCatalog (atomic pointer-swap commits, time-travel, rollback —
    pipeline/snapshots.py) instead of the _SUCCESS-marker PipelineRunner;
    the stage graph and resume contract are identical."""
    from ..localgraph import LocalGraph
    from ..validation import Engine
    from .canonicalize import alias_edges, canonicalize_triples, connected_components
    from .emit import EX, emit_triples
    from .extract import extract_mentions
    from .link import link_entities
    from .synth import interleaved_documents

    if snapshots:
        from .snapshots import SnapshotRunner

        runner = SnapshotRunner(spark, out_dir)
    else:
        runner = PipelineRunner(spark, out_dir)
    docs = runner.run("documents", lambda: interleaved_documents(spark, sf_dir))
    mentions = runner.run("mentions", lambda: extract_mentions(spark, docs))
    links = runner.run("links", lambda: link_entities(spark, mentions))
    raw_triples = runner.run("raw_triples", lambda: emit_triples(spark, docs, links))
    mapping = runner.run(
        "canonical_map",
        lambda: connected_components(spark, alias_edges(spark)),
    )
    triples = runner.run(
        "triples",
        lambda: canonicalize_triples(spark, raw_triples, mapping, EX + "entity/"),
    )
    # node/edge tables for graph consumers
    nodes = runner.run(
        "nodes",
        lambda: triples.filter(F.col("p") == "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>")
        .select(F.col("s").alias("node"), F.col("o").alias("node_type"))
        .distinct(),
    )
    edges = runner.run(
        "edges",
        lambda: triples.filter(F.col("o_kind") == "iri")
        .select(F.col("s").alias("src"), F.col("p").alias("rel"), F.col("o").alias("dst")),
    )
    result = {
        "documents": docs, "mentions": mentions, "links": links,
        "raw_triples": raw_triples, "canonical_map": mapping,
        "triples": triples, "nodes": nodes, "edges": edges,
    }
    if validate:
        shapes = LocalGraph.from_turtle(KG_SHAPES_TTL)
        engine = Engine(spark, triples, shapes)
        result["report"] = runner.run("validation_report", lambda: engine.report_df())
    return result
