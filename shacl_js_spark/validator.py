"""Top-level SHACLValidator facade — the reference's main interface
(ref: /root/reference/index.js:53-370) re-expressed for Spark.

    v = SHACLValidator(spark)
    report = v.validate(data_text, "text/turtle", shapes_text, "text/turtle")
    report.conforms(); report.results()

Like the reference: data and shapes graphs can be swapped independently
(updateDataGraph/updateShapesGraph, index.js:235-269), custom validator code
registers under a library key (registerJSLibrary analog -> register_validator,
index.js:351-370), nodeConformsToShape is exposed (index.js:82-92), and the
error-batch configuration maps to validation-engine-configuration.js.

Differences by design: the data graph may also be a pre-existing triples
DataFrame (the TB-scale path — parquet/Iceberg), and media types beyond
Turtle/JSON-LD raise cleanly instead of delegating to rdflib.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .graph import triples_df
from .jsonld import parse_jsonld
from .localgraph import LocalGraph
from .registry import ValidatorRegistry
from .report import ValidationReport
from .terms import Term
from .turtle import parse_turtle
from .validation import Engine

SHAPES_GRAPH_URI = "urn:x-shacl:shapesGraph"  # ref: index.js:25
DATA_GRAPH_URI = "urn:x-shacl:dataGraph"      # ref: index.js:26


def _parse(text: str, media_type: str, jsonld_contexts: dict | None = None):
    if media_type in ("text/turtle", "text/n3", None):
        return parse_turtle(text)
    if media_type == "application/ld+json":
        return parse_jsonld(text, contexts=jsonld_contexts)
    raise ValueError(f"unsupported media type {media_type!r}")


class SHACLValidator:
    def __init__(self, spark: SparkSession, registry: ValidatorRegistry | None = None):
        self.spark = spark
        self.registry = registry or ValidatorRegistry()
        self._data_df: DataFrame | None = None
        self._shapes: LocalGraph | None = None
        self._engine: Engine | None = None
        self._error_batch = -1  # ref: validation-engine-configuration.js (-1 = all)
        self._jsonld_contexts: dict = {}

    # --- configuration (ref: index.js getConfiguration) ---
    def set_validation_error_batch(self, n: int) -> None:
        self._error_batch = n
        self._engine = None

    # --- registry (ref: registerJSLibrary/registerJSCode, index.js:351-370) ---
    def register_validator(self, key: str, fn, kind: str = "value") -> None:
        self.registry.register(key, fn, kind)
        self._engine = None

    def register_jsonld_context(self, url: str, context) -> None:
        """Pre-register a remote JSON-LD context for offline resolution —
        the same pattern as register_validator replacing the reference's
        network fetch of JS libraries (shapes-graph.js:440-469): callers
        supply the remote resource up front, the engine never fetches."""
        self._jsonld_contexts[url] = context

    # --- graph updates (ref: updateDataGraph/updateShapesGraph, index.js:235-269) ---
    def update_data_graph(self, data, media_type: str = "text/turtle") -> None:
        if isinstance(data, DataFrame):
            self._data_df = data
        else:
            trips, _ = _parse(data, media_type, self._jsonld_contexts)
            self._data_df = triples_df(self.spark, trips, DATA_GRAPH_URI)
        self._engine = None

    def update_shapes_graph(self, shapes, media_type: str = "text/turtle") -> None:
        if isinstance(shapes, LocalGraph):
            self._shapes = shapes
        else:
            trips, prefixes = _parse(shapes, media_type, self._jsonld_contexts)
            self._shapes = LocalGraph(trips, prefixes)
        self._engine = None

    def _ensure_engine(self) -> Engine:
        if self._data_df is None or self._shapes is None:
            raise RuntimeError("data and shapes graphs must be loaded first")
        if self._engine is None:
            self._engine = Engine(
                self.spark, self._data_df, self._shapes,
                registry=self.registry, error_batch=self._error_batch,
            )
        return self._engine

    # --- main entry (ref: validate, index.js:307-322) ---
    def validate(self, data, data_media_type: str = "text/turtle",
                 shapes=None, shapes_media_type: str = "text/turtle") -> ValidationReport:
        self.update_data_graph(data, data_media_type)
        if shapes is not None:
            self.update_shapes_graph(shapes, shapes_media_type)
        return self._ensure_engine().validate()

    def report_df(self) -> DataFrame:
        return self._ensure_engine().report_df()

    # --- recursive conformance (ref: nodeConformsToShape, index.js:82-92) ---
    def node_conforms_to_shape(self, node: Term, shape_node: Term) -> bool:
        from .graph import terms_frame

        eng = self._ensure_engine()
        nodes = terms_frame(self.spark, [node], "focus")
        return eng.nonconforming(shape_node, nodes).isEmpty()
