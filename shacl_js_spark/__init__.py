"""shacl_js_spark — a from-scratch PySpark-native KG-construction and SHACL
validation engine with the query/data-processing capabilities of
mulesoft-labs/shacl-js (reference at /root/reference, studied for behavior
only; architecture is Spark-first DataFrame/Catalyst, not a port).

Layout:
  terms        RDF term model + namespaces (ref: src/rdfquery/term-factory.js)
  turtle       driver-side Turtle-subset parser (ref: rdflib parse via src/rdflib-graph.js:55-82)
  localgraph   small in-memory triple store for shapes graphs (KB-sized)
  graph        distributed triples DataFrame schema + loaders
  shapes       ShapeIR compiler (ref: src/shapes-graph.js)
  validation   set-oriented DataFrame validation engine (ref: src/validation-engine.js, shared/dash.js)
  report       ValidationReport (ref: src/validation-report.js)
  registry     custom constraint-component validator registry (ref: src/validation-function.js)
  plans/       query operators: match/filter/bind/limit/orderBy/path + fixpoint
  pipeline/    KG construction: synth docs -> mentions -> link -> triples -> canonicalize -> materialize
  ops/         training-data ops: dedup, similarity, text analysis, multimodal stubs
"""

__version__ = "0.1.0"

# public API
from .graph import TRIPLE_SCHEMA, triples_df, turtle_df  # noqa: E402,F401
from .localgraph import LocalGraph  # noqa: E402,F401
from .plans.query import RDFQueryDF  # noqa: E402,F401
from .registry import ValidatorRegistry  # noqa: E402,F401
from .report import ValidationReport  # noqa: E402,F401
from .terms import T, Term, bnode, iri, literal  # noqa: E402,F401
from .turtle import parse_turtle  # noqa: E402,F401
from .validation import Engine, ShaclValidationError  # noqa: E402,F401
from .validator import SHACLValidator  # noqa: E402,F401
