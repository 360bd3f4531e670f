"""Error-batch early stop (ref: test/configuration_tests.js +
src/validation-engine-configuration.js: validationErrorBatch).  Set-oriented
semantics: the report is truncated to N rows (documented divergence from the
reference's iteration-order stop, SURVEY.md §2.5)."""

from shacl_js_spark.graph import triples_df
from shacl_js_spark.localgraph import LocalGraph
from shacl_js_spark.turtle import parse_turtle
from shacl_js_spark.validation import Engine

TTL = """
@prefix ex: <http://e/> .
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:Shape a sh:NodeShape ;
  sh:targetNode ex:a, ex:b, ex:c ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
"""


def test_error_batch(spark):
    trips, prefixes = parse_turtle(TTL)
    local = LocalGraph(trips, prefixes)
    data = triples_df(spark, trips)
    full = Engine(spark, data, local).validate()
    assert len(full.results()) == 3
    batched = Engine(spark, data, local, error_batch=1).validate()
    assert len(batched.results()) == 1
