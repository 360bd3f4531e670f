"""Error paths mirroring the reference's thrown validation errors."""

import pytest

from shacl_js_spark import Engine, LocalGraph, ShaclValidationError, parse_turtle, triples_df
from shacl_js_spark.shapes import compile_path
from shacl_js_spark.terms import bnode, literal


def _engine(spark, ttl):
    trips, prefixes = parse_turtle(ttl)
    return Engine(spark, triples_df(spark, trips), LocalGraph(trips, prefixes))


def test_recursive_shape_rejected(spark):
    # reference would stack-overflow (index.js:82-92); we reject at compile
    ttl = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://e/> .
ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:node ex:S2 .
ex:S2 a sh:NodeShape ; sh:node ex:S .
ex:a a ex:T .
"""
    with pytest.raises(ShaclValidationError, match="recursive"):
        _engine(spark, ttl).validate()


def test_property_only_component_on_node_shape_raises(spark):
    # sh:minCount has no node validator -> 'Cannot find validator'
    # (validation-engine.js:301)
    ttl = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://e/> .
ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:minCount 1 .
ex:a a ex:T .
"""
    with pytest.raises(ShaclValidationError, match="Cannot find validator"):
        _engine(spark, ttl).validate()


def test_custom_component_without_registry_raises(spark):
    ttl = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://e/> .
ex:MyComponent a sh:ConstraintComponent ;
  sh:parameter [ sh:path ex:myParam ] ;
  sh:validator [ a sh:JSValidator ; sh:jsFunctionName "nope" ] .
ex:S a sh:NodeShape ; sh:targetClass ex:T ; ex:myParam 3 .
ex:a a ex:T .
"""
    with pytest.raises(ShaclValidationError, match="Cannot find validator"):
        _engine(spark, ttl).validate()


def test_unsupported_path_rejected(spark):
    # a bnode that encodes none of the path forms (ref throws
    # 'Unsupported SHACL path', shapes-graph.js:153)
    g = LocalGraph([])
    with pytest.raises(ValueError, match="unsupported SHACL path"):
        compile_path(g, bnode("_:x"))
    with pytest.raises(ValueError, match="unsupported SHACL path"):
        compile_path(g, literal("oops"))
