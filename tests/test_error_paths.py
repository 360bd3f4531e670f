"""Error paths mirroring the reference's thrown validation errors."""

import pytest

from shacl_js_spark import Engine, LocalGraph, ShaclValidationError, parse_turtle, triples_df
from shacl_js_spark.shapes import compile_path
from shacl_js_spark.terms import bnode, literal


def _engine(spark, ttl):
    trips, prefixes = parse_turtle(ttl)
    return Engine(spark, triples_df(spark, trips), LocalGraph(trips, prefixes))


def test_pathfree_recursive_shape_rejected(spark):
    # a PATH-FREE shape cycle re-enters with the same frontier forever —
    # the reference would stack-overflow (index.js:82-92); we raise at the
    # recursion depth cap
    ttl = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://e/> .
ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:node ex:S2 .
ex:S2 a sh:NodeShape ; sh:node ex:S .
ex:a a ex:T .
"""
    trips, prefixes = parse_turtle(ttl)
    eng = Engine(
        spark, triples_df(spark, trips), LocalGraph(trips, prefixes),
        max_shape_recursion=3,
    )
    with pytest.raises(ShaclValidationError, match="recursive"):
        eng.validate()


RECURSIVE_PERSON_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://e/> .
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] ;
  sh:property [ sh:path ex:knows ; sh:node ex:PersonShape ] .
ex:a a ex:Person ; ex:name "A" ; ex:knows ex:b .
ex:b a ex:Person ; ex:name "B" ; ex:knows ex:c .
ex:c a ex:Person .
"""


def test_recursive_shape_on_finite_data_validates(spark):
    # the reference's data-driven recursion (ex:PersonShape referencing
    # itself through sh:property/sh:node) terminates on acyclic data; the
    # engine unrolls it to the data depth via the empty-frontier check.
    # c lacks a name -> c violates minCount; b's knows-value c nonconforms
    # -> b violates sh:node; a's knows-value b nonconforms -> a violates.
    report = _engine(spark, RECURSIVE_PERSON_TTL).validate()
    focuses = sorted(r.focusNode() for r in report.results())
    assert focuses == ["http://e/a", "http://e/b", "http://e/c"]


def test_recursive_shape_on_cyclic_data_raises(spark):
    # knows-cycle in the DATA: frontier never empties -> depth cap
    ttl = RECURSIVE_PERSON_TTL + "\nex:c ex:knows ex:a .\n"
    trips, prefixes = parse_turtle(ttl)
    eng = Engine(
        spark, triples_df(spark, trips), LocalGraph(trips, prefixes),
        max_shape_recursion=4,
    )
    with pytest.raises(ShaclValidationError, match="recursive"):
        eng.validate()


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


def test_duplicate_source_triples_are_set_semantics(spark):
    # the same triple stated twice must not trip maxCount 1 (rdflib stores
    # are sets; ADVICE r01)
    ttl = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://e/> .
ex:S a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:name ; sh:maxCount 1 ] .
ex:a a ex:T ; ex:name "X" .
ex:a ex:name "X" .
"""
    assert _engine(spark, ttl).validate().conforms()


def test_connected_components_nonconvergence_raises(spark):
    from shacl_js_spark.pipeline.canonicalize import connected_components

    chain = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(12)]
    df = spark.createDataFrame(chain, "src string, dst string")
    # force the distributed path with too few rounds for the diameter
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(spark, df, max_iter=2, driver_threshold=0)
    # enough rounds: converges to the chain head
    out = connected_components(spark, df, max_iter=15, driver_threshold=0)
    assert {r["canonical_id"] for r in out.collect()} == {"n000"}


def test_unsupported_path_rejected(spark):
    # a bnode that encodes none of the path forms (ref throws
    # 'Unsupported SHACL path', shapes-graph.js:153)
    g = LocalGraph([])
    with pytest.raises(ValueError, match="unsupported SHACL path"):
        compile_path(g, bnode("_:x"))
    with pytest.raises(ValueError, match="unsupported SHACL path"):
        compile_path(g, literal("oops"))
