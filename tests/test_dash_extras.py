"""DASH extras: uniqueValueForClass, dash_to_string, all-objects/subjects
targets, construct terminal."""

from pyspark.sql import functions as F

from shacl_js_spark.functions import all_objects, all_subjects, dash_to_string
from shacl_js_spark.graph import triples_df
from shacl_js_spark.localgraph import LocalGraph
from shacl_js_spark.plans.query import RDFQueryDF
from shacl_js_spark.turtle import parse_turtle
from shacl_js_spark.validation import Engine

TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix dash: <http://datashapes.org/dash#> .
@prefix ex: <http://e/> .
ex:Shape a sh:NodeShape ; sh:targetClass ex:Country ;
  sh:property [ sh:path ex:code ; dash:uniqueValueForClass ex:Country ] .
ex:de a ex:Country ; ex:code "DE" .
ex:de2 a ex:Country ; ex:code "DE" .
ex:fr a ex:Country ; ex:code "FR" .
ex:x ex:code "DE" .
"""


def test_unique_value_for_class(spark):
    trips, prefixes = parse_turtle(TTL)
    report = Engine(spark, triples_df(spark, trips), LocalGraph(trips, prefixes)).validate()
    focuses = sorted(r.focusNode() for r in report.results())
    # de and de2 clash with each other; ex:x shares the value but is not a
    # Country, so it neither violates nor causes extra violations
    assert focuses == ["http://e/de", "http://e/de2"]


def test_functions_and_construct(spark):
    trips, _ = parse_turtle(TTL)
    data = triples_df(spark, trips)
    assert all_subjects(data).count() == 6  # Shape, property bnode, de, de2, fr, x
    assert all_objects(data).count() > 0
    q = RDFQueryDF(spark, data).match("?s", "<http://e/code>", "?v")
    out = q.construct([
        ("?s", "<http://e/hasCode>", "?v"),
        ("?s", "rdf:type", "<http://e/Coded>"),
    ])
    rows = out.collect()
    preds = {r["p"] for r in rows}
    assert preds == {"<http://e/hasCode>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"}
    assert len(rows) == 8  # 4 hasCode + 4 type
    lab = q.sols.select(dash_to_string("v").alias("s")).collect()
    assert {r["s"] for r in lab} == {"DE", "FR"}
