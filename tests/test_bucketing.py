"""Bucketed triple storage: self-joins on the bucket key must not shuffle the
bucketed sides (co-located join; SURVEY §4 partitioning design)."""

from pyspark.sql import functions as F

from shacl_js_spark.graph import triples_df
from shacl_js_spark.pipeline.materialize import write_bucketed_triples
from shacl_js_spark.turtle import parse_turtle

TTL = """
@prefix ex: <http://e/> .
ex:a ex:p ex:b . ex:b ex:p ex:c . ex:c ex:p ex:d .
ex:a ex:q "1" . ex:b ex:q "2" .
"""


def test_bucketed_self_join_no_exchange(spark, tmp_path):
    trips, _ = parse_turtle(TTL)
    write_bucketed_triples(spark, triples_df(spark, trips), "t_bucketed", buckets=4)
    t = spark.table("t_bucketed")
    a = t.select(F.col("s").alias("k"), F.col("o"))
    b = t.select(F.col("s").alias("k"), F.col("p"))
    joined = a.join(b, "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # both sides bucketed on s -> sort-merge join without Exchange
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS t_bucketed")
