"""Round-6 experiments, part 4: SHACL engine persist_values A/B + target fast-path."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402


def t(name, fn, n=3):
    samples = []
    for _ in range(n):
        t0 = time.time()
        fn()
        samples.append(round(time.time() - t0, 3))
    print(f"  {name}: {samples}", flush=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import __spark_entry__ as entry
    from shacl_js_spark.localgraph import LocalGraph
    from shacl_js_spark.validation import Engine

    EX = "http://ex/"
    data = entry._cached_triples(
        "customer_triples", spark, sf_dir,
        lambda: entry._customer_triples(spark, sf_dir))
    data.count()  # warm the input cache like a prior query would have

    ttl_min = entry._SHAPES_PREFIX + """
ex:CustShape a sh:NodeShape ; sh:targetClass ex:Customer ;
  sh:property [ sh:path ex:order ; sh:minCount 5 ] .
"""
    ttl_cls = entry._SHAPES_PREFIX + """
ex:OrderShape a sh:NodeShape ; sh:targetClass ex:Order ;
  sh:property [ sh:path ex:cust ; sh:class ex:BigCustomer ] .
"""
    sub = {f"<{EX}BigCustomer>": [f"<{EX}VIP>"]}

    for name, ttl in (("mincount", ttl_min), ("class", ttl_cls)):
        for pv in (True, False):
            def run():
                eng = Engine(spark, data, LocalGraph.from_turtle(ttl),
                             subclass_edges=sub, persist_values=pv)
                n = eng.report_df().count()
                eng.release()
                return n
            t(f"shacl_{name} persist={pv}", run)

    # range query input (line_qty triples)
    data2 = entry._cached_triples(
        "line_qty_triples", spark, sf_dir,
        lambda: entry._line_qty_report.__wrapped__ if False else None) if False else None
    spark.stop()


if __name__ == "__main__":
    main()
