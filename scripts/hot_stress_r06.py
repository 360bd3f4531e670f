"""Skewed-corpus stress (r6; VERDICT r5 item 3): run the skew-sensitive
operators on a uniform replica set and on the --hot-entity overlay of the
SAME size, in one session (same load window), and report walls + whether the
skew guards (LSH bucket cap, ngram max_df cap) actually fired.

Usage: python scripts/hot_stress_r06.py <uniform_dir> <hot_dir>
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402


class _CapCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.records = []

    def emit(self, record):
        self.records.append(record.getMessage())


def main() -> None:
    uniform_dir, hot_dir = sys.argv[1], sys.argv[2]
    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import __spark_entry__ as entry
    from bench import kg_pipeline_triples

    qs = entry.queries()
    cap_log = _CapCounter()
    logging.getLogger("shacl_js_spark.ops.dedup").addHandler(cap_log)
    logging.getLogger("shacl_js_spark.ops.dedup").setLevel(logging.WARNING)

    out: dict[str, dict] = {}
    for label, sf_dir in (("uniform", uniform_dir), ("hot", hot_dir)):
        res: dict[str, float] = {}
        for name in ("dedup_lsh_pairs", "dedup_ngram_jaccard", "dedup_exact"):
            best = None
            rows = None
            for _ in range(2):
                t0 = time.time()
                rows = qs[name](spark, sf_dir).count()
                dt = round(time.time() - t0, 3)
                best = dt if best is None else min(best, dt)
            res[name] = best
            res[f"{name}_rows"] = rows
        t0 = time.time()
        res["kg_pipeline_triples"] = kg_pipeline_triples(spark, sf_dir)
        res["kg_pipeline"] = round(time.time() - t0, 3)
        out[label] = res
        print(f"  {label}: {res}", flush=True)

    ratios = {
        k: round(out["hot"][k] / out["uniform"][k], 3)
        for k in ("dedup_lsh_pairs", "dedup_ngram_jaccard", "dedup_exact", "kg_pipeline")
    }
    print(json.dumps({
        "uniform": out["uniform"], "hot": out["hot"], "hot_over_uniform": ratios,
        "cap_warnings": cap_log.records,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
