"""Two-cluster-size scaling evidence (BASELINE.json north rule; sandbox proxy
per BASELINE.md): the SAME KG-construction job on the SAME input at N and 4N
parallelism, reporting throughput at both + scaling efficiency.

Measured at two N/4N pairs (local[2]/local[8] and local[8]/local[32]) and
paired with a HOST-CAPACITY CALIBRATION: an embarrassingly parallel Spark job
(sha2 over range, no shuffle, no Python) measured at the same parallelism
levels.  This sandbox's 32 vCPUs deliver only ~2.2x aggregate compute going
2->8 threads and ~1.3x going 8->32 (no cgroup quota, no steal — shared
execution resources / clock scaling), so raw efficiency is capped at
~0.55/0.33 for ANY Spark job here.  The meaningful number is

    calibrated_efficiency = pipeline_speedup / calibration_speedup

i.e. how much of the host's actually-available scaling the pipeline captures.

Usage:
    python scripts/scaling_bench.py                   # full protocol
    python scripts/scaling_bench.py --worker pipe 8   # one pipeline run
    python scripts/scaling_bench.py --worker cal 8    # one calibration run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALE_REP", "50"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LEVELS = ("2", "8", "32")          # single-JVM local[n] (legacy protocol)
CLUSTER_LEVELS = ("1x8", "4x8")    # N vs 4N executor JVMs (primary evidence)


def _master(spec: str) -> str:
    """'8' -> local[8]; '4x8' -> local-cluster[4,8,4096] (separate executor
    JVMs — the true N-executor vs 4N-executor shape of the north rule;
    sidesteps the single-JVM GC ceiling of local[n])."""
    if "x" in spec:
        n, cores = spec.split("x")
        # 8g per executor JVM (exit-52 OOMs at 4g/6g when the single-executor
        # level holds the whole replicated corpus)
        return f"local-cluster[{n},{cores},8192]"
    return f"local[{spec}]"


def _session(cpus: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(_master(str(cpus)))
        .appName(f"scaling-bench-{cpus}")
        # local-cluster[n,c,MEM] caps the WORKER; executors still default to
        # spark.executor.memory=1g (observed -Xmx1024M in the executor
        # command → exit-52 OOM loops at the x50 corpus, r6) — size the
        # executor heap to the worker capacity explicitly
        .config("spark.executor.memory", os.environ.get("SPARK_GRAFT_EXEC_MEM", "7g"))
        # constant partition count across sizes: identical per-task footprint
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.sql.maxPlanStringLength", "1000000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"))
        # tmpfs shuffle dirs: the shared sandbox disk is not the bottleneck
        # we want to measure
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def run_pipeline(cpus: str) -> dict:
    from pyspark.sql import functions as F

    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from shacl_js_spark.pipeline.canonicalize import (
        alias_edges, canonicalize_triples, connected_components,
    )
    from shacl_js_spark.pipeline.emit import EX, emit_triples
    from shacl_js_spark.pipeline.extract import extract_mentions
    from shacl_js_spark.pipeline.link import link_entities
    from shacl_js_spark.pipeline.synth import raw_to_interleaved

    # repartition BEFORE the crossJoin expansion (the file has 1-2 partitions;
    # expanding there is a serial section)
    from shacl_js_spark.pipeline.synth import replicate_docs

    raw_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
    big = replicate_docs(spark, raw_docs, REPLICATE)
    t0 = time.time()
    docs = raw_to_interleaved(big).persist()
    mentions = extract_mentions(spark, docs)
    links = link_entities(spark, mentions).persist()
    raw = emit_triples(spark, docs, links)
    mapping = connected_components(spark, alias_edges(spark))
    triples = canonicalize_triples(spark, raw, mapping, EX + "entity/")
    n = triples.count()
    wall = time.time() - t0
    spark.stop()
    return {"job": "pipeline", "cpus": cpus, "wall_sec": round(wall, 2), "triples": n,
            "triples_per_sec": round(n / wall, 1), "replicate": REPLICATE, "sf_dir": SF_DIR}


def run_calibration(cpus: str) -> dict:
    from pyspark.sql import functions as F

    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    (spark.range(150_000_000, numPartitions=64)
     .select(F.sha2(F.col("id").cast("string"), 256).alias("h"))
     .select(F.max("h")).collect())
    wall = time.time() - t0
    spark.stop()
    return {"job": "calibration", "cpus": cpus, "wall_sec": round(wall, 2),
            "hashes_per_sec": round(150_000_000 / wall, 0)}


def build_engine_zip(path: str | None = None) -> str:
    """Build the --py-files engine zip.  Single source of truth for the dist
    layout: `make dist`, the scaling-bench launcher, and the packaging test
    all call this.  Ships EVERY package file except bytecode caches (so a
    future non-.py resource — a .ttl shapes file, a .json context — can't
    silently diverge between the Makefile zip and the bench zip).  Always
    rebuilds: the zip must reflect the working tree being measured."""
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = path or os.path.join(repo, "dist", "engine.zip")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(repo, "shacl_js_spark")):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith((".pyc", ".pyo")):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, repo))
    return path


def _spawn(kind: str, cpus: str) -> dict:
    # Default launcher is spark-submit --py-files (the literal invocation the
    # north rule names): executors import the engine from dist/engine.zip,
    # not from the repo checkout.  SPARK_GRAFT_LAUNCHER=python falls back to
    # the in-process harness (identical measurement, lighter startup).
    script = os.path.abspath(__file__)
    env = dict(os.environ)
    if os.environ.get("SPARK_GRAFT_LAUNCHER", "submit") == "submit":
        # pin the worker Python to this interpreter — otherwise spark-submit
        # resolves whatever python3 is on PATH and the two launchers would
        # measure different interpreters/libraries
        env.setdefault("PYSPARK_PYTHON", sys.executable)
        env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
        cmd = [
            "spark-submit",
            "--master", _master(str(cpus)),
            "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"),
            # must be set before the JVM starts; the builder copy is a no-op
            # under spark-submit
            "--conf", "spark.local.dir="
            + os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"),
            "--py-files", build_engine_zip(),
            script, "--worker", kind, str(cpus),
        ]
    else:
        cmd = [sys.executable, script, "--worker", kind, str(cpus)]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, env=env)
    except FileNotFoundError:
        raise SystemExit(
            f"{cmd[0]} not on PATH — install Spark or set SPARK_GRAFT_LAUNCHER=python"
        )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    if not lines:
        print(out.stdout[-1500:], out.stderr[-1500:])
        raise SystemExit(f"worker {kind} {cpus} failed")
    return json.loads(lines[-1][7:])


def main() -> None:
    if len(sys.argv) > 3 and sys.argv[1] == "--worker":
        fn = run_pipeline if sys.argv[2] == "pipe" else run_calibration
        print("RESULT " + json.dumps(fn(sys.argv[3])))
        return
    mode = os.environ.get("SPARK_GRAFT_SCALE_MODE", "cluster")
    levels = CLUSTER_LEVELS if mode == "cluster" else LEVELS
    # >=3 trials per arm (r4 verdict #5): with this host's ~2x run-to-run
    # variance, a best-of-2 can land on one lucky draw — medians are the
    # primary statistic now, best-of kept alongside for comparability
    trials = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "3"))
    pipe: dict[str, dict] = {}
    cal: dict[str, dict] = {}
    from statistics import median

    for cpus in levels:
        for kind, store in (("pipe", pipe), ("cal", cal)):
            runs = []
            for _ in range(trials):
                r = _spawn(kind, cpus)
                print(json.dumps(r))
                runs.append(r)
            best = dict(min(runs, key=lambda x: x["wall_sec"]))
            best["trial_walls"] = sorted(x["wall_sec"] for x in runs)
            best["median_wall_sec"] = round(median(best["trial_walls"]), 2)
            store[cpus] = best

    def eff(lo: str, hi: str):
        sp_best = pipe[lo]["wall_sec"] / pipe[hi]["wall_sec"]
        sp_med = pipe[lo]["median_wall_sec"] / pipe[hi]["median_wall_sec"]
        cal_best = cal[lo]["wall_sec"] / cal[hi]["wall_sec"]
        cal_med = cal[lo]["median_wall_sec"] / cal[hi]["median_wall_sec"]
        return {
            "pair": f"{_master(lo)} -> {_master(hi)} (N vs 4N)",
            "pipeline_thr_N": pipe[lo]["triples_per_sec"],
            "pipeline_thr_4N": pipe[hi]["triples_per_sec"],
            "pipeline_trial_walls_N": pipe[lo]["trial_walls"],
            "pipeline_trial_walls_4N": pipe[hi]["trial_walls"],
            "pipeline_speedup_best": round(sp_best, 2),
            "pipeline_speedup_median": round(sp_med, 2),
            "raw_efficiency_best": round(sp_best / 4, 3),
            "raw_efficiency_median": round(sp_med / 4, 3),
            "host_ceiling_speedup_best": round(cal_best, 2),
            "host_ceiling_speedup_median": round(cal_med, 2),
            "calibrated_efficiency_best": round(sp_best / cal_best, 3),
            "calibrated_efficiency_median": round(sp_med / cal_med, 3),
        }

    pairs = (
        [eff("1x8", "4x8")] if mode == "cluster" else [eff("2", "8"), eff("8", "32")]
    )
    summary = {
        "metric": "kg-construction N->4N scaling (raw + host-calibrated)",
        "mode": mode,
        "pairs": pairs,
        "target": 0.8,
        "note": "host delivers <4x compute from N to 4N processes (calibration job); "
                "calibrated_efficiency = pipeline speedup / host ceiling speedup",
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
