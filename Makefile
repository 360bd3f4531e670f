# Round-end verification: the full driver-gate replica + the bench, with
# logs committed under BENCH/.  Run before every round-end commit so the
# shipped artifacts always carry a fresh full-set run (the external driver
# samples a subset; these logs are the full-coverage backstop evidence).

# pipes must propagate failure: without pipefail `check_oracle | tee` would
# exit 0 on a gate mismatch and the round would ship green on a broken gate
SHELL := /bin/bash
.SHELLFLAGS := -o pipefail -c

SF_DIR ?= /root/testdata/sf0.01
ROUND  ?= r03

.PHONY: gate bench verify test dist submit-smoke

# Package the engine for spark-submit --py-files (north rule: the pipeline
# must run via spark-submit on a multi-executor cluster).  Single zip
# builder shared with scaling_bench and tests/test_packaging.py.
dist:
	python -c "import sys; sys.path.insert(0,'scripts'); \
	  from scaling_bench import build_engine_zip; print(build_engine_zip())"

# Prove the spark-submit path end-to-end at small scale.  Full log kept in
# BENCH/submit_smoke.log; the JSON metrics line (not an arbitrary trailing
# log line) is what gets echoed.
submit-smoke: dist
	rm -rf /tmp/kg_submit_smoke
	spark-submit --master local[8] --driver-memory 4g \
	  --py-files dist/engine.zip scripts/submit_pipeline.py \
	  --input /root/testdata/sf0.001 --output /tmp/kg_submit_smoke \
	  > BENCH/submit_smoke.log 2>&1 \
	  || { tail -30 BENCH/submit_smoke.log; exit 1; }
	grep -E '^\{"input"' BENCH/submit_smoke.log | tail -1

gate:
	python scripts/check_oracle.py $(SF_DIR) 2>&1 | grep -v -E "WARN|FutureWarning|serializers.py" | tee BENCH/full_gate_$(ROUND).log

bench:
	python bench.py 2>&1 | tail -1 | tee BENCH/bench_$(ROUND).json

test:
	python -m pytest tests/ -x -q

verify: gate bench
