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
# must run via spark-submit on a multi-executor cluster).
dist:
	rm -f dist/engine.zip && mkdir -p dist
	cd . && zip -qr dist/engine.zip shacl_js_spark -x '*__pycache__*'

# Prove the spark-submit path end-to-end at small scale.
submit-smoke: dist
	rm -rf /tmp/kg_submit_smoke
	spark-submit --master local[8] --driver-memory 4g \
	  --py-files dist/engine.zip scripts/submit_pipeline.py \
	  --input /root/testdata/sf0.001 --output /tmp/kg_submit_smoke 2>&1 | tail -1

gate:
	python scripts/check_oracle.py $(SF_DIR) 2>&1 | grep -v -E "WARN|FutureWarning|serializers.py" | tee BENCH/full_gate_$(ROUND).log

bench:
	python bench.py 2>&1 | tail -1 | tee BENCH/bench_$(ROUND).json

test:
	python -m pytest tests/ -x -q

verify: gate bench
