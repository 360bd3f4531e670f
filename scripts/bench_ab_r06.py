"""Run the FROZEN bench.py main() with the SPARK_GRAFT_NO_FUSE=1 A/B knob
(same monkeypatch as scripts/many_shapes_bench.py) — settles VERDICT r5 #1:
is the shacl_validate delta fusion overhead or host noise?  bench.py itself
is not modified."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SPARK_GRAFT_NO_FUSE") == "1":
    from shacl_js_spark.validation import Engine as _E

    _E._split_fusible = (
        lambda self, shape, min_fuse=2, pool_counts=False: ([], [], shape.constraints)
    )

import bench

bench.main()
