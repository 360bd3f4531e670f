"""The engine must ship to executors as a spark-submit --py-files zip
(north rule: run via spark-submit --py-files at N and 4N executors).
This test builds the zip exactly as `make dist` does and proves the whole
package imports from the zip alone — no repo checkout, no __file__-relative
resource loads (executors unpack only the zip)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_pythonpath() -> str:
    """Drop repo-referencing entries so the zip is the only source of the
    engine, but keep the rest (pyspark may ship via PYTHONPATH on
    SPARK_HOME-style installs)."""
    keep = [
        p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if p and not os.path.abspath(p).startswith(REPO)
    ]
    return os.pathsep.join(keep)


def test_engine_zip_imports_standalone(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from scaling_bench import build_engine_zip  # the one true dist builder

    zip_path = build_engine_zip(str(tmp_path / "engine.zip"))
    # Import every public surface from the zip in a clean interpreter whose
    # cwd is NOT the repo, so a stray repo-relative import would fail loudly.
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import shacl_js_spark\n"
        "import shacl_js_spark.pipeline as p\n"
        "import shacl_js_spark.ops.dedup, shacl_js_spark.ops.similarity\n"
        "import shacl_js_spark.ops.text, shacl_js_spark.ops.curation\n"
        "import shacl_js_spark.ops.multimodal\n"
        "import shacl_js_spark.streaming.incremental, shacl_js_spark.streaming.sessions\n"
        "import shacl_js_spark.validation, shacl_js_spark.report, shacl_js_spark.registry\n"
        "import shacl_js_spark.turtle, shacl_js_spark.jsonld, shacl_js_spark.shapes\n"
        "from shacl_js_spark.pipeline.materialize import run_pipeline\n"
        "assert shacl_js_spark.__file__.startswith(sys.argv[1]), shacl_js_spark.__file__\n"
        "print('OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, zip_path],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=60,
        env={**os.environ, "PYTHONPATH": _clean_pythonpath()},
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "OK"
