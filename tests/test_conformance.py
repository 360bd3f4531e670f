"""The 84 self-describing golden fixtures of the reference, run end-to-end
through the Spark engine (ref: test/integration_tests.js)."""

import glob

import pytest

from shacl_js_spark.conformance import compare_reports, run_fixture

CORE = sorted(glob.glob("/root/reference/test/data/core/**/*.ttl", recursive=True))


@pytest.mark.parametrize("path", CORE, ids=lambda p: "/".join(p.split("/")[-2:]))
def test_core_fixture(spark, path):
    report, expected = run_fixture(spark, open(path).read())
    errors = compare_reports(report, expected)
    assert not errors, "\n".join(errors)
