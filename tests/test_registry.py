"""Custom constraint-component registry — the Python analog of the
reference's JS function registration (ref: test/function_registration_tests.js
and test/data/functionregistry/jsconstraintcomponent/*).

The fixture declares two custom components in the shapes graph; here their
validators are vectorized Python functions registered under the same
sh:jsFunctionName, replacing eval()'d JS libraries."""

from shacl_js_spark.conformance import run_fixture
from shacl_js_spark.registry import ValidatorRegistry

DATA = open("/root/reference/test/data/functionregistry/jsconstraintcomponent/data.ttl").read()
EX = "http://datashapes.org/sh/tests/functionregistry/jsconstraintcomponent/data#"


def _registry():
    reg = ValidatorRegistry()

    def has_max_length(values, params):
        # JS analog: $value.lex.length <= Number($customMaxLength.lex);
        # blank node -> violation (library.js:1-11)
        n = float(params["customMaxLength"].value)
        out = []
        for kind, v in zip(values["value_kind"], values["value_v"]):
            out.append(False if kind == "bnode" else len(v) <= n)
        return out

    def constant_valid(values, params):
        ok = params["constantValidation"].value == "true"
        return [ok] * len(values)

    reg.register("hasMaxLength", has_max_length, kind="value")
    reg.register("constantValid", constant_valid, kind="value")
    return reg


def test_function_registration(spark):
    report, _ = run_fixture(spark, DATA, registry=_registry())
    assert report.conforms() is False
    results = report.results()
    assert len(results) == 2
    by_focus = {r.focusNode(): r for r in results}
    inv = by_focus[EX + "InvalidExample"]
    assert inv.resultPath() == EX + "prop"
    assert inv.resultMessage() == "Value has more than 3 characters"
    inv2 = by_focus[EX + "InvalidExampleShape"]
    assert inv2.resultPath() is None
    assert inv2.resultMessage() == "Shape is constantly valid false"
