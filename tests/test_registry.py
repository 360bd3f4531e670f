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


def test_vocab_component_override(spark):
    # a shapes graph that RE-declares sh:PatternConstraintComponent with its
    # own validator must override the built-in rlike behavior (the reference
    # merges vocab + user component triples, shapes-graph.js:364-385)
    from shacl_js_spark import Engine, LocalGraph, parse_turtle, triples_df

    ttl = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://e/> .
sh:PatternConstraintComponent a sh:ConstraintComponent ;
  sh:parameter [ sh:path sh:pattern ] ;
  sh:validator [ a sh:JSValidator ; sh:jsFunctionName "alwaysFail" ] .
ex:S a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:v ; sh:pattern "^match" ] .
ex:a a ex:T ; ex:v "matches fine" .
"""
    reg = ValidatorRegistry()
    reg.register("alwaysFail", lambda values, params: [False] * len(values), kind="value")
    trips, prefixes = parse_turtle(ttl)
    report = Engine(
        spark, triples_df(spark, trips), LocalGraph(trips, prefixes), registry=reg
    ).validate()
    # built-in pattern would conform; the override rejects everything
    assert not report.conforms()
    assert report.results()[0].focusNode() == "http://e/a"
    # without a user validator the built-in stays in charge
    ttl2 = ttl.replace(
        '  sh:validator [ a sh:JSValidator ; sh:jsFunctionName "alwaysFail" ] .',
        "  sh:message \"just metadata\" .",
    )
    trips2, prefixes2 = parse_turtle(ttl2)
    report2 = Engine(
        spark, triples_df(spark, trips2), LocalGraph(trips2, prefixes2), registry=reg
    ).validate()
    assert report2.conforms()


def test_vocab_override_inherits_builtin_params(spark):
    # redeclaring PatternConstraintComponent with only sh:pattern must keep
    # sh:flags recognized (the reference's vocab parameter triples stay in
    # the merged graph)
    from shacl_js_spark import Engine, LocalGraph, parse_turtle, triples_df

    ttl = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://e/> .
sh:PatternConstraintComponent a sh:ConstraintComponent ;
  sh:parameter [ sh:path sh:pattern ] ;
  sh:validator [ a sh:JSValidator ; sh:jsFunctionName "flagAware" ] .
ex:S a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:v ; sh:pattern "^m" ; sh:flags "i" ] .
ex:a a ex:T ; ex:v "Matches" .
ex:b a ex:T ; ex:v "nope" .
"""
    def flag_aware(values, params):
        # runs on executors (Arrow batches) — prove flags arrived via the
        # VERDICT: 'Matches' conforms to '^m' only under the 'i' flag
        import re
        fl = re.I if (params.get("flags") and "i" in params["flags"].value) else 0
        rx = re.compile(params["pattern"].value, fl)
        return [rx.search(v) is not None for v in values["value_v"]]

    reg = ValidatorRegistry()
    reg.register("flagAware", flag_aware, kind="value")
    trips, prefixes = parse_turtle(ttl)
    report = Engine(
        spark, triples_df(spark, trips), LocalGraph(trips, prefixes), registry=reg
    ).validate()
    # ex:a ('Matches') conforms ONLY if sh:flags "i" reached the custom
    # validator through the inherited built-in parameter binding
    assert [r.focusNode() for r in report.results()] == ["http://e/b"]
