"""Set-oriented SHACL validation engine over a distributed triples DataFrame.

Behavioral reference: /root/reference/src/validation-engine.js (result
creation/multiplicity, nested-result suppression) and /root/reference/shared/
dash.js (per-component verdict logic).  Architecture is NOT a port of the
per-node recursive walk: each shape compiles to one lazy DataFrame plan
(joins/aggregations over the whole focus-node set at once); the report is a
union of per-shape violation frames collected once.  Nested conformance
(sh:and/or/not/node/qualified*) maps to semi/anti-joins against the child
shape's non-conforming node set — only the boolean escapes, mirroring the
reference's recordErrorsLevel suppression (validation-engine.js:251-282).

Scale notes (100 TB design):
  * every constraint is built-in Column expressions + equi-joins — no
    per-row Python in the hot path (pandas UDFs only for the rare
    encodeURIComponent parity case and custom registry validators)
  * class/subclass closures are collected once (ontology ≪ data) and applied
    as broadcast joins — the "broadcast-joined type closure" of the north rule
  * focus/value frames key on a single encoded-term string column, so all
    joins are 1-column equi-joins AQE can re-plan (skew → AQE skew join)
  * zeroOrMore/oneOrMore paths run as an iterative fixpoint with
    localCheckpoint per round to cut lineage (SURVEY.md §4)
"""

from __future__ import annotations

import logging

import pandas as pd  # module-level: pandas_udf type hints resolve via globals

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .graph import (
    cut_lineage,
    js_number,
    object_decomposed,
    subject_decomposed,
    term_cols,
    terms_frame,
)
from .localgraph import RDFS_SUBCLASSOF, LocalGraph
from .shapes import DASH, SH, Constraint, Path, Shape, ShapesIR
from .terms import (
    NAMESPACES,
    TRUE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_FLOAT,
    XSD_INTEGER,
    Term,
    decode_term,
    iri,
)
from .report import ValidationReport, ValidationResult

RDF_TYPE_ENC = f"<{NAMESPACES['rdf']}type>"
SUBCLASS_ENC = f"<{RDFS_SUBCLASSOF}>"

VIOL_COLS = (
    ["bubble"]
    + term_cols("focus")
    + term_cols("value")
    + ["path", "component", "severity", "source_shape", "message"]
)
VIOL_SCHEMA = StructType([StructField(c, StringType(), True) for c in VIOL_COLS])
RECORD_COLS = VIOL_COLS[1:]

def _NULL() -> Column:
    return F.lit(None).cast("string")


class ShaclValidationError(RuntimeError):
    """Mirrors the reference's thrown validation errors (e.g. 'Cannot find
    validator for constraint component ...', validation-engine.js:301)."""


def _tt_name(kind_col: Column) -> Column:
    """termType name used by compareTerms ordering (rdfquery.js:910)."""
    return (
        F.when(kind_col == "bnode", F.lit("BlankNode"))
        .when(kind_col == "literal", F.lit("Literal"))
        .otherwise(F.lit("NamedNode"))
    )


def _cmp_struct(prefix: str) -> Column:
    """Lexicographic struct implementing compareTerms (rdfquery.js:903-938):
    termType name, value, datatype, language (codepoint order; the JS
    localeCompare divergence is documented in SURVEY.md §1.3)."""
    return F.struct(
        _tt_name(F.col(f"{prefix}_kind")),
        F.col(f"{prefix}_v"),
        F.coalesce(F.col(f"{prefix}_dt"), F.lit("")),
        F.coalesce(F.col(f"{prefix}_lang"), F.lit("")),
    )


def _incomparable(a: str, b: str) -> Column:
    """compareNodes returns null when both literals but datatypes differ
    (index.js:66-76)."""
    return (
        (F.col(f"{a}_kind") == "literal")
        & (F.col(f"{b}_kind") == "literal")
        & (F.coalesce(F.col(f"{a}_dt"), F.lit("")) != F.coalesce(F.col(f"{b}_dt"), F.lit("")))
    )


def _js_regex_to_java(pattern: str, flags: str | None) -> str:
    prefix = ""
    if flags:
        inline = "".join(ch for ch in flags if ch in "ims")
        if inline:
            prefix = f"(?{inline})"
    return prefix + pattern


_JAVA_REGEX_OK: dict[str, bool] = {}


def _java_regex_compiles(spark: SparkSession, pattern: str) -> bool:
    """Driver-side probe: does java.util.regex accept this pattern?  JS
    accepts constructs Java rejects (dangling '{', some escapes); patterns
    are shapes-graph-sized, so the result is memoized per pattern."""
    if pattern not in _JAVA_REGEX_OK:
        jvm = getattr(spark, "_jvm", None)
        if jvm is None:
            # Spark Connect session: no py4j bridge to probe with.  Route to
            # the Python JS-regex fallback (False) — semantically correct for
            # every pattern, just slower than rlike; never crash the probe.
            _JAVA_REGEX_OK[pattern] = False
        else:
            try:
                jvm.java.util.regex.Pattern.compile(pattern)
                _JAVA_REGEX_OK[pattern] = True
            except Exception:
                _JAVA_REGEX_OK[pattern] = False
    return _JAVA_REGEX_OK[pattern]


_INT_LEX = r"^\s*[+-]?[0-9]"          # JS parseInt(lex) not NaN
_FLOAT_LEX = r"^\s*[+-]?([0-9]|\.[0-9])"  # JS parseFloat(lex) not NaN

# Default result messages — vocabulary DATA from the Apache-2.0 DASH
# vocabulary validator declarations (vocabularies/dash.ttl, used by
# createResultMessages when neither shape nor validator overrides,
# validation-engine.js:149-173).  {$param}/{?param} substituted driver-side.
DEFAULT_MESSAGES: dict[str, str] = {
    SH + "ClassConstraintComponent": "Value does not have class {$class}",
    SH + "ClosedConstraintComponent": "Predicate {?path} is not allowed (closed shape)",
    SH + "DatatypeConstraintComponent": "Value does not have datatype {$datatype}",
    SH + "DisjointConstraintComponent":
        "Value node must not also be one of the values of {$disjoint}",
    SH + "EqualsConstraintComponent": "Must have same values as {$equals}",
    SH + "HasValueConstraintComponent": "Value must be {$hasValue}",
    SH + "InConstraintComponent": "Value is not in {$in}",
    SH + "LanguageInConstraintComponent": "Language does not match any of {$languageIn}",
    SH + "LessThanConstraintComponent": "Value is not < value of {$lessThan}",
    SH + "LessThanOrEqualsConstraintComponent": "Value is not <= value of {$lessThanOrEquals}",
    SH + "MaxCountConstraintComponent": "More than {$maxCount} values",
    SH + "MaxExclusiveConstraintComponent": "Value is not < {$maxExclusive}",
    SH + "MaxInclusiveConstraintComponent": "Value is not <= {$maxInclusive}",
    SH + "MaxLengthConstraintComponent": "Value has more than {$maxLength} characters",
    SH + "MinCountConstraintComponent": "Less than {$minCount} values",
    SH + "MinExclusiveConstraintComponent": "Value is not > {$minExclusive}",
    SH + "MinInclusiveConstraintComponent": "Value is not >= {$minInclusive}",
    SH + "MinLengthConstraintComponent": "Value has less than {$minLength} characters",
    SH + "NodeConstraintComponent": "Value does not have shape {$node}",
    SH + "NodeKindConstraintComponent": "Value does not have node kind {$nodeKind}",
    SH + "NotConstraintComponent": "Value does have shape {$not}",
    SH + "PatternConstraintComponent": 'Value does not match pattern "{$pattern}"',
    SH + "QualifiedMaxCountConstraintComponent":
        "More than {$qualifiedMaxCount} values have shape {$qualifiedValueShape}",
    SH + "QualifiedMinCountConstraintComponent":
        "Less than {$qualifiedMinCount} values have shape {$qualifiedValueShape}",
    DASH + "ClosedByTypesConstraintComponent":
        "Property {?path} is not among those permitted for any of the types",
    DASH + "SubSetOfConstraintComponent": "Must be one of the values of {$subSetOf}",
    DASH + "CoExistsWithConstraintComponent": "Values must co-exist with values of {$coExistsWith}",
    DASH + "HasValueWithClassConstraintComponent":
        "At least one of the values must have class {$hasValueWithClass}",
    DASH + "NonRecursiveConstraintComponent": "Points back at itself (recursively)",
    DASH + "PrimaryKeyConstraintComponent": "Violation of primary key constraint",
    DASH + "RootClassConstraintComponent": "Value must be subclass of {$rootClass}",
    DASH + "StemConstraintComponent": "Value does not have stem {$stem}",
}

# property-validator messages that differ from the node form
# (vocabularies/dash.ttl:1245 hasValue, :1157 disjoint)
PROPERTY_DEFAULT_MESSAGES: dict[str, str] = {
    SH + "HasValueConstraintComponent": "Missing expected value {$hasValue}",
    SH + "DisjointConstraintComponent": "Property must not share any values with {$disjoint}",
}


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        data: DataFrame,
        shapes: LocalGraph,
        registry=None,
        error_batch: int = -1,
        persist_values: bool = True,
        subclass_edges: dict | None = None,
        max_driver_results: int = 100_000,
        max_shape_recursion: int = 25,
    ):
        self.spark = spark
        self.data = data
        self.shapes = shapes
        self.registry = registry
        self.ir = ShapesIR(shapes, registry)
        self.error_batch = error_batch
        self.max_driver_results = max_driver_results
        self.max_shape_recursion = max_shape_recursion
        self.persist_values = persist_values
        # parent enc -> child encs; callers that already hold the graph
        # driver-side (fixture harness) can pass the edges to skip a collect
        self._sub_children: dict[str, list[str]] | None = subclass_edges
        self._distinct_types: list[str] | None = None  # cached once per Engine
        self._stack: list[Term] = []  # shape recursion guard (compile-time cycle reject)
        # shared-scan memos (see targets_frame / shape_violations): many
        # shapes target the same classes and walk the same paths — compute
        # each distinct target frame and (focus, path) value frame once
        self._targets_cache: dict[tuple, DataFrame] = {}
        # identity index of every SHARED focus frame (cached target frames
        # AND memoized property-candidate frames): a focus frame listed here
        # is handed out repeatedly by the engine, so per-(focus, path) memos
        # downstream are safe and profitable
        self._cached_target_ids: dict[int, DataFrame] = {}
        self._values_cache: dict[tuple, tuple[DataFrame, DataFrame]] = {}
        self._cached_values_ids: dict[int, DataFrame] = {}
        self._candidates_cache: dict[int, tuple[DataFrame, DataFrame]] = {}
        self._counts_cache: dict[tuple, tuple[DataFrame, DataFrame, DataFrame]] = {}
        self._class_fail_cache: dict[tuple, tuple[DataFrame, DataFrame]] = {}
        # cross-shape fusion pool (active only inside validate()/report_df()):
        # id(value frame) -> [values, bubble-mapping-or-None, entries], where
        # entries collect row-wise checks from EVERY shape sharing that value
        # frame; the pool flushes as ONE scan + (for property children) ONE
        # bubble join per frame instead of one per shape.  See _all_violations.
        self._fuse_pool: dict[int, list] = {}
        # same idea for min/maxCount: entries pool per shared COUNT frame
        # (the memoized (focus, _cnt) aggregation), flushing as one pass
        self._fuse_pool_counts: dict[int, list] = {}
        self._deferring = False
        self._pool_mapping: DataFrame | None = None  # set by _property around child calls

    def release(self) -> None:
        """Unpersist the engine's memoized target/value frames.  Optional —
        dropped references are eventually cleaned by Spark's context
        cleaner — but long-lived processes creating many engines (e.g. a
        streaming re-validator, one engine per batch) should release
        eagerly rather than wait for GC."""
        for df in self._targets_cache.values():
            df.unpersist()
        for _focus, df in self._values_cache.values():
            df.unpersist()
        for _v, df in self._candidates_cache.values():
            df.unpersist()
        for _t, _v, df in self._counts_cache.values():
            df.unpersist()
        for _v, df in self._class_fail_cache.values():
            df.unpersist()
        self._targets_cache.clear()
        self._cached_target_ids.clear()
        self._values_cache.clear()
        self._cached_values_ids.clear()
        self._candidates_cache.clear()
        self._counts_cache.clear()
        self._class_fail_cache.clear()

    # ------------------------------------------------------------------ data
    def _empty_viols(self) -> DataFrame:
        # range(0)-backed: the optimizer's PropagateEmptyRelation folds this
        # into an empty LocalRelation and prunes it out of report unions
        # entirely.  createDataFrame([], schema) is RDD-backed in PySpark and
        # every empty accumulator leg scheduled real (no-op) tasks per union.
        return self.spark.range(0).select(
            *[F.lit(None).cast("string").alias(c) for c in VIOL_COLS]
        )

    def trips(self, pred_enc: str | None = None) -> DataFrame:
        """Triples projected to fresh attribute ids (t_*) so repeated
        self-joins of the data graph stay unambiguous."""
        df = self.data if pred_enc is None else self.data.filter(F.col("p") == pred_enc)
        return df.select(
            F.col("s").alias("t_s"),
            F.col("p").alias("t_p"),
            F.col("o").alias("t_o"),
            F.col("o_v").alias("t_o_v"),
            F.col("o_kind").alias("t_o_kind"),
            F.col("o_dt").alias("t_o_dt"),
            F.col("o_lang").alias("t_o_lang"),
        )

    def _subclass_children(self) -> dict[str, list[str]]:
        """Collect rdfs:subClassOf edges from the DATA graph once (ontology is
        small even at 100 TB data; ref getSubClassesOf walks the store,
        shapes-graph.js:54-58) -> parent -> [children]."""
        if self._sub_children is None:
            rows = (
                self.data.filter(F.col("p") == SUBCLASS_ENC)
                .select("s", "o")
                .distinct()
                .collect()
            )
            m: dict[str, list[str]] = {}
            for r in rows:
                m.setdefault(r["o"], []).append(r["s"])
            self._sub_children = m
        return self._sub_children

    # classes are ontology-sized, not data-sized; with dirty 100 TB data the
    # distinct rdf:type object set is unbounded in theory, so hard-cap it
    # rather than silently materializing millions of driver rows
    MAX_DISTINCT_TYPES = 100_000

    def distinct_types(self) -> list[str]:
        """Distinct rdf:type objects in the data graph, collected once per
        Engine lifetime (used by dash:closedByTypes)."""
        if self._distinct_types is None:
            rows = (
                self.data.filter(F.col("p") == RDF_TYPE_ENC)
                .select("o")
                .distinct()
                .limit(self.MAX_DISTINCT_TYPES + 1)
                .collect()
            )
            if len(rows) > self.MAX_DISTINCT_TYPES:
                raise ShaclValidationError(
                    f"more than {self.MAX_DISTINCT_TYPES} distinct rdf:type "
                    "objects in the data graph; refusing driver-side collect"
                )
            self._distinct_types = [r["o"] for r in rows]
        return self._distinct_types

    def data_subclasses(self, cls_enc: str) -> set[str]:
        """Transitive subclasses in the data graph (excludes cls itself)."""
        children = self._subclass_children()
        out: set[str] = set()
        stack = [cls_enc]
        while stack:
            for ch in children.get(stack.pop(), ()):
                if ch not in out:
                    out.add(ch)
                    stack.append(ch)
        return out

    def class_instances_df(
        self, cls: Term, prefix: str = "focus", dedup: bool = True
    ) -> DataFrame:
        encs = list(self.data_subclasses(cls.encoded()) | {cls.encoded()})
        out = self.data.filter(
            (F.col("p") == RDF_TYPE_ENC) & F.col("o").isin(encs)
        )
        # callers that union several target pieces dedup once at the end
        # (dedup=False) — stacking a per-piece dedup under the union dedup
        # costs an extra aggregate pass over the same rows.
        # r6: dedup BEFORE decomposing — the 4 derived columns are pure
        # functions of the encoded subject, so deduping the single encoded
        # column (a HashAggregate with no aggregate buffers) and decomposing
        # after replaces a SortAggregate that carried 4 first(string) buffers
        # through a 5-column-wide exchange.
        if dedup:
            out = out.select(F.col("s").alias(prefix)).dropDuplicates([prefix])
            return out.select(*subject_decomposed(prefix, prefix))
        return out.select(*subject_decomposed("s", prefix))

    # --------------------------------------------------------------- targets
    def targets_frame(self, shape: Shape) -> DataFrame:
        """Focus-node frame for the shape's targets.  MEMOIZED by the
        target spec's content: real shape sets pile dozens of shapes onto
        the same few target classes, and without the cache each shape
        re-scanned rdf:type and re-deduped an identical frame (measured
        ~linear wall growth in shape count at 50 shapes; the cache makes
        the marginal shape pay only its own constraint joins).  Cached
        frames persist for the Engine's life — call release() when done
        with a long-lived engine."""
        spec = self.ir.target_spec(shape.node)
        key = (
            tuple(sorted(t.encoded() for t in spec.classes)),
            tuple(sorted(t.encoded() for t in spec.nodes)),
            tuple(sorted(t.encoded() for t in spec.subjects_of)),
            tuple(sorted(t.encoded() for t in spec.objects_of)),
        )
        hit = self._targets_cache.get(key)
        if hit is not None:
            return hit
        out = self._targets_frame_uncached(spec)
        if self.persist_values:
            out = out.persist()
        self._targets_cache[key] = out
        self._cached_target_ids[id(out)] = out
        return out

    def _targets_frame_uncached(self, spec) -> DataFrame:
        # fast path (r6): when every target piece is subject-derived
        # (targetClass / targetSubjectsOf), the 4 decomposed columns are pure
        # functions of the encoded subject — union the 1-column encoded
        # frames, distinct on that single column (HashAggregate, no
        # first(string) buffers, narrow exchange), decompose once after.
        # Node/objectsOf targets carry literal dt/lang that cannot be
        # re-derived from the encoded form, so they keep the 5-column dedup.
        if not spec.nodes and not spec.objects_of and (spec.classes or spec.subjects_of):
            enc_pieces: list[DataFrame] = []
            for cls in spec.classes:
                encs = list(self.data_subclasses(cls.encoded()) | {cls.encoded()})
                enc_pieces.append(
                    self.data.filter(
                        (F.col("p") == RDF_TYPE_ENC) & F.col("o").isin(encs)
                    ).select(F.col("s").alias("focus"))
                )
            for pred in spec.subjects_of:
                enc_pieces.append(
                    self.data.filter(F.col("p") == pred.encoded()).select(
                        F.col("s").alias("focus")
                    )
                )
            out = enc_pieces[0]
            for p in enc_pieces[1:]:
                out = out.unionByName(p)
            return out.dropDuplicates(["focus"]).select(
                *subject_decomposed("focus", "focus")
            )
        pieces: list[DataFrame] = []
        for cls in spec.classes:
            pieces.append(self.class_instances_df(cls, dedup=False))
        if spec.nodes:
            pieces.append(terms_frame(self.spark, spec.nodes, "focus"))
        for pred in spec.subjects_of:
            pieces.append(
                self.data.filter(F.col("p") == pred.encoded()).select(
                    *subject_decomposed("s", "focus")
                )
            )
        for pred in spec.objects_of:
            pieces.append(
                self.data.filter(F.col("p") == pred.encoded()).select(
                    *object_decomposed("focus")
                )
            )
        if not pieces:
            return self.spark.createDataFrame(
                [], StructType([StructField(c, StringType(), True) for c in term_cols("focus")])
            )
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out.dropDuplicates(["focus"])

    # ----------------------------------------------------------------- paths
    def eval_path(self, path: Path, focus_df: DataFrame) -> DataFrame:
        """focus frame -> (focus5, value5) via SPARQL-path algebra
        (ref: src/rdfquery.js:1024-1080; mapping SURVEY.md §2.3)."""
        start = focus_df.select(
            *term_cols("focus"),
            *[F.col(c).alias(c.replace("focus", "cur")) for c in term_cols("focus")],
        )
        out = self._walk(path, start)
        renamed = out.select(
            *term_cols("focus"),
            *[F.col(c.replace("value", "cur")).alias(c) for c in term_cols("value")],
        )
        if path.is_simple_pred:
            # breadcrumb for _count_frame (r6): a simple-pred value frame is
            # focus ⋈ trips(pred), so counts-per-focus can be computed by
            # aggregating the (filtered) triple side FIRST and left-joining
            # the focus frame once — "aggregate before you shuffle".  The
            # strong focus-frame ref makes the identity check GC-safe.
            renamed._graft_count_src = (focus_df, f"<{path.pred}>")
        # r6: only SEQ roots can emit duplicate (focus, value) pairs — two
        # intermediate routes reaching the same value.  pred/inverse hops
        # over a set-semantics triple frame are distinct per (focus, value)
        # by triple uniqueness, and alt/zeroOrOne/zeroOrMore/oneOrMore each
        # dedup inside _walk (the fixpoint accumulator is a disjoint union
        # of deduped frontiers) — the old blanket dedup re-sorted an
        # already-distinct frame for every non-pred path.
        if path.kind == "seq":
            renamed = renamed.dropDuplicates(["focus", "value"])
        return renamed

    def _hop_pred(self, df: DataFrame, pred_iri: str, inverse: bool = False) -> DataFrame:
        trips = self.trips(f"<{pred_iri}>")
        if not inverse:
            joined = df.join(trips, df["cur"] == trips["t_s"], "inner")
            new_cur = [
                trips["t_o"].alias("cur"),
                trips["t_o_v"].alias("cur_v"),
                trips["t_o_kind"].alias("cur_kind"),
                trips["t_o_dt"].alias("cur_dt"),
                trips["t_o_lang"].alias("cur_lang"),
            ]
        else:
            joined = df.join(trips, df["cur"] == trips["t_o"], "inner")
            s = trips["t_s"]
            is_b = s.startswith("_:")
            new_cur = [
                s.alias("cur"),
                F.when(is_b, s).otherwise(F.expr("substring(t_s, 2, length(t_s) - 2)")).alias("cur_v"),
                F.when(is_b, F.lit("bnode")).otherwise(F.lit("iri")).alias("cur_kind"),
                _NULL().alias("cur_dt"),
                _NULL().alias("cur_lang"),
            ]
        return joined.select(*[df[c] for c in term_cols("focus")], *new_cur)

    def _walk(self, path: Path, df: DataFrame) -> DataFrame:
        if path.kind == "pred":
            return self._hop_pred(df, path.pred)
        if path.kind == "inverse":
            return self._hop_pred(df, path.pred, inverse=True)
        if path.kind == "seq":
            cur = df
            for child in path.children:
                cur = self._walk(child, cur)
            return cur
        if path.kind == "alt":
            branches = [self._walk(c, df) for c in path.children]
            out = branches[0]
            for b in branches[1:]:
                out = out.unionByName(b)
            return out.dropDuplicates(["focus", "cur"])
        if path.kind == "zeroOrOne":
            return df.unionByName(self._walk(path.children[0], df)).dropDuplicates(
                ["focus", "cur"]
            )
        if path.kind in ("zeroOrMore", "oneOrMore"):
            child = path.children[0]
            if path.kind == "zeroOrMore":
                base = df.dropDuplicates(["focus", "cur"])
            else:
                base = self._walk(child, df).dropDuplicates(["focus", "cur"])
            # iterative fixpoint join with per-round checkpointing
            # (SURVEY.md §4 custom machinery #1; cycle guard = the anti-join).
            # r6: only FRONTIERS are checkpointed; acc stays a lazy union of
            # already-checkpointed frontiers, so each round runs 1 checkpoint
            # job + 1 cheap isEmpty over materialized partitions instead of
            # also re-materializing the whole accumulated set per round
            # (2 jobs/round saved; the union plan grows by one scan per
            # round, bounded by the traversal depth, and every leg is a
            # checkpoint scan so lineage stays flat).
            frontier = cut_lineage(base)
            acc = frontier
            while True:
                frontier = cut_lineage(
                    self._walk(child, frontier)
                    .dropDuplicates(["focus", "cur"])
                    .join(acc, ["focus", "cur"], "left_anti")
                )
                if frontier.isEmpty():
                    break
                acc = acc.unionByName(frontier)
            return acc
        raise ValueError(f"unknown path kind {path.kind}")

    # ----------------------------------------------------------- value nodes
    def values_frame(self, shape: Shape, focus_df: DataFrame) -> DataFrame:
        """(focus5, value5); node shapes use the focus itself
        (ref: shapes-graph.js:348-355)."""
        if shape.path is None:
            return focus_df.select(
                *term_cols("focus"),
                *[F.col(c).alias(c.replace("focus", "value")) for c in term_cols("focus")],
            )
        return self.eval_path(shape.path, focus_df)

    # ------------------------------------------------------------ validation
    def validate(self) -> ValidationReport:
        """Driver-side report (ref validateAll, validation-engine.js).

        Driver materialization is ALWAYS bounded: error_batch if set
        (validation-engine-configuration.js semantics), else
        max_driver_results (default 100k) — a non-conforming 100 TB graph
        must not OOM the driver because someone called the convenience API.
        report.truncated flags the cap; the full set stays distributed via
        report_df()."""
        out = self._all_violations()
        cap = self.error_batch if self.error_batch >= 0 else self.max_driver_results
        rows = out.limit(cap + 1).collect()
        truncated = len(rows) > cap
        if truncated:
            rows = rows[:cap]
            if self.error_batch < 0:
                logging.getLogger(__name__).warning(
                    "validation report truncated at max_driver_results=%d; "
                    "use report_df() for the full distributed report", cap,
                )
        return ValidationReport(
            [
                ValidationResult(
                    focus=decode_term(r["focus"]) if r["focus"] else None,
                    value=decode_term(r["value"]) if r["value"] else None,
                    path=decode_term(r["path"]) if r["path"] else None,
                    component=r["component"],
                    severity=r["severity"],
                    source_shape=decode_term(r["source_shape"]) if r["source_shape"] else None,
                    message=r["message"],
                )
                for r in rows
            ],
            truncated=truncated,
        )

    def report_df(self) -> DataFrame:
        """Full report as a DataFrame (for writing to parquet/Iceberg)."""
        return self._all_violations()

    def _all_violations(self) -> DataFrame:
        """Report rows for every shape-with-target, with CROSS-SHAPE fusion:
        row-wise value constraints from different shapes that share a
        memoized value frame (the dominant pattern of wide shape sets —
        many property shapes over the same target class and path) are
        deferred into _fuse_pool during the per-shape walk and flushed here
        as one fused pass per value frame.  Verdict/row multiplicity parity:
        the flush applies the exact per-constraint fail predicate, message,
        and (for property children) the same bubble-mapping inner join the
        unfused path would have applied — the join distributes over the
        union, so the emitted row multiset is identical."""
        shapes = self.ir.shapes_with_target()
        out = self._empty_viols().select(*RECORD_COLS)
        self._fuse_pool = {}
        self._fuse_pool_counts = {}
        # r6 (r5-verdict "skip pooling below k shapes"): cross-shape pooling
        # pays only when MULTIPLE top-level shapes can share memoized frames;
        # for a single-shape report the deferred-flush machinery is pure
        # overhead over the direct dispatch path.  Row-multiset parity
        # between the two paths is pinned by the fusion-parity tests.
        self._deferring = len(shapes) > 1
        self._pool_mapping = None
        try:
            for shape in shapes:
                targets = self.targets_frame(shape)
                out = out.unionByName(
                    self.shape_violations(shape, targets).select(*RECORD_COLS)
                )
            for pool, with_value in (
                (self._fuse_pool, True),
                (self._fuse_pool_counts, False),
            ):
                for frame, mapping, entries in pool.values():
                    rows = self._fused_rows(frame, entries, with_value=with_value)
                    if mapping is not None:
                        rows = rows.join(
                            mapping, rows["bubble"] == mapping["_pvalue"], "inner"
                        ).select(F.col("_pfocus").alias("bubble"), *VIOL_COLS[1:])
                    out = out.unionByName(rows.select(*RECORD_COLS))
        finally:
            self._deferring = False
            self._pool_mapping = None
            self._fuse_pool = {}
            self._fuse_pool_counts = {}
        return out

    def shape_violations(self, shape: Shape, focus_df: DataFrame) -> DataFrame:
        """All violation rows for `shape` over the given focus frame
        (ref: validateNodeAgainstShape, validation-engine.js:201-218)."""
        if shape.deactivated:
            return self._empty_viols()
        if self._stack.count(shape.node) >= self.max_shape_recursion:
            # A well-founded recursive schema (PersonShape -> sh:property ->
            # sh:node PersonShape) bottoms out via the empty-frontier check
            # in nonconforming() — but only once the data's recursion depth
            # is exhausted.  Reaching this cap therefore means cyclic data, a
            # path-free shape cycle (the reference would stack-overflow,
            # index.js:82-92), OR acyclic data deeper than the cap — the
            # error says so and names the knob.
            raise ShaclValidationError(
                f"recursive shape reference at {shape.node} exceeded "
                f"max_shape_recursion={self.max_shape_recursion}; either the "
                "data/shape graph is cyclic, or the acyclic recursion depth "
                "exceeds the cap — raise Engine(max_shape_recursion=...) for "
                "deeper finite data"
            )
        self._stack.append(shape.node)
        try:
            # value-frame memo: keyed by (focus-frame identity, path value),
            # and ONLY for focus frames served by the target cache — target
            # memoization hands every shape of a target spec the SAME frame
            # object, so shapes sharing (targets, path) reuse one persisted
            # path join.  Recursion-level frames (nonconforming passes a
            # fresh lineage-cut frame per level) are deliberately NOT
            # memoized: their identities never recur, and pinning them in
            # the dict would hold ~max_shape_recursion dead persisted
            # frames per recursive shape that the context cleaner could
            # otherwise reclaim mid-run.  Identity is re-checked against
            # the stored ref (id() alone could collide after GC).
            memoizable = self._cached_target_ids.get(id(focus_df)) is focus_df
            vkey = (id(focus_df), shape.path)
            hit = self._values_cache.get(vkey) if memoizable else None
            if hit is not None and hit[0] is focus_df:
                values = hit[1]
            else:
                values = self.values_frame(shape, focus_df)
                # several constraint branches (and, with the memo, several
                # shapes) consume the same value frame; persist so the
                # (possibly multi-hop) path join runs once.  Non-memoized
                # frames keep the pre-memo policy (persist only when >1
                # constraint shares them, released by scope like before).
                if memoizable and self.persist_values:
                    values = values.persist()
                    self._values_cache[vkey] = (focus_df, values)
                    self._cached_values_ids[id(values)] = values
                elif len(shape.constraints) > 1 and self.persist_values:
                    values = values.persist()
            # cross-shape pooling: inside validate()/report_df(), at depth
            # <= 2 (a top-level shape or its direct sh:property child — the
            # bubble mapping composes one level), row-wise checks defer into
            # the pool so shapes sharing a value frame flush as ONE pass.
            pooling = self._deferring and len(self._stack) <= 2
            fused, fused_counts, rest = self._split_fusible(
                shape, min_fuse=1 if pooling else 2, pool_counts=pooling
            )
            out = self._empty_viols()
            if fused:
                if pooling:
                    self._pool_add(self._fuse_pool, values, fused)
                else:
                    out = out.unionByName(
                        self._fused_rows(values, fused).select(*VIOL_COLS)
                    )
            if fused_counts:  # pooling-only by construction
                cf = _count_frame(self, focus_df, values)
                self._pool_add(self._fuse_pool_counts, cf, fused_counts)
            for constraint in rest:
                v = self._dispatch(shape, constraint, focus_df, values)
                if v is not None:
                    out = out.unionByName(v.select(*VIOL_COLS))
            return out
        finally:
            self._stack.pop()

    def _fusible_message(self, shape: Shape, c: Constraint) -> tuple[str | None, bool]:
        """(message, fusible): message parity with _dispatch — shape-level
        sh:message wins, else the component default (constant per constraint
        here).  fusible=False when the default needs row-level {?path}
        substitution, which only the unfused path implements."""
        if shape.messages:
            msg = self.MESSAGE_SEP.join(m.value for m in shape.messages)
        else:
            msg = self._default_message(shape, c)
        return msg, not (msg is not None and "{?path}" in msg)

    def _split_fusible(
        self, shape: Shape, min_fuse: int = 2, pool_counts: bool = False
    ) -> tuple[list, list, list[Constraint]]:
        """Partition a shape's constraints into (fused row-wise value checks,
        fused count checks, everything else).  A constraint fuses when its
        component is valid for this shape kind (style check parity with
        _dispatch: invalid usage must reach _dispatch and raise), has an
        _OK_CONDS / _COUNT_OKS condition builder that yields a Column, and
        its resolved message needs no row-level {?path} substitution.
        Outside the cross-shape pool, fusion fires only for >=2 value-check
        candidates — a lone constraint keeps the plain filter path (same
        plan, fewer moving parts); pooled contexts pass min_fuse=1 since
        other shapes may join the same group.  Count checks pool only when
        pool_counts (they fuse over the shared count frame, which only the
        report-walk flush knows how to emit)."""
        fused: list = []
        fused_counts: list = []
        for c in shape.constraints:
            style = (
                c.component.property_style
                if shape.is_property_shape
                else c.component.node_style
            )
            if c.component.custom or style is None:
                continue
            if pool_counts and c.component.iri in _COUNT_OKS:
                msg, fusible = self._fusible_message(shape, c)
                if fusible:
                    fused_counts.append(
                        (shape, c, _COUNT_OKS[c.component.iri](self, shape, c), msg)
                    )
                continue
            cond_fn = _OK_CONDS.get(c.component.iri)
            ok = cond_fn(self, shape, c) if cond_fn is not None else None
            if ok is None:
                continue
            msg, fusible = self._fusible_message(shape, c)
            if fusible:
                fused.append((shape, c, ok, msg))
        if len(fused) < min_fuse:
            fused = []
        taken = {id(c) for (_s, c, _o, _m) in fused}
        taken |= {id(c) for (_s, c, _o, _m) in fused_counts}
        rest = [c for c in shape.constraints if id(c) not in taken]
        return fused, fused_counts, rest

    def _pool_add(self, pool: dict[int, list], frame: DataFrame, entries: list) -> None:
        """Add fused entries to `frame`'s pool group.  The bubble mapping is
        captured from the CURRENT _property context at group creation; all
        shapes sharing a frame share one logically-identical mapping (both
        derive from the same memoized parent value frame)."""
        group = pool.get(id(frame))
        if group is None:
            pool[id(frame)] = [frame, self._pool_mapping, list(entries)]
        elif group[0] is not frame:
            # unreachable while the pool holds a strong ref to group[0]
            # (live id() collision impossible in CPython) — but if a future
            # change ever breaks that invariant, silently REPLACING the
            # group would drop already-pooled shapes' violation rows from
            # the report; fail loudly instead (code-review r5)
            raise ShaclValidationError(
                "fusion pool identity collision: two live frames share id(); "
                "pool keying must be made collision-safe"
            )
        else:
            group[2].extend(entries)

    def _fused_rows(
        self,
        values: DataFrame,
        fused: list[tuple[Shape, Constraint, Column, str | None]],
        with_value: bool = True,
    ) -> DataFrame:
        """ONE pass over the shared value frame evaluates every fused
        row-wise constraint: per-constraint fail structs (component +
        constant message/severity/source-shape/path) collect into an array,
        nulls are compacted out, and the array explodes into violation rows
        — k constraints (possibly from k different shapes sharing this
        value frame) cost one scan branch instead of k filter+union
        branches over the (persisted) frame.  This is the VERDICT-r4 #4
        fusion: with target/value/count frames already memoized, per-shape
        value checks were the remaining marginal cost in wide shape sets
        (50-shape bench)."""
        entries = []
        for shape, c, ok, msg in fused:
            path_col = (
                F.lit(shape.path_node.encoded())
                if shape.path_node is not None
                else _NULL()
            )
            entries.append(
                F.when(
                    ~ok,
                    F.struct(
                        F.lit(c.component.iri).alias("comp"),
                        (F.lit(msg) if msg is not None else _NULL()).alias("msg"),
                        F.lit(shape.severity.value).alias("sev"),
                        F.lit(shape.node.encoded()).alias("src"),
                        path_col.alias("pth"),
                    ),
                )
            )
        viol = F.explode(F.filter(F.array(*entries), lambda x: x.isNotNull()))
        exploded = values.select("*", viol.alias("_viol"))
        # count-frame groups have no value columns (createResult parity with
        # _rows(with_value=False): value stays null on count violations)
        value_cols = (
            [F.col(cn) for cn in term_cols("value")]
            if with_value
            else [_NULL().alias(cn) for cn in term_cols("value")]
        )
        return exploded.select(
            F.col("focus").alias("bubble"),
            *[F.col(cn) for cn in term_cols("focus")],
            *value_cols,
            F.col("_viol.pth").alias("path"),
            F.col("_viol.comp").alias("component"),
            F.col("_viol.sev").alias("severity"),
            F.col("_viol.src").alias("source_shape"),
            F.col("_viol.msg").alias("message"),
        )

    def nonconforming(self, shape_node: Term, nodes_df: DataFrame) -> DataFrame:
        """DF['node'] of nodes NOT conforming to the shape — the distributed
        analog of nodeConformsToShape (index.js:82-92); only the set
        membership escapes (result suppression, validation-engine.js:74-81).

        Recursive shapes (sh:node cycles) are unrolled DATA-DEPENDENTLY: on
        re-entry, an empty candidate frontier short-circuits (the recursion
        is well-founded on acyclic data and stops at the leaves), so e.g.
        PersonShape{ knows -> PersonShape } validates finite data exactly
        like the reference. The isEmpty action runs only on re-entry, never
        on the non-recursive fast path."""
        shape = self.ir.get_shape(shape_node)
        if shape.node in self._stack:
            # cut lineage at every recursion level: without this the logical
            # plan NESTS once per level and a ~30-deep chain OOMs the driver
            # during analysis before the depth cap can fire (observed:
            # java.lang.OutOfMemoryError in generateTreeString)
            nodes_df = cut_lineage(nodes_df)
            if nodes_df.isEmpty():
                return self.spark.range(0).select(
                    F.lit(None).cast("string").alias("node")
                )
        # conformance needs the COMPLETE violation set for this shape NOW —
        # cross-shape deferral would leak its rows into the report flush
        prev_deferring = self._deferring
        self._deferring = False
        try:
            viols = self.shape_violations(shape, nodes_df)
        finally:
            self._deferring = prev_deferring
        return viols.select(F.col("bubble").alias("node")).dropDuplicates(["node"])

    # --------------------------------------------------------------- helpers
    def _rows(
        self,
        df: DataFrame,
        shape: Shape,
        comp_iri: str,
        with_value: bool = True,
        path_col: Column | None = None,
        value_cols: list[Column] | None = None,
        message_col: Column | None = None,
        bubble_col: Column | None = None,
    ) -> DataFrame:
        """Normalize a failure frame into violation rows
        (ref: createResult, validation-engine.js:50-64)."""
        if path_col is None:
            path_col = (
                F.lit(shape.path_node.encoded()) if shape.path_node is not None else _NULL()
            )
        if value_cols is None:
            if with_value:
                value_cols = [F.col(c) for c in term_cols("value")]
            else:
                value_cols = [_NULL().alias(c) for c in term_cols("value")]
        if message_col is None:
            message_col = self._shape_message(shape)
        return df.select(
            (bubble_col if bubble_col is not None else F.col("focus")).alias("bubble"),
            *[F.col(c) for c in term_cols("focus")],
            *[c.alias(n) if not isinstance(c, str) else F.col(c).alias(n)
              for c, n in zip(value_cols, term_cols("value"))],
            path_col.alias("path"),
            F.lit(comp_iri).alias("component"),
            F.lit(shape.severity.value).alias("severity"),
            F.lit(shape.node.encoded()).alias("source_shape"),
            message_col.alias("message"),
        )

    #: separates multiple sh:message values inside the single message column;
    #: single source of truth is ValidationResult.MESSAGE_SEP (the splitter) —
    #: aliased here so the joiner and splitters cannot drift apart
    MESSAGE_SEP = ValidationResult.MESSAGE_SEP

    def _shape_message(self, shape: Shape) -> Column:
        # shape-level sh:message wins (createResultMessages,
        # validation-engine.js:149-173); ALL sh:message values are kept,
        # joined with MESSAGE_SEP for the sinks to split.
        if shape.messages:
            return F.lit(self.MESSAGE_SEP.join(m.value for m in shape.messages))
        return _NULL()

    def _num_param(self, t: Term) -> float | None:
        try:
            return float(t.value)
        except (TypeError, ValueError):
            return None

    def _values_as_candidates(self, values: DataFrame) -> DataFrame:
        return values.select(
            *[F.col(c).alias(c.replace("value", "focus")) for c in term_cols("value")]
        ).dropDuplicates(["focus"])

    # -------------------------------------------------------------- dispatch
    def _dispatch(
        self, shape: Shape, c: Constraint, targets: DataFrame, values: DataFrame
    ) -> DataFrame | None:
        comp = c.component
        style = comp.property_style if shape.is_property_shape else comp.node_style
        if comp.iri == SH + "PropertyConstraintComponent":
            return self._property(shape, c, targets, values)
        if style is None:
            raise ShaclValidationError(
                f"Cannot find validator for constraint component {comp.iri}"
            )
        if comp.custom:
            return self._custom(shape, c, targets, values, style)
        impl = _IMPLS.get(comp.iri)
        if impl is None:
            raise ShaclValidationError(
                f"Cannot find validator for constraint component {comp.iri}"
            )
        rows = impl(self, shape, c, targets, values)
        if rows is not None:
            default = self._default_message(shape, c)
            if default is not None:
                if "{?path}" in default:
                    # row-level substitution: closed/closedByTypes record the
                    # OFFENDING predicate in the path column
                    default_col = F.replace(
                        F.lit(default), F.lit("{?path}"), self._label_col(F.col("path"))
                    )
                else:
                    default_col = F.lit(default)
                rows = rows.withColumn(
                    "message", F.coalesce(F.col("message"), default_col)
                )
        return rows

    def _param_label(self, val: Term) -> str:
        """nodeLabel (validation-engine.js:6-29) incl. the Collection branch:
        an rdf:List param ({$in}, {$languageIn}) renders as the ', '-joined
        element labels, not 'Blank node _:bN'."""
        if val.is_bnode:
            try:
                items = self.shapes.rdf_list(val)
            except ValueError:
                items = []  # a non-list bnode (e.g. an inline shape)
            if items:
                return ", ".join(_node_label(t, self.shapes.prefixes) for t in items)
        return _node_label(val, self.shapes.prefixes)

    def _label_col(self, col: Column) -> Column:
        """Per-row nodeLabel for ENCODED terms ('<iri>' form): prefix-shorten
        against the shapes-graph namespaces, else keep the <iri> rendering."""
        import re as _re

        bare = F.regexp_extract(col, "^<(.*)>$", 1)
        out = col  # non-IRI encodings pass through
        for p, ns in self.shapes.prefixes.items():
            out = F.when(
                bare.startswith(ns),
                F.regexp_replace(bare, "^" + _re.escape(ns), p + ":"),
            ).otherwise(out)
        return out

    def _default_message(self, shape: Shape, c: Constraint) -> str | None:
        """Component default message with {$param}/{?param} substitution
        (ref: createResultMessages + withSubstitutions,
        validation-engine.js:149-173, 316-325); property-validator variants
        (dash.ttl:1245, :1157) win on property shapes."""
        msg = None
        if shape.is_property_shape:
            msg = PROPERTY_DEFAULT_MESSAGES.get(c.component.iri)
        if msg is None:
            msg = DEFAULT_MESSAGES.get(c.component.iri)
        if msg is None:
            return None
        for lname, val in c.params.items():
            if val is None:
                continue
            label = self._param_label(val)
            msg = msg.replace("{$" + lname + "}", label).replace("{?" + lname + "}", label)
        return msg

    # ---------------------------------------------------- constraint impls --
    # Each returns a violation frame or None. Citations point at the verdict
    # logic being reproduced (shared/dash.js).

    def _property(self, shape, c, targets, values):
        # sh:property — native recursion; child focus = parent value nodes
        # (validation-engine.js:224-232). Violations recorded with the CHILD's
        # focus/severity/shape; bubbled to the parent focus for conformance.
        child = self.ir.get_shape(c.param_value)
        # candidates memo: when `values` is one of the engine's shared value
        # frames (same (targets, path) across parent shapes), every parent's
        # sh:property dispatch hands the SAME candidates frame to its child —
        # which registers as a shared focus frame, so the CHILD's value/count
        # memos fire too.  Without this, each of N parent shapes over one
        # target class rebuilt the child focus frame and re-ran every child
        # path join (the dominant cost of wide shape sets).
        shared_vals = self._cached_values_ids.get(id(values)) is values
        hit = self._candidates_cache.get(id(values)) if shared_vals else None
        if hit is not None and hit[0] is values:
            candidates = hit[1]
        else:
            if shape.path is None:
                # node shape: values IS the focus frame, which is distinct by
                # construction (targets_frame ends in a dedup) — renaming is
                # enough, no third dedup pass over the same rows
                candidates = values.select(
                    *[F.col(c_).alias(c_.replace("value", "focus")) for c_ in term_cols("value")]
                )
            else:
                candidates = self._values_as_candidates(values)
            if shared_vals and self.persist_values:
                candidates = candidates.persist()
                self._candidates_cache[id(values)] = (values, candidates)
                self._cached_target_ids[id(candidates)] = candidates
        # r6: a path-less parent's value frame is the identity over its
        # distinct focus set, so the bubble mapping is (x -> x) with
        # multiplicity 1 — the join neither filters nor re-multiplies nor
        # changes any bubble value (child bubbles are drawn from candidates
        # = parent focus).  Skip it (one SortMergeJoin + two sorts per
        # NodeShape->sh:property query removed); pooled entries get a None
        # mapping and flush join-free for the same reason.
        identity_mapping = shape.path is None
        mapping = (
            None
            if identity_mapping
            else values.select(
                F.col("focus").alias("_pfocus"), F.col("value").alias("_pvalue")
            )
        )
        # pooled child checks bypass this mapping join (they flush in
        # _all_violations), so hand the child's pool entries THIS mapping
        prev_mapping = self._pool_mapping
        self._pool_mapping = mapping
        try:
            child_viols = self.shape_violations(child, candidates)
        finally:
            self._pool_mapping = prev_mapping
        if identity_mapping:
            return child_viols
        return (
            child_viols.join(mapping, child_viols["bubble"] == mapping["_pvalue"], "inner")
            .select(F.col("_pfocus").alias("bubble"), *VIOL_COLS[1:])
        )

    def _class(self, shape, c, targets, values):
        # validateClass (dash.js:27-29): instance-of incl. data-graph subclass
        # closure — broadcast-joined type closure.  The FAIL frame is memoized
        # per (shared value frame, class): N shapes asserting the same class
        # over the same (targets, path) — common in wide shape sets — share
        # one persisted anti-join instead of N scans of the value frame.
        cls = c.param_value
        shared = self._cached_values_ids.get(id(values)) is values
        key = (id(values), cls.encoded())
        hit = self._class_fail_cache.get(key) if shared else None
        if hit is not None and hit[0] is values:
            fail = hit[1]
        else:
            instances = self.class_instances_df(cls, "node").select("node")
            fail = values.join(
                F.broadcast(instances), values["value"] == instances["node"], "left_anti"
            )
            if shared and self.persist_values:
                fail = fail.persist()
                self._class_fail_cache[key] = (values, fail)
        return self._rows(fail, shape, c.component.iri)

# --------------------------------------------------------------------------
# Constraint implementations (module-level for a flat dispatch table).
# --------------------------------------------------------------------------

def _impl_class(eng: Engine, shape, c, targets, values):
    return eng._class(shape, c, targets, values)


def _cond_datatype(eng, shape, c):
    # validateDatatype (dash.js:92-99) + isValidForDatatype (dash.js:526-541):
    # exact datatype IRI equality; lexical check only for integer/decimal/
    # float (JS parseInt/parseFloat semantics) and boolean.
    dt = c.param_value.value
    ok = (F.col("value_kind") == "literal") & (F.col("value_dt") == dt)
    if dt == XSD_INTEGER:
        ok = ok & F.col("value_v").rlike(_INT_LEX)
    elif dt in (XSD_DECIMAL, XSD_FLOAT):
        ok = ok & F.col("value_v").rlike(_FLOAT_LEX)
    elif dt == XSD_BOOLEAN:
        ok = ok & F.col("value_v").isin(["true", "false"])
    return ok


def _impl_datatype(eng, shape, c, targets, values):
    return eng._rows(values.filter(~_cond_datatype(eng, shape, c)), shape, c.component.iri)


_NODEKIND_ALLOWED = {
    SH + "BlankNode": ["bnode"],
    SH + "IRI": ["iri"],
    SH + "Literal": ["literal"],
    SH + "BlankNodeOrIRI": ["bnode", "iri"],
    SH + "BlankNodeOrLiteral": ["bnode", "literal"],
    SH + "IRIOrLiteral": ["iri", "literal"],
}


def _cond_nodekind(eng, shape, c):
    allowed = _NODEKIND_ALLOWED.get(c.param_value.value, [])
    return F.col("value_kind").isin(allowed)


def _impl_nodekind(eng, shape, c, targets, values):
    fail = values.filter(~_cond_nodekind(eng, shape, c))
    return eng._rows(fail, shape, c.component.iri)


def _cond_pattern(eng, shape, c):
    """OK column for the Java-regex fast path; None when the pattern needs
    the Arrow/Python fallback (not fusible — it stays on the unfused path)."""
    flags = c.params.get("flags")
    flag_str = flags.value if flags else None
    java_re = _js_regex_to_java(c.params["pattern"].value, flag_str)
    if not _java_regex_compiles(eng.spark, java_re):
        return None
    return (F.col("value_kind") != "bnode") & F.col("value_v").rlike(java_re)


def _impl_pattern(eng, shape, c, targets, values):
    # validatePattern (dash.js:305-311): bnode fails; regex over value.value
    # (IRIs included). JS RegExp -> Java regex with inline flags (rlike,
    # whole-stage codegen fast path). Patterns Java rejects (JS-only syntax
    # like a dangling '{') fall back to an Arrow-vectorized Python re —
    # Python shares JS's lenient treatment of those constructs.
    ok = _cond_pattern(eng, shape, c)
    if ok is None:
        flags = c.params.get("flags")
        flag_str = flags.value if flags else None
        raw = c.params["pattern"].value
        import re as _re

        from pyspark.sql.functions import pandas_udf

        pyflags = 0
        for ch, fl in (("i", _re.I), ("m", _re.M), ("s", _re.S)):
            if flag_str and ch in flag_str:
                pyflags |= fl
        try:
            rx = _re.compile(raw, pyflags)
        except _re.error as e:
            raise ShaclValidationError(
                f"invalid sh:pattern {raw!r}: rejected by both Java regex "
                f"and the Python fallback ({e})"
            ) from e

        @pandas_udf("boolean")
        def _js_match(v: pd.Series) -> pd.Series:
            return v.map(lambda x: x is not None and rx.search(x) is not None)

        ok = (F.col("value_kind") != "bnode") & _js_match(F.col("value_v"))
    return eng._rows(values.filter(~ok), shape, c.component.iri)


def _cond_minlength(eng, shape, c):
    n = eng._num_param(c.param_value)
    return (F.col("value_kind") != "bnode") & (F.length("value_v") >= F.lit(n))


def _impl_minlength(eng, shape, c, targets, values):
    return eng._rows(values.filter(~_cond_minlength(eng, shape, c)), shape, c.component.iri)


def _cond_maxlength(eng, shape, c):
    n = eng._num_param(c.param_value)
    return (F.col("value_kind") != "bnode") & (F.length("value_v") <= F.lit(n))


def _impl_maxlength(eng, shape, c, targets, values):
    return eng._rows(values.filter(~_cond_maxlength(eng, shape, c)), shape, c.component.iri)


def _range_cond(op):
    def cond(eng, shape, c):
        # validateMin/MaxInclusive/Exclusive (dash.js:223-249): literal-only,
        # JS Number() coercion on both sides; NaN comparisons fail.
        bound = eng._num_param(c.param_value)
        if bound is None:
            return F.lit(False)
        num = js_number(F.col("value_v"))
        return (F.col("value_kind") == "literal") & num.isNotNull() & op(num, F.lit(bound))

    return cond


def _range_impl(op):
    cond = _range_cond(op)

    def impl(eng, shape, c, targets, values):
        return eng._rows(values.filter(~cond(eng, shape, c)), shape, c.component.iri)

    return impl


def _cond_in(eng, shape, c):
    # validateIn (dash.js:163-167): term-identity membership in shapes-graph list
    members = [t.encoded() for t in eng.shapes.rdf_list(c.param_value)]
    return F.col("value").isin(members)


def _impl_in(eng, shape, c, targets, values):
    fail = values.filter(~_cond_in(eng, shape, c))
    return eng._rows(fail, shape, c.component.iri)


def _cond_languagein(eng, shape, c):
    # validateLanguageIn (dash.js:169-184): literal with nonempty lang whose
    # tag STARTS WITH one of the listed tags.
    tags = [t.value for t in eng.shapes.rdf_list(c.param_value)]
    lang_ok = F.lit(False)
    for t in tags:
        lang_ok = lang_ok | F.col("value_lang").startswith(t)
    return (
        (F.col("value_kind") == "literal")
        & F.col("value_lang").isNotNull()
        & (F.col("value_lang") != "")
        & lang_ok
    )


def _impl_languagein(eng, shape, c, targets, values):
    return eng._rows(values.filter(~_cond_languagein(eng, shape, c)), shape, c.component.iri)


def _cond_stem(eng, shape, c):
    return (F.col("value_kind") == "iri") & F.col("value_v").startswith(c.param_value.value)


def _impl_stem(eng, shape, c, targets, values):
    return eng._rows(values.filter(~_cond_stem(eng, shape, c)), shape, c.component.iri)


def _impl_rootclass(eng, shape, c, targets, values):
    # validateRootClass (dash.js:365-367): zeroOrMore(subClassOf) reachability
    root = c.param_value.encoded()
    reach = list(eng.data_subclasses(root) | {root})
    fail = values.filter(~F.col("value").isin(reach))
    return eng._rows(fail, shape, c.component.iri)


def _impl_subsetof(eng, shape, c, targets, values):
    # validateSubSetOf (dash.js:373-375): (focus, subSetOf, value) must exist
    trips = eng.trips(c.param_value.encoded())
    fail = values.join(
        trips, (values["focus"] == trips["t_s"]) & (values["value"] == trips["t_o"]), "left_anti"
    )
    return eng._rows(fail, shape, c.component.iri)


def _impl_disjoint(eng, shape, c, targets, values):
    # validateDisjoint (dash.js:101-103): violation if (focus, disjoint, value) exists
    trips = eng.trips(c.param_value.encoded())
    fail = values.join(
        trips, (values["focus"] == trips["t_s"]) & (values["value"] == trips["t_o"]), "left_semi"
    )
    return eng._rows(fail, shape, c.component.iri)


def _impl_hasvalue(eng, shape, c, targets, values):
    want = c.param_value.encoded()
    if shape.is_property_shape:
        # validateHasValueProperty (dash.js:151-154): ∃ path value == hasValue
        have = values.filter(F.col("value") == want).select("focus").dropDuplicates()
        fail = targets.join(have, "focus", "left_anti")
    else:
        # validateHasValueNode (dash.js:147-149): focus == hasValue
        fail = targets.filter(F.col("focus") != want)
    return eng._rows(fail, shape, c.component.iri, with_value=False)


def _impl_hasvaluewithclass(eng, shape, c, targets, values):
    # validateHasValueWithClass (dash.js:156-161)
    instances = eng.class_instances_df(c.param_value, "node").select("node")
    have = (
        values.join(F.broadcast(instances), values["value"] == instances["node"], "left_semi")
        .select("focus")
        .dropDuplicates()
    )
    fail = targets.join(have, "focus", "left_anti")
    return eng._rows(fail, shape, c.component.iri, with_value=False)


def _count_frame(eng, targets: DataFrame, values: DataFrame) -> DataFrame:
    """(focus5, _cnt) per target.  MEMOIZED per (targets, values) identity
    when the focus frame came from the engine's target cache: minCount and
    maxCount shapes sharing (targets, path) — e.g. "at least 1" and "at
    most 1" over the same property across a wide shape set — reuse one
    persisted aggregation instead of re-shuffling the value frame each."""
    memoizable = eng._cached_target_ids.get(id(targets)) is targets
    key = (id(targets), id(values))
    if memoizable:
        hit = eng._counts_cache.get(key)
        if hit is not None and hit[0] is targets and hit[1] is values:
            return hit[2]
    src = getattr(values, "_graft_count_src", None)
    if src is not None and src[0] is targets:
        # r6 "aggregate before you shuffle": the value frame is
        # targets ⋈ trips(pred), so per-focus value counts equal the
        # per-subject row counts of the filtered triple side — aggregate
        # that side directly (map-side partial agg over the narrow (p, s)
        # projection) and left-join targets once, skipping the wide
        # values SortMergeJoin entirely.  Join-multiplicity parity: values
        # rows per focus == trips rows with t_s == focus, and `value` (the
        # triple object) is never null, so count("value") == count(*).
        counts = (
            eng.data.filter(F.col("p") == src[1])
            .groupBy(F.col("s").alias("focus"))
            .agg(F.count("*").alias("_cnt"))
        )
    else:
        counts = values.groupBy("focus").agg(F.count("value").alias("_cnt"))
    out = targets.join(counts, "focus", "left").withColumn(
        "_cnt", F.coalesce(F.col("_cnt"), F.lit(0))
    )
    if memoizable and eng.persist_values:
        out = out.persist()
        eng._counts_cache[key] = (targets, values, out)
    return out


def _impl_mincount(eng, shape, c, targets, values):
    n = eng._num_param(c.param_value)
    fail = _count_frame(eng, targets, values).filter(~(F.col("_cnt") >= F.lit(n)))
    return eng._rows(fail, shape, c.component.iri, with_value=False)


def _impl_maxcount(eng, shape, c, targets, values):
    n = eng._num_param(c.param_value)
    fail = _count_frame(eng, targets, values).filter(~(F.col("_cnt") <= F.lit(n)))
    return eng._rows(fail, shape, c.component.iri, with_value=False)


def _impl_uniquelang(eng, shape, c, targets, values):
    # validateUniqueLangProperty (dash.js:377-404): per overused language one
    # violation with the exact message string; no value recorded.
    if c.param_value != TRUE:
        return None
    langs = (
        values.filter(
            (F.col("value_kind") == "literal")
            & F.col("value_lang").isNotNull()
            & (F.col("value_lang") != "")
        )
        .groupBy(*term_cols("focus"), "value_lang")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
    )
    msg = F.format_string('Language "%s" has been used by %d values', F.col("value_lang"), F.col("_n"))
    return eng._rows(langs, shape, c.component.iri, with_value=False, message_col=msg)


def _equals_prop_frames(eng, c, targets, values):
    trips = eng.trips(c.param_value.encoded())
    return targets.join(trips, targets["focus"] == trips["t_s"], "inner").select(
        *[targets[x] for x in term_cols("focus")],
        F.col("t_o").alias("value"),
        F.col("t_o_v").alias("value_v"),
        F.col("t_o_kind").alias("value_kind"),
        F.col("t_o_dt").alias("value_dt"),
        F.col("t_o_lang").alias("value_lang"),
    )


def _impl_equals(eng, shape, c, targets, values):
    comp_iri = c.component.iri
    if shape.is_property_shape:
        # validateEqualsProperty (dash.js:105-125): symmetric difference,
        # one violation per missing member on either side.
        other = _equals_prop_frames(eng, c, targets, values)
        # anti-join on (focus, value) both directions
        a = values.select(*term_cols("focus"), *term_cols("value"))
        b = other.select(*term_cols("focus"), *term_cols("value"))
        miss1 = a.join(b.select("focus", "value"), ["focus", "value"], "left_anti")
        miss2 = b.join(a.select("focus", "value"), ["focus", "value"], "left_anti")
        return eng._rows(miss1.unionByName(miss2), shape, comp_iri)
    # validateEqualsNode (dash.js:127-145): every value of the equals
    # predicate must equal the focus; zero values -> one violation (value=focus)
    other = _equals_prop_frames(eng, c, targets, values)
    neq = other.filter(F.col("value") != F.col("focus"))
    empty = targets.join(other.select("focus").dropDuplicates(), "focus", "left_anti")
    self_val = empty.select(
        *term_cols("focus"),
        *[F.col(x).alias(x.replace("focus", "value")) for x in term_cols("focus")],
    )
    return eng._rows(neq.unionByName(self_val), shape, comp_iri)


def _lessthan_impl(strict: bool):
    def impl(eng, shape, c, targets, values):
        # validateLessThan(/OrEquals)Property (dash.js:186-216): cross product
        # of path values × other-prop values per focus; incomparable (mixed
        # datatypes) or cmp >= 0 (> 0) is a violation; string comparison.
        other = _equals_prop_frames(eng, c, targets, values).select(
            F.col("focus").alias("_f2"),
            *[F.col(x).alias(x.replace("value", "_o")) for x in term_cols("value")],
        )
        pairs = values.join(other, values["focus"] == other["_f2"], "inner")
        cmp_bad = F.when(_incomparable("value", "_o"), F.lit(True)).otherwise(
            _cmp_struct("value") >= _cmp_struct("_o") if strict
            else _cmp_struct("value") > _cmp_struct("_o")
        )
        return eng._rows(pairs.filter(cmp_bad), shape, c.component.iri)

    return impl


def _impl_closed(eng, shape, c, targets, values):
    # validateClosed (dash.js:31-54): allowed = IRI paths of this shape's
    # property shapes + sh:ignoredProperties; one violation per offending
    # (predicate, object) with custom path/value. rdf:type NOT auto-ignored.
    if c.params.get("closed") != TRUE:
        return None
    allowed: list[str] = []
    for pshape in eng.shapes.objects(shape.node, iri(SH + "property")):
        p = eng.shapes.object(pshape, iri(SH + "path"))
        if p is not None and p.is_iri:
            allowed.append(p.encoded())
    ignored = c.params.get("ignoredProperties")
    if ignored is not None:
        allowed += [t.encoded() for t in eng.shapes.rdf_list(ignored)]
    trips = eng.trips()
    off = values.join(trips, values["value"] == trips["t_s"], "inner").filter(
        ~trips["t_p"].isin(allowed)
    )
    return eng._rows(
        off,
        shape,
        c.component.iri,
        path_col=F.col("t_p"),
        value_cols=[F.col("t_o"), F.col("t_o_v"), F.col("t_o_kind"), F.col("t_o_dt"), F.col("t_o_lang")],
    )


def _impl_closedbytypes(eng, shape, c, targets, values):
    # validateClosedByTypesNode (dash.js:56-83): allowed props come from the
    # focus node's rdf:type closure joined to shapes-graph property paths.
    if c.param_value != TRUE:
        return None
    # shapes-graph side: class -> allowed predicate encs (driver, KB-sized)
    cls_props: dict[str, list[str]] = {}
    for (cls_node, _, pshape) in eng.shapes.find(None, iri(SH + "property"), None):
        p = eng.shapes.object(pshape, iri(SH + "path"))
        if p is not None and p.is_iri:
            cls_props.setdefault(cls_node.encoded(), []).append(p.encoded())
    # data side: focus -> direct types, then zeroOrMore(subClassOf) UP in
    # data. Invert the Engine-cached parent->children map (one collect per
    # Engine lifetime, shared with sh:class) instead of re-collecting here.
    parents: dict[str, list[str]] = {}
    for parent, children in eng._subclass_children().items():
        for child in children:
            parents.setdefault(child, []).append(parent)

    def super_closure(t: str) -> set[str]:
        out = {t}
        stack = [t]
        while stack:
            for par in parents.get(stack.pop(), ()):
                if par not in out:
                    out.add(par)
                    stack.append(par)
        return out

    # allowed (type -> preds) expanded over the data-graph superclass closure
    allowed_rows = []
    for cls_enc, preds in cls_props.items():
        allowed_rows.append((cls_enc, preds))
    typed = eng.data.filter(F.col("p") == RDF_TYPE_ENC).select(
        F.col("s").alias("_n"), F.col("o").alias("_t")
    )
    # expand each focus's direct types to their superclosure driver-side map
    # via a broadcast mapping (type -> allowed preds over closure); the type
    # list is cached + size-capped on the Engine
    all_types = eng.distinct_types()
    type_allowed: list[tuple[str, str]] = []
    for t in all_types:
        preds: set[str] = set()
        for sup in super_closure(t):
            preds.update(cls_props.get(sup, ()))
        for pe in preds:
            type_allowed.append((t, pe))
    if type_allowed:
        allowed_df = eng.spark.createDataFrame(type_allowed, ["_t", "_pred"])
        focus_allowed = (
            targets.join(typed, targets["focus"] == typed["_n"], "inner")
            .join(F.broadcast(allowed_df), "_t", "inner")
            .select("focus", "_pred")
            .dropDuplicates()
        )
    else:
        focus_allowed = eng.spark.createDataFrame([], "focus string, _pred string")
    trips = eng.trips()
    fa = focus_allowed.select(
        F.col("focus").alias("_fa_focus"), F.col("_pred").alias("_fa_pred")
    )
    off = (
        targets.join(trips, targets["focus"] == trips["t_s"], "inner")
        .filter(trips["t_p"] != RDF_TYPE_ENC)
        .join(
            fa,
            (F.col("focus") == fa["_fa_focus"]) & (trips["t_p"] == fa["_fa_pred"]),
            "left_anti",
        )
    )
    return eng._rows(
        off,
        shape,
        c.component.iri,
        path_col=F.col("t_p"),
        value_cols=[F.col("t_o"), F.col("t_o_v"), F.col("t_o_kind"), F.col("t_o_dt"), F.col("t_o_lang")],
    )


def _impl_coexistswith(eng, shape, c, targets, values):
    # validateCoExistsWith (dash.js:85-90): (∃ path value) must equal (∃ coProp value)
    has1 = values.select("focus").dropDuplicates().withColumn("_h1", F.lit(1))
    has2 = (
        eng.data.filter(F.col("p") == c.param_value.encoded())
        .select(F.col("s").alias("focus"))
        .dropDuplicates()
        .withColumn("_h2", F.lit(1))
    )
    flags = targets.join(has1, "focus", "left").join(has2, "focus", "left")
    fail = flags.filter(
        F.coalesce(F.col("_h1"), F.lit(0)) != F.coalesce(F.col("_h2"), F.lit(0))
    )
    return eng._rows(fail, shape, c.component.iri, with_value=False)


def _impl_uniquevalueforclass(eng, shape, c, targets, values):
    # validateUniqueValueForClass (dash.js:406-424): violation per (other
    # instance of the class sharing a path value, value) pair.  Self-join on
    # the value column — the skew-prone join SURVEY §2.6 flags; the instance
    # filter is applied BEFORE the join to bound the hot side.
    if shape.path is None or not shape.path.is_simple_pred:
        raise ShaclValidationError(
            "dash:uniqueValueForClass requires a simple predicate path"
        )
    # instance frame is one row per class member — corpus-sized, NOT
    # broadcastable at scale (observed: 4g-driver heap OOM broadcasting
    # 1.5M instance IRIs at sf1); shuffle-hash keys both sides on the
    # subject and builds the per-partition hash from the instance rows
    instances = eng.class_instances_df(c.param_value, "node").select("node")
    others = (
        eng.trips(f"<{shape.path.pred}>")
        .join(instances.hint("shuffle_hash"), F.col("t_s") == F.col("node"), "left_semi")
        .select(F.col("t_s").alias("_other"), F.col("t_o").alias("_oval"))
    )
    fail = values.join(
        others,
        (values["value"] == others["_oval"]) & (values["focus"] != others["_other"]),
        "inner",
    )
    return eng._rows(fail, shape, c.component.iri)


def _impl_nonrecursive(eng, shape, c, targets, values):
    # validateNonRecursiveProperty (dash.js:280-289)
    if c.param_value != TRUE:
        return None
    fail = values.filter(F.col("value") == F.col("focus")).dropDuplicates(["focus"])
    return eng._rows(fail, shape, c.component.iri)


def _encode_uri_component(col):
    """JS encodeURIComponent as a Column expression. Java URLEncoder
    (F.url_encode, UTF-8, uppercase hex) differs from encodeURIComponent in
    exactly seven tokens: space -> '+' vs '%20', and !~'()* which
    encodeURIComponent leaves bare; fix those up deterministically."""
    out = F.url_encode(col)
    for src, dst in [
        ("+", "%20"), ("%21", "!"), ("%7E", "~"),
        ("%27", "'"), ("%28", "("), ("%29", ")"),
    ]:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def _impl_primarykey(eng, shape, c, targets, values):
    # validatePrimaryKeyProperty (dash.js:313-325): three failure modes with
    # exact message strings; encodeURIComponent parity stays JVM-side
    # (vectorized url_encode + finite fix-ups, no Python in the path).
    uri_start = c.param_value.value
    cnt = _count_frame(eng, targets, values)
    first_val = values.groupBy("focus").agg(F.min("value_v").alias("_val"))
    frame = cnt.join(first_val, "focus", "left")
    expected = F.concat(F.lit(uri_start), _encode_uri_component(F.col("_val")))
    msg = (
        F.when(F.col("focus_kind") != "iri", F.lit("Must be an IRI"))
        .when(F.col("_cnt") != 1, F.lit("Must have exactly one value"))
        .when(F.col("focus_v") != expected, F.concat(F.lit("Does not have URI "), expected))
        .otherwise(_NULL())
    )
    fail = frame.withColumn("_msg", msg).filter(F.col("_msg").isNotNull())
    return eng._rows(fail, shape, c.component.iri, with_value=False, message_col=F.col("_msg"))


# ---- logical components (conformance joins) ----

def _impl_and(eng, shape, c, targets, values):
    # validateAnd (dash.js:17-25): value fails if ANY member shape rejects it
    members = eng.shapes.rdf_list(c.param_value)
    candidates = eng._values_as_candidates(values)
    nc_union = None
    for m in members:
        nc = eng.nonconforming(m, candidates)
        nc_union = nc if nc_union is None else nc_union.unionByName(nc)
    if nc_union is None:
        return None
    nc_union = nc_union.dropDuplicates(["node"])
    fail = values.join(nc_union, values["value"] == nc_union["node"], "left_semi")
    return eng._rows(fail, shape, c.component.iri)


def _impl_or(eng, shape, c, targets, values):
    # validateOr (dash.js:295-303): value fails if ALL member shapes reject it
    members = eng.shapes.rdf_list(c.param_value)
    candidates = eng._values_as_candidates(values)
    fail_set = candidates.select(F.col("focus").alias("node"))
    for m in members:
        nc = eng.nonconforming(m, candidates)
        fail_set = fail_set.join(nc, "node", "left_semi")
    fail = values.join(fail_set, values["value"] == fail_set["node"], "left_semi")
    return eng._rows(fail, shape, c.component.iri)


def _impl_not(eng, shape, c, targets, values):
    # validateNot (dash.js:291-293): value fails if it CONFORMS
    candidates = eng._values_as_candidates(values)
    nc = eng.nonconforming(c.param_value, candidates)
    conforming = candidates.select(F.col("focus").alias("node")).join(nc, "node", "left_anti")
    fail = values.join(conforming, values["value"] == conforming["node"], "left_semi")
    return eng._rows(fail, shape, c.component.iri)


def _impl_xone(eng, shape, c, targets, values):
    # validateXone (dash.js:426-435): exactly one member must conform
    members = eng.shapes.rdf_list(c.param_value)
    candidates = eng._values_as_candidates(values)
    conf_union = None
    for m in members:
        nc = eng.nonconforming(m, candidates)
        conf = candidates.select(F.col("focus").alias("node")).join(nc, "node", "left_anti")
        conf_union = conf if conf_union is None else conf_union.unionByName(conf)
    counts = (
        conf_union.groupBy("node").agg(F.count("*").alias("_n"))
        if conf_union is not None
        else None
    )
    cand_nodes = candidates.select(F.col("focus").alias("node"))
    if counts is None:
        fail_set = cand_nodes
    else:
        fail_set = (
            cand_nodes.join(counts, "node", "left")
            .filter(F.coalesce(F.col("_n"), F.lit(0)) != 1)
            .select("node")
        )
    fail = values.join(fail_set, values["value"] == fail_set["node"], "left_semi")
    return eng._rows(fail, shape, c.component.iri)


def _impl_node(eng, shape, c, targets, values):
    # validateNode (dash.js:276-278)
    candidates = eng._values_as_candidates(values)
    nc = eng.nonconforming(c.param_value, candidates)
    fail = values.join(nc, values["value"] == nc["node"], "left_semi")
    return eng._rows(fail, shape, c.component.iri)


def _qualified_impl(is_min: bool):
    def impl(eng, shape, c, targets, values):
        # validateQualifiedMin/MaxCountProperty + helper (dash.js:327-363)
        qshape = c.params["qualifiedValueShape"]
        bound = eng._num_param(
            c.params["qualifiedMinCount" if is_min else "qualifiedMaxCount"]
        )
        candidates = eng._values_as_candidates(values)
        nc = eng.nonconforming(qshape, candidates)
        cand_nodes = candidates.select(F.col("focus").alias("node"))
        conf = cand_nodes.join(nc, "node", "left_anti")
        qualified = values.join(conf, values["value"] == conf["node"], "left_semi")
        disjoint = c.params.get("qualifiedValueShapesDisjoint")
        if disjoint == TRUE:
            siblings = []
            for parent in eng.shapes.subjects(iri(SH + "property"), shape.node):
                for sib in eng.shapes.objects(parent, iri(SH + "property")):
                    for sib_q in eng.shapes.objects(sib, iri(SH + "qualifiedValueShape")):
                        if sib_q != qshape:
                            siblings.append(sib_q)
            for sib_q in siblings:
                sib_nc = eng.nonconforming(sib_q, candidates)
                sib_conf = cand_nodes.join(sib_nc, "node", "left_anti")
                qualified = qualified.join(
                    sib_conf, qualified["value"] == sib_conf["node"], "left_anti"
                )
        counts = qualified.groupBy("focus").agg(F.count("*").alias("_cnt"))
        frame = targets.join(counts, "focus", "left").withColumn(
            "_cnt", F.coalesce(F.col("_cnt"), F.lit(0))
        )
        cond = (F.col("_cnt") >= F.lit(bound)) if is_min else (F.col("_cnt") <= F.lit(bound))
        return eng._rows(frame.filter(~cond), shape, c.component.iri, with_value=False)

    return impl


#: row-wise value-constraint OK conditions usable by the fused single-pass
#: evaluator (Engine._fused_rows): each builder returns the per-row OK
#: Column over a (focus5, value5) frame, or None when this instance cannot
#: be fused (e.g. a pattern needing the Arrow/Python fallback) — those go
#: down the ordinary _dispatch path.
_OK_CONDS = {
    SH + "DatatypeConstraintComponent": _cond_datatype,
    SH + "NodeKindConstraintComponent": _cond_nodekind,
    SH + "PatternConstraintComponent": _cond_pattern,
    SH + "MinLengthConstraintComponent": _cond_minlength,
    SH + "MaxLengthConstraintComponent": _cond_maxlength,
    SH + "MinInclusiveConstraintComponent": _range_cond(lambda a, b: a >= b),
    SH + "MinExclusiveConstraintComponent": _range_cond(lambda a, b: a > b),
    SH + "MaxInclusiveConstraintComponent": _range_cond(lambda a, b: a <= b),
    SH + "MaxExclusiveConstraintComponent": _range_cond(lambda a, b: a < b),
    SH + "InConstraintComponent": _cond_in,
    SH + "LanguageInConstraintComponent": _cond_languagein,
    DASH + "StemConstraintComponent": _cond_stem,
}

#: count-constraint OK conditions over the shared COUNT frame ((focus5,
#: _cnt) from _count_frame) for the cross-shape pool: min/maxCount shapes
#: sharing (targets, path) flush as one pass over one persisted aggregation.
_COUNT_OKS = {
    SH + "MinCountConstraintComponent": (
        lambda eng, shape, c: F.col("_cnt") >= F.lit(eng._num_param(c.param_value))
    ),
    SH + "MaxCountConstraintComponent": (
        lambda eng, shape, c: F.col("_cnt") <= F.lit(eng._num_param(c.param_value))
    ),
}

_IMPLS = {
    SH + "ClassConstraintComponent": _impl_class,
    SH + "DatatypeConstraintComponent": _impl_datatype,
    SH + "NodeKindConstraintComponent": _impl_nodekind,
    SH + "PatternConstraintComponent": _impl_pattern,
    SH + "MinLengthConstraintComponent": _impl_minlength,
    SH + "MaxLengthConstraintComponent": _impl_maxlength,
    SH + "MinInclusiveConstraintComponent": _range_impl(lambda a, b: a >= b),
    SH + "MinExclusiveConstraintComponent": _range_impl(lambda a, b: a > b),
    SH + "MaxInclusiveConstraintComponent": _range_impl(lambda a, b: a <= b),
    SH + "MaxExclusiveConstraintComponent": _range_impl(lambda a, b: a < b),
    SH + "InConstraintComponent": _impl_in,
    SH + "LanguageInConstraintComponent": _impl_languagein,
    SH + "UniqueLangConstraintComponent": _impl_uniquelang,
    SH + "HasValueConstraintComponent": _impl_hasvalue,
    SH + "MinCountConstraintComponent": _impl_mincount,
    SH + "MaxCountConstraintComponent": _impl_maxcount,
    SH + "EqualsConstraintComponent": _impl_equals,
    SH + "DisjointConstraintComponent": _impl_disjoint,
    SH + "LessThanConstraintComponent": _lessthan_impl(strict=True),
    SH + "LessThanOrEqualsConstraintComponent": _lessthan_impl(strict=False),
    SH + "ClosedConstraintComponent": _impl_closed,
    SH + "AndConstraintComponent": _impl_and,
    SH + "OrConstraintComponent": _impl_or,
    SH + "NotConstraintComponent": _impl_not,
    SH + "XoneConstraintComponent": _impl_xone,
    SH + "NodeConstraintComponent": _impl_node,
    SH + "QualifiedMinCountConstraintComponent": _qualified_impl(is_min=True),
    SH + "QualifiedMaxCountConstraintComponent": _qualified_impl(is_min=False),
    DASH + "ClosedByTypesConstraintComponent": _impl_closedbytypes,
    DASH + "CoExistsWithConstraintComponent": _impl_coexistswith,
    DASH + "HasValueWithClassConstraintComponent": _impl_hasvaluewithclass,
    DASH + "NonRecursiveConstraintComponent": _impl_nonrecursive,
    DASH + "UniqueValueForClassConstraintComponent": _impl_uniquevalueforclass,
    DASH + "PrimaryKeyConstraintComponent": _impl_primarykey,
    DASH + "RootClassConstraintComponent": _impl_rootclass,
    DASH + "StemConstraintComponent": _impl_stem,
    DASH + "SubSetOfConstraintComponent": _impl_subsetof,
}


# custom-component dispatch (registry.py) — attached to Engine here to keep
# the impl table and the class in one module.
def _node_label(t: Term, prefixes: dict) -> str:
    """ref: nodeLabel (validation-engine.js:6-29)."""
    if t.is_iri:
        for p, ns in prefixes.items():
            if t.value.startswith(ns):
                return f"{p}:{t.value[len(ns):]}"
        return f"<{t.value}>"
    if t.is_bnode:
        return "Blank node " + t.value
    return t.value


def _custom_default_message(self: Engine, shape, c) -> str | None:
    """Validator-level (then component-level) sh:message with {$param}/{?param}
    substitution (ref: createResultMessages + withSubstitutions,
    validation-engine.js:149-173, 316-325)."""
    comp_node = iri(c.component.iri)
    msg = None
    preds = ([SH + "propertyValidator", SH + "validator"] if shape.is_property_shape
             else [SH + "nodeValidator", SH + "validator"])
    for pred in preds:
        for v in self.shapes.objects(comp_node, iri(pred)):
            m = self.shapes.object(v, iri(SH + "message"))
            if m is not None:
                msg = m.value
                break
        if msg:
            break
    if msg is None:
        m = self.shapes.object(comp_node, iri(SH + "message"))
        msg = m.value if m is not None else None
    if msg is None:
        return None
    for lname, val in c.params.items():
        label = _node_label(val, self.shapes.prefixes)
        msg = msg.replace("{$" + lname + "}", label).replace("{?" + lname + "}", label)
    return msg


def _custom(self: Engine, shape, c, targets, values, style):
    if self.registry is None:
        raise ShaclValidationError(
            f"Cannot find validator for constraint component {c.component.iri}"
        )
    fn_name = self.ir.validator_function_name(c.component, shape.is_property_shape)
    validator = self.registry.resolve(c.component.iri, fn_name)
    if validator is None:
        raise ShaclValidationError(
            f"Cannot find validator for constraint component {c.component.iri}"
        )
    rows = validator(self, shape, c, targets, values, style)
    if rows is None:
        return None
    shape_msg = (
        Engine.MESSAGE_SEP.join(m.value for m in shape.messages)
        if shape.messages else None
    )
    default = _custom_default_message(self, shape, c)
    return rows.withColumn(
        "message",
        F.coalesce(
            F.col("message"),
            F.lit(shape_msg) if shape_msg is not None else _NULL(),
            F.lit(default) if default is not None else _NULL(),
        ),
    )


Engine._custom = _custom
