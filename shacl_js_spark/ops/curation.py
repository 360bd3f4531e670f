"""Training-data curation operators over the `documents` table: PII
scanning, repetition statistics, benchmark-contamination checks, and
deterministic sequence packing.  All pure Column expressions / window
functions (whole-stage codegen; zero Python in the row path) — the ops a
pre-training data pipeline runs between dedup and tokenization.

100 TB notes per op:
  * pii_scan           — map-only (regexp over each doc); trivially scales.
  * repetition_stats   — per-doc aggregation over exploded tokens; map-side
                         combine, shuffle keyed by doc_id only.
  * contamination_check— broadcast semi-join of corpus 8-gram hashes against
                         the (small) benchmark-set hash list; the benchmark
                         side is eval-suite-sized, never the corpus.
  * pack_sequences     — oracle twin: one global-order running sum.  The
                         scale path is pack_sequences_partitioned: identical
                         output via a two-level prefix sum (per-range-
                         partition cumsum + broadcast partition offsets), no
                         single-partition window anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deliberately simple, portable patterns (no lookbehind; identical in Spark
# rlike/regexp_* and DuckDB regexp_matches).  Dict order is SPECIFICITY order:
# the generic phone pattern also matches SSN-shaped strings, so each pattern
# is counted and redacted against the text with all MORE specific patterns
# already replaced — an SSN is labelled <SSN_LIKE>, never <PHONE>, and
# n_phone does not double-count SSN hits.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn_like": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9 ()-]{7,}[0-9]",
}


def pii_scan(df: DataFrame) -> DataFrame:
    """Per-document PII hit counts + a redacted text column.
    (doc_id, n_email, n_ssn_like, n_ipv4, n_phone, any_pii, text_redacted)

    Counts and redaction proceed in PII_PATTERNS (specificity) order over the
    progressively redacted text, so overlapping patterns never double-count."""
    out = df.select("doc_id", "text")
    redacted = F.col("text")
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(redacted, F.lit(pat), F.lit(0))).cast("long")
        )
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    any_pii = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}") > 0
        any_pii = c if any_pii is None else (any_pii | c)
    return out.withColumn("any_pii", any_pii).withColumn("text_redacted", redacted).drop("text")


def repetition_stats(df: DataFrame) -> DataFrame:
    """Distinct-token ratio + top-token share: the standard cheap repetition
    signals (near-zero distinct ratio = boilerplate/spam).
    (doc_id, n_tokens, n_distinct, distinct_ratio, top_share)"""
    toks = df.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    per_tok = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("n"))
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_distinct"),
            F.max("n").cast("long").alias("top_n"),
        )
        .select(
            "doc_id", "n_tokens", "n_distinct",
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias("distinct_ratio"),
            F.round(F.col("top_n") / F.col("n_tokens"), 6).alias("top_share"),
        )
    )


def _ngram_hashes(df: DataFrame, n: int) -> DataFrame:
    """(doc_id, h): md5-prefix hash of each n-token shingle (portable)."""
    toks = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.select("doc_id", F.explode(grams).alias("g"))
        .filter(F.col("g") != "")
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long").alias("h"),
        )
        .dropDuplicates(["doc_id", "h"])
    )


def contamination_check(
    corpus: DataFrame, benchmark: DataFrame, n: int = 8, threshold: float = 0.2
) -> DataFrame:
    """Flag corpus documents whose n-gram hash set overlaps a benchmark
    (eval-suite) document's beyond `threshold` — the test-set leakage check
    every pre-training pipeline needs.  The benchmark side is broadcast
    (eval suites are tiny next to the corpus).
    -> (doc_id, n_grams, n_hit, overlap, contaminated)"""
    c = _ngram_hashes(corpus, n)
    b = F.broadcast(_ngram_hashes(benchmark, n).select("h").dropDuplicates())
    sizes = c.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        c.join(b, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        sizes.join(hits, "doc_id", "left")
        .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0)))
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_hit").cast("long").alias("n_hit"),
            F.round(F.col("n_hit") / F.col("n_grams"), 6).alias("overlap"),
            (F.col("n_hit") / F.col("n_grams") >= threshold).alias("contaminated"),
        )
    )


def pack_sequences(df: DataFrame, budget: int = 512) -> DataFrame:
    """Concatenate-and-chunk sequence packing (the GPT-style pretraining
    layout): docs in doc_id order are laid end-to-end on a token tape and
    chunked into fixed `budget`-token training sequences; documents may
    straddle chunk boundaries.  -> (doc_id, n_tokens, pack_id, pack_offset)
    where pack_id/pack_offset locate the document's FIRST token.

    The doc_id total order makes this reproducible at any parallelism and
    oracle-checkable.  This single-window form is the oracle twin;
    pack_sequences_partitioned computes the SAME result with a two-level
    prefix sum and is the variant to run at corpus scale."""
    sized = _sized(df)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    cum = sized.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    return cum.select(
        "doc_id", "n_tokens",
        F.floor(start / budget).cast("long").alias("pack_id"),
        (start % budget).cast("long").alias("pack_offset"),
    )


def _sized(df: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    return df.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: t != "")).cast("long").alias("n_tokens"),
    )


def pack_sequences_partitioned(
    df: DataFrame, budget: int = 512, num_partitions: int = 32
) -> DataFrame:
    """Scale path for pack_sequences: IDENTICAL output, no global-order
    window.  Two-level prefix sum — range-partition by doc_id, cumsum within
    each partition (Window.partitionBy, all partitions in parallel), then add
    each partition's exclusive prefix total.  The only total order taken is
    over the `num_partitions` partial sums (driver-side, bounded), never over
    the rows, so the cumsum no longer serializes through one task at corpus
    scale.  -> (doc_id, n_tokens, pack_id, pack_offset), equal row-for-row to
    pack_sequences(df, budget)."""
    # persist the partitioned frame: spark_partition_id() must be observed by
    # exactly one materialization so the totals job and the output job see
    # the same pid assignment (and the range shuffle runs once)
    from ..graph import cut_lineage

    parted = (
        _sized(df)
        .repartitionByRange(num_partitions, "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        totals = parted.groupBy("_pid").agg(F.sum("n_tokens").alias("tot")).collect()
        run = 0
        offsets = []
        for row in sorted(totals, key=lambda r: r["_pid"]):
            offsets.append((int(row["_pid"]), run))
            run += int(row["tot"])
        off_df = df.sparkSession.createDataFrame(
            offsets or [(0, 0)], "_pid int, _off long"
        )
        w = Window.partitionBy("_pid").orderBy("doc_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
        local = parted.withColumn("cum_local", F.sum("n_tokens").over(w))
        out = local.join(F.broadcast(off_df), "_pid")
        start = F.col("_off") + F.col("cum_local") - F.col("n_tokens")
        # materialize eagerly so the per-call cache can be released here
        # rather than leaking one pinned dataset per invocation
        return cut_lineage(
            out.select(
                "doc_id", "n_tokens",
                F.floor(start / budget).cast("long").alias("pack_id"),
                (start % budget).cast("long").alias("pack_offset"),
            )
        )
    finally:
        parted.unpersist()
