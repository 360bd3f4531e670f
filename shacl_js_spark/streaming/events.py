"""Watermarked windowed aggregation for append streams — the canonical
Structured Streaming shape (readStream -> withWatermark -> window -> agg)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + sums with late-data watermarking; works on
    both streaming and batch frames (batch ignores the watermark)."""
    # watermarks require TIMESTAMP (not NTZ); normalize on both paths
    df = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(F.col(ts_col), window_len).alias("win"), F.col(key_col)
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        key_col, "n", "total",
    )
