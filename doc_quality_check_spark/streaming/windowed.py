"""Event-time windowed validation stats with watermarked late-data bounds.

The reference has no event-time concept (SURVEY.md §2.11) — this is the
engine's beyond-parity streaming aggregate: per event-time window, the
row-check pass rate of arriving clips, with a watermark bounding both state
size and how late a record may arrive (later → dropped, the standard
Structured Streaming contract). This is the continuous twin of the batch
per-partition verdicts (suite/runner.py `_partition_verdicts`): same
compiled predicates, windowed by event time instead of grouped by
partition key.

Scale: state per (window × group) is a fixed-width counter struct; the
watermark expires windows older than ``watermark``, so state is bounded by
(watermark / window_len) × |groups| regardless of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from doc_quality_check_spark.suite.compiler import PASS_PREFIX, with_row_checks
from doc_quality_check_spark.suite.spec import Check


def windowed_pass_rates(
    stream_df: DataFrame,
    checks: list[Check],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    window_len: str = "5 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming DataFrame → windowed verdict aggregate:
    (window, [group_cols...], n_rows, n_invalid, pass_rate). Works on batch
    DataFrames too (same plan, no watermark semantics) — one code path.

    Rows later than ``watermark`` behind the max observed event time are
    dropped by the engine; use update/append output mode per sink needs.
    Watermark caveat (measured on Spark 4.1): the drop is GUARANTEED only
    once the window's state has been evicted (append mode: after the window
    was emitted). A late row arriving in the same micro-batch that crosses
    the watermark may still be aggregated — Spark's contract is
    "within-watermark data is never dropped", not "beyond-watermark data is
    always dropped". tests/test_stateful_streaming.py pins both sides.
    """
    row_checks = [c for c in checks if c.is_row_level]
    checked = with_row_checks(stream_df, row_checks)
    if stream_df.isStreaming:
        checked = checked.withWatermark(ts_col, watermark)
    invalid = F.col("status") == "Invalid"
    keys = [F.window(F.col(ts_col), window_len).alias("window")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return checked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(invalid, 1).otherwise(0)).alias("n_invalid"),
        F.round(
            1.0 - F.try_divide(
                F.sum(F.when(invalid, 1).otherwise(0)), F.count(F.lit(1))
            ),
            4,
        ).alias("pass_rate"),
        *[
            F.sum(F.when(~F.col(PASS_PREFIX + c.constraint_id), 1).otherwise(0))
            .alias("nv__" + c.constraint_id)
            for c in row_checks
        ],
    )
