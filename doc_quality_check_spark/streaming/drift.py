"""Streaming distribution drift: per event-time window PSI vs a baseline.

The continuous twin of the batch drift checks (operators/aggregates.py
drift_psi / drift_psi_by_group): the stream maintains a watermarked
per-(window, bucket) count — fixed-width state bounded by
(watermark / window_len) × |buckets| — and the reader joins the stored
histograms against a STATIC baseline snapshot to score each window's PSI.

Reference analog: none (the reference is strictly batch, SURVEY.md §2.11);
north-star analog: the drift checks run continuously over an appended
Iceberg table instead of per full-table run.

Why PSI is computed by the READER, not inside the stream: the windowed
count runs in UPDATE mode (append would hold open windows back until the
watermark closes them, which an availableNow run may never reach), and an
update-mode micro-batch emits only the CHANGED buckets — a PSI computed
inside foreachBatch would see a partial histogram. The sink therefore
stores every update tagged with batch_id, and the reader reconstructs the
LATEST count per (window, bucket) with one max-batch_id window before
scoring — the same latest-wins convention as stream_validate's windowed
pass-rate sink (streaming/incremental.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import Window

from doc_quality_check_spark.operators.aggregates import drift_psi_by_group

CLIPS_META_SCHEMA_DDL = (
    "clip_id string, sr_hz int, dur_ms int, codec string, "
    "transcript string, category string, part_key string, ts timestamp"
)


#: NULL group values are normalized to this sentinel string in the stored
#: histogram — the same convention as the batch per-partition drift checks
#: (suite/runner.py NULL_PART), so a NULL codec never silently drops out of
#: the (group, bucket) equi-join.
NULL_GROUP = "__null__"


def stream_histogram(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    column: str,
    schema_ddl: str = CLIPS_META_SCHEMA_DDL,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    window_len: str = "5 minutes",
    max_files_per_trigger: int = 4,
    group_cols: list[str] | None = None,
    bin_width: float | None = None,
):
    """Start (availableNow) a file-source stream maintaining the windowed
    histogram of ``column``: rows (window_start, window_end, [group...,]
    bucket, count, batch_id) appended under ``output_dir``. Returns the
    StreamingQuery; callers awaitTermination(). Restarting with the same
    checkpoint resumes from unprocessed files, and the stateful count
    carries across restarts (the state store lives in the checkpoint).

    ``group_cols`` (e.g. ``["codec"]``) adds those columns to the stateful
    key, producing the grouped histogram :func:`read_stream_drift` scores
    per (window, group) — the continuous twin of the batch per-group drift
    checks. State stays bounded: (watermark / window_len) × |groups| ×
    |buckets| rows. NULL group values are stored as :data:`NULL_GROUP`.

    ``bin_width`` bins a CONTINUOUS column equi-width (same contract as the
    batch checks — operators/aggregates.bucket_col): without it, a
    high-cardinality numeric column makes the streaming state per window as
    large as the window's distinct-value count; score against a baseline
    written with the same width."""
    from doc_quality_check_spark.operators.aggregates import bucket_col

    group_cols = list(group_cols or [])
    stream = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    gkeys = [
        F.coalesce(F.col(g).cast("string"), F.lit(NULL_GROUP)).alias(g)
        for g in group_cols
    ]
    counts = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_len).alias("window"),
            *gkeys,
            bucket_col(column, bin_width).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            "bucket",
            "count",
        )
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(os.path.join(output_dir, "hist"))

    return (
        counts.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(output_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def read_stream_drift(
    spark: SparkSession,
    output_dir: str,
    baseline_hist: DataFrame,
    max_psi: float | None = None,
    statistic: str = "psi",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Score the stored windowed histograms against a static baseline
    (``[group...,] bucket, count``) → (window_start, window_end,
    [group...,] psi[, passed]) — full batch parity: ``statistic`` is one of
    ``psi | ks | w1 | chi2`` (chi2 scores Cramér's V, the scale-free
    categorical form), and ``group_cols`` scores each (window, group) pair
    the way the batch per-group drift checks do.

    Latest-wins per (window[, group], bucket) across micro-batch updates,
    then ONE grouped plan over all (window, group) pairs — the composite
    key rides a struct through drift_*_by_group; never a per-window job
    loop. The output score column is always named ``psi`` so downstream
    consumers and ``max_psi`` thresholding are statistic-agnostic."""
    from doc_quality_check_spark.operators.aggregates import (
        drift_chi2_by_group,
        drift_ks_by_group,
        drift_w1_by_group,
    )

    group_cols = list(group_cols or [])
    hist = spark.read.parquet(os.path.join(output_dir, "hist"))
    w = Window.partitionBy("window_start", *group_cols, "bucket").orderBy(
        F.desc("batch_id")
    )
    latest = (
        hist.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("window_start", "window_end", *group_cols, "bucket", "count")
    )
    bounds = latest.groupBy("window_start").agg(
        F.max("window_end").alias("window_end")
    )
    # composite (window[, group...]) key as ONE struct column: every
    # drift_*_by_group plan (grouped agg + (grp, bucket) equi-join + grp
    # window) works unchanged on struct equality
    key = F.struct(F.col("window_start"), *[F.col(g) for g in group_cols])
    cur = latest.select(key.alias("grp"), "bucket", "count")
    # every window drifts against the SAME static baseline: cross the tiny
    # baseline histogram with the window keys (broadcast, histogram-sized).
    # Grouped form: the baseline carries its own group columns, so the
    # cross product is windows × (group, bucket) baseline rows.
    base = bounds.select("window_start").crossJoin(
        F.broadcast(baseline_hist.select(*group_cols, "bucket", "count"))
    )
    base = base.select(key.alias("grp"), "bucket", "count")
    if statistic == "psi":
        scored = drift_psi_by_group(cur, base, "grp").select("grp", "psi")
    elif statistic == "ks":
        scored = drift_ks_by_group(cur, base, "grp").select(
            "grp", F.col("ks").alias("psi")
        )
    elif statistic == "w1":
        scored = drift_w1_by_group(cur, base, "grp").select(
            "grp", F.col("w1").alias("psi")
        )
    elif statistic == "chi2":
        scored = drift_chi2_by_group(cur, base, "grp").select(
            "grp", F.col("cramers_v").alias("psi")
        )
    else:
        raise ValueError(f"unknown drift statistic: {statistic!r}")
    unpacked = scored.select(
        F.col("grp.window_start").alias("window_start"),
        *[F.col(f"grp.{g}").alias(g) for g in group_cols],
        "psi",
    )
    out = unpacked.join(bounds, "window_start").select(
        "window_start", "window_end", *group_cols, "psi"
    )
    if max_psi is not None:
        out = out.withColumn("passed", F.col("psi") <= F.lit(max_psi))
    return out.orderBy("window_start", *group_cols)
