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
):
    """Start (availableNow) a file-source stream maintaining the windowed
    histogram of ``column``: rows (window_start, window_end, bucket, count,
    batch_id) appended under ``output_dir``. Returns the StreamingQuery;
    callers awaitTermination(). Restarting with the same checkpoint resumes
    from unprocessed files, and the stateful count carries across restarts
    (the state store lives in the checkpoint)."""
    stream = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    counts = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_len).alias("window"),
            F.col(column).cast("string").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
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
) -> DataFrame:
    """Score the stored windowed histograms against a static baseline
    (bucket, count) → (window_start, window_end, psi[, passed]).

    Latest-wins per (window, bucket) across micro-batch updates, then ONE
    grouped plan over all windows (drift_*_by_group with the window start
    as the group) — never a per-window job loop. ``statistic``: "psi"
    (default) or "chi2" (Cramér's V — the scale-free categorical score;
    the output column is still named ``psi`` so downstream consumers and
    ``max_psi`` thresholding are statistic-agnostic)."""
    hist = spark.read.parquet(os.path.join(output_dir, "hist"))
    w = Window.partitionBy("window_start", "bucket").orderBy(
        F.desc("batch_id")
    )
    latest = (
        hist.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("window_start", "window_end", "bucket", "count")
    )
    bounds = latest.groupBy("window_start").agg(
        F.max("window_end").alias("window_end")
    )
    cur = latest.select(F.col("window_start").alias("grp"), "bucket", "count")
    # every window drifts against the SAME static baseline: cross the tiny
    # baseline histogram with the window keys (broadcast, histogram-sized)
    base = (
        bounds.select(F.col("window_start").alias("grp"))
        .crossJoin(F.broadcast(baseline_hist.select("bucket", "count")))
    )
    if statistic == "psi":
        scored = drift_psi_by_group(cur, base, "grp").select(
            F.col("grp").alias("window_start"), "psi"
        )
    elif statistic == "chi2":
        from doc_quality_check_spark.operators.aggregates import (
            drift_chi2_by_group,
        )

        scored = drift_chi2_by_group(cur, base, "grp").select(
            F.col("grp").alias("window_start"),
            F.col("cramers_v").alias("psi"),
        )
    else:
        raise ValueError(f"unknown drift statistic: {statistic!r}")
    out = scored.join(bounds, "window_start").select(
        "window_start", "window_end", "psi"
    )
    if max_psi is not None:
        out = out.withColumn("passed", F.col("psi") <= F.lit(max_psi))
    return out.orderBy("window_start")
