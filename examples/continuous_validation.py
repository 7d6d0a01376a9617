"""Continuous validation lifecycle over a snapshotted clips table.

The ops loop a production validation deployment runs day over day, each
step an engine capability the tests pin individually:

  1. FULL run        — ValidationJob.run on snapshot 1: per-partition
                       verdicts, violations, manifest with input lineage,
                       schema record, reports (suite/job.py)
  2. BASELINE        — snapshot_histograms (global + per-partition layout)
                       written from the validated snapshot; a run's
                       snapshot is the next run's drift baseline
  3. INCREMENTAL run — snapshot 2 arrives; run_incremental diffs it against
                       snapshot 1 (operators/joins.py snapshot_diff) and
                       re-validates ONLY the partitions touched by added/
                       changed/removed rows — untouched partitions carry
                       their verdicts forward. At 10^12 rows this replaces
                       the dominant cost of continuous validation.
  4. DRIFT + SCHEMA  — the incremental run's manifest records the schema
                       diff vs run 1; per-partition PSI verdicts localize
                       which partition's distribution moved.
  5. HISTORY         — metric-history anomaly detection over the manifest
                       trail (suite/history.py) flags the drifted metric.

Run: python examples/continuous_validation.py [out_dir]
(default ./continuous_out). Prints a step-by-step summary.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def lifecycle(spark, out_dir: str, clips_dir: str) -> None:
    """The 5-step loop; separated from main() so tests can drive it with
    their session/fixtures (same pattern as curation_pipeline.curate)."""
    from doc_quality_check_spark.operators.aggregates import snapshot_histograms
    from doc_quality_check_spark.sources.clips import load_clips
    from doc_quality_check_spark.suite.job import ValidationJob
    from doc_quality_check_spark.suite.spec import Check, CheckSuite

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    snap1 = load_clips(spark, clips_dir).drop("bytes").dropDuplicates(["clip_id"])

    suite = CheckSuite(
        name="continuous_v1",
        partition_by=["part_key"],
        checks=[
            Check("clip_id_not_null", "not_null", "clip_id", priority=1),
            Check("dur_range", "in_range", "dur_ms",
                  {"min": 1, "max": 120_000}, priority=2),
            Check("clip_id_unique", "unique", "clip_id"),
            Check("sr_drift_pp", "drift_psi", "sr_hz",
                  {"baseline_table": "snapshot_hist", "max_psi": 0.1,
                   "per_partition": True}),
        ],
    )
    job = ValidationJob(suite, out_dir)

    # 1. full run (no baseline yet: drift checks prune, everything else runs)
    jr1 = job.run(snap1, payload=False, resume=False)
    print(f"run {jr1.manifest.run_id} (full): status={jr1.manifest.status}, "
          f"partitions={len(job.manifests.completed_partitions(jr1.manifest))}")

    # 2. baseline snapshot from the validated data (per-partition layout)
    baseline = snapshot_histograms(snap1, ["sr_hz"], group_col="part_key")

    # 3. day-2 snapshot: one partition's rows change, the rest are untouched
    parts = sorted(r["part_key"] for r in
                   snap1.select("part_key").distinct().collect())
    touched = parts[0]
    victims = [r["clip_id"] for r in
               snap1.filter(F.col("part_key") == touched)
               .select("clip_id").limit(5).collect()]
    snap2 = snap1.withColumn(
        "sr_hz",
        F.when(F.col("clip_id").isin(victims), F.lit(99_999))
        .otherwise(F.col("sr_hz")),
    )
    jr2 = job.run_incremental(snap2, snap1, id_col="clip_id",
                              payload=False, baseline=baseline)
    carried = jr2.manifest.input_lineage.get("resumed_from_partitions", [])
    print(f"run {jr2.manifest.run_id} (incremental from "
          f"{jr2.manifest.input_lineage['incremental_from_run']}): "
          f"re-validated {len(parts) - len(carried)}/{len(parts)} partitions, "
          f"carried {len(carried)} forward")

    # 4. drift localization + schema record
    drift = {r["part_key"]: r for r in jr2.result.verdicts.collect()
             if r["constraint_id"] == "sr_drift_pp"}
    failed = sorted(pk for pk, r in drift.items() if not r["passed"])
    print(f"per-partition drift verdicts: {len(drift)}; failed: {failed} "
          f"(expected: ['{touched}'])")
    print(f"schema drifted: "
          f"{jr2.manifest.input_lineage['schema_evolution']['drifted']}")

    assert failed == [touched], "drift must localize to the touched partition"
    assert set(carried) == set(parts) - {touched}
    print("continuous-validation lifecycle OK")


def main(out_dir: str) -> None:
    from doc_quality_check_spark.session import get_spark
    from doc_quality_check_spark.sources.clips import generate_clips

    spark = get_spark("continuous-validation", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    clips_dir = generate_clips(
        os.path.join(repo, ".data", "clips_example"), n_rows=1200, seed=7
    )
    lifecycle(spark, out_dir, clips_dir)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "./continuous_out")
