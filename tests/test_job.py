"""ValidationJob: manifest lifecycle, reports, resume semantics."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from doc_quality_check_spark.sources.clips import (
    load_baseline,
    load_catalog,
    load_clips,
)
from doc_quality_check_spark.suite.job import ValidationJob
from doc_quality_check_spark.suite.runner import GLOBAL_PART
from doc_quality_check_spark.suite.spec import Check, CheckSuite, default_suite


def _suite() -> CheckSuite:
    return CheckSuite(
        name="job_meta",
        partition_by=["part_key"],
        checks=[
            Check("clip_id_not_null", "not_null", "clip_id", priority=1),
            Check("dur_range", "in_range", "dur_ms", {"min": 1, "max": 120000}, priority=2),
            Check("clip_id_unique", "unique", "clip_id"),
        ],
    )


def test_job_end_to_end(spark, clips_dir, tmp_path):
    out = str(tmp_path / "job1")
    clips = load_clips(spark, clips_dir).drop("bytes").limit(800)
    job = ValidationJob(_suite(), out)
    jr = job.run(clips, payload=False, input_files=["clips.parquet"])

    assert jr.manifest.run_id == 1
    assert jr.manifest.status == "complete"
    assert set(jr.report_paths) == {"txt", "html", "json"}
    for p in jr.report_paths.values():
        assert os.path.exists(p)
    with open(jr.report_paths["json"]) as fh:
        doc = json.load(fh)
    assert doc["verdicts"]
    # result tables written
    assert glob.glob(out + "/run_000001/verdicts/*.parquet")
    # manifest records every partition's checks
    mpath = glob.glob(out + "/manifests/run_*.json")
    assert len(mpath) == 1
    with open(mpath[0]) as fh:
        m = json.load(fh)
    assert m["constraint_versions"]["clip_id_unique"] == "1"
    assert any(pk != GLOBAL_PART for pk in m["partitions"])


def test_job_resume_skips_completed_partitions(spark, clips_dir, tmp_path):
    out = str(tmp_path / "job2")
    clips = load_clips(spark, clips_dir).drop("bytes").limit(800)
    job = ValidationJob(_suite(), out)

    # run 1: simulate crash — manifest left 'running' with two partitions done
    jr1 = job.run(clips, payload=False)
    m1 = job.manifests.load(jr1.manifest.run_id)
    done = [pk for pk in m1.partitions if pk != GLOBAL_PART][:2]
    m1.partitions = {pk: m1.partitions[pk] for pk in done}
    m1.status = "running"
    job.manifests.save(m1)

    # run 2 resumes: completed partitions are excluded from row verdicts
    jr2 = job.run(clips, payload=False, resume=True)
    assert jr2.manifest.run_id == m1.run_id + 1
    assert jr2.manifest.input_lineage["resumed_from_partitions"] == sorted(done)
    parts = {
        r["part_key"]
        for r in jr2.result.verdicts.select("part_key").distinct().collect()
    }
    assert parts.isdisjoint(done)

    # run 3 after a COMPLETE run does not resume (full revalidation)
    jr3 = job.run(clips, payload=False, resume=True)
    assert "resumed_from_partitions" not in jr3.manifest.input_lineage


def test_job_prunes_checks_missing_side_tables(spark, clips_dir, tmp_path):
    out = str(tmp_path / "job3")
    clips = load_clips(spark, clips_dir).limit(400)
    job = ValidationJob(default_suite(), out)
    # no catalog/baseline → referential + drift checks pruned, run succeeds
    jr = job.run(clips, payload=True)
    cids = {r["constraint_id"] for r in jr.result.verdicts.collect()}
    assert "transcript_in_catalog" not in cids
    assert "sr_drift" not in cids
    assert "clip_id_unique" in cids
    jr.result.unpersist()


def test_job_deterministic_verdicts(spark, clips_dir, tmp_path):
    """Re-running the same input yields identical verdict rows (UDF
    determinism — SURVEY.md §7 hard parts)."""
    clips = load_clips(spark, clips_dir).limit(600)
    job_a = ValidationJob(_suite(), str(tmp_path / "a"))
    job_b = ValidationJob(_suite(), str(tmp_path / "b"))
    va = sorted(map(str, job_a.run(clips, payload=False).result.verdicts.collect()))
    vb = sorted(map(str, job_b.run(clips, payload=False).result.verdicts.collect()))
    assert va == vb
