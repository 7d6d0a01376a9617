"""transcript_match check kind + Iceberg-or-parquet source shim."""

import pytest
from pyspark.sql import functions as F

from doc_quality_check_spark.sources.clips import load_catalog, load_clips
from doc_quality_check_spark.sources.iceberg import (
    iceberg_available,
    load_clips_table,
    snapshot_lineage,
)
from doc_quality_check_spark.suite.runner import SuiteRunner
from doc_quality_check_spark.suite.spec import Check, CheckSuite


def test_transcript_match_check(spark, clips_dir):
    """F9 analog: transcript equality against the joined canonical column —
    null canonical passes (no evidence), mismatch fails."""
    clips = load_clips(spark, clips_dir).drop("bytes").limit(600)
    catalog = load_catalog(spark, clips_dir)
    joined = clips.join(
        catalog.select("clip_id", "canonical_transcript"), "clip_id", "left"
    )
    # force known mismatches: clips in the catalog have canonical text
    # 'canonical text <id>' which never equals the synthetic transcript
    suite = CheckSuite(
        name="tm", partition_by=["part_key"],
        checks=[Check("transcript_canonical", "transcript_match", "transcript")],
    )
    res = SuiteRunner(suite).run(joined, payload=False)
    rows = res.checked.select("clip_id", "transcript", "canonical_transcript",
                              "passed__transcript_canonical").collect()
    for r in rows:
        # null canonical → no evidence → pass; null transcript → flagged only
        # by the dedicated not_null check (compiler.py null-gating semantics)
        expected = r["canonical_transcript"] is None or r["transcript"] is None
        assert r["passed__transcript_canonical"] == expected
    res.unpersist()

    # and an equality case passes
    ok = joined.withColumn("transcript", F.col("canonical_transcript"))
    res2 = SuiteRunner(suite).run(ok, payload=False)
    assert res2.violations.count() == 0
    res2.unpersist()


def test_example_suite_config_loads():
    """The shipped JSON config (the reference's config.json analog) parses
    into the exact default suite."""
    import os

    from doc_quality_check_spark.suite.spec import CheckSuite, default_suite

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "audio_clip_quality_v1.json")
    with open(path) as fh:
        loaded = CheckSuite.from_json(fh.read())
    assert loaded.to_json() == default_suite().to_json()


def test_load_clips_table_parquet_fallback(spark, clips_dir):
    import os

    path = os.path.join(clips_dir, "clips.parquet")
    df = load_clips_table(spark, path)
    assert df.count() > 0
    lin = snapshot_lineage(spark, path)
    assert lin["kind"] == "parquet" and lin["n_files"] >= 1


def test_load_clips_table_identifier_without_iceberg(spark):
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        load_clips_table(spark, "lake.audio.clips")
