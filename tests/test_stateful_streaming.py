"""applyInPandasWithState cumulative verdicts across micro-batches."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from doc_quality_check_spark.sources.clips import load_clips
from doc_quality_check_spark.streaming.stateful import cumulative_verdicts
from doc_quality_check_spark.suite.spec import Check, CheckSuite


def _suite():
    return CheckSuite(
        name="cum", partition_by=["part_key"],
        checks=[
            Check("clip_id_not_null", "not_null", "clip_id", priority=1),
            Check("dur_range", "in_range", "dur_ms", {"min": 1, "max": 120000}, priority=2),
        ],
    )


def test_cumulative_verdicts_accumulate(spark, clips_dir, tmp_path):
    base = str(tmp_path)
    inp, out = base + "/in", base + "/out"
    os.makedirs(inp)
    clips = load_clips(spark, clips_dir).drop("bytes").limit(800).cache()
    # pmod, not %: Spark's % keeps the dividend's sign, so negative dur_ms
    # rows would fall out of both parity shards
    clips.filter(F.pmod("dur_ms", F.lit(2)) == 0).coalesce(1).write.parquet(base + "/a")
    clips.filter(F.pmod("dur_ms", F.lit(2)) == 1).coalesce(1).write.parquet(base + "/b")
    for i, f in enumerate(glob.glob(base + "/[ab]/part-*.parquet")):
        shutil.copy(f, f"{inp}/clips_{i}.parquet")

    schema = ("clip_id string, sr_hz int, dur_ms int, codec string, "
              "transcript string, category string, part_key string")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    result = cumulative_verdicts(stream, _suite())
    q = (
        result.writeStream.format("memory")
        .queryName("cum_verdicts")
        .option("checkpointLocation", base + "/ckpt")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.table("cum_verdicts")
    # the LAST update per (part, constraint) must equal the batch totals
    latest = (
        got.groupBy("part_key", "constraint_id")
        .agg(F.max("total_rows").alias("total_rows"),
             F.max("total_violations").alias("total_violations"))
        .collect()
    )
    expected_rows = {
        r["part_key"]: r["cnt"]
        for r in clips.groupBy("part_key").agg(F.count("*").alias("cnt")).collect()
    }
    expected_viol = {
        r["part_key"]: r["v"]
        for r in clips.groupBy("part_key").agg(
            F.sum(F.when((F.col("dur_ms") < 1) | (F.col("dur_ms") > 120000), 1)
                  .otherwise(0)).alias("v")).collect()
    }
    assert latest, "no state output produced"
    for r in latest:
        assert r["total_rows"] == expected_rows[r["part_key"]]
        if r["constraint_id"] == "dur_range":
            assert r["total_violations"] == expected_viol[r["part_key"]]
        else:
            assert r["total_violations"] == 0
    # state actually accumulated across >=2 micro-batches: some (part,
    # constraint) appears more than once in the update stream
    multi = got.groupBy("part_key", "constraint_id").count().filter("count > 1")
    assert multi.count() > 0
