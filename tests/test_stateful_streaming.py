"""applyInPandasWithState cumulative verdicts across micro-batches."""

import datetime
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


def test_windowed_pass_rates_watermark_drops_late(spark, tmp_path):
    """Event-time windows + watermark: on-time rows aggregate per window;
    a record arriving later than the watermark bound is DROPPED (its
    window's final update excludes it)."""
    import time as _t

    from doc_quality_check_spark.streaming.windowed import windowed_pass_rates
    from doc_quality_check_spark.suite.spec import Check

    src = str(tmp_path / "win_src")
    os.makedirs(src)
    ddl = "clip_id string, ts timestamp, dur_ms int"
    checks = [Check("dur_range", "in_range", "dur_ms", {"min": 1, "max": 1000})]

    stage = str(tmp_path / "win_stage")

    def write_file(name, rows):
        # flatten the part file so the file-source stream sees one file per
        # batch with strictly increasing mtimes (processing order)
        d = f"{stage}/{name}"
        spark.createDataFrame(rows, ddl).coalesce(1).write.mode("overwrite").parquet(d)
        import glob as _g, shutil as _sh
        dst = f"{src}/{name}.parquet"
        _sh.copy(_g.glob(f"{d}/part-*.parquet")[0], dst)
        # file source orders batches by mtime — make it explicit and distinct
        write_file.seq += 1
        os.utime(dst, (1_700_000_000 + write_file.seq, 1_700_000_000 + write_file.seq))

    write_file.seq = 0

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    # batch 1: two rows in window [12:00,12:05), one invalid
    write_file("f1", [("a", ts(1), 100), ("b", ts(2), 5000)])
    # batch 2: a row 40 min later — advances the watermark to ~12:30
    write_file("f2", [("c", ts(40), 100)])
    # batch 3: runs with watermark 12:30 → window [12:00,12:05) is emitted
    # and its state evicted during this batch
    write_file("f3", [("d", ts(41), 100)])
    # batch 4: a LATE row for the already-emitted window → guaranteed dropped
    write_file("f4", [("late", ts(3), 100)])

    stream = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = windowed_pass_rates(stream, checks, ts_col="ts",
                              watermark="10 minutes", window_len="5 minutes")
    # append mode: a window is emitted exactly once, AFTER the watermark
    # passes its end — and input older than the watermark is dropped, so the
    # late row must not appear in the finalized window.
    q = (
        agg.writeStream.format("memory").queryName("win_rates")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    _t.sleep(0.5)
    rows = spark.sql("SELECT * FROM win_rates").collect()
    final = {str(r["window"]["start"]): r for r in rows}
    w0 = final["2026-01-01 12:00:00"]
    assert w0["n_rows"] == 2           # late row 'late' was dropped
    assert w0["n_invalid"] == 1        # dur 5000 out of range
    assert abs(w0["pass_rate"] - 0.5) < 1e-9
    # the 12:40 window never finalizes (watermark never passes 12:45)
    assert "2026-01-01 12:40:00" not in final


def test_windowed_pass_rates_on_batch_df(spark):
    """The same windowed aggregation runs on a BATCH DataFrame (no watermark
    semantics, same plan) — one code path for batch and streaming."""
    from doc_quality_check_spark.streaming.windowed import windowed_pass_rates
    from doc_quality_check_spark.suite.spec import Check

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("a", t0 + datetime.timedelta(minutes=1), 100),
        ("b", t0 + datetime.timedelta(minutes=2), 5000),
        ("c", t0 + datetime.timedelta(minutes=7), 100),
    ]
    df = spark.createDataFrame(rows, "clip_id string, ts timestamp, dur_ms int")
    checks = [Check("dur_range", "in_range", "dur_ms", {"min": 1, "max": 1000})]
    out = {str(r["window"]["start"]): r
           for r in windowed_pass_rates(df, checks, window_len="5 minutes").collect()}
    assert out["2026-01-01 12:00:00"]["n_rows"] == 2
    assert out["2026-01-01 12:00:00"]["n_invalid"] == 1
    assert out["2026-01-01 12:05:00"]["pass_rate"] == 1.0


def test_windowed_pass_rates_group_cols(spark):
    """group_cols adds a grouping dimension alongside the event-time window."""
    from doc_quality_check_spark.streaming.windowed import windowed_pass_rates
    from doc_quality_check_spark.suite.spec import Check

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("a", t0, "flac", 100), ("b", t0, "flac", 9000),
        ("c", t0, "pcm_s16le", 100),
    ]
    df = spark.createDataFrame(rows, "clip_id string, ts timestamp, codec string, dur_ms int")
    checks = [Check("dur_range", "in_range", "dur_ms", {"min": 1, "max": 1000})]
    out = {(str(r["window"]["start"]), r["codec"]): r for r in
           windowed_pass_rates(df, checks, window_len="5 minutes",
                               group_cols=["codec"]).collect()}
    assert out[("2026-01-01 12:00:00", "flac")]["n_invalid"] == 1
    assert out[("2026-01-01 12:00:00", "pcm_s16le")]["pass_rate"] == 1.0


def test_stream_dedupe_within_watermark(spark, tmp_path):
    """Streaming exact dedup: repeats of a clip_id arriving within the
    watermark are dropped across micro-batches; batch mode degrades to
    dropDuplicates."""
    from doc_quality_check_spark.streaming.dedupe import stream_dedupe

    base = str(tmp_path)
    inp = base + "/in"
    os.makedirs(inp)
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    # file 1: c0..c9; file 2: c5..c9 re-delivered 1 min later + c10..c12 new
    first = [(f"c{i}", t0 + datetime.timedelta(seconds=i)) for i in range(10)]
    second = [(f"c{i}", t0 + datetime.timedelta(minutes=1, seconds=i))
              for i in range(5, 13)]
    schema = "clip_id string, ts timestamp"
    spark.createDataFrame(first, schema).coalesce(1).write.parquet(base + "/a")
    spark.createDataFrame(second, schema).coalesce(1).write.parquet(base + "/b")
    for i, f in enumerate(sorted(glob.glob(base + "/[ab]/part-*.parquet"))):
        shutil.copy(f, f"{inp}/clips_{i}.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    deduped = stream_dedupe(stream, ["clip_id"], ts_col="ts",
                            watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", base + "/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [r["clip_id"] for r in spark.table("dedup_stream").collect()]
    assert sorted(got) == sorted(f"c{i}" for i in range(13))  # no repeats

    # batch path: same call, plain dropDuplicates
    bdf = spark.createDataFrame(first + second, schema)
    out = stream_dedupe(bdf, ["clip_id"])
    assert out.count() == 13
