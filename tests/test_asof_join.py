"""asof_join semantics: backward match, equal-ts inclusion, NULL fill,
tolerance, and per-key isolation (DuckDB/kdb ASOF JOIN contract)."""

from datetime import datetime

from pyspark.sql import functions as F

from doc_quality_check_spark.operators.joins import asof_join


def _ts(m):
    return datetime(2024, 1, 1, 0, m, 0)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10), 1.0),
            (2, "u1", _ts(20), 2.0),
            (3, "u1", _ts(5), 3.0),   # before any right row
            (4, "u2", _ts(30), 4.0),  # u2 has no right rows at all
            (5, "u1", _ts(15), 5.0),  # equal-ts with a right row
        ],
        ["event_id", "user_id", "ts", "value"],
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(8), 100, 10.0),
            ("u1", _ts(15), 200, 20.0),
            ("u3", _ts(1), 300, 30.0),  # key absent from left
        ],
        ["user_id", "ts", "r_id", "r_value"],
    )
    return left, right


def test_asof_backward_and_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["r_id_r"], r["r_value_r"])
        for r in asof_join(
            left, right, ["user_id"], "ts", ["r_id", "r_value"]
        ).collect()
    }
    assert out[1] == (100, 10.0)       # 10 -> latest right at 8
    assert out[2] == (200, 20.0)       # 20 -> latest right at 15
    assert out[3] == (None, None)      # 5 precedes every right row
    assert out[4] == (None, None)      # key with no right rows
    assert out[5] == (200, 20.0)       # equal ts matches (l.ts >= r.ts)
    assert len(out) == 5               # left rows preserved exactly


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r["r_id_r"]
        for r in asof_join(
            left, right, ["user_id"], "ts", ["r_id"],
            tolerance_us=3 * 60 * 1_000_000,
        ).collect()
    }
    assert out[1] == 100     # gap 2 min <= 3 min
    assert out[2] is None    # gap 5 min > 3 min -> stale, nulled
    assert out[5] == 200     # gap 0
    assert out[3] is None and out[4] is None


def test_asof_left_columns_untouched(spark):
    left, right = _frames(spark)
    res = asof_join(left, right, ["user_id"], "ts", ["r_value"])
    assert res.columns == ["event_id", "user_id", "ts", "value", "r_value_r"]
    vals = {r["event_id"]: r["value"] for r in res.collect()}
    assert vals == {1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0, 5: 5.0}


def test_range_join_boundaries_and_bin_spanning(spark):
    """range_join_points must reproduce exact BETWEEN semantics regardless
    of bin width: inclusive ends, intervals spanning many bins, per-key
    isolation."""
    from doc_quality_check_spark.operators.joins import range_join_points

    pts = spark.createDataFrame(
        [
            (1, "k1", 100),   # == interval start (inclusive)
            (2, "k1", 250),   # interior, bin far from interval start bin
            (3, "k1", 300),   # == interval end (inclusive)
            (4, "k1", 301),   # just past end
            (5, "k1", 99),    # just before start
            (6, "k2", 250),   # other key, no intervals
        ],
        ["pt_id", "key", "pt"],
    )
    iv = spark.createDataFrame(
        [("i1", "k1", 100, 300), ("i2", "k1", 260, 270), ("i3", "k3", 0, 1000)],
        ["iv_id", "key", "t0", "t1"],
    )
    for bin_w in (7, 50, 1000):  # spans ~29 bins / ~5 bins / sub-bin
        got = {
            (r["pt_id"], r["iv_id"])
            for r in range_join_points(
                pts, iv, ["key"], "pt", "t0", "t1", bin_us=bin_w
            ).collect()
        }
        assert got == {(1, "i1"), (2, "i1"), (3, "i1")}, (bin_w, got)
