"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship validation run over /root/testdata/sf0.001: applies
                 a declarative check suite (the engine's core capability) to
                 the lineitem table and returns per-partition verdicts.
queries()      — SURVEY.md §2 operator surface over the shared parquet tables.
oracle_sql()   — matching ANSI SQL for DuckDB (same column names/rounding).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from doc_quality_check_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: run a declarative check suite over sf0.001 lineitem —
    row-level domain/range checks compiled to Catalyst predicates, verdicts
    grouped per l_returnflag partition (the engine's per-partition verdict
    path, suite/runner.py)."""
    from doc_quality_check_spark.suite.runner import SuiteRunner
    from doc_quality_check_spark.suite.spec import Check, CheckSuite

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    suite = CheckSuite(
        name="lineitem_quality",
        partition_by=["l_returnflag"],
        checks=[
            Check("orderkey_not_null", "not_null", "l_orderkey", priority=1),
            Check("qty_range", "in_range", "l_quantity", {"min": 1, "max": 50}, priority=2),
            Check("discount_range", "in_range", "l_discount", {"min": 0.0, "max": 0.1}, priority=3),
            Check("returnflag_domain", "isin", "l_returnflag", {"values": ["A", "N", "R"]}, priority=4),
            Check("price_positive", "min", "l_extendedprice", {"value": 0.0}, priority=5),
        ],
    )
    runner = SuiteRunner(suite)
    # the runner's violation path keys on clip_id — alias the row id
    res = runner.run(df.withColumn("clip_id", df["l_orderkey"]), payload=False)
    return res.verdicts


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
