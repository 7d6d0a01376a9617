"""Stateful streaming: cumulative per-partition violation counters via
``applyInPandasWithState``.

The batch engine's per-partition verdicts are per-run; a continuously-fed
table also wants RUNNING totals ("how many violations has partition p
accumulated across all micro-batches so far") — per-group mutable state that
``foreachBatch`` alone can't express. This operator keeps one state row per
(part_key, constraint_id): cumulative row and violation counts, updated each
micro-batch; every update emits the new totals, so the sink always holds the
latest cumulative verdict per partition.

No watermark/timeout is used: validation state is keyed by partition (a
small, bounded keyspace), not by time — the state never expires
(GroupStateTimeout.NoTimeout).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from doc_quality_check_spark.suite.compiler import PASS_PREFIX, with_row_checks
from doc_quality_check_spark.suite.spec import CheckSuite

STATE_SCHEMA = StructType(
    [
        StructField("total_rows", LongType()),
        StructField("total_violations", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("part_key", StringType()),
        StructField("constraint_id", StringType()),
        StructField("total_rows", LongType()),
        StructField("total_violations", LongType()),
        StructField("passed", BooleanType()),
    ]
)


def cumulative_verdicts(
    stream_df: DataFrame, suite: CheckSuite, part_col: str = "part_key"
) -> DataFrame:
    """Transform a streaming clips DataFrame into a stream of cumulative
    per-(partition, constraint) verdict rows. Row checks compile to the same
    Catalyst predicates as in batch; only the running totals are stateful."""
    checks = [c for c in suite.row_checks() if not c.kind.startswith("payload_")]
    checked = with_row_checks(stream_df, checks)
    # long form: one row per (part, constraint, passed-flag)
    long_parts = []
    for c in checks:
        long_parts.append(
            checked.selectExpr(
                f"{part_col} as part_key",
                f"'{c.constraint_id}' as constraint_id",
                f"CAST(NOT {PASS_PREFIX}{c.constraint_id} AS LONG) as is_violation",
            )
        )
    long = long_parts[0]
    for p in long_parts[1:]:
        long = long.unionByName(p)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = 0
        viols = 0
        for pdf in pdfs:
            rows += len(pdf)
            viols += int(pdf["is_violation"].sum())
        if state.exists:
            prev_rows, prev_viols = state.get
        else:
            prev_rows, prev_viols = 0, 0
        total_rows = prev_rows + rows
        total_viols = prev_viols + viols
        state.update((total_rows, total_viols))
        yield pd.DataFrame(
            {
                "part_key": [key[0]],
                "constraint_id": [key[1]],
                "total_rows": [total_rows],
                "total_violations": [total_viols],
                "passed": [total_viols == 0],
            }
        )

    return long.groupBy("part_key", "constraint_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
