"""Grouped-repair operator: mutual correction inside small groups via
``groupBy(...).applyInPandas`` (SURVEY.md §2.4 J3).

Reference parity: the intra-page pairing heuristics
(/root/reference/modules/identity_detection.py:189-258) — pages with exactly
two segments mutually repair each other's labels (propagate the known type to
an unknown partner, front↔back complement). The engine form: partition by the
group key, ship each (tiny) group to a vectorized Python worker as one pandas
DataFrame, apply the deterministic repair rule, return the repaired rows.

The rule implemented here (the audio/text analog, same shape):
within each group of exactly two rows, if one member's token count is less
than half the other's, it adopts the longer member's label into
``repaired_label`` (the short row is assumed mislabeled — the analog of
propagating the confident segment's type). All other rows keep their own
label. Deterministic and SQL-expressible, so the oracle can cross-check the
applyInPandas path exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StringType, StructType


def pair_repair(
    df: DataFrame,
    group_col: str,
    label_col: str,
    weight_col: str,
    id_col: str,
) -> DataFrame:
    """Returns (id, group, label, repaired_label). Groups of size != 2 pass
    through unchanged (identity_detection.py:195 'exactly 2 segments')."""
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField(group_col, df.schema[group_col].dataType),
            StructField(label_col, df.schema[label_col].dataType),
            StructField("repaired_label", StringType()),
        ]
    )
    cols = [id_col, group_col, label_col, weight_col]

    def repair(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[[id_col, group_col, label_col]].copy()
        out["repaired_label"] = pdf[label_col].astype(object)
        if len(pdf) == 2:
            w = pdf[weight_col].to_numpy()
            labels = pdf[label_col].to_numpy()
            if w[0] < 0.5 * w[1]:
                out.iloc[0, out.columns.get_loc("repaired_label")] = labels[1]
            elif w[1] < 0.5 * w[0]:
                out.iloc[1, out.columns.get_loc("repaired_label")] = labels[0]
        return out

    return (
        df.select(*cols)
        .groupBy(group_col)
        .applyInPandas(repair, schema=schema)
    )
