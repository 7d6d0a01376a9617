"""Join-shaped operators: catalog membership, enrichment, referential
integrity, salted aggregation for skewed keys.

Reference parity (SURVEY.md §2.4):
- J1 keyword-catalog membership (/root/reference/modules/
  identity_detection.py:296-304,319-325) → broadcast left-semi join.
- J2 frequency-map enrichment (identity_detection.py:261-327 build,
  :329-451 apply) → aggregate + broadcast-join-back.
- J4 referential integrity (north rule; reference analog: membership against
  curated catalogs, config.json:6,17) → left-anti join, AQE skew-aware.

Skew note (north rule "partitioning/shuffle/skew handled explicitly"): the
fixtures contain a hot clip_id repeated across the table; `salted_key_counts`
demonstrates the two-phase salted aggregation pattern. For plain counts
Spark's partial aggregation already combines map-side, so salting matters
when the aggregate state is large (collect_set/list) or under extreme
single-key skew — the engine exposes it as an explicit knob
(unique check param ``salt_buckets``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def referential_violations(
    df: DataFrame, ref: DataFrame, key: str, ref_key: str | None = None,
    broadcast_ref: bool = True,
) -> DataFrame:
    """Rows of ``df`` whose key is absent from ``ref`` → left-anti join.
    Broadcast the reference catalog when it is small; otherwise rely on
    sort-merge + AQE skew handling."""
    ref_key = ref_key or key
    ref_sel = ref.select(F.col(ref_key).alias(key)).dropDuplicates([key])
    if broadcast_ref:
        ref_sel = F.broadcast(ref_sel)
    return df.join(ref_sel, on=key, how="left_anti")


def semi_join_members(df: DataFrame, ref: DataFrame, key: str) -> DataFrame:
    """Left-semi membership (J1)."""
    return df.join(F.broadcast(ref.select(key).dropDuplicates([key])), on=key, how="left_semi")


def duplicate_keys(df: DataFrame, key: str, salt_buckets: int = 0) -> DataFrame:
    """Keys appearing more than once → (key, cnt). The uniqueness/PK check
    (A11). With ``salt_buckets`` > 0, a two-phase salted aggregation: partial
    count per (key, salt) then re-aggregate per key — bounds per-task state
    under a hot key."""
    if salt_buckets and salt_buckets > 1:
        salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
        partial = df.groupBy(F.col(key), salt.alias("_salt")).agg(F.count("*").alias("_c"))
        counts = partial.groupBy(key).agg(F.sum("_c").alias("cnt"))
    else:
        counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
    return counts.filter(F.col("cnt") > 1)


def frequency_enrich(
    df: DataFrame, key: str, count_col: str = "freq"
) -> DataFrame:
    """J2: global per-key frequency aggregated once, broadcast-joined back
    onto every row (the reference's two-pass keyword-frequency boost,
    identity_detection.py:261-327 → :329-451)."""
    freq = df.groupBy(key).agg(F.count("*").alias(count_col))
    return df.join(F.broadcast(freq), on=key, how="left")
