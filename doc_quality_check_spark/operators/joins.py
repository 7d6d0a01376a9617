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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    right_cols: list[str],
    suffix: str = "_r",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row is matched to the single
    ``right`` row with the greatest ``ts_col`` <= the left row's, per key
    (DuckDB/kdb ``ASOF JOIN`` semantics; left rows without a prior right
    row keep NULLs). Output = all ``left`` columns + each requested right
    column as ``<name><suffix>``.

    THE scalable shape: tag each side, union, and window-fill with
    ``last(..., ignorenulls=True)`` over (key, ts, side) — no join operator
    at all, so there is exactly ONE shuffle (the window exchange on the
    key) and both inputs arrive co-partitioned through it. The naive
    alternatives fail at 10^12 rows: an inequality join degenerates to a
    per-key cross product, and per-key ``applyInPandas`` materializes whole
    keys in Python. Per-key window state here is O(1) per row (running
    last), and skew is bounded by per-key row counts exactly like
    sessionization. Right rows sort BEFORE left rows at equal timestamps
    (side 0 < 1), so an equal-ts right row IS matched — the ``l.ts >=
    r.ts`` convention.

    Contract: ``right`` must be unique per (key, ts) — pre-aggregate with
    ``max_by`` otherwise (ambiguous as-of is nondeterministic under any
    engine). ``tolerance_us``: matches older than ``ts - tolerance`` are
    nulled (the matched right ts is tracked internally in epoch
    microseconds).
    """
    lcols = left.columns
    out_cols = [f"{c}{suffix}" for c in right_cols]
    clash = set(out_cols) & set(lcols)
    if clash:
        # silently overwriting a left column with right-side fills would
        # destroy left payload data — refuse instead
        raise ValueError(
            f"asof_join output columns {sorted(clash)} collide with left "
            "columns; pass a suffix that makes them distinct"
        )
    rtypes = dict((f.name, f.dataType) for f in right.schema.fields)

    l_tag = left.withColumn("__side", F.lit(1))
    for c, oc in zip(right_cols, out_cols):
        l_tag = l_tag.withColumn(oc, F.lit(None).cast(rtypes[c]))
    r_tag = right.select(
        *key_cols,
        F.col(ts_col),
        *[F.col(c).alias(oc) for c, oc in zip(right_cols, out_cols)],
    ).withColumn("__side", F.lit(0))
    for c in lcols:
        if c not in set(key_cols) | {ts_col}:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(
                (f.name, f.dataType) for f in left.schema.fields)[c]))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))

    from pyspark.sql import Window

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.asc(ts_col), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # all fills in ONE projection -> a single Window node in the plan
    fills = {
        oc: F.last(
            F.when(F.col("__side") == 0, F.col(oc)), ignorenulls=True
        ).over(w)
        for oc in out_cols
    }
    keep = [c for c in unioned.columns if c not in fills]
    if tolerance_us is None:
        filled = unioned.select(
            *keep, *[fills[oc].alias(oc) for oc in out_cols]
        )
    else:
        us = F.unix_micros(F.col(ts_col).cast("timestamp"))
        m_us = F.last(
            F.when(F.col("__side") == 0, F.unix_micros(F.col(ts_col).cast("timestamp"))),
            ignorenulls=True,
        ).over(w)
        filled = unioned.select(
            *keep,
            *[fills[oc].alias(oc) for oc in out_cols],
            ((us - m_us) <= F.lit(tolerance_us)).alias("__in_tol"),
        )
        filled = filled.select(
            *keep,
            *[
                F.when(F.col("__in_tol"), F.col(oc)).alias(oc)
                for oc in out_cols
            ],
        )
    return filled.filter(F.col("__side") == 1).select(*lcols, *out_cols)


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    pt_col: str,
    start_col: str,
    end_col: str,
    bin_us: int = 3_600_000_000,
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair on the same key
    with ``start <= pt <= end`` (inclusive BETWEEN semantics) — the binned
    range join. A plain inequality join is planned as a per-key cross
    product (quadratic under hot keys at 10^12 rows); instead both sides
    are mapped to fixed-width time bins — points to ONE bin, intervals
    EXPLODED over every bin they cover — and the pairing becomes an
    equi-join on (key, bin) with the exact BETWEEN predicate as a
    post-filter. Join cost is then sum over bins of |pts|x|ivs| within the
    bin, not per key.

    ``bin_us``: bin width in the same units as the columns (default 1h in
    epoch-microseconds). Choose it near the typical interval length:
    fanout per interval is ~len/bin_us + 1 exploded rows, while oversized
    bins re-grow the per-bin cross product. Timestamps should be
    pre-converted to epoch microseconds (``F.unix_micros``); any monotonic
    numeric domain works.
    """
    pb = points.withColumn(
        "__bin", F.floor(F.col(pt_col) / F.lit(bin_us)).cast("long")
    )
    ib = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bin_us)).cast("long"),
                F.floor(F.col(end_col) / F.lit(bin_us)).cast("long"),
            )
        ),
    )
    return (
        pb.join(ib, on=key_cols + ["__bin"])
        .filter(F.col(pt_col).between(F.col(start_col), F.col(end_col)))
        .drop("__bin")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level delta between two snapshots of the same table →
    (keys..., change_type ∈ added | removed | changed) — what changed
    between two Iceberg snapshot reads, the validation primitive behind
    incremental re-checking (only re-validate the delta) and change audits.
    Unchanged rows are NOT emitted. Comparison is NULL-safe per column
    (NULL = NULL is unchanged; NULL vs value is changed). Keys must be
    unique per snapshot — pre-aggregate otherwise.

    Scale shape: ONE full-outer shuffle join on the key columns (both
    sides hash-partition by key; AQE handles skewed keys); the compare
    columns ride the shuffle, nothing else does. At 10^12 rows prune
    ``compare_cols`` to the checked subset — the shuffle width is the
    operator's only cost knob."""
    o = old.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, key_cols, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.select(*key_cols, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )
