"""Constraint suggestion: profile a table once, emit a CheckSuite that the
profiled data passes — the machine-written analog of the reference's
hand-authored config.json (the declarative suite, config_loader.py), and
the standard bootstrap move of data-validation engines (cf. Deequ's
constraint suggestion): run the suggested suite against FUTURE data to
catch drift from today's invariants.

One profiling pass computes, for every column, in a SINGLE fused
aggregation job (the suite planner's fuse-same-granularity rule):
completeness, approx distinct count, min/max, and p0.5/p99.5 quantiles for
numerics. Low-cardinality string columns additionally get one tiny distinct
scan for their domain. Suggested rules:

- completeness == 1           → ``not_null`` row check
- completeness in [hi, 1)     → ``completeness_min`` table check (floored)
- numeric                     → ``in_range`` over the [p0.5, p99.5] span,
                                widened by ``range_slack`` so boundary
                                values don't flap (quantiles via sketch —
                                bounded memory at any scale)
- string, distinct <= max_domain → ``isin`` domain check + an advisory
                                ``entropy_range`` around the observed
                                Shannon entropy (fires on collapse toward
                                one value or spread toward uniform)
- distinct ≈ rows on a non-float column → ``unique`` table check (PK-like)

Every suggested rule except ``unique`` passes on the profiled data by
construction. ``unique`` is deliberately looser: a column whose
distinctness is within ``unique_tolerance`` of 1 is ALMOST a key, and the
suggested check then FAILS on the profiled data, surfacing the duplicates
— flagging a near-key with existing dups is more useful than silently not
suggesting the constraint (approx_count_distinct's own ~2% error also sits
inside the tolerance).

``bytes``-typed columns are never profiled (the column-pruning discipline:
suggestion is a metadata pass and must not read payloads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType, NumericType, StringType

from doc_quality_check_spark.suite.spec import Check, CheckSuite


def suggest_suite(
    df: DataFrame,
    name: str = "suggested",
    partition_by: list[str] | None = None,
    max_domain: int = 32,
    range_slack: float = 0.1,
    completeness_floor: float = 0.9,
    unique_tolerance: float = 0.02,
    range_severity: str = "error",
) -> CheckSuite:
    """Profile ``df`` and return a CheckSuite the profiled data satisfies.

    ``range_severity="warn"`` stamps the suggested in_range rules as
    advisory — the right default posture for auto-derived numeric bounds
    on their first deployment (they encode today's distribution, not a
    hard contract; promote to errors after the bounds have been reviewed).
    """
    fields = [
        f for f in df.schema.fields if not isinstance(f.dataType, BinaryType)
    ]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c = f.name
        aggs.append(F.count(c).alias(f"nn__{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"nd__{c}"))
        if isinstance(f.dataType, NumericType):
            aggs.append(F.min(c).alias(f"mn__{c}"))
            aggs.append(F.max(c).alias(f"mx__{c}"))
            aggs.append(
                F.expr(f"percentile_approx({c}, array(0.005, 0.995))").alias(
                    f"pq__{c}"
                )
            )
    prof = df.agg(*aggs).first()
    n_rows = prof["__n"] or 0

    checks: list[Check] = []
    prio = 1
    for f in fields:
        c = f.name
        nn, nd = prof[f"nn__{c}"], prof[f"nd__{c}"]
        completeness = (nn / n_rows) if n_rows else 1.0
        if n_rows and completeness == 1.0:
            checks.append(Check(f"{c}_not_null", "not_null", c, priority=prio))
        elif completeness >= completeness_floor:
            # floor slightly below observed so sampling noise doesn't flap
            floor = max(0.0, round(completeness - 0.01, 4))
            checks.append(
                Check(f"{c}_completeness", "completeness_min", c,
                      {"min_ratio": floor}, priority=prio)
            )
        prio += 1
        if isinstance(f.dataType, NumericType):
            lo, hi = prof[f"mn__{c}"], prof[f"mx__{c}"]
            pq = prof[f"pq__{c}"]
            if lo is not None and hi is not None and pq:
                p_lo, p_hi = float(pq[0]), float(pq[-1])
                span = max(p_hi - p_lo, abs(p_hi) * 0.01, 1e-9)
                params = {
                    "min": min(float(lo), p_lo - range_slack * span),
                    "max": max(float(hi), p_hi + range_slack * span),
                }
                if range_severity != "error":
                    params["severity"] = range_severity
                checks.append(
                    Check(f"{c}_range", "in_range", c, params, priority=prio)
                )
                prio += 1
        if isinstance(f.dataType, StringType) and nd and nd <= max_domain:
            # one grouped count serves BOTH the isin domain and the entropy
            # profile (same single extra scan the distinct() used to be)
            counts = (
                df.select(c).filter(F.col(c).isNotNull())
                .groupBy(c).agg(F.count(F.lit(1)).alias("_c"))
                .limit(max_domain + 1).collect()
            )
            domain = [r[0] for r in counts]
            if len(domain) <= max_domain:
                checks.append(
                    Check(f"{c}_domain", "isin", c,
                          {"values": sorted(domain)}, priority=prio)
                )
                prio += 1
                tot = sum(r["_c"] for r in counts)
                if len(domain) >= 2 and tot:
                    import math

                    h = -sum(
                        (r["_c"] / tot) * math.log2(r["_c"] / tot)
                        for r in counts if r["_c"]
                    )
                    if h > 0:
                        # h/2 <= h <= (h + log2(k))/2 — passes today, fires
                        # on collapse toward one value or spread toward
                        # uniform; advisory by the same posture as in_range.
                        # DIRECTIONAL rounding: a uniform domain has
                        # h == log2(k), and round-to-nearest on the max
                        # could land below h, failing the profiled data
                        params = {
                            "min": math.floor(h / 2 * 1e4) / 1e4,
                            "max": math.ceil(
                                (h + math.log2(len(domain))) / 2 * 1e4
                            ) / 1e4,
                        }
                        if range_severity != "error":
                            params["severity"] = range_severity
                        checks.append(
                            Check(f"{c}_entropy", "entropy_range", c,
                                  params, priority=prio)
                        )
                        prio += 1
        # PK-like: near-total distinctness on a non-floating column
        if (
            nd
            and n_rows
            and nd >= n_rows * (1 - unique_tolerance)
            and f.dataType.simpleString() not in ("double", "float")
        ):
            checks.append(
                Check(f"{c}_unique", "unique", c, {}, priority=prio)
            )
            prio += 1
    return CheckSuite(
        name=name, checks=checks, partition_by=partition_by or []
    )


def suggest_drift_spec(
    df: DataFrame,
    columns: list[str] | None = None,
    target_bins: int = 32,
    max_categorical_distinct: int = 64,
) -> dict[str, float | None]:
    """Recommend drift-histogram bucketing per column: ``{column:
    bin_width-or-None}``, ready to hand to ``snapshot_histograms(df, cols,
    bin_width=...)`` and to each drift check's ``bin_width`` param — both
    sides then bucket identically, which is the one invariant binned drift
    depends on.

    One fused profiling pass (same discipline as :func:`suggest_suite`).
    Per column:

    - numeric with more than ``max_categorical_distinct`` distinct values →
      an equi-width ``bin_width`` spanning the robust p0.5–p99.5 range in
      ``target_bins`` bins, rounded UP to 1-2-5×10^k so the widths are
      human-stable (a re-profile on slightly different data yields the
      SAME width — raw span/target_bins would churn every snapshot);
    - numeric low-cardinality or low-cardinality string → None (raw
      categorical buckets);
    - binary columns are skipped entirely (never profiled);
    - columns with no meaningful drift distribution are DROPPED from the
      spec (round-5 review: the CLI pastes the spec straight into drift
      checks): identifier-like numerics (approx-distinct >= 90% of rows —
      drift on a unique key reads 100% every snapshot) and
      high-cardinality strings (> ``max_categorical_distinct`` distinct —
      free text can't bucket by equality, and its histogram would grow
      one bucket per distinct value, the unbounded-histogram failure
      ``bin_width`` exists to prevent).

    The point at scale: unbinned continuous columns make the drift
    histogram as large as the distinct-value count (operators/aggregates
    ``bucket_col``); this derives the width users would otherwise guess."""
    import math

    fields = [
        f for f in df.schema.fields if not isinstance(f.dataType, BinaryType)
    ]
    if columns is not None:
        want = set(columns)
        fields = [f for f in fields if f.name in want]
    aggs = []
    numeric = []
    for f in fields:
        aggs.append(F.approx_count_distinct(f.name).alias(f"nd__{f.name}"))
        if isinstance(f.dataType, NumericType):
            numeric.append(f.name)
            aggs.append(
                F.expr(
                    f"percentile_approx({f.name}, array(0.005, 0.995))"
                ).alias(f"pq__{f.name}")
            )
    if not fields:
        return {}
    aggs.append(F.count(F.lit(1)).alias("__n"))
    prof = df.agg(*aggs).first()
    n_rows = int(prof["__n"] or 0)

    def round_125(x: float) -> float:
        # smallest 1/2/5 x 10^k width >= x: stable across re-profiles
        if x <= 0:
            return 1.0
        k = math.floor(math.log10(x))
        for m in (1.0, 2.0, 5.0, 10.0):
            w = m * 10.0**k
            if w >= x - 1e-12 * max(1.0, abs(x)):
                return w
        return 10.0 ** (k + 1)

    spec: dict[str, float | None] = {}
    for f in fields:
        c = f.name
        nd = prof[f"nd__{c}"] or 0
        if nd > max_categorical_distinct:
            if c not in numeric:
                continue  # high-cardinality string: not drift-checkable
            if n_rows and nd >= 0.9 * n_rows:
                continue  # identifier-like numeric: no distribution
        if c in numeric and nd > max_categorical_distinct:
            pq = prof[f"pq__{c}"]
            span = (
                float(pq[-1]) - float(pq[0])
                if pq and pq[0] is not None else 0.0
            )
            spec[c] = round_125(span / target_bins) if span > 0 else None
        else:
            spec[c] = None
    return spec
