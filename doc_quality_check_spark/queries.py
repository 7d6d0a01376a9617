"""Driver-contract query surface: each SURVEY.md §2 operator exposed as a
(spark, sf_dir) -> DataFrame callable with a matching ANSI-SQL oracle that
DuckDB runs over the same parquet (CORRECTNESS gate).

Conventions required by the driver's compare (row-count + schema +
order-insensitive value hash):
- every computed column aliased IDENTICALLY in Spark and SQL;
- floating aggregates rounded (4dp) on BOTH sides so ulp-level accumulation
  order differences can't flip the hash;
- deterministic tie-breaks on every ranking/window.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from doc_quality_check_spark.operators.aggregates import (
    drift_chi2,
    drift_chi2_by_group,
    drift_ks,
    drift_ks_by_group,
    drift_psi,
    drift_psi_by_group,
    drift_w1,
    drift_w1_by_group,
)
from doc_quality_check_spark.operators.joins import (
    duplicate_keys,
    frequency_enrich,
    referential_violations,
    semi_join_members,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# P1-P4 verdict projection (first-failure-wins reason chain, app.py:369-380)
# ---------------------------------------------------------------------------

def q_verdict_projection(spark, sf):
    ev = t(spark, sf, "events")
    is_error = F.col("event_type") == "error"
    is_low = F.col("value") < 5.0
    reason = (
        F.when(is_error, F.lit("error_event"))
        .when(is_low, F.lit("low_value"))
        .otherwise(F.lit("OK"))
    )
    return ev.select(
        "event_id",
        reason.alias("reason"),
        F.when(reason == "OK", F.lit("Valid")).otherwise(F.lit("Invalid")).alias("status"),
    )


SQL_VERDICT = """
SELECT event_id,
       CASE WHEN event_type = 'error' THEN 'error_event'
            WHEN value < 5.0 THEN 'low_value'
            ELSE 'OK' END AS reason,
       CASE WHEN event_type <> 'error' AND value >= 5.0 THEN 'Valid'
            ELSE 'Invalid' END AS status
FROM events
"""


# P6 violation rows (one pass, array_compact + explode)
def q_violation_rows(spark, sf):
    ev = t(spark, sf, "events")
    checks = [
        ("error_event", F.col("event_type") == "error"),
        ("low_value", F.col("value") < 5.0),
        ("null_props", F.col("props").isNull()),
    ]
    arr = F.array_compact(F.array(*[F.when(c, F.lit(cid)) for cid, c in checks]))
    return (
        ev.select("event_id", arr.alias("_f"))
        .filter(F.size("_f") > 0)
        .select("event_id", F.explode("_f").alias("constraint_id"))
    )


SQL_VIOLATIONS = """
SELECT event_id, 'error_event' AS constraint_id FROM events WHERE event_type = 'error'
UNION ALL
SELECT event_id, 'low_value' FROM events WHERE value < 5.0
UNION ALL
SELECT event_id, 'null_props' FROM events WHERE props IS NULL
"""


# ---------------------------------------------------------------------------
# A1 global summary
# ---------------------------------------------------------------------------

def q_global_summary(spark, sf):
    # avg is computed as an exact fixed-point decimal sum / count so the
    # result is independent of partial-aggregation order (float sums are
    # not associative; the driver's hash compares exact rounded values).
    li = t(spark, sf, "lineitem")
    dec_sum = F.sum(F.col("l_quantity").cast("decimal(28,6)"))
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).cast("long").alias("n_returned"),
        F.round((dec_sum / F.count(F.lit(1))).cast("double"), 4).alias("avg_qty"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


SQL_GLOBAL_SUMMARY = """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) / count(*) AS DOUBLE), 4) AS avg_qty,
       count(DISTINCT l_orderkey) AS n_orders,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem
"""


# A2 grouped stats (TPC-H Q1 shape)
def q_group_stats(spark, sf):
    li = t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
    )


SQL_GROUP_STATS = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 4) AS avg_disc
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# A3 rollup (multi-level grouping {folder:{file:[rows]}} analog)
def q_rollup_stats(spark, sf):
    o = t(spark, sf, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


SQL_ROLLUP = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_rows, round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


# A4 per-category stats + pass-rate at threshold (analyze_thresholds.py:79-89)
def q_category_stats(spark, sf):
    ev = t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.avg(F.when(F.col("value") >= 10.0, 1.0).otherwise(0.0)), 4).alias("pass_rate"),
    )


SQL_CATEGORY_STATS = """
SELECT event_type,
       count(*) AS n_rows,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value,
       round(avg(value), 4) AS avg_value,
       round(avg(CASE WHEN value >= 10.0 THEN 1.0 ELSE 0.0 END), 4) AS pass_rate
FROM events
GROUP BY event_type
"""


# A5 exact percentile distribution (analyze_thresholds.py:99-113)
def q_percentiles(spark, sf):
    """ONE exact-percentile aggregation over the probability array (a single
    sort/merge pass), then element extraction — 5× cheaper than five separate
    percentile aggregates."""
    li = t(spark, sf, "lineitem")
    qs = {"p10": 1, "p25": 2, "p50": 3, "p75": 4, "p90": 5}
    arr = li.agg(
        F.expr(
            "percentile(l_extendedprice, array(0.1, 0.25, 0.5, 0.75, 0.9))"
        ).alias("_q")
    )
    return arr.select(*[
        F.round(F.element_at("_q", i), 4).alias(name) for name, i in qs.items()
    ])


def q_percentiles_sketch(spark, sf):
    """The ENGINE's percentile path: percentile_approx (Greenwald-Khanna
    sketch — mergeable, bounded memory, map-side partial like every other
    agg) over the same probabilities. This is what the suite's
    quantile_range check runs at 10^12 rows; the exact `percentiles` query
    above exists only as the DuckDB-parity form (single-reducer array sort)
    and is deliberately NOT the benchmarked engine number (r2 verdict:
    'bench should not present the exact form as an engine number').

    Sketch estimates are engine-specific, so raw approx values cannot
    value-match DuckDB. Round-5 quantitative gate (r4 verdict #7): the
    query is SELF-CHECKING — it emits the exact percentiles (hash-matched
    against quantile_cont, the proven-equal pair from `percentiles`) plus
    one ok_* boolean per probability asserting |approx − exact| ≤ 1% of
    exact; the oracle asserts TRUE. A sketch drifting past the bound flips
    the boolean and hash-fails the driver row.

    Scale note: embedding percentile() makes THIS GATE QUERY carry the
    single-reducer exact sort — deliberate, because driver-gate queries
    run at fixture scale only. The production percentile path (the
    quantile_range check, percentile_approx/t-digest) never computes the
    exact form; don't read this query's bench time as the sketch cost."""
    li = t(spark, sf, "lineitem")
    probs = "array(0.1, 0.25, 0.5, 0.75, 0.9)"
    arr = li.agg(
        F.expr(
            f"percentile_approx(l_extendedprice, {probs}, 10000)"
        ).alias("_a"),
        F.expr(f"percentile(l_extendedprice, {probs})").alias("_e"),
    )
    cols = []
    for name, i in {"p10": 1, "p25": 2, "p50": 3, "p75": 4, "p90": 5}.items():
        exact = F.element_at("_e", i)
        approx = F.element_at("_a", i)
        cols.append(F.round(exact, 4).alias(name))
        cols.append(
            (F.abs(approx - exact) <= F.abs(exact) * F.lit(0.01))
            .alias(f"ok_{name}")
        )
    return arr.select(*cols)


SQL_PERCENTILES = """
SELECT round(quantile_cont(l_extendedprice, 0.1), 4) AS p10,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
FROM lineitem
"""

# the sketch query's oracle: exact values (same expressions as
# SQL_PERCENTILES) + TRUE for each epsilon-bound flag — the Spark side
# computes the flags from |approx − exact|, so a drifting sketch
# hash-fails here
SQL_PERCENTILES_SKETCH = """
SELECT round(quantile_cont(l_extendedprice, 0.1), 4) AS p10,  TRUE AS ok_p10,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25, TRUE AS ok_p25,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,  TRUE AS ok_p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75, TRUE AS ok_p75,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,  TRUE AS ok_p90
FROM lineitem
"""


# A6 threshold sweep — ONE scan, conditional sums
def q_threshold_sweep(spark, sf):
    ev = t(spark, sf, "events")
    ts = [5, 10, 15, 20, 30, 50]
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(F.when(F.col("value") >= F.lit(float(x)), 1).otherwise(0)).cast("long").alias(f"ge_{x}") for x in ts],
    )


# DuckDB sum() over INTEGER yields HUGEINT (int128) — cast to BIGINT so the
# driver's value normalization matches Spark's LongType exactly.
SQL_SWEEP = """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN value >= 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS ge_5,
       CAST(sum(CASE WHEN value >= 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS ge_10,
       CAST(sum(CASE WHEN value >= 15.0 THEN 1 ELSE 0 END) AS BIGINT) AS ge_15,
       CAST(sum(CASE WHEN value >= 20.0 THEN 1 ELSE 0 END) AS BIGINT) AS ge_20,
       CAST(sum(CASE WHEN value >= 30.0 THEN 1 ELSE 0 END) AS BIGINT) AS ge_30,
       CAST(sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS ge_50
FROM events
"""


# A11 uniqueness / duplicate keys
def q_duplicate_keys(spark, sf):
    o = t(spark, sf, "orders")
    return duplicate_keys(o, "o_custkey").withColumnRenamed("o_custkey", "key")


SQL_DUP_KEYS = """
SELECT o_custkey AS key, count(*) AS cnt
FROM orders GROUP BY o_custkey HAVING count(*) > 1
"""


# J4 referential-integrity anti-join
def q_referential_anti(spark, sf):
    c = t(spark, sf, "customer").select("c_custkey", "c_name")
    o = t(spark, sf, "orders")
    return referential_violations(c, o, "c_custkey", "o_custkey")


SQL_REF_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
"""


# J1 left-semi membership
def q_semi_join(spark, sf):
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    bld = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("o_custkey")
    )
    return semi_join_members(o, bld, "o_custkey")


SQL_SEMI = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


# J2 frequency aggregate + broadcast-back enrichment
def q_freq_enrich(spark, sf):
    ev = t(spark, sf, "events").select("event_id", "user_id")
    return frequency_enrich(ev, "user_id", "user_events").select(
        "event_id", "user_id", "user_events"
    )


SQL_FREQ_ENRICH = """
SELECT e.event_id, e.user_id, f.user_events
FROM events e
JOIN (SELECT user_id, count(*) AS user_events FROM events GROUP BY user_id) f
USING (user_id)
"""


# A8 argmax per group (best detection per page, app.py:461-488)
def q_argmax_per_group(spark, sf):
    ev = t(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "event_id", F.round("value", 4).alias("best_value"))
    )


SQL_ARGMAX = """
SELECT event_type, event_id, round(value, 4) AS best_value
FROM (SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
      FROM events) x
WHERE rn = 1
"""


# P9/W4 top-N per group
def q_topn_per_group(spark, sf):
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rn")
    )


SQL_TOPN = """
SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price, rn
FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders) x
WHERE rn <= 3
"""


# W2 lag/lead neighbor computation (overlap-fix analog)
def q_lag_neighbor(spark, sf):
    ev = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value", 1).over(w), 4).alias("delta_prev"),
    )


SQL_LAG = """
SELECT event_id, user_id,
       round(value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC), 4) AS delta_prev
FROM events
"""


# U1/U2/U3 set ops: union + dedupe
def q_union_dedupe(spark, sf):
    ev = t(spark, sf, "events")
    a = ev.filter(F.col("value") >= 50).select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.unionByName(b).dropDuplicates(["user_id"])


SQL_UNION_DEDUPE = """
SELECT DISTINCT user_id FROM (
  SELECT user_id FROM events WHERE value >= 50
  UNION ALL
  SELECT user_id FROM events WHERE event_type = 'purchase'
)
"""


# A12 drift: PSI between two cohort histograms (engine operator reused)
def _value_hist(ev, etype):
    return (
        ev.filter(F.col("event_type") == etype)
        .groupBy(F.floor(F.col("value") / 10).cast("long").alias("bucket"))
        .agg(F.count("*").alias("count"))
    )


def q_drift_psi(spark, sf):
    ev = t(spark, sf, "events")
    return drift_psi(_value_hist(ev, "click"), _value_hist(ev, "view")).select(
        F.round("psi", 4).alias("psi")
    )


SQL_DRIFT_PSI = """
WITH cur AS (SELECT CAST(floor(value/10) AS BIGINT) AS bucket, count(*) AS c_cnt
             FROM events WHERE event_type = 'click' GROUP BY 1),
base AS (SELECT CAST(floor(value/10) AS BIGINT) AS bucket, count(*) AS b_cnt
         FROM events WHERE event_type = 'view' GROUP BY 1),
j AS (SELECT coalesce(cur.bucket, base.bucket) AS bucket,
             coalesce(c_cnt, 0) AS c_cnt, coalesce(b_cnt, 0) AS b_cnt
      FROM cur FULL OUTER JOIN base ON cur.bucket = base.bucket),
tot AS (SELECT sum(c_cnt) AS ct, sum(b_cnt) AS bt FROM j)
SELECT round(sum((p - q) * ln(p / q)), 4) AS psi
FROM (SELECT greatest(c_cnt / ct, 1e-6) AS p, greatest(b_cnt / bt, 1e-6) AS q
      FROM j, tot) z
"""


def q_drift_ks(spark, sf):
    ev = t(spark, sf, "events")
    return drift_ks(_value_hist(ev, "click"), _value_hist(ev, "view")).select(
        F.round("ks", 4).alias("ks")
    )


SQL_DRIFT_KS = """
WITH cur AS (SELECT CAST(floor(value/10) AS BIGINT) AS bucket, count(*) AS c_cnt
             FROM events WHERE event_type = 'click' GROUP BY 1),
base AS (SELECT CAST(floor(value/10) AS BIGINT) AS bucket, count(*) AS b_cnt
         FROM events WHERE event_type = 'view' GROUP BY 1),
j AS (SELECT coalesce(cur.bucket, base.bucket) AS bucket,
             coalesce(c_cnt, 0) AS c_cnt, coalesce(b_cnt, 0) AS b_cnt
      FROM cur FULL OUTER JOIN base ON cur.bucket = base.bucket),
tot AS (SELECT sum(c_cnt) AS ct, sum(b_cnt) AS bt FROM j),
cdf AS (SELECT sum(c_cnt) OVER (ORDER BY bucket) * 1.0 / ct AS cc,
               sum(b_cnt) OVER (ORDER BY bucket) * 1.0 / bt AS cb
        FROM j, tot)
SELECT round(max(abs(cc - cb)), 4) AS ks FROM cdf
"""


def q_drift_w1(spark, sf):
    """A12 drift, Wasserstein-1: EMD between the click/view value-bucket
    distributions — PSI is bucket-order-blind and KS magnitude-blind; W1
    weighs how FAR the mass moved (operators/aggregates.py drift_w1)."""
    ev = t(spark, sf, "events")
    return drift_w1(_value_hist(ev, "click"), _value_hist(ev, "view")).select(
        F.round("w1", 4).alias("w1")
    )


SQL_DRIFT_W1 = """
WITH cur AS (SELECT CAST(floor(value/10) AS BIGINT) AS bucket, count(*) AS c_cnt
             FROM events WHERE event_type = 'click' GROUP BY 1),
base AS (SELECT CAST(floor(value/10) AS BIGINT) AS bucket, count(*) AS b_cnt
         FROM events WHERE event_type = 'view' GROUP BY 1),
j AS (SELECT coalesce(cur.bucket, base.bucket) AS bucket,
             coalesce(c_cnt, 0) AS c_cnt, coalesce(b_cnt, 0) AS b_cnt
      FROM cur FULL OUTER JOIN base ON cur.bucket = base.bucket),
tot AS (SELECT sum(c_cnt) AS ct, sum(b_cnt) AS bt FROM j),
cdf AS (SELECT bucket, ct, bt,
               sum(c_cnt) OVER (ORDER BY bucket) * 1.0 / ct AS cc,
               sum(b_cnt) OVER (ORDER BY bucket) * 1.0 / bt AS cb
        FROM j, tot),
step AS (SELECT ct, bt,
                abs(cc - cb) * (lead(bucket) OVER (ORDER BY bucket) - bucket) AS a
         FROM cdf)
SELECT round(CASE WHEN count(*) > 0 AND max(ct) > 0 AND max(bt) > 0
             THEN coalesce(sum(a), 0.0) END, 4) AS w1
FROM step
"""


def _grouped_event_hist(ev, etype):
    """Cohort histogram (grp, bucket, count) shared by the four by-group
    drift queries. NULL values are excluded on BOTH engines: a NULL bucket
    would sort NULLS FIRST in Spark window orders but NULLS LAST in
    DuckDB's ORDER BY — a latent hash divergence (driver-contract gotcha),
    and a NULL bucket is a completeness concern, not a distribution one."""
    return (
        ev.filter((F.col("event_type") == etype) & F.col("value").isNotNull())
        .groupBy(
            (F.col("user_id") % 10).alias("grp"),
            F.floor(F.col("value") / 10).cast("long").alias("bucket"),
        )
        .agg(F.count("*").alias("count"))
    )


def q_drift_psi_by_group(spark, sf):
    """A12 drift at partition granularity: PSI per user cohort in ONE plan
    (grouped histograms + (group,bucket) equi-join + group window) — the
    per-Iceberg-partition drift scan, not a driver loop of per-group jobs."""
    ev = t(spark, sf, "events")
    ghist = lambda etype: _grouped_event_hist(ev, etype)  # noqa: E731

    return (
        drift_psi_by_group(ghist("click"), ghist("view"), "grp")
        .select("grp", F.round("psi", 4).alias("psi"))
        .orderBy("grp")
    )


SQL_DRIFT_PSI_BY_GROUP = """
WITH cur AS (SELECT user_id % 10 AS grp, CAST(floor(value/10) AS BIGINT) AS bucket,
                    count(*) AS c_cnt
             FROM events WHERE event_type = 'click' AND value IS NOT NULL GROUP BY 1, 2),
base AS (SELECT user_id % 10 AS grp, CAST(floor(value/10) AS BIGINT) AS bucket,
                count(*) AS b_cnt
         FROM events WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1, 2),
j AS (SELECT coalesce(cur.grp, base.grp) AS grp,
             coalesce(cur.bucket, base.bucket) AS bucket,
             coalesce(c_cnt, 0) AS c_cnt, coalesce(b_cnt, 0) AS b_cnt
      FROM cur FULL OUTER JOIN base
        ON cur.grp = base.grp AND cur.bucket = base.bucket),
t AS (SELECT grp, c_cnt, b_cnt,
             sum(c_cnt) OVER (PARTITION BY grp) AS ct,
             sum(b_cnt) OVER (PARTITION BY grp) AS bt
      FROM j)
SELECT grp, round(sum((p - q) * ln(p / q)), 4) AS psi
FROM (SELECT grp, greatest(c_cnt * 1.0 / ct, 1e-6) AS p,
             greatest(b_cnt * 1.0 / bt, 1e-6) AS q
      FROM t) z
GROUP BY grp
ORDER BY grp
"""


def q_drift_ks_by_group(spark, sf):
    """Per-cohort KS in one grouped plan (per-group cumulative CDF
    windows — the ordered per-partition drift statistic)."""
    ev = t(spark, sf, "events")
    ghist = lambda etype: _grouped_event_hist(ev, etype)  # noqa: E731

    return (
        drift_ks_by_group(ghist("click"), ghist("view"), "grp")
        .select("grp", F.round("ks", 4).alias("ks"))
        .orderBy("grp")
    )


SQL_DRIFT_KS_BY_GROUP = """
WITH cur AS (SELECT user_id % 10 AS grp, CAST(floor(value/10) AS BIGINT) AS bucket,
                    count(*) AS c_cnt
             FROM events WHERE event_type = 'click' AND value IS NOT NULL GROUP BY 1, 2),
base AS (SELECT user_id % 10 AS grp, CAST(floor(value/10) AS BIGINT) AS bucket,
                count(*) AS b_cnt
         FROM events WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1, 2),
j AS (SELECT coalesce(cur.grp, base.grp) AS grp,
             coalesce(cur.bucket, base.bucket) AS bucket,
             coalesce(c_cnt, 0) AS c_cnt, coalesce(b_cnt, 0) AS b_cnt
      FROM cur FULL OUTER JOIN base
        ON cur.grp = base.grp AND cur.bucket = base.bucket),
cdf AS (SELECT grp,
               sum(c_cnt) OVER (PARTITION BY grp ORDER BY bucket) * 1.0
                 / sum(c_cnt) OVER (PARTITION BY grp) AS cc,
               sum(b_cnt) OVER (PARTITION BY grp ORDER BY bucket) * 1.0
                 / sum(b_cnt) OVER (PARTITION BY grp) AS cb
        FROM j)
SELECT grp, round(max(abs(cc - cb)), 4) AS ks FROM cdf
GROUP BY grp ORDER BY grp
"""


def q_drift_w1_by_group(spark, sf):
    """Per-cohort Wasserstein-1 in one grouped plan (per-group CDF gap x
    bucket distance — per-partition drift magnitude in value units)."""
    ev = t(spark, sf, "events")
    ghist = lambda etype: _grouped_event_hist(ev, etype)  # noqa: E731

    return (
        drift_w1_by_group(ghist("click"), ghist("view"), "grp")
        .select("grp", F.round("w1", 4).alias("w1"))
        .orderBy("grp")
    )


SQL_DRIFT_W1_BY_GROUP = """
WITH cur AS (SELECT user_id % 10 AS grp, CAST(floor(value/10) AS BIGINT) AS bucket,
                    count(*) AS c_cnt
             FROM events WHERE event_type = 'click' AND value IS NOT NULL GROUP BY 1, 2),
base AS (SELECT user_id % 10 AS grp, CAST(floor(value/10) AS BIGINT) AS bucket,
                count(*) AS b_cnt
         FROM events WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1, 2),
j AS (SELECT coalesce(cur.grp, base.grp) AS grp,
             coalesce(cur.bucket, base.bucket) AS bucket,
             coalesce(c_cnt, 0) AS c_cnt, coalesce(b_cnt, 0) AS b_cnt
      FROM cur FULL OUTER JOIN base
        ON cur.grp = base.grp AND cur.bucket = base.bucket),
cdf AS (SELECT grp, bucket,
               sum(c_cnt) OVER (PARTITION BY grp) AS ct,
               sum(b_cnt) OVER (PARTITION BY grp) AS bt,
               sum(c_cnt) OVER (PARTITION BY grp ORDER BY bucket) * 1.0
                 / sum(c_cnt) OVER (PARTITION BY grp) AS cc,
               sum(b_cnt) OVER (PARTITION BY grp ORDER BY bucket) * 1.0
                 / sum(b_cnt) OVER (PARTITION BY grp) AS cb
        FROM j),
step AS (SELECT grp, ct, bt,
                abs(cc - cb) * (lead(bucket) OVER (PARTITION BY grp ORDER BY bucket)
                                - bucket) AS a
         FROM cdf)
SELECT grp, round(CASE WHEN count(*) > 0 AND max(ct) > 0 AND max(bt) > 0
                  THEN coalesce(sum(a), 0.0) END, 4) AS w1
FROM step GROUP BY grp ORDER BY grp
"""


def q_drift_chi2_by_group(spark, sf):
    """Per-cohort chi-squared/Cramér's V in one grouped plan — the
    categorical twin of drift_psi_by_group (per-Iceberg-partition drift on
    a categorical column, no per-group job loop)."""
    ev = t(spark, sf, "events")
    ghist = lambda etype: _grouped_event_hist(ev, etype)  # noqa: E731

    return (
        drift_chi2_by_group(ghist("click"), ghist("view"), "grp")
        .select(
            "grp",
            F.round("chi2", 4).alias("chi2"),
            F.round("cramers_v", 4).alias("cramers_v"),
            F.col("dof"),
        )
        .orderBy("grp")
    )


SQL_DRIFT_CHI2_BY_GROUP = """
WITH cur AS (SELECT user_id % 10 AS grp, CAST(floor(value/10) AS BIGINT) AS bucket,
                    count(*) AS c_cnt
             FROM events WHERE event_type = 'click' AND value IS NOT NULL GROUP BY 1, 2),
base AS (SELECT user_id % 10 AS grp, CAST(floor(value/10) AS BIGINT) AS bucket,
                count(*) AS b_cnt
         FROM events WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1, 2),
j AS (SELECT coalesce(cur.grp, base.grp) AS grp,
             coalesce(cur.bucket, base.bucket) AS bucket,
             coalesce(c_cnt, 0) AS c_cnt, coalesce(b_cnt, 0) AS b_cnt
      FROM cur FULL OUTER JOIN base
        ON cur.grp = base.grp AND cur.bucket = base.bucket),
t AS (SELECT grp, c_cnt, b_cnt,
             sum(c_cnt) OVER (PARTITION BY grp) AS ct,
             sum(b_cnt) OVER (PARTITION BY grp) AS bt
      FROM j),
e AS (SELECT grp, c_cnt, b_cnt, ct, bt,
             (c_cnt + b_cnt) * 1.0 / (ct + bt) * ct AS e1,
             (c_cnt + b_cnt) * 1.0 / (ct + bt) * bt AS e2
      FROM t)
SELECT grp, round(CASE WHEN max(ct) > 0 AND max(bt) > 0 THEN sum(term) END, 4) AS chi2,
       round(CASE WHEN max(ct) > 0 AND max(bt) > 0
             THEN sqrt(sum(term) / max(ct + bt)) END, 4) AS cramers_v,
       CAST(count(*) - 1 AS BIGINT) AS dof
FROM (SELECT grp, ct, bt,
             CASE WHEN e1 > 0 THEN (c_cnt - e1) * (c_cnt - e1) / e1 ELSE 0.0 END
           + CASE WHEN e2 > 0 THEN (b_cnt - e2) * (b_cnt - e2) / e2 ELSE 0.0 END AS term
      FROM e) z
GROUP BY grp
ORDER BY grp
"""


def q_drift_chi2(spark, sf):
    """A12 drift, chi-squared homogeneity + Cramér's V over the same cohort
    histograms — the categorical-column drift statistic (V is scale-free,
    so one threshold works at any table size)."""
    ev = t(spark, sf, "events")
    return drift_chi2(_value_hist(ev, "click"), _value_hist(ev, "view")).select(
        F.round("chi2", 4).alias("chi2"),
        F.round("cramers_v", 4).alias("cramers_v"),
        F.col("dof"),
    )


SQL_DRIFT_CHI2 = """
WITH cur AS (SELECT CAST(floor(value/10) AS BIGINT) AS bucket, count(*) AS c_cnt
             FROM events WHERE event_type = 'click' GROUP BY 1),
base AS (SELECT CAST(floor(value/10) AS BIGINT) AS bucket, count(*) AS b_cnt
         FROM events WHERE event_type = 'view' GROUP BY 1),
j AS (SELECT coalesce(cur.bucket, base.bucket) AS bucket,
             coalesce(c_cnt, 0) AS c_cnt, coalesce(b_cnt, 0) AS b_cnt
      FROM cur FULL OUTER JOIN base ON cur.bucket = base.bucket),
tot AS (SELECT sum(c_cnt) AS ct, sum(b_cnt) AS bt FROM j),
e AS (SELECT c_cnt, b_cnt, ct, bt,
             (c_cnt + b_cnt) * 1.0 / (ct + bt) * ct AS e1,
             (c_cnt + b_cnt) * 1.0 / (ct + bt) * bt AS e2
      FROM j, tot)
SELECT round(CASE WHEN max(ct) > 0 AND max(bt) > 0 THEN sum(term) END, 4) AS chi2,
       round(CASE WHEN max(ct) > 0 AND max(bt) > 0
             THEN sqrt(sum(term) / max(ct + bt)) END, 4) AS cramers_v,
       CAST(count(*) - 1 AS BIGINT) AS dof
FROM (SELECT ct, bt,
             CASE WHEN e1 > 0 THEN (c_cnt - e1) * (c_cnt - e1) / e1 ELSE 0.0 END
           + CASE WHEN e2 > 0 THEN (b_cnt - e2) * (b_cnt - e2) / e2 ELSE 0.0 END AS term
      FROM e) z
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "verdict_projection": q_verdict_projection,
    "violation_rows": q_violation_rows,
    "global_summary": q_global_summary,
    "group_stats": q_group_stats,
    "rollup_stats": q_rollup_stats,
    "category_stats": q_category_stats,
    "percentiles": q_percentiles,
    "percentiles_sketch": q_percentiles_sketch,
    "threshold_sweep": q_threshold_sweep,
    "duplicate_keys": q_duplicate_keys,
    "referential_anti": q_referential_anti,
    "semi_join": q_semi_join,
    "freq_enrich": q_freq_enrich,
    "argmax_per_group": q_argmax_per_group,
    "topn_per_group": q_topn_per_group,
    "lag_neighbor": q_lag_neighbor,
    "union_dedupe": q_union_dedupe,
    "drift_psi": q_drift_psi,
    "drift_ks": q_drift_ks,
    "drift_w1": q_drift_w1,
    "drift_chi2": q_drift_chi2,
    "drift_psi_by_group": q_drift_psi_by_group,
    "drift_chi2_by_group": q_drift_chi2_by_group,
    "drift_ks_by_group": q_drift_ks_by_group,
    "drift_w1_by_group": q_drift_w1_by_group,
}

from doc_quality_check_spark.queries_ext import ORACLES_EXT, QUERIES_EXT  # noqa: E402

QUERIES.update(QUERIES_EXT)

ORACLES: dict[str, str] = {
    "verdict_projection": SQL_VERDICT,
    "violation_rows": SQL_VIOLATIONS,
    "global_summary": SQL_GLOBAL_SUMMARY,
    "group_stats": SQL_GROUP_STATS,
    "rollup_stats": SQL_ROLLUP,
    "category_stats": SQL_CATEGORY_STATS,
    "percentiles": SQL_PERCENTILES,
    "percentiles_sketch": SQL_PERCENTILES_SKETCH,
    "threshold_sweep": SQL_SWEEP,
    "duplicate_keys": SQL_DUP_KEYS,
    "referential_anti": SQL_REF_ANTI,
    "semi_join": SQL_SEMI,
    "freq_enrich": SQL_FREQ_ENRICH,
    "argmax_per_group": SQL_ARGMAX,
    "topn_per_group": SQL_TOPN,
    "lag_neighbor": SQL_LAG,
    "union_dedupe": SQL_UNION_DEDUPE,
    "drift_psi": SQL_DRIFT_PSI,
    "drift_ks": SQL_DRIFT_KS,
    "drift_w1": SQL_DRIFT_W1,
    "drift_chi2": SQL_DRIFT_CHI2,
    "drift_psi_by_group": SQL_DRIFT_PSI_BY_GROUP,
    "drift_chi2_by_group": SQL_DRIFT_CHI2_BY_GROUP,
    "drift_ks_by_group": SQL_DRIFT_KS_BY_GROUP,
    "drift_w1_by_group": SQL_DRIFT_W1_BY_GROUP,
}

ORACLES.update(ORACLES_EXT)
