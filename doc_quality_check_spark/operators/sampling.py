"""Deterministic sampling / split assignment for training-data curation.

A training pipeline needs reproducible dataset membership — eval splits that
never drift across runs, clusters of near-duplicates that never straddle a
train/test boundary (leakage). Random sampling (``df.sample``) is seed-
stable only per plan; these operators instead derive membership from a
CONTENT hash, so assignment is a pure function of the row id — stable across
engines, partitionings, and re-runs, and reproducible bit-for-bit by the
DuckDB oracle (same md5-prefix hash family as operators/dedup.py).

Scale: every operator is a stateless projection (one scan, no shuffle) —
except cluster_safe_split, which adds the connected-components join so that
a whole near-dup cluster hashes by its representative.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# bucket resolution of the unit-interval hash (1e6 ≈ 3ppm split-size error)
_BUCKETS = 1_000_000


def hash_unit(col: Column, salt: str = "") -> Column:
    """Deterministic hash of a column into [0, 1): md5-prefix bigint mod 1e6.
    Shared semantics with DuckDB (see queries_ext oracle) — the same id maps
    to the same point on both engines."""
    from doc_quality_check_spark.operators.dedup import md5_prefix_hash

    h = md5_prefix_hash(F.concat(F.lit(salt), col.cast("string")))
    return (h % _BUCKETS) / F.lit(float(_BUCKETS))


def hash_sample(df: DataFrame, id_col: str, fraction: float,
                salt: str = "sample") -> DataFrame:
    """Deterministic ``fraction`` sample: keep rows whose hash point falls
    below the threshold. Same rows every run, any partitioning."""
    return df.filter(hash_unit(F.col(id_col), salt) < F.lit(fraction))


def hash_split(df: DataFrame, id_col: str, splits: dict[str, float],
               salt: str = "split", key_col: Column | None = None) -> DataFrame:
    """Deterministic split assignment: adds a ``split`` column with each
    row's split name, by cumulative hash ranges in ``splits`` insertion
    order (fractions should sum to 1; a trailing remainder falls into the
    LAST split). ``key_col`` overrides the hashed key (used by
    cluster_safe_split to hash the cluster representative instead)."""
    key = key_col if key_col is not None else F.col(id_col)
    u = hash_unit(key, salt)
    names = list(splits)
    cum = 0.0
    expr: Column | None = None
    for name in names[:-1]:
        cum += float(splits[name])
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-group sampling (corpus balancing: keep 100% of a
    rare language, 5% of the dominant one). A row is kept iff its hash point
    falls below its group's fraction — pure projection + filter, no shuffle,
    stable across runs/partitionings like :func:`hash_sample`. Groups not in
    ``fractions`` get ``default_fraction``."""
    u = hash_unit(F.col(id_col), salt)
    thr: Column = F.lit(float(default_fraction))
    for g, frac in fractions.items():
        thr = F.when(F.col(group_col) == F.lit(g), F.lit(float(frac))).otherwise(thr)
    return df.filter(u < thr)


def group_capped_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-group cap: keep at most ``cap`` rows per group,
    chosen by hash order (not arrival order), so the selection is
    reproducible across runs and engines. One window shuffle on the group
    key; at 10^12 rows pre-filter with :func:`stratified_hash_sample` at
    ~cap/|group| fractions first so the window only ranks survivors.

    NULL ids sort LAST (matching DuckDB's ASC default, so the oracle
    agrees) and are only selected after every keyed row; among multiple
    NULL-id rows the choice is arbitrary — as with any keyed operator, a
    NULL key carries no identity to select by."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_unit(F.col(id_col), salt).asc_nulls_last(),
        F.col(id_col).cast("string").asc_nulls_last(),
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def upsample_groups(
    df: DataFrame,
    group_col: str,
    factors: dict[str, float],
    id_col: str | None = None,
    salt: str = "upsample",
) -> DataFrame:
    """Deterministic per-group upsampling WITH replacement: a row whose
    group has factor f appears floor(f) times, plus once more for the
    frac(f) share of rows selected by content hash — the oversampling
    counterpart of :func:`stratified_hash_sample` (epoch-style repetition
    of rare groups, e.g. {"low_resource_lang": 2.5}). Adds a ``copy_id``
    (0-based repeat index) so downstream shuffling can distinguish repeats.

    Groups not in ``factors`` keep factor 1. Pure projection + explode —
    no shuffle, no RNG; the same rows repeat every run. Without ``id_col``
    the hash point comes from the full row content (all columns), so the
    fractional share still varies per row — hashing the group value alone
    would make frac(f) all-or-nothing for the whole group."""
    whole = F.lit(1.0)
    for g, f in factors.items():
        whole = F.when(F.col(group_col) == F.lit(g), F.lit(float(f))).otherwise(whole)
    if id_col:
        key = F.col(id_col)
    else:
        key = F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in df.columns],
        )
    frac_keep = hash_unit(key, salt) < (whole - F.floor(whole))
    n_copies = (F.floor(whole) + F.when(frac_keep, 1).otherwise(0)).cast("int")
    return (
        df.withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") > 0)
        .withColumn(
            "copy_id", F.explode(F.sequence(F.lit(0), F.col("__n_copies") - 1))
        )
        .drop("__n_copies")
    )


def pack_token_bins(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_buckets: int = 256,
    salt: str = "pack",
) -> DataFrame:
    """Deterministic sequence packing: assign each document a
    (pack_bucket, pack_bin) so that consecutive documents in a bin sum to
    roughly ``budget`` tokens — the batch-construction step of a training
    pipeline (fill each context window, minimize padding).

    Scalable shape: documents first scatter into ``n_buckets`` hash buckets
    (pure projection), then ONE window cumsum per bucket orders documents
    by content hash and bins them at ``floor((cumsum - tokens) / budget)``.
    A document straddling a boundary stays in the earlier bin, so bins can
    overrun the budget by at most one document — the standard streaming
    relaxation of first-fit; exact reset-on-overflow packing is inherently
    sequential and would serialize the corpus. All arithmetic is integer →
    bit-identical across engines/runs; the only shuffle is the bucket
    window, and bucket count scales the parallelism."""
    from pyspark.sql import Window

    bucket = F.floor(hash_unit(F.col(id_col), salt) * F.lit(n_buckets)).cast(
        "long"
    ).alias("pack_bucket")
    # explicit ROWS frame: Spark's default for an ordered window is RANGE,
    # which lumps ordering PEERS (duplicate ids) into one cumulative step —
    # diverging from the oracle's ROWS frame and breaking the one-document
    # overrun bound (same rule as every other cumsum in the repo)
    w = Window.partitionBy("pack_bucket").orderBy(
        hash_unit(F.col(id_col), salt + "_ord").asc_nulls_last(),
        F.col(id_col).cast("string").asc_nulls_last(),
    ).rowsBetween(Window.unboundedPreceding, 0)
    out = df.select("*", bucket)
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    return out.withColumn(
        "pack_bin",
        F.floor(
            (cum - F.col(token_col).cast("long")) / F.lit(int(budget))
        ).cast("long"),
    )


def cluster_safe_split(df: DataFrame, id_col: str, pairs: DataFrame,
                       splits: dict[str, float], salt: str = "split",
                       max_iter: int = 25) -> DataFrame:
    """Leakage-safe split: rows in the same near-duplicate cluster always
    land in the same split. The pair graph's connected components give each
    row a cluster representative (min reachable id; singletons represent
    themselves); the split hash is taken over the REPRESENTATIVE, so a
    near-dup of a test document can never leak into train.

    One broadcast-join of the (tiny) component map onto the corpus — the
    component table has one row per clustered doc, not per doc."""
    from doc_quality_check_spark.operators.dedup import connected_components

    comp = (
        connected_components(pairs, max_iter=max_iter)
        .withColumnRenamed("id", "__cc_id")
        .withColumnRenamed("comp", "__cc_comp")  # reserved names: the input
        # df may legitimately carry its own 'comp'/'split' columns
    )
    joined = df.join(
        F.broadcast(comp), df[id_col] == F.col("__cc_id"), "left"
    ).drop("__cc_id")
    # coalesce in STRING space: casting a non-numeric string id to long
    # yields NULL, which would silently dump every singleton into the last
    # split and break the ratio/leakage guarantees for string-id corpora.
    # comp values are themselves ids, so string hashing stays consistent
    # with plain hash_split for numeric ids ("5" either way).
    rep = F.coalesce(
        F.col("__cc_comp").cast("string"), F.col(id_col).cast("string")
    )
    return hash_split(joined, id_col, splits, salt, key_col=rep).drop("__cc_comp")


def select_token_budget(
    df: DataFrame,
    score_col: str,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy quality-first corpus selection under a GLOBAL token budget:
    keep documents in (score DESC, id ASC) order while the running token
    total stays <= ``budget`` — the canonical data-mixing primitive
    ("take the best N billion tokens"). The running total comes from the
    distributed two-phase scan (:func:`..aggregates.prefix_sum`), so there
    is no single-partition window: the plan survives a corpus whose sort
    order has no useful partition key.

    ``token_col`` must be non-null and NON-NEGATIVE integral: the running
    total is then monotone, so the greedy prefix is exactly the rows with
    cumulative tokens <= budget (a document is kept iff it fits including
    itself; the first over-budget document and everything after are
    dropped). Deterministic: ties in score break by ``id_col``."""
    from doc_quality_check_spark.operators.aggregates import prefix_sum

    ordered = df.withColumn("__neg_score", -F.col(score_col).cast("double"))
    cum = prefix_sum(
        ordered,
        ["__neg_score", id_col],
        token_col,
        out_col="__cum_tokens",
        num_partitions=num_partitions,
    )
    return (
        cum.filter(F.col("__cum_tokens") <= F.lit(budget))
        .drop("__neg_score", "__cum_tokens")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row draws an Exp(weight) variate from its content
    hash — key = -ln(u)/w with u = hash_unit(id) — and the k SMALLEST keys
    win, which is exactly sampling without replacement with inclusion
    probability proportional to weight. The training-pipeline use: sample a
    corpus subset proportional to a quality/score column, reproducibly
    (same rows every run, any partitioning, any engine).

    Rows with NULL or non-positive weight are excluded (they carry no
    sampling mass). Scale shape: pure projection + ordered take
    (TakeOrderedAndProject) — no shuffle, no RNG state; k must fit on the
    driver like any top-k."""
    # +5e-7 keeps u strictly inside (0,1): hash_unit lands on exact 0 for
    # ~1e-6 of ids and ln(0) diverges (NULL on Spark, -inf on DuckDB)
    u = hash_unit(F.col(id_col), salt) + F.lit(5e-7)
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__wkey", key)
        .orderBy(F.asc("__wkey"), F.col(id_col).cast("string").asc())
        .limit(k)
        .drop("__wkey")
    )
