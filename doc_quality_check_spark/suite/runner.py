"""Suite runner — the engine's execution spine.

Physical plan (the Spark translation of the reference's CLI lifecycle,
/root/reference/test_readability.py:887-1044, SURVEY.md §3.1): the per-file
``for`` loop disappears — the table is the loop.

  clips ── with_audio_metrics (one pandas-UDF pass, bytes column dropped)
        ── with_row_checks (pure Catalyst predicates + reason/status)
        ── persist  (decode-once cache: the reference's session_state reuse,
                     app.py:317-320; verdicts re-project cheaply)
        ├─ row violations        (filter + explode, one pass)
        ├─ per-partition verdicts (single groupBy(part_key) w/ conditional
        │                          sums, unpivoted to long form)
        ├─ table-level checks    (uniqueness / referential / completeness /
        │                         drift — each its own small aggregate)
        └─ global summary        (one agg)

Shuffles: exactly one for the partition verdicts, one per table-level
aggregate/join — nothing shuffles the binary payload (dropped before any
wide operation).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from doc_quality_check_spark.functions.audio import with_audio_metrics, with_payload_metrics
from doc_quality_check_spark.operators.aggregates import drift_ks, drift_psi, histogram
from doc_quality_check_spark.operators.joins import duplicate_keys, referential_violations
from doc_quality_check_spark.suite.compiler import PASS_PREFIX, row_violations, with_row_checks
from doc_quality_check_spark.suite.spec import Check, CheckSuite

GLOBAL_PART = "__global__"

# decode-output columns that can trigger a payload decode when a generic
# check references them. Deliberately EXCLUDES names a raw table might
# plausibly carry itself (error, decode_ok, header_sr, n_samples) — for
# those the raw column always wins.
DERIVED_METRIC_COLUMNS = {
    "energy_ratio", "spectral_flatness", "zcr", "decode_conf",
    "decoded_dur_ms", "rms_db", "peak_db", "clip_fraction",
    "lead_silence_ms", "trail_silence_ms",
}

# table-check kinds that lower to scalar aggregates — fused into one agg job
_SIMPLE_AGG_KINDS = {"completeness_min", "row_count_min", "distinct_range", "quantile_range"}

VERDICT_COLS = ["part_key", "constraint_id", "n_rows", "n_violations", "passed", "metric_value"]

VERDICT_SCHEMA = StructType(
    [
        StructField("part_key", StringType()),
        StructField("constraint_id", StringType()),
        StructField("n_rows", LongType()),
        StructField("n_violations", LongType()),
        StructField("passed", BooleanType()),
        StructField("metric_value", DoubleType()),
    ]
)


NULL_PART = "__null__"


def _param_bool(v) -> bool:
    """Check-param boolean that survives JSON string authoring: the strings
    'false'/'no'/'0'/'' parse as False (plain bool('false') would be True)."""
    if isinstance(v, str):
        return v.strip().lower() not in ("false", "no", "0", "")
    return bool(v)


def part_key_col(part_cols: list[str]):
    """The canonical part_key expression — shared by the verdict groupBy and
    the resume filter so multi-column partition keys resume correctly. NULL
    partition values map to the '__null__' sentinel: they form their own
    verdict/resume unit instead of producing NULL keys (which would break
    manifest JSON keys and make the resume isin() filter drop the rows)."""
    if not part_cols:
        return F.lit(GLOBAL_PART)
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(NULL_PART)) for c in part_cols]
    return parts[0] if len(parts) == 1 else F.concat_ws("/", *parts)


@dataclass
class RunResult:
    """All result tables of one suite run (lazy DataFrames)."""

    checked: DataFrame            # row-level: clips + metrics + passed__* + reason/status
    violations: DataFrame         # (clip_id, constraint_id)
    verdicts: DataFrame           # per-partition + global verdicts (VERDICT_COLS)
    summary: DataFrame            # one-row global summary
    # constraint_id -> wall seconds for each table-level check (F20: the
    # reference returns elapsed time with every metric, clarity_check.py:21)
    table_metrics: dict[str, float] = field(default_factory=dict)
    # DataFrames persisted by table checks (e.g. payload_neardup's redundant
    # set) that back lazy `violations` rows — released with the result, not
    # before, so the violations union stays cache-served until the caller is
    # done materializing it
    extra_caches: list = field(default_factory=list)

    def unpersist(self) -> None:
        self.checked.unpersist()
        for df in self.extra_caches:
            df.unpersist()


def _media_payload_col(checks, kinds, label: str) -> str:
    """The PAYLOAD column for one modality's decode pass: named by that
    modality's row kinds' ``.column``; generic checks referencing its
    metric columns ride the same decode and default to ``bytes``."""
    cols = {c.column or "bytes" for c in checks if c.kind in kinds} or {
        "bytes"
    }
    if len(cols) > 1:
        raise ValueError(
            f"{label} checks must share one payload column, "
            f"got {sorted(cols)}"
        )
    return cols.pop()


def _image_payload_col(image_checks) -> str:
    from doc_quality_check_spark.suite.spec import IMAGE_ROW_KINDS

    return _media_payload_col(image_checks, IMAGE_ROW_KINDS, "image")


def _video_payload_col(video_checks) -> str:
    from doc_quality_check_spark.suite.spec import VIDEO_ROW_KINDS

    return _media_payload_col(video_checks, VIDEO_ROW_KINDS, "video")


class SuiteRunner:
    def __init__(self, suite: CheckSuite):
        self.suite = suite
        # set by run() when payload checks execute: which F5 mode actually ran
        self.effective_payload_mode: str | None = None
        # set by run() before table checks: the pre-decode input, for table
        # checks that consume the raw payload (payload_neardup)
        self._raw_clips: DataFrame | None = None

    # ------------------------------------------------------------------
    def run(
        self,
        clips: DataFrame,
        catalog: DataFrame | None = None,
        baseline: DataFrame | None = None,
        payload: bool = True,
        completed_partitions: list[str] | None = None,
    ) -> RunResult:
        """Execute the suite. ``completed_partitions`` (from a prior run's
        manifest) are skipped for the ROW-LEVEL path only — the resume filter
        is partition-pruned because ``part_key`` is the table's partition
        column. Table-level checks (uniqueness, referential, completeness,
        drift, …) always see the FULL input: a duplicate key spanning a
        completed and a pending partition must still be caught, and
        row_count_min must not falsely fail on the resumed subset."""
        suite = self.suite
        part_cols = suite.partition_by
        full_clips = clips
        self._run_caches: list[DataFrame] = []
        resuming = bool(completed_partitions and part_cols)
        if resuming:
            pk = part_key_col(part_cols)
            # NULL part keys make isin() NULL → the row would be silently
            # dropped; coalesce keeps them (they were never marked complete)
            clips = clips.filter(
                F.coalesce(~pk.isin(list(completed_partitions)), F.lit(True))
            )

        row_checks = suite.row_checks()
        # decode is needed for payload_* checks AND for generic checks that
        # reference a DERIVED metric column (e.g. in_range on rms_db) —
        # unless the raw table already carries a column of that name, in
        # which case the raw column wins (no silent shadowing by decode
        # output). expr-kind checks are scanned textually for metric names.
        import re as _re

        metric_cols = {
            c for c in DERIVED_METRIC_COLUMNS if c not in clips.columns
        }

        def _references_metric(c) -> bool:
            if c.column in metric_cols:
                return True
            if c.kind == "expr":
                expr = str(c.params.get("expr", ""))
                return any(_re.search(rf"\b{m}\b", expr) for m in metric_cols)
            return False

        # table-level checks (e.g. quantile_range on spectral_flatness) also
        # demand decode and count toward the mode floor — otherwise they'd
        # silently compute their verdict over an all-NULL column
        table_checks = suite.table_checks()
        if not payload:
            # payload=False is the metadata-only contract: payload_neardup
            # decodes+fingerprints the bytes column, so it is skipped the
            # same way row-level payload checks are below
            table_checks = [c for c in table_checks if c.kind != "payload_neardup"]
        from doc_quality_check_spark.functions.media import (
            IMAGE_METRIC_COLUMNS,
            VIDEO_METRIC_COLUMNS,
        )
        from doc_quality_check_spark.suite.spec import (
            IMAGE_ROW_KINDS,
            VIDEO_ROW_KINDS,
        )

        def _references_media(c, metric_columns) -> bool:
            # generic checks (in_range/expr/... on img_luma_mean /
            # vid_fps etc.) demand that modality's decode exactly as
            # metric-referencing generic checks demand the audio decode
            if c.column in metric_columns:
                return True
            if c.kind == "expr":
                expr = str(c.params.get("expr", ""))
                return any(
                    _re.search(rf"\b{m}\b", expr) for m in metric_columns
                )
            return False

        def _references_image(c) -> bool:
            return _references_media(c, IMAGE_METRIC_COLUMNS)

        def _references_video(c) -> bool:
            return _references_media(c, VIDEO_METRIC_COLUMNS)

        # image/video row kinds (and generic checks referencing an img_*/
        # vid_* column) run their own media decode pass (not the audio
        # one) — they must not trigger with_payload_metrics
        image_checks = (
            [
                c
                for c in [*row_checks, *table_checks]
                if c.kind in IMAGE_ROW_KINDS or _references_image(c)
            ]
            if payload
            else []
        )
        video_checks = (
            [
                c
                for c in [*row_checks, *table_checks]
                if c.kind in VIDEO_ROW_KINDS or _references_video(c)
            ]
            if payload
            else []
        )
        _media_row_kinds = IMAGE_ROW_KINDS | VIDEO_ROW_KINDS
        needs_payload = payload and (
            any(
                c.kind.startswith("payload_")
                and c.kind not in _media_row_kinds
                for c in row_checks
            )
            or any(_references_metric(c) for c in [*row_checks, *table_checks])
        )
        df = clips
        if needs_payload:
            # F5 mode dispatch: per-check params["mode"] values win over the
            # suite-wide settings["payload_mode"]; when checks disagree, the
            # STRONGEST requested tier runs (metrics are computed once for
            # all checks — an 'accurate' check must never be evaluated
            # against a cheaper tier's confidence). Default 'accurate'.
            strength = {"superfast": 0, "balanced": 1, "fast": 2, "accurate": 3}
            payload_checks = [
                c for c in row_checks
                if c.kind.startswith("payload_")
                and c.kind not in _media_row_kinds
            ]
            requested = [
                c.params["mode"] for c in payload_checks
                if c.params.get("mode") in strength
            ]
            if requested:
                mode = max(requested, key=strength.__getitem__)
            else:
                mode = suite.settings.get("payload_mode", "accurate")
            if mode not in strength:
                # unknown mode string falls back to 'balanced' (same rule as
                # with_payload_metrics) — must happen before the strength
                # comparison below, which would otherwise KeyError
                mode = "balanced"
            # generic checks referencing derived metric columns force a tier
            # that actually produces them: full decode at least; the
            # spectral column only exists in 'accurate'. Table-level checks
            # count too (a quantile_range on spectral_flatness needs the
            # column populated, not merely present-and-NULL).
            generic_metric = {
                c.column for c in [*row_checks, *table_checks]
                if c.column in metric_cols and not c.kind.startswith("payload_")
            }
            if generic_metric:
                floor = "accurate" if "spectral_flatness" in generic_metric else "fast"
                mode = max((mode, floor), key=strength.__getitem__)
            df, self.effective_payload_mode = with_payload_metrics(
                df,
                checks=payload_checks,
                mode=mode,
                escalate_below=float(suite.settings.get("escalate_below", 15.0)),
            )
        else:
            # metadata-only / audio-free path: skip AUDIO payload checks and
            # generic checks that reference derived metric columns (no audio
            # decode means those columns don't exist); image/video kinds
            # survive here when payload=True — their decode passes run below
            row_checks = [
                c for c in row_checks
                if (
                    payload
                    and (
                        c.kind in _media_row_kinds
                        or _references_image(c)
                        or _references_video(c)
                    )
                )
                or (
                    c.kind not in _media_row_kinds
                    and not c.kind.startswith("payload_")
                    and not _references_metric(c)
                    and not _references_image(c)
                    and not _references_video(c)
                )
            ]
            # a media-only table may carry its payload in 'bytes' — the
            # image/video pass below consumes (and drops) it itself
            media_owns_bytes = (
                image_checks and _image_payload_col(image_checks) == "bytes"
            ) or (
                video_checks and _video_payload_col(video_checks) == "bytes"
            )
            if not media_owns_bytes:
                df = df.drop("bytes")
        if image_checks:
            from doc_quality_check_spark.functions.media import with_image_metrics

            img_col = _image_payload_col(image_checks)
            if img_col not in df.columns:
                raise ValueError(
                    f"image checks reference missing column {img_col!r}"
                    + (
                        " (consumed by the audio decode — image checks must "
                        "target a separate column from the audio payload)"
                        if needs_payload and img_col == "bytes"
                        else ""
                    )
                )
            # one mapInPandas decode pass; img_col is dropped inside (the
            # image binary never shuffles). Mixed-modality note: when the
            # audio pass above also ran, this image binary column crossed
            # that stage's Arrow transfer — acceptable at check time, but a
            # very wide media table should split modalities into separate
            # suites/tables to keep each binary column inside its own scan.
            df = with_image_metrics(df, payload_col=img_col)
        if video_checks:
            from doc_quality_check_spark.functions.media import (
                with_video_metrics,
            )

            vid_col = _video_payload_col(video_checks)
            if vid_col not in df.columns:
                raise ValueError(
                    f"video checks reference missing column {vid_col!r}"
                    + (
                        " (consumed by an earlier decode — video checks "
                        "must target their own payload column)"
                        if vid_col == "bytes"
                        and (needs_payload or image_checks)
                        else ""
                    )
                )
            # one bounded mapInPandas pass (container metadata + <=3
            # sampled frames per row); vid_col is dropped inside
            df = with_video_metrics(df, payload_col=vid_col)
        df = with_row_checks(df, row_checks).persist()

        id_col = "clip_id"
        viols = row_violations(df, row_checks, id_col=id_col, part_cols=part_cols)
        verdicts = self._partition_verdicts(df, row_checks, part_cols)

        table_verdict_rows: list[tuple] = []
        table_verdict_dfs: list[DataFrame] = []
        check_timings: dict[str, float] = {}
        # schema_match validates the RAW input schema (pure metadata — the
        # checked df has bytes dropped and metric columns added, so it must
        # not be the comparison target); evaluated inline, no Spark job.
        schema_checks = [c for c in table_checks if c.kind == "schema_match"]
        table_checks = [c for c in table_checks if c.kind != "schema_match"]
        def _apply_severity(check, row):
            # advisory table checks: same rule as row checks — the verdict
            # row keeps its n_violations/metric_value but never fails
            if check.severity == "warn" and not row[4]:
                return (*row[:4], True, *row[5:])
            return row

        for check in schema_checks:
            table_verdict_rows.append(
                _apply_severity(check, self._run_schema_check(full_clips, check))
            )
            check_timings[check.constraint_id] = 0.0
        if table_checks:
            # materialize the decode/row-check cache ONCE (a single barrier
            # job), then evaluate table checks CONCURRENTLY — each is a small
            # independent Spark job, and serializing them is pure Amdahl loss
            # on a warm cache. Scalar aggregates are fused into one job first.
            df.count()
            # On resume, table checks run on the FULL input, not the pending
            # subset. On either path, a table check referencing a derived
            # metric column absent from table_df forces a full decode —
            # persisted + materialized ONCE before the concurrent check pool
            # (otherwise every worker thread triggers its own decode pass,
            # the single most expensive stage). Accurate-tier metrics
            # deliberately: table-check thresholds assume full metrics.
            table_df = full_clips.drop("bytes") if resuming else df
            resume_cache = None
            # payload_neardup fingerprints the RAW payload (its own single
            # decode pass) — hand it the pre-decode input; its column is
            # excluded from the derived-metric 'needed' analysis below
            # because 'bytes' is deliberately absent from table_df
            self._raw_clips = full_clips
            needed = {
                c.column
                for c in table_checks
                if c.column and c.kind != "payload_neardup"
            }
            # corr_range reads a SECOND column from params: validate it
            # upfront (clean error, not a worker-thread AnalysisException)
            # and let it force the decode exactly like a .column reference
            for c in table_checks:
                if c.kind == "corr_range":
                    if not c.params.get("col2"):
                        raise ValueError(
                            f"check {c.constraint_id}: corr_range requires "
                            "params['col2'] (the second column)"
                        )
                    needed.add(c.params["col2"])
            missing = needed - set(table_df.columns)
            if missing:
                if payload and (
                    missing & DERIVED_METRIC_COLUMNS
                    or missing & set(IMAGE_METRIC_COLUMNS)
                    or missing & set(VIDEO_METRIC_COLUMNS)
                ):
                    src = full_clips if resuming else clips
                    if missing & DERIVED_METRIC_COLUMNS:
                        src = with_audio_metrics(src)
                    if missing & set(IMAGE_METRIC_COLUMNS):
                        # resume path: table_df = full_clips.drop('bytes')
                        # loses img_* columns too — re-run the image decode
                        # over the same payload column the row pass used
                        from doc_quality_check_spark.functions.media import (
                            with_image_metrics,
                        )

                        img_col = (
                            _image_payload_col(image_checks)
                            if image_checks
                            else "bytes"
                        )
                        if img_col not in src.columns:
                            raise ValueError(
                                "image table checks reference missing "
                                f"payload column {img_col!r}"
                            )
                        src = with_image_metrics(src, payload_col=img_col)
                    if missing & set(VIDEO_METRIC_COLUMNS):
                        from doc_quality_check_spark.functions.media import (
                            with_video_metrics,
                        )

                        vid_col = (
                            _video_payload_col(video_checks)
                            if video_checks
                            else "bytes"
                        )
                        if vid_col not in src.columns:
                            # e.g. both modalities defaulting to 'bytes':
                            # the image pass above already consumed it —
                            # clean error, not an executor KeyError
                            raise ValueError(
                                "video table checks reference missing "
                                f"payload column {vid_col!r} (consumed by "
                                "an earlier decode pass — video checks "
                                "must target their own payload column)"
                            )
                        src = with_video_metrics(src, payload_col=vid_col)
                    resume_cache = src.persist()
                    resume_cache.count()
                    table_df = resume_cache
                else:
                    raise ValueError(
                        f"table checks reference missing columns: {sorted(missing)}"
                        + ("" if payload else " (payload=False, decode disabled)")
                    )
            def _is_simple(c):
                # quantile_range with method=tdigest runs its own two-level
                # digest job — it can't fuse into the scalar aggregate
                if c.kind == "quantile_range" and c.params.get("method") == "tdigest":
                    return False
                # per-partition completeness is a GROUPED aggregate emitting
                # one verdict row per part_key — not fusable with scalars
                if _param_bool(c.params.get("per_partition", False)):
                    return False
                return c.kind in _SIMPLE_AGG_KINDS

            simple = [c for c in table_checks if _is_simple(c)]
            complex_ = [c for c in table_checks if not _is_simple(c)]
            results: dict[str, tuple] = {}
            extras: dict[str, DataFrame] = {}
            timings = check_timings
            if simple:
                import time as _time

                t0 = _time.perf_counter()
                for cid, v in self._run_simple_aggs(table_df, simple).items():
                    results[cid] = v
                fused = _time.perf_counter() - t0
                # ONE fused job serves every simple check — attribute each an
                # equal share so the per-check timings still SUM to real wall
                # (recording the full wall N times would over-count N-fold)
                share = fused / len(simple)
                for c in simple:
                    timings[c.constraint_id] = round(share, 3)
            if complex_:
                import time as _time
                from concurrent.futures import ThreadPoolExecutor

                def run_one(check):
                    t0 = _time.perf_counter()
                    out = self._run_table_check(table_df, check, catalog, baseline)
                    return check.constraint_id, out, _time.perf_counter() - t0

                with ThreadPoolExecutor(max_workers=min(4, len(complex_))) as ex:
                    for cid, (v, extra), dt in ex.map(run_one, complex_):
                        results[cid] = v
                        timings[cid] = round(dt, 3)
                        if extra is not None:
                            extras[cid] = extra
            for check in table_checks:  # preserve suite order
                got = results[check.constraint_id]
                if isinstance(got, DataFrame):
                    # per-partition checks (completeness/drift) return their
                    # verdict rows as a DataFrame — one row per part_key,
                    # never collected to the driver (at 10^6 part keys the
                    # per-check round-trip is the scale wall); severity is a
                    # column rewrite, the advisory rule unchanged
                    if check.severity == "warn":
                        got = got.withColumn("passed", F.lit(True))
                    table_verdict_dfs.append(got)
                else:
                    table_verdict_rows.append(_apply_severity(check, got))
                if check.constraint_id in extras:
                    viols = viols.unionByName(extras[check.constraint_id])
            if resume_cache is not None:
                # released with the RunResult: per-partition verdict
                # DataFrames computed over it are lazy and must stay
                # cache-served until the caller materializes verdicts
                self._run_caches.append(resume_cache)

        if table_verdict_rows:
            spark = df.sparkSession
            tv = spark.createDataFrame(table_verdict_rows, VERDICT_SCHEMA)
            verdicts = verdicts.unionByName(tv)
        for vdf in table_verdict_dfs:
            verdicts = verdicts.unionByName(vdf)

        summary = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("status") == "Valid", 1).otherwise(0)).alias("n_valid"),
            F.sum(F.when(F.col("status") == "Invalid", 1).otherwise(0)).alias("n_invalid"),
            *(
                [F.avg("decode_conf").alias("avg_decode_conf")]
                if "decode_conf" in df.columns else []
            ),
            *(
                [F.avg("energy_ratio").alias("avg_energy_ratio")]
                if "energy_ratio" in df.columns else []
            ),
            F.approx_count_distinct(id_col).alias("n_distinct_ids"),
        )
        return RunResult(checked=df, violations=viols, verdicts=verdicts,
                         summary=summary, table_metrics=check_timings,
                         extra_caches=self._run_caches)

    # ------------------------------------------------------------------
    def _partition_verdicts(self, df, row_checks: list[Check], part_cols: list[str]):
        """ONE groupBy produces every (partition × constraint) verdict:
        conditional sums per check, then stack() to long form — partial
        aggregation map-side, a single shuffle total. Multi-column partition
        keys collapse into one '/'-joined part_key string."""
        if not row_checks:
            return df.sparkSession.createDataFrame([], VERDICT_SCHEMA)
        part = part_key_col(part_cols)
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(F.when(~F.col(PASS_PREFIX + c.constraint_id), 1).otherwise(0))
            .alias("nv__" + c.constraint_id)
            for c in row_checks
        ]
        wide = df.groupBy(part.alias("part_key")).agg(*aggs)
        stack_args = ", ".join(
            f"'{c.constraint_id}', nv__{c.constraint_id}" for c in row_checks
        )
        long = wide.selectExpr(
            "part_key",
            "n_rows",
            f"stack({len(row_checks)}, {stack_args}) as (constraint_id, n_violations)",
        )
        # advisory (severity='warn') checks never flip a verdict's passed
        # flag — failures stay visible through n_violations/metric_value
        warn_ids = [c.constraint_id for c in row_checks if c.severity == "warn"]
        passed = (F.col("n_violations") == 0) | F.col("constraint_id").isin(
            warn_ids
        )
        return long.select(
            "part_key",
            "constraint_id",
            F.col("n_rows").cast("long"),
            F.col("n_violations").cast("long"),
            passed.alias("passed"),
            F.try_divide(F.col("n_violations"), F.col("n_rows")).cast("double").alias("metric_value"),
        )

    # ------------------------------------------------------------------
    def _run_simple_aggs(self, df, checks: list[Check]) -> dict[str, tuple]:
        """Fuse every scalar-aggregate table check (completeness, row count,
        distinct range, quantile range) into ONE agg job — the suite
        planner's 'fuse same-granularity aggregates' rule (SURVEY.md §4.5)."""
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in checks:
            cid = c.constraint_id
            if c.kind == "completeness_min":
                aggs.append(F.try_divide(F.count(c.column), F.count(F.lit(1))).alias(cid))
            elif c.kind == "row_count_min":
                aggs.append(F.count(F.lit(1)).cast("double").alias(cid))
            elif c.kind == "distinct_range":
                aggs.append(F.approx_count_distinct(c.column).cast("double").alias(cid))
            elif c.kind == "quantile_range":
                q = float(c.params.get("q", 0.5))
                aggs.append(F.expr(f"percentile_approx({c.column}, {q})").cast("double").alias(cid))
        row = df.agg(*aggs).first()
        n_rows = int(row["__n"])
        out = {}
        for c in checks:
            cid, p = c.constraint_id, c.params
            metric = float(row[cid]) if row[cid] is not None else (
                1.0 if c.kind == "completeness_min" else 0.0)
            if c.kind == "completeness_min":
                passed = metric >= float(p.get("min_ratio", 1.0))
            elif c.kind == "row_count_min":
                passed = metric >= int(p["min_rows"])
            elif c.kind == "distinct_range":
                passed = p.get("min", 0) <= metric <= p.get("max", float("inf"))
            else:
                # quantile over an all-NULL column is NULL: no value can
                # attest the bound — fail (same rule as _run_table_check)
                passed = (
                    row[cid] is not None
                    and p.get("min", float("-inf")) <= metric <= p.get("max", float("inf"))
                )
            has_n = c.kind in ("completeness_min", "row_count_min")
            out[cid] = (GLOBAL_PART, cid, n_rows if has_n else None,
                        0, bool(passed), metric)
        return out

    def _run_schema_check(self, raw_df, check: Check) -> tuple:
        """schema_match (the north rule's 'schema + constraint' engine):
        every expected column must exist on the RAW input with the expected
        Spark simpleString type; pure metadata — no Spark job runs.
        params: {"columns": {"clip_id": "string", "sr_hz": "int", ...},
                 "allow_extra": bool (default True)}."""
        p = check.params
        # case-insensitive on BOTH sides: simpleString() preserves nested
        # field-name case (struct<Lang:string>), which must not fail a match
        expected = {k: str(v).lower() for k, v in p.get("columns", {}).items()}
        actual = {
            f.name: f.dataType.simpleString().lower() for f in raw_df.schema.fields
        }
        mismatches = [c for c, typ in expected.items() if actual.get(c) != typ]
        if not _param_bool(p.get("allow_extra", True)):
            mismatches += [c for c in actual if c not in expected]
        return (GLOBAL_PART, check.constraint_id, None, len(mismatches),
                not mismatches, float(len(mismatches)))

    def _run_table_check(self, df, check: Check, catalog, baseline):
        """Evaluate one table-level check eagerly (each is a tiny aggregate).
        Returns (verdict_row, extra_violations_df|None)."""
        cid, p = check.constraint_id, check.params
        n_rows = None
        extra = None
        if check.kind == "unique":
            dups = duplicate_keys(df, check.column, int(p.get("salt_buckets", 0))).persist()
            n_bad_keys = dups.count()
            # table-level violations are global facts (a dup key can span
            # partitions) → part_key = __global__
            extra = dups.select(F.col(check.column).alias("clip_id"),
                                F.lit(cid).alias("constraint_id"),
                                F.lit(GLOBAL_PART).alias("part_key"))
            metric = float(n_bad_keys)
            passed = n_bad_keys == 0
            n_viol = n_bad_keys
        elif check.kind == "referential":
            if catalog is None:
                raise ValueError(f"check {cid} needs a reference catalog DataFrame")
            missing = referential_violations(
                df.select(check.column), catalog, check.column,
                p.get("ref_column", check.column),
                # catalogs at 10^12-row scale cannot broadcast — the knob
                # switches to sort-merge + AQE skew handling. String-safe:
                # JSON-authored "false"/"no"/"0" must not coerce to True.
                broadcast_ref=_param_bool(p.get("broadcast_catalog", True)),
            ).persist()
            n_viol = missing.count()
            extra = missing.select(
                F.col(check.column).alias("clip_id"),
                F.lit(cid).alias("constraint_id"),
                F.lit(GLOBAL_PART).alias("part_key"),
            ).dropDuplicates()
            metric = float(n_viol)
            passed = n_viol == 0
        elif check.kind == "completeness_min":
            if _param_bool(p.get("per_partition", False)) and self.suite.partition_by:
                # one verdict row per part_key from ONE grouped aggregate —
                # completeness localized the same way per-partition drift is
                mn = float(p.get("min_ratio", 1.0))
                grouped = df.groupBy(
                    part_key_col(self.suite.partition_by).alias("grp")
                ).agg(
                    F.try_divide(F.count(check.column), F.count(F.lit(1))).alias("r"),
                    F.count(F.lit(1)).alias("n"),
                )
                # verdict rows stay a DataFrame — never collected: at 10^6+
                # part keys the per-check driver round-trip is the scale
                # wall; rows reach the driver only at the report sink
                vdf = grouped.select(
                    F.col("grp").alias("part_key"),
                    F.lit(cid).alias("constraint_id"),
                    F.col("n").cast("long").alias("n_rows"),
                    F.lit(0).cast("long").alias("n_violations"),
                    (F.col("r").isNotNull() & (F.col("r") >= F.lit(mn))).alias("passed"),
                    F.coalesce(F.col("r"), F.lit(0.0)).cast("double").alias("metric_value"),
                )
                return vdf, None
            row = df.agg(
                F.try_divide(F.count(check.column), F.count(F.lit(1))).alias("r"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            metric = float(row["r"]) if row["r"] is not None else 1.0
            n_rows, n_viol = int(row["n"]), 0
            passed = metric >= float(p.get("min_ratio", 1.0))
        elif check.kind == "row_count_min":
            n_rows = df.count()
            metric = float(n_rows)
            n_viol = 0
            passed = n_rows >= int(p["min_rows"])
        elif check.kind == "distinct_range":
            d = df.agg(F.approx_count_distinct(check.column).alias("d")).first()["d"]
            metric = float(d)
            n_viol = 0
            passed = p.get("min", 0) <= d <= p.get("max", float("inf"))
        elif check.kind == "quantile_range":
            q = float(p.get("q", 0.5))
            if p.get("method") == "tdigest":
                from doc_quality_check_spark.operators.aggregates import (
                    tdigest_quantiles,
                )

                val = tdigest_quantiles(
                    df, check.column, [q], int(p.get("delta", 100))
                )[q]
            else:
                val = df.agg(
                    F.expr(f"percentile_approx({check.column}, {q})").alias("v")
                ).first()["v"]
            metric = float(val) if val is not None else 0.0  # all-null column
            n_viol = 0
            # all-null column: no quantile exists, the bound cannot be
            # attested — fail rather than compare against None (TypeError)
            passed = (
                val is not None
                and p.get("min", float("-inf")) <= val <= p.get("max", float("inf"))
            )
        elif check.kind == "entropy_range":
            # Shannon entropy (bits) of the column's NON-NULL value
            # distribution — a profiling gate: ~0 flags a degenerate/
            # near-constant column, log2(k) a uniform one. NULLs are a
            # completeness concern, not a distribution bucket (and
            # suggest_suite derives its bounds from non-null counts).
            # Grouped count + broadcast total only — histogram-sized data.
            cnt = (
                df.filter(F.col(check.column).isNotNull())
                .groupBy(F.col(check.column).cast("string").alias("b"))
                .agg(F.count("*").alias("c"))
            )
            tot = cnt.agg(F.sum("c").alias("tot"))
            pcol = F.try_divide(F.col("c"), F.col("tot"))
            val = (
                cnt.crossJoin(F.broadcast(tot))
                .select((-(pcol) * F.log2(pcol)).alias("t"))
                .agg(F.sum("t").alias("h"))
                .first()["h"]
            )
            metric = float(val) if val is not None else 0.0
            n_viol = 0
            # empty input -> no distribution, the bound cannot be attested
            passed = (
                val is not None
                and p.get("min", 0.0) <= val <= p.get("max", float("inf"))
            )
        elif check.kind == "payload_neardup":
            # near-duplicate-rate bound over the AUDIO payload: spectral
            # fingerprints + pigeonhole Hamming LSH (operators/audio_dedup),
            # clustered by connected components; every cluster member except
            # the keeper (min id — the keep-first retention rule) is a
            # violation row. metric = redundant clips / total clips.
            # Runs on the RAW input (self._raw_clips): the checked df has
            # the bytes column dropped by design.
            from doc_quality_check_spark.operators.audio_dedup import (
                audio_neardup_pairs,
            )
            from doc_quality_check_spark.operators.dedup import (
                connected_components,
            )

            raw = self._raw_clips
            id_col = p.get("id_col", "clip_id")
            pairs = audio_neardup_pairs(
                raw,
                id_col=id_col,
                bytes_col=check.column or "bytes",
                codec_col=p.get("codec_col", "codec"),
                max_hamming=int(p.get("max_hamming", 7)),
            )
            redundant = (
                connected_components(
                    pairs, algorithm=str(p.get("algorithm", "label"))
                )
                .filter(F.col("id") != F.col("comp"))
                .select(F.col("id").alias("clip_id"))
                .persist()
            )
            # released by RunResult.unpersist(), not here: the violations
            # union below is lazy and must stay cache-served
            self._run_caches.append(redundant)
            n_viol = redundant.count()
            n_rows = df.count()  # cached checked df — cheap recount
            extra = redundant.select(
                "clip_id",
                F.lit(cid).alias("constraint_id"),
                # a near-dup cluster can span partitions → global fact
                F.lit(GLOBAL_PART).alias("part_key"),
            )
            metric = float(n_viol) / n_rows if n_rows else 0.0
            passed = metric <= float(p.get("max_dup_rate", 0.0))
        elif check.kind == "corr_range":
            # Pearson correlation between check.column and params["col2"]
            # (Deequ correlation-analyzer shape) — one grouped aggregate;
            # NULL corr (constant column / n<2) cannot attest the bound
            from doc_quality_check_spark.operators.aggregates import (
                pearson_corr,
            )

            col2 = p["col2"]
            row = pearson_corr(
                df, check.column, col2,
                exact_integers=_param_bool(p.get("exact_integers", False)),
            ).first()
            val = None if row is None else row["corr"]
            metric = None if val is None else float(val)
            n_rows = df.count()
            n_viol = 0
            passed = (
                metric is not None
                and float(p.get("min", -1.0)) <= metric
                <= float(p.get("max", 1.0))
            )
        elif check.kind in ("drift_psi", "drift_ks", "drift_w1", "drift_chi2"):
            if baseline is None:
                raise ValueError(f"check {cid} needs a baseline snapshot DataFrame")
            if _param_bool(p.get("per_partition", False)):
                # per-partition drift: ONE grouped plan over all partitions
                # (drift_*_by_group), one verdict row per part_key — the
                # north rule's per-partition pass/fail applied to drift
                if not self.suite.partition_by:
                    raise ValueError(
                        f"check {cid}: per_partition drift needs suite.partition_by"
                    )
                if "part_key" not in baseline.columns:
                    raise ValueError(
                        f"check {cid}: per_partition drift needs a baseline with a "
                        "part_key column — write it with "
                        "snapshot_histograms(df_with_part_key, cols, group_col='part_key')"
                    )
                from doc_quality_check_spark.operators.aggregates import (
                    drift_chi2_by_group,
                    drift_ks_by_group,
                    drift_psi_by_group,
                    drift_w1_by_group,
                )

                grouped = {
                    "drift_psi": (drift_psi_by_group, "psi", "max_psi", 0.2),
                    "drift_ks": (drift_ks_by_group, "ks", "max_ks", 0.1),
                    "drift_w1": (drift_w1_by_group, "w1", "max_w1", 1.0),
                    "drift_chi2": (drift_chi2_by_group, "cramers_v", "max_v", 0.1),
                }
                from doc_quality_check_spark.operators.aggregates import (
                    bucket_col,
                )

                cur_g = (
                    df.select(
                        part_key_col(self.suite.partition_by).alias("grp"),
                        # params["bin_width"]: equi-width bins for continuous
                        # columns — keeps the histogram tiny at scale; the
                        # baseline must be written with the same width
                        bucket_col(
                            check.column, p.get("bin_width")
                        ).alias("bucket"),
                    )
                    .groupBy("grp", "bucket")
                    .agg(F.count("*").alias("count"))
                )
                base_g = baseline.filter(F.col("metric") == check.column).select(
                    # the current side's part keys go through part_key_col's
                    # '__null__' sentinel — normalize the baseline the same
                    # way or NULL partitions never match and spuriously drift
                    F.coalesce(F.col("part_key").cast("string"),
                               F.lit(NULL_PART)).alias("grp"),
                    "bucket",
                    "count",
                )
                fn, stat_col, mx_key, mx_default = grouped[check.kind]
                mx = float(p.get(mx_key, mx_default))
                scored = fn(cur_g, base_g, "grp").select(
                    "grp", F.col(stat_col).alias("stat")
                )
                # verdicts for EXACTLY the partitions present in the CURRENT
                # input: a baseline-only partition must not enter the verdict
                # table (record_partitions would mark a nonexistent partition
                # complete, corrupting the resume/incremental skip set), and
                # a current partition the statistic couldn't score (w1 with
                # no numeric support drops the group) gets a NULL stat ->
                # failed verdict, not a silently missing row
                scored = cur_g.select("grp").distinct().join(scored, "grp", "left")
                # DataFrame-native verdict rows (same rationale as
                # per-partition completeness: no driver round-trip per check)
                vdf = scored.select(
                    F.col("grp").alias("part_key"),
                    F.lit(cid).alias("constraint_id"),
                    F.lit(None).cast("long").alias("n_rows"),
                    F.lit(0).cast("long").alias("n_violations"),
                    (F.col("stat").isNotNull() & (F.col("stat") <= F.lit(mx))).alias("passed"),
                    F.coalesce(F.col("stat"), F.lit(0.0)).cast("double").alias("metric_value"),
                )
                return vdf, None
            cur = histogram(df, check.column, bin_width=p.get("bin_width"))
            base = baseline.filter(F.col("metric") == check.column)
            if "part_key" in baseline.columns:
                # grouped (per-partition) snapshot consumed by a GLOBAL
                # drift check: collapse to the flat layout — one tiny
                # aggregate, so one promoted baseline serves both shapes
                base = base.groupBy("bucket").agg(F.sum("count").alias("count"))
            else:
                base = base.select("bucket", "count")
            if check.kind == "drift_psi":
                metric = float(drift_psi(cur, base).first()["psi"])
                passed = metric <= float(p.get("max_psi", 0.2))
            elif check.kind == "drift_ks":
                metric = float(drift_ks(cur, base).first()["ks"])
                passed = metric <= float(p.get("max_ks", 0.1))
            elif check.kind == "drift_w1":
                from doc_quality_check_spark.operators.aggregates import drift_w1

                val = drift_w1(cur, base).first()["w1"]
                # NULL = no numeric bucket support to compare — the bound
                # cannot be attested, fail (same rule as quantile_range)
                metric = float(val) if val is not None else 0.0
                passed = val is not None and val <= float(p.get("max_w1", 1.0))
            else:
                from doc_quality_check_spark.operators.aggregates import drift_chi2

                row = drift_chi2(cur, base).first()
                val = row["cramers_v"]
                metric = float(val) if val is not None else 0.0
                passed = val is not None and val <= float(p.get("max_v", 0.1))
            n_viol = 0
        else:
            raise ValueError(f"unknown table-level check: {check.kind}")
        return (GLOBAL_PART, cid, n_rows, int(n_viol), bool(passed), metric), extra
