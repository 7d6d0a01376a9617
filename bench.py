"""Benchmark harness (driver contract): prints ONE JSON line.

Headline metric: full constraint-suite throughput over a deterministic
synthetic clips table (clips validated/sec — BASELINE.json), plus per-query
wall times for the relational operator surface at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Scaling-efficiency evidence (N vs 4N cores) is produced by
tools/bench_scaling.py → BENCH/BASELINE.md; this script is the per-round
single-config run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CLIPS = int(os.environ.get("BENCH_N_CLIPS", "20000"))

BENCH_QUERIES = [
    "group_stats", "percentiles_sketch", "threshold_sweep", "duplicate_keys",
    "semi_join", "freq_enrich", "argmax_per_group", "topn_per_group",
    "lag_neighbor", "drift_psi", "drift_psi_by_group",
    # payload-level audio near-dup (decode + fingerprint + LSH pairing)
    "audio_neardup",
    # video container decode + sampled-frame JPEG decode (round 5)
    "video_frame_metrics",
    # training-pipeline operators (documents/embeddings tables)
    "dedup_jaccard", "dedup_jaccard_prefix", "dedup_minhash_lsh",
    "dedup_simhash",
    "cosine_topk", "ann_sign_lsh", "lang_id", "token_quality",
    "hash_split", "group_capped_sample", "unigram_logprob",
    "contamination", "boilerplate_lines", "bm25_search", "snapshot_diff",
]


def run_suite(spark, clips_dir: str) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from doc_quality_check_spark.sources.clips import (
        load_baseline, load_catalog, load_clips,
    )
    from doc_quality_check_spark.suite.runner import SuiteRunner
    from doc_quality_check_spark.suite.spec import default_suite

    clips = load_clips(spark, clips_dir)
    n = clips.count()
    t0 = time.perf_counter()
    res = SuiteRunner(default_suite()).run(
        clips,
        catalog=load_catalog(spark, clips_dir),
        baseline=load_baseline(spark, clips_dir),
    )
    # materialize every result table (violations, verdicts, summary)
    res.violations.agg(F.count(F.lit(1))).collect()
    res.verdicts.collect()
    res.summary.collect()
    dt = time.perf_counter() - t0
    res.unpersist()
    return dt, n


def main() -> None:
    from doc_quality_check_spark.queries import QUERIES
    from doc_quality_check_spark.session import get_spark
    from doc_quality_check_spark.sources.clips import generate_clips

    repo = os.path.dirname(os.path.abspath(__file__))
    clips_dir = generate_clips(os.path.join(repo, ".data", "clips_bench"), n_rows=N_CLIPS, seed=42)

    spark = get_spark("dqcs-bench", cores=CPUS, shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/Python workers and the page cache for every input table
    # once (hot-data steady state; cold-IO cost is a property of the storage
    # layer, not the query plans being measured)
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F
    for tb in ["lineitem", "orders", "customer", "events", "documents", "embeddings"]:
        df = spark.read.parquet(f"{SF_DIR}/{tb}.parquet")
        # per-column count forces a real scan of every column's pages
        df.agg(*[F.count(c).alias(c) for c in df.columns]).collect()

    # best-of-2 for the headline: this VM's wall time swings ±30% hour to
    # hour (BENCH_SCALING.json history); a single sample under-reports the
    # engine. First run also pays Python-worker fork cost.
    suite_reps = []
    suite_sec, n_clips = run_suite(spark, clips_dir)
    suite_reps.append(round(suite_sec, 3))
    suite_sec2, _ = run_suite(spark, clips_dir)
    suite_reps.append(round(suite_sec2, 3))
    suite_sec = min(suite_sec, suite_sec2)
    clips_per_sec = n_clips / suite_sec

    # r2 post-mortem: the relational block recorded phantom 3-7x regressions
    # when timed immediately after the decode-heavy suite stage (GC /
    # executor-thread churn bleeding into the first timed rep, compounded by
    # VM drift). De-noising, per the BENCH_SCALING protocol:
    #   1. one UNTIMED warm-up pass of every query (plans compiled, shuffles
    #      materialized once, suite aftershocks absorbed);
    #   2. reps INTERLEAVED A/B-style across queries (rep 1 of all queries,
    #      then rep 2) so a transient slow minute cannot hit every rep of
    #      one query;
    #   3. per-rep lists recorded alongside the best.
    def _run_one(name):
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in BENCH_QUERIES:  # warm-up pass, untimed
        _run_one(name)
    n_reps = 2
    qreps: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for _ in range(n_reps):
        for name in BENCH_QUERIES:
            qreps[name].append(round(_run_one(name), 3))
    qtimes = {name: min(reps) for name, reps in qreps.items()}

    total = suite_sec + sum(qtimes.values())
    out = {
        "metric": "clips validated/sec (full constraint suite) + relational query wall times",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {"constraint_suite": round(suite_sec, 3), **qtimes},
        "query_reps": {"constraint_suite": suite_reps, **qreps},
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "clips_per_sec": round(clips_per_sec, 1),
        "n_clips": n_clips,
        "cores": CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
