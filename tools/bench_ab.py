"""Interleaved A/B benchmark: r3 vs r4 binaries in ONE JVM session.

Round-4 verdict flagged that several relational queries read 1.3-3x slower
in BENCH_r04 than BENCH_r03 (drift_psi, snapshot_diff, hash_split,
token_quality, dedup_simhash, dedup_minhash_lsh) with no plan-level cause.
The two benches ran hours apart on a VM whose wall time drifts 2-3x within
a session (BASELINE.md "Environment pathologies"), so round-over-round
numbers are confounded.  This harness removes the confound:

  * both code trees are pinned git worktrees (.ab/r3 = 7ce4821 round-3
    final, .ab/r4 = b0be610 round-4 final) loaded into ONE Python process
    against ONE SparkSession (same JVM, same page cache, same VM minute);
  * each rep runs every query under BOTH variants back-to-back, with the
    variant order flipped per rep, so a transient slow minute hits both
    variants equally;
  * per-rep lists are recorded; the verdict compares best-of-reps.

Variant swapping purges doc_quality_check_spark* from sys.modules and
re-imports from the variant's worktree.  Queries are pure DataFrame
builders over $SPARK_GRAFT_SF_DIR parquet, so no cross-variant state leaks
through the shared session beyond the JVM warm-up we *want* shared.

Usage:  python tools/bench_ab.py  (writes BENCH_r04b.json at the repo root)
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_REPS = int(os.environ.get("AB_REPS", "3"))

VARIANTS = {
    "r3": os.path.join(REPO, ".ab", "r3"),
    "r4": os.path.join(REPO, ".ab", "r4"),
}
MOVERS = [
    "drift_psi", "snapshot_diff", "hash_split", "token_quality",
    "dedup_simhash", "dedup_minhash_lsh",
]


def load_queries(variant_root: str):
    """Import the variant's QUERIES dict, purging any other variant first."""
    for mod in [m for m in sys.modules if m.startswith("doc_quality_check_spark")]:
        del sys.modules[mod]
    sys.path = [p for p in sys.path if ".ab" not in p and p != REPO]
    sys.path.insert(0, variant_root)
    queries_mod = importlib.import_module("doc_quality_check_spark.queries")
    return queries_mod.QUERIES


def main() -> None:
    sys.path.insert(0, REPO)
    from doc_quality_check_spark.session import get_spark

    spark = get_spark("dqcs-bench-ab", cores=CPUS, shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")

    # warm page cache + JVM exactly as bench.py does
    from pyspark.sql import functions as F
    for tb in ["lineitem", "orders", "events", "documents", "embeddings"]:
        df = spark.read.parquet(f"{SF_DIR}/{tb}.parquet")
        df.agg(*[F.count(c).alias(c) for c in df.columns]).collect()

    def run_one(queries, name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # untimed warm-up: every query under every variant once (compiles plans,
    # forks Python workers, absorbs first-touch costs for both sides)
    for vname, vroot in VARIANTS.items():
        q = load_queries(vroot)
        for name in MOVERS:
            run_one(q, name)

    reps: dict[str, dict[str, list[float]]] = {
        v: {m: [] for m in MOVERS} for v in VARIANTS
    }
    order = list(VARIANTS)
    for rep in range(N_REPS):
        for vname in (order if rep % 2 == 0 else order[::-1]):
            q = load_queries(VARIANTS[vname])
            for name in MOVERS:
                reps[vname][name].append(round(run_one(q, name), 3))

    best = {v: {m: min(r) for m, r in reps[v].items()} for v in VARIANTS}
    ratio = {m: round(best["r4"][m] / best["r3"][m], 3) for m in MOVERS}
    out = {
        "protocol": "interleaved A/B, one JVM, order flipped per rep, best-of-%d" % N_REPS,
        "variants": {"r3": "7ce4821", "r4": "b0be610"},
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cores": CPUS,
        "best": best,
        "reps": reps,
        "r4_over_r3_ratio": ratio,
        "verdict": {
            m: ("environment-drift-confirmed" if ratio[m] <= 1.15 else "investigate")
            for m in MOVERS
        },
    }
    with open(os.path.join(REPO, "BENCH_r04b.json"), "w") as fh:
        fh.write(json.dumps(out) + "\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
