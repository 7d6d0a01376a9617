"""End-to-end training-data curation pipeline over the documents table.

The composition a production curation job runs, each stage an operator this
engine ships (and the driver oracle-checks individually):

  1. exact dedup          — drop byte-identical texts (hash groupBy)
  2. near-dup keep-best   — MinHash/Jaccard pair graph → connected
                            components → keep the highest-quality member
                            per cluster (operators/dedup.py)
  3. decontamination      — drop documents sharing n-grams with the eval
                            set (broadcast shingle semi-join)
  4. PII scrub            — emails/phones/IPv4 → class placeholders
  5. quality filter       — Gopher-style repetition cap + unigram
                            log-probability floor (corpus-statistics pass)
  6. leakage-safe splits  — cluster-aware deterministic train/val/test

Stage order matters at scale: dedup first shrinks every later stage;
decontamination runs before quality filtering so eval leakage can't survive
behind a quality pass; splits run LAST over the near-dup pair graph so
surviving near-dups of the same cluster can never straddle train/test.

Run: python examples/curation_pipeline.py [sf_dir] [out_dir]
(defaults: /root/testdata/sf0.001, ./curated). The console summary prints
per-stage row counts — the curation funnel.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F


def curate(
    spark: SparkSession,
    docs: DataFrame,
    eval_docs: DataFrame,
    min_logprob: float = -9.0,
    max_repetition: float = 0.5,
    jaccard_threshold: float = 0.6,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the curation funnel; returns (curated_df, per-stage counts)."""
    from doc_quality_check_spark.functions.text import (
        repetition_ratio,
        scrub_pii,
    )
    from doc_quality_check_spark.operators.aggregates import (
        unigram_logprob_scores,
    )
    from doc_quality_check_spark.operators.dedup import (
        contamination_flags,
        dedup_exact_keep_first,
        dedup_keep_best,
        jaccard_pairs,
    )
    from doc_quality_check_spark.operators.sampling import cluster_safe_split

    funnel: dict[str, int] = {"input": docs.count()}
    cached: list[DataFrame] = []

    def stage(name: str, df: DataFrame) -> DataFrame:
        # persist each stage boundary: the funnel count AND the next stage
        # both consume it, and without the cache every count would re-run
        # the whole upstream pipeline (the expensive joins O(stages²) times)
        df = df.persist()
        funnel[name] = df.count()
        cached.append(df)
        return df

    # 1. exact dedup — the driver-verified operator (min-id survivor per
    # identical text; NULL-text rows all kept)
    docs = stage("exact_dedup", dedup_exact_keep_first(docs, "doc_id", "text"))

    # 2. near-dup keep-best: longest text survives its cluster
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3,
                          threshold=jaccard_threshold).persist()
    cached.append(pairs)
    scored = docs.withColumn(
        "score", F.coalesce(F.length("text").cast("long"), F.lit(0))
    )
    docs = stage(
        "neardup_keep_best",
        dedup_keep_best(scored, pairs, "doc_id", "score").drop("score"),
    )

    # 3. decontamination vs the eval set
    contaminated = contamination_flags(docs, eval_docs, "doc_id", "text")
    docs = stage(
        "decontaminated",
        docs.join(contaminated.select("doc_id"), "doc_id", "left_anti"),
    )

    # 4. PII scrub (pure Catalyst regexp chain, no row loss)
    docs = stage("pii_scrubbed", docs.withColumn("text", scrub_pii("text")))

    # 5. quality: repetition cap + unigram log-probability floor
    kept = docs.filter(repetition_ratio("text", 3) <= max_repetition)
    lp = unigram_logprob_scores(kept, "doc_id", "text")
    docs = stage(
        "quality_filtered",
        kept.join(
            lp.filter(F.col("mean_logprob") >= min_logprob).select("doc_id"),
            "doc_id",
        ),
    )

    # 6. leakage-safe deterministic splits over the ORIGINAL pair graph:
    # clusters were reduced to one survivor, but the survivor still hashes
    # by its component representative, keeping assignment stable even if
    # the retention policy changes between runs
    docs = stage(
        "split",
        cluster_safe_split(
            docs, "doc_id", pairs, {"train": 0.9, "val": 0.05, "test": 0.05}
        ),
    )
    # earlier stage caches are no longer needed; the final stage stays
    # persisted for the caller's write/collect
    for df in cached[:-1]:
        df.unpersist()
    return docs, funnel


def main() -> None:
    from doc_quality_check_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "./curated"
    spark = get_spark("curation-pipeline", cores=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # eval set stand-in: every 50th document
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.join(eval_docs.select("doc_id"), "doc_id", "left_anti")
    curated, funnel = curate(spark, corpus, eval_docs)
    curated.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    for stage, n in funnel.items():
        print(f"{stage:20s} {n}")


if __name__ == "__main__":
    main()
