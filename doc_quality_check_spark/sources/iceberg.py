"""Iceberg table source (the production input per BASELINE.json input_hint:
"Iceberg table of audio clip + transcript pairs").

This sandbox has no Iceberg runtime jars, so the loader degrades gracefully:
``load_clips_table`` prefers an Iceberg catalog table and falls back to a
parquet path — the engine's plans are identical either way (both are
DataSource-v2 scans; Catalyst pushes the same filters/projections down, and
Iceberg additionally contributes partition pruning + min/max file skipping
for the sr_hz/dur_ms domain predicates).

Cluster deployment (spark-submit):
    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.lake.type=glue|hive|rest ...
then ``load_clips_table(spark, "lake.audio.clips")``.

Lineage for the run manifest comes from the table's current snapshot
(``snapshot_id()``) when Iceberg is active, else from the file listing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def load_clips_table(spark: SparkSession, source: str) -> DataFrame:
    """``source`` is either an Iceberg table identifier (catalog.db.table)
    or a parquet path. Returns the clips DataFrame."""
    if os.path.exists(source) or source.startswith(("file:", "s3:", "hdfs:")):
        return spark.read.parquet(source)
    if not iceberg_available(spark):
        raise RuntimeError(
            f"{source!r} looks like a table identifier but no Iceberg runtime "
            "is on the classpath — add the iceberg-spark-runtime package"
        )
    return spark.read.format("iceberg").load(source)


def snapshot_lineage(spark: SparkSession, source: str) -> dict:
    """Input-lineage record for the run manifest: Iceberg snapshot id when
    available, else the (sorted) file list of the parquet path."""
    if os.path.exists(source):
        files = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(source) for f in fs if f.endswith(".parquet")
        ) or [source]
        return {"kind": "parquet", "files": files, "n_files": len(files)}
    row = spark.sql(
        f"SELECT snapshot_id, committed_at FROM {source}.snapshots "
        "ORDER BY committed_at DESC LIMIT 1"
    ).first()
    return {
        "kind": "iceberg",
        "snapshot_id": int(row["snapshot_id"]),
        "committed_at": str(row["committed_at"]),
    }
