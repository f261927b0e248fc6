"""Per-partition lineage + metrics + resume-from-checkpoint (north rule).

A long tiling job over 10^12 documents runs zoom level by zoom level. Each
level's output is written partitioned by ``z`` with a MANIFEST row per
(zoom, partition) recording row/byte counts; on restart, completed zoom
levels are detected from the manifest and skipped — resume mid-job without
recomputing finished levels.

Mechanics, all built-in Spark:
* ``df.observe(name, metrics...)`` — row/byte counters collected on the
  driver at action time, no extra pass over the data.
* ``spark_partition_id()`` — partition-granular lineage rows.
* the manifest is itself a tiny parquet table under <root>/_manifest; a
  level is complete iff its ``status=done`` row exists (written AFTER the
  data write succeeds — write-ahead ordering makes the resume check safe).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def _manifest_path(root: str) -> str:
    return f"{root.rstrip('/')}/_manifest"


def partition_lineage(df: DataFrame, keys: list[str]) -> DataFrame:
    """Per (keys..., spark partition) row/byte metrics — the lineage rows."""
    sized = [F.length(F.col(c).cast("binary")) for c in df.columns
             if dict(df.dtypes)[c] in ("string", "binary")]
    size_agg = (F.sum(sum(sized[1:], start=sized[0])) if sized
                else F.sum(F.lit(0)))
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy(*keys, "_pid")
        .agg(F.count("*").alias("rows"), size_agg.alias("bytes"))
        .withColumnRenamed("_pid", "partition_id")
    )


def completed_levels(spark: SparkSession, root: str) -> set[int]:
    try:
        m = spark.read.parquet(_manifest_path(root))
    except Exception:
        return set()
    return {r.zoom for r in
            m.filter(F.col("status") == "done").select("zoom").distinct().collect()}


def write_level(df: DataFrame, root: str, zoom: int,
                partition_cols: list[str] = ("z",)) -> dict:
    """Write one zoom level + its manifest row; returns observed metrics."""
    spark = df.sparkSession
    obs = Observation(f"level_{zoom}")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    writer = observed.write.mode("overwrite")
    pcols = [c for c in partition_cols if c in df.columns]
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.parquet(f"{root.rstrip('/')}/z={zoom}__data")
    metrics = dict(obs.get)
    manifest_row = [(int(zoom), int(metrics.get("rows", 0)),
                     float(time.time()), "done")]
    mdf = spark.createDataFrame(
        manifest_row, "zoom INT, rows BIGINT, ts DOUBLE, status STRING")
    mdf.write.mode("append").parquet(_manifest_path(root))
    return metrics


def run_levels(spark: SparkSession, root: str, zooms: list[int],
               build_level, force: bool = False) -> dict[int, dict]:
    """Resume-aware driver loop: ``build_level(zoom) -> DataFrame``; levels
    already marked done are skipped unless ``force``."""
    done = set() if force else completed_levels(spark, root)
    out: dict[int, dict] = {}
    for z in zooms:
        if z in done:
            out[z] = {"skipped": True}
            continue
        out[z] = write_level(build_level(z), root, z)
    return out
