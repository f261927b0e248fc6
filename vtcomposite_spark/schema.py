"""Relational schemas for the engine (SURVEY.md §1.2) + session helper.

The tile is not an object here — it is a grouping key. One DataFrame row per
feature, geometry packed into Arrow-native arrays so kernels stay vectorized.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

# exploded relational form of MVT tile content (FIXTURES.md §2)
FEATURES_SCHEMA = T.StructType([
    T.StructField("tile_idx", T.IntegerType()),       # input tile ordinal (first-wins order)
    T.StructField("src_z", T.IntegerType()),
    T.StructField("src_x", T.LongType()),
    T.StructField("src_y", T.LongType()),
    T.StructField("layer", T.StringType()),
    T.StructField("layer_version", T.IntegerType()),
    T.StructField("extent", T.IntegerType()),
    T.StructField("feature_idx", T.IntegerType()),    # stream ordinal within tile (output order)
    T.StructField("feature_id", T.LongType()),
    T.StructField("geom_type", T.ByteType()),         # 1=point 2=line 3=poly
    T.StructField("xs", T.ArrayType(T.LongType())),
    T.StructField("ys", T.ArrayType(T.LongType())),
    T.StructField("part_offsets", T.ArrayType(T.IntegerType())),  # starts, first=0
    T.StructField("ring_types", T.ArrayType(T.ByteType())),       # aligned with parts
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
    # per-key MVT value-type tag (sources.mvt.TAG_*): properties carries a
    # lossless canonical-string view for the (string-only) property algebra;
    # prop_types lets the encode sink re-emit every value with its original
    # wire type (reference src/feature_builder.hpp:169-180). Entry order
    # mirrors `properties` exactly.
    T.StructField("prop_types", T.MapType(T.StringType(), T.ByteType())),
])

# composite requests (FIXTURES.md §3)
TARGETS_SCHEMA = T.StructType([
    T.StructField("z", T.IntegerType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("buffer_size", T.IntegerType()),
    T.StructField("keep_layers", T.ArrayType(T.StringType())),
    T.StructField("compress", T.BooleanType()),
])

# web-page payload (BASELINE.json input_hint)
PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def get_spark(app: str = "vtcomposite-spark", master: str | None = None,
              shuffle_partitions: int = 32,
              extra_conf: dict | None = None) -> SparkSession:
    """Session tuned for the engine.

    * AQE on (skew-join split, partition coalescing at runtime)
    * Arrow on (every kernel crosses JVM↔Python as Arrow batches)
    * LAST_WIN map-key dedupe — the reference's `languages=all` map is
      last-wins (src/vtcomposite.cpp:871-877); Spark's default would throw.
    """
    b = SparkSession.builder.appName(app)
    if master:
        b = b.master(master)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 128k-row batches: the Arrow seam's per-batch fixed cost (JVM
        # writer → socket → python parse → back) dominates kernel compute
        # at the 10k default; measured on the lines-composite seam:
        # 16k 5.34s / 64k 4.59s / 128k 4.20s. ~25 MB/batch for feature
        # rows; parquet's 128 MB maxPartitionBytes bounds the worst case.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        # the packed encode sinks move ONE fat row per tile (nested feature
        # structs); cap batch BYTES independently of row count. 2 MB (was
        # 256 MB; 2 beats 4 consistently on the poly sink, whose finer
        # 96-partition payloads only split below ~2 MB): the numpy
        # kernels make dozens of passes over each
        # batch's flat arrays, and a batch that fits L2/L3 turns those
        # passes into cache hits instead of DRAM traffic — measured
        # same-window on the sink/fused/packed stages: 256MB → 2-4MB gives
        # 1.25-1.5× per run AND collapses the run-to-run spread under
        # memory-bandwidth contention (OPTIMIZATION_r06.md); batch-split
        # byte parity is gated by the 1-row-batch parity legs. Still
        # bounds hot-tile memory (its original purpose). Row cap above
        # keeps the relational per-feature seam's amortization unchanged
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(2 << 20))
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # deterministic timestamp semantics: crawl timestamps are
        # timezone-naive; never let a host timezone leak into results
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: driver heap IS the executor heap; at 32 concurrent
        # tasks an 8g heap GC-thrashes under Arrow batches + broadcast
        .config("spark.driver.memory", __import__("os").environ.get("VTC_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
