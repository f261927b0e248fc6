"""Structured Streaming wrapper over the batch kernels (SURVEY.md §2.10).

The reference is a synchronous request library — it has NO streaming
operator surface; its only asynchrony is a threadpool. This module is the
micro-batch extension the survey names as the natural v2: the SAME
geotag-extraction + cell-index kernels run under ``readStream``, with
event-time watermarks and windowed per-tile aggregation for late data.

Everything here composes built-ins: the extraction kernel is the identical
``mapInPandas`` used in batch (kernel reuse is the point), the aggregation
is a watermarked groupBy — Spark maintains the state store, no custom
stateful operator is needed for tile counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.cells import encode_cells
from ..sources.pages import extract_geotags


def streaming_tile_counts(pages_stream: DataFrame, zoom: int = 10,
                          window_duration: str = "1 minute",
                          watermark: str = "2 minutes") -> DataFrame:
    """pages stream → geotags → cells → windowed per-tile page counts.

    Late pages beyond the watermark are dropped by the state store; the
    output is append-ready per (window, cell).
    """
    geo = extract_geotags(pages_stream).filter(F.col("lat").isNotNull())
    cells = encode_cells(geo, zoom)
    return (
        cells
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_duration).alias("w"),
                 F.col("cell"), F.col("tile_x"), F.col("tile_y"))
        .agg(F.count("*").alias("n_pages"),
             F.approx_count_distinct("lang").alias("n_langs"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "cell", "tile_x", "tile_y", "n_pages", "n_langs")
    )


def run_file_stream(spark, source_dir: str, checkpoint_dir: str, zoom: int = 10,
                    table_name: str = "tile_counts_stream") -> None:
    """Drive the stream from a parquet directory (availableNow → finishes
    when the backlog is drained; checkpointed → resumable)."""
    from ..schema import PAGES_SCHEMA

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(source_dir)
    out = streaming_tile_counts(stream, zoom)
    q = (out.writeStream
         .format("memory")
         .queryName(table_name)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
