"""Structured Streaming wrapper test: file-source micro-batches through the
same extraction/cell kernels, watermarked windowed tile counts."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from vtcomposite_spark.sources.pages import synthesize_pages
from vtcomposite_spark.streaming.pipeline import run_file_stream


def test_streaming_tile_counts_match_batch(spark):
    src = tempfile.mkdtemp(prefix="vtc_stream_src_")
    ckpt = tempfile.mkdtemp(prefix="vtc_stream_ckpt_")
    try:
        pages = synthesize_pages(spark, 300, partitions=3)
        pages.write.mode("overwrite").parquet(src)

        run_file_stream(spark, src, ckpt, zoom=8, table_name="tc_stream")
        got = spark.sql("select cell, sum(n_pages) n from tc_stream group by cell")
        stream_counts = {r.cell: r.n for r in got.collect()}

        # batch ground truth through the same kernels
        from vtcomposite_spark.operators.cells import encode_cells
        from vtcomposite_spark.sources.pages import extract_geotags
        batch = encode_cells(
            extract_geotags(spark.read.parquet(src)).filter(F.col("lat").isNotNull()), 8)
        batch_counts = {r.cell: r.n for r in
                        batch.groupBy("cell").agg(F.count("*").alias("n")).collect()}
        assert stream_counts == batch_counts
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
