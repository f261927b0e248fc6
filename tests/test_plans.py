"""Skew (salted two-phase agg) and lineage/checkpoint-resume tests."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from vtcomposite_spark.plans import lineage as L
from vtcomposite_spark.plans import skew as K


def test_salted_counts_match_plain(spark):
    # hot key: 80% of rows on one tile
    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 5 < 4, F.lit(99)).otherwise(F.col("id") % 50)
        .alias("tile"),
        F.col("id"))
    plain = {r.tile: r.n for r in
             df.groupBy("tile").agg(F.count("*").alias("n")).collect()}
    salted = {r.tile: r.n for r in
              K.salted_tile_counts(df, ["tile"], ["id"], nsalt=8).collect()}
    assert salted == plain
    assert salted[99] == 4000


def test_salted_agg_min_max_sum(spark):
    df = spark.range(0, 1000).select((F.col("id") % 3).alias("k"), "id")
    out = {r.k: (r.s, r.mn, r.mx) for r in K.salted_agg(
        df, ["k"], {"s": ("id", "sum"), "mn": ("id", "min"), "mx": ("id", "max")},
        ["id"], nsalt=4).collect()}
    want = {r.k: (r.s, r.mn, r.mx) for r in df.groupBy("k").agg(
        F.sum("id").alias("s"), F.min("id").alias("mn"),
        F.max("id").alias("mx")).collect()}
    assert out == want


def test_partition_lineage(spark):
    df = spark.range(0, 100, numPartitions=4).select(
        (F.col("id") % 2).alias("z"), F.col("id").cast("string").alias("s"))
    lin = L.partition_lineage(df, ["z"]).collect()
    assert sum(r.rows for r in lin) == 100
    assert all(r.bytes > 0 for r in lin)
    assert {r.partition_id for r in lin} <= {0, 1, 2, 3}


def test_write_level_and_resume(spark):
    root = tempfile.mkdtemp(prefix="vtc_lineage_")
    try:
        calls = []

        def build(z):
            calls.append(z)
            return spark.range(0, 10 * (z + 1)).select(
                F.lit(z).alias("z"), F.col("id"))

        r1 = L.run_levels(spark, root, [0, 1], build)
        assert r1[0]["rows"] == 10 and r1[1]["rows"] == 20
        assert calls == [0, 1]
        # resume: both levels done, nothing recomputed, a new level runs
        r2 = L.run_levels(spark, root, [0, 1, 2], build)
        assert r2[0] == {"skipped": True} and r2[1] == {"skipped": True}
        assert r2[2]["rows"] == 30
        assert calls == [0, 1, 2]
        # data actually written and partitioned
        z1 = spark.read.parquet(f"{root}/z=1__data")
        assert z1.count() == 20
        assert L.completed_levels(spark, root) == {0, 1, 2}
    finally:
        shutil.rmtree(root, ignore_errors=True)
