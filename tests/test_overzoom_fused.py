"""overzoom_encode_tiles (source-grouped fused sink) — byte parity with the
generic composite_encode_tiles under its single-source-zoom contract.

The specialized path moves the target fan-out from the join into the
kernel (numpy gathers), computes first-wins per source group, and applies
keep-lists/envelope-prune per (feature, target) pair — every one of those
re-arrangements must be invisible in the output bytes.
"""

import pytest
from pyspark.sql import functions as F

from vtcomposite_spark.operators import composite as C
from vtcomposite_spark.sources import ingest


def _tiles(df):
    return {(r.z, r.x, r.y): bytes(r.tile) for r in df.collect()}


def _check(feats, targets, src_zoom, partitions=None):
    want = _tiles(C.composite_encode_tiles(feats, targets,
                                           join_strategy="broadcast"))
    got = _tiles(C.overzoom_encode_tiles(feats, targets, src_zoom=src_zoom,
                                         partitions=partitions))
    assert set(got) == set(want)
    assert want  # non-trivial
    for k in want:
        assert got[k] == want[k], k


def _grid_feats(spark, fixture_bytes, name, src_zoom=8, n=4):
    template = ingest.features_from_tiles(
        spark, [(fixture_bytes(name), 0, 0, 0)]).drop("src_z", "src_x", "src_y")
    grid = spark.range(n).select(
        (F.col("id") % 2).cast("long").alias("src_x"),
        (F.col("id") / 2).cast("long").alias("src_y"))
    return template.crossJoin(grid).withColumn("src_z", F.lit(src_zoom)), grid


def _targets(spark, grid, z, src_zoom, buffer_size=128, compress=False):
    k = 1 << (z - src_zoom)
    fan = spark.range(k * k).select(
        (F.col("id") % k).alias("dx"), (F.col("id") / k).cast("long").alias("dy"))
    return grid.crossJoin(fan).select(
        F.lit(z).alias("z"),
        (F.col("src_x") * k + F.col("dx")).cast("long").alias("x"),
        (F.col("src_y") * k + F.col("dy")).cast("long").alias("y"),
        F.lit(buffer_size).alias("buffer_size"),
        F.lit(None).cast("array<string>").alias("keep_layers"),
        F.lit(compress).alias("compress"))


@pytest.mark.parametrize("fixture,partitions", [
    ("linestrings-properties-16-10498-22872.mvt", None),
    ("polygons-properties-16-10498-22872.mvt", 16),
    ("points-properties-16-10498-22872.mvt", None),
])
def test_dz1_parity(spark, fixture_bytes, fixture, partitions):
    feats, grid = _grid_feats(spark, fixture_bytes, fixture)
    targets = _targets(spark, grid, 9, 8)
    _check(feats, targets, 8, partitions=partitions)


def test_mixed_dz0_dz2_parity(spark, fixture_bytes):
    """Same-zoom pass-through targets and dz=2 grandchildren in ONE request."""
    feats, grid = _grid_feats(
        spark, fixture_bytes, "linestrings-properties-16-10498-22872.mvt")
    t0 = grid.select(
        F.lit(8).alias("z"), F.col("src_x").alias("x"), F.col("src_y").alias("y"),
        F.lit(0).alias("buffer_size"),
        F.lit(None).cast("array<string>").alias("keep_layers"),
        F.lit(False).alias("compress"))
    t2 = _targets(spark, grid, 10, 8)
    _check(feats, t0.unionByName(t2), 8)


def test_first_wins_keep_compress_parity(spark, fixture_bytes):
    """Two input tiles share one source address (in-kernel first-wins must
    equal the generic keys-agg + semi-join), plus per-target keep-lists,
    gzip output, and a dz=0 target."""
    lbuf = fixture_bytes("linestrings-properties-16-10498-22872.mvt")
    pbuf = fixture_bytes("polygons-properties-16-10498-22872.mvt")
    f2 = ingest.features_from_tiles(
        spark, [(lbuf, 4, 2, 3), (pbuf, 4, 2, 3), (lbuf, 4, 2, 2)])
    name = f2.select("layer").distinct().collect()[0].layer
    t3 = spark.createDataFrame(
        [(5, 4, 6, 128, None, True), (5, 5, 7, 4080, [name], False),
         (4, 2, 3, 0, None, False)],
        "z int, x long, y long, buffer_size int, "
        "keep_layers array<string>, compress boolean")
    _check(f2, t3, 4)


def test_targets_above_source_zoom_yield_nothing(spark, fixture_bytes):
    """z < src_zoom targets drop, matching the generic inner join."""
    feats, grid = _grid_feats(
        spark, fixture_bytes, "linestrings-properties-16-10498-22872.mvt")
    bad = spark.createDataFrame([(7, 0, 0, 0, None, False)],
                                "z int, x long, y long, buffer_size int, "
                                "keep_layers array<string>, compress boolean")
    out = C.overzoom_encode_tiles(feats, bad, src_zoom=8)
    assert out.count() == 0


def test_generic_fused_src_zooms_routes_to_specialized(spark, fixture_bytes):
    """composite_encode_tiles(src_zooms=[z]) must byte-match its own
    generic plan — the single-zoom declaration is a physical strategy
    switch (source-grouped), never a semantic one."""
    feats, grid = _grid_feats(
        spark, fixture_bytes, "linestrings-properties-16-10498-22872.mvt")
    targets = _targets(spark, grid, 9, 8)
    want = _tiles(C.composite_encode_tiles(feats, targets,
                                           join_strategy="broadcast"))
    got = _tiles(C.composite_encode_tiles(feats, targets, src_zooms=[8]))
    assert got == want and want
