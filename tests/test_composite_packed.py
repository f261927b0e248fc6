"""composite_packed — row-identical parity with the per-row composite().

The packed path crosses the python seam one row per TILE in both
directions (pack → clip kernel → re-pack → JVM inline); every
re-arrangement must be invisible in the relational rows. Mirrors the
fused-sink parity matrix (tests/test_overzoom_fused.py) shape-for-shape.
"""

import pytest
from pyspark.sql import functions as F

from vtcomposite_spark.operators import composite as C
from vtcomposite_spark.sources import ingest


def _canon(df):
    def cell(v):
        if isinstance(v, list):
            return tuple(v)
        if isinstance(v, dict):
            return tuple(sorted(v.items()))
        return v

    from collections import Counter
    cols = sorted(df.columns)
    return Counter(tuple(cell(r[c]) for c in cols) for r in df.collect())


def _check(feats, targets, _src_zooms=None, **kw):
    """Generic-join packed path by default (src_zooms=None); pass
    _src_zooms to exercise the auto/source-grouped routes."""
    want = C.composite(feats, targets, join_strategy="broadcast")
    got = C.composite_packed(feats, targets, join_strategy="broadcast",
                             src_zooms=_src_zooms, **kw)
    assert got.columns == want.columns
    w, g = _canon(want), _canon(got)
    assert w  # non-trivial
    assert g == w


def _grid_feats(spark, fixture_bytes, name, src_zoom=8, n=4):
    template = ingest.features_from_tiles(
        spark, [(fixture_bytes(name), 0, 0, 0)]).drop("src_z", "src_x", "src_y")
    grid = spark.range(n).select(
        (F.col("id") % 2).cast("long").alias("src_x"),
        (F.col("id") / 2).cast("long").alias("src_y"))
    return template.crossJoin(grid).withColumn("src_z", F.lit(src_zoom)), grid


def _targets(spark, grid, z, src_zoom, buffer_size=128):
    k = 1 << (z - src_zoom)
    fan = spark.range(k * k).select(
        (F.col("id") % k).alias("dx"), (F.col("id") / k).cast("long").alias("dy"))
    return grid.crossJoin(fan).select(
        F.lit(z).alias("z"),
        (F.col("src_x") * k + F.col("dx")).cast("long").alias("x"),
        (F.col("src_y") * k + F.col("dy")).cast("long").alias("y"),
        F.lit(buffer_size).alias("buffer_size"),
        F.lit(None).cast("array<string>").alias("keep_layers"),
        F.lit(False).alias("compress"))


@pytest.mark.parametrize("fixture", [
    "linestrings-properties-16-10498-22872.mvt",
    "polygons-properties-16-10498-22872.mvt",
    "points-properties-16-10498-22872.mvt",
])
def test_dz1_parity(spark, fixture_bytes, fixture):
    feats, grid = _grid_feats(spark, fixture_bytes, fixture)
    _check(feats, _targets(spark, grid, 9, 8))


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
    _check(feats, t0.unionByName(t2))


def test_first_wins_keep_holes_parity(spark, fixture_bytes):
    """Two input tiles share one source address (first-wins before the
    seam), per-target keep-lists, polygons with holes, and a dz=0 target."""
    lbuf = fixture_bytes("linestrings-properties-16-10498-22872.mvt")
    pbuf = fixture_bytes("polygons-with-holes-4-13-6.mvt")
    f2 = ingest.features_from_tiles(
        spark, [(lbuf, 4, 2, 3), (pbuf, 4, 2, 3), (lbuf, 4, 2, 2)])
    name = f2.select("layer").distinct().orderBy("layer").collect()[0].layer
    t3 = spark.createDataFrame(
        [(5, 4, 6, 128, None, False), (5, 5, 7, 4080, [name], False),
         (4, 2, 3, 0, None, False)],
        "z int, x long, y long, buffer_size int, "
        "keep_layers array<string>, compress boolean")
    _check(f2, t3)


def test_null_buffer_size_parity(spark, fixture_bytes):
    """NULL buffer_size (dz>0) drops all its features via the envelope
    predicate in both paths — the packed seam must not resurrect them."""
    lbuf = fixture_bytes("linestrings-properties-16-10498-22872.mvt")
    feats = ingest.features_from_tiles(spark, [(lbuf, 4, 2, 3)])
    targets = spark.createDataFrame(
        [(5, 4, 6, None, None, False),
         (5, 5, 7, 128, None, False)],
        "z int, x long, y long, buffer_size int, "
        "keep_layers array<string>, compress boolean")
    _check(feats, targets)
    got = C.composite_packed(feats, targets)
    assert {(r.z, r.x, r.y) for r in got.select("z", "x", "y").collect()} \
        == {(5, 5, 7)}


def test_capped_packing_parity(spark, fixture_bytes):
    """max_pack_features splits a tile into per-layer packed rows; the
    inlined rows must equal the uncapped (and the per-row) output."""
    lbuf = fixture_bytes("linestrings-properties-16-10498-22872.mvt")
    pbuf = fixture_bytes("polygons-properties-16-10498-22872.mvt")
    feats = ingest.features_from_tiles(spark, [(lbuf, 4, 2, 3), (pbuf, 4, 2, 3)])
    targets = spark.createDataFrame(
        [(5, 4, 6, 128, None, False), (4, 2, 3, 0, None, False)],
        "z int, x long, y long, buffer_size int, "
        "keep_layers array<string>, compress boolean")
    nmax = (feats.groupBy("layer").count()
            .agg(F.max("count")).collect()[0][0])
    _check(feats, targets, max_pack_features=int(nmax))


def test_capped_packing_over_cap_raises(spark, fixture_bytes):
    """A single layer beyond the cap raises the sinks' loud error rather
    than packing an unbounded row."""
    lbuf = fixture_bytes("linestrings-properties-16-10498-22872.mvt")
    feats = ingest.features_from_tiles(spark, [(lbuf, 4, 2, 3)])
    targets = spark.createDataFrame(
        [(4, 2, 3, 0, None, False)],
        "z int, x long, y long, buffer_size int, "
        "keep_layers array<string>, compress boolean")
    out = C.composite_packed(feats, targets, max_pack_features=1)
    with pytest.raises(Exception, match="max_pack_features"):
        out.collect()


@pytest.mark.parametrize("fixture", [
    "linestrings-properties-16-10498-22872.mvt",
    "polygons-properties-16-10498-22872.mvt",
    "points-properties-16-10498-22872.mvt",
])
def test_source_grouped_dz1_parity(spark, fixture_bytes, fixture):
    """overzoom_composite_packed (features shuffle once, in-kernel fan-out,
    packed emit) must be row-identical to the generic composite()."""
    feats, grid = _grid_feats(spark, fixture_bytes, fixture)
    targets = _targets(spark, grid, 9, 8)
    want = C.composite(feats, targets, join_strategy="broadcast")
    got = C.overzoom_composite_packed(feats, targets, src_zoom=8)
    assert got.columns == want.columns
    w = _canon(want)
    assert w and _canon(got) == w


def test_source_grouped_mixed_dz0_dz2_first_wins_keep(spark, fixture_bytes):
    """The fused-sink parity shapes, relational: shared source address
    (first-wins), keep-list target, dz=0 pass-through + dz=2, null buffer."""
    lbuf = fixture_bytes("linestrings-properties-16-10498-22872.mvt")
    pbuf = fixture_bytes("polygons-with-holes-4-13-6.mvt")
    f2 = ingest.features_from_tiles(
        spark, [(lbuf, 4, 2, 3), (pbuf, 4, 2, 3), (lbuf, 4, 2, 2)])
    name = f2.select("layer").distinct().orderBy("layer").collect()[0].layer
    t3 = spark.createDataFrame(
        [(5, 4, 6, 128, None, False), (5, 5, 7, 4080, [name], False),
         (4, 2, 3, 0, None, False), (6, 11, 14, 64, None, True),
         (5, 4, 7, None, None, False)],
        "z int, x long, y long, buffer_size int, "
        "keep_layers array<string>, compress boolean")
    want = C.composite(f2, t3, join_strategy="broadcast")
    got = C.overzoom_composite_packed(f2, t3, src_zoom=4)
    assert got.columns == want.columns
    w = _canon(want)
    assert w and _canon(got) == w


def test_auto_routes_single_zoom_to_source_grouped(spark, fixture_bytes):
    """composite_packed's default src_zooms='auto' must infer the single
    source zoom and still produce composite()'s exact rows."""
    feats, grid = _grid_feats(
        spark, fixture_bytes, "linestrings-properties-16-10498-22872.mvt")
    targets = _targets(spark, grid, 9, 8)
    _check(feats, targets, _src_zooms="auto")


def test_multizoom_auto_falls_back_to_generic(spark, fixture_bytes):
    """Two source zooms: auto inference keeps the generic join path and
    stays row-identical (cross-zoom first-wins included)."""
    lbuf = fixture_bytes("linestrings-properties-16-10498-22872.mvt")
    pbuf = fixture_bytes("polygons-properties-16-10498-22872.mvt")
    feats = ingest.features_from_tiles(
        spark, [(lbuf, 4, 2, 3), (pbuf, 5, 4, 6)])
    targets = spark.createDataFrame(
        [(5, 4, 6, 128, None, False), (6, 8, 12, 64, None, False)],
        "z int, x long, y long, buffer_size int, "
        "keep_layers array<string>, compress boolean")
    _check(feats, targets, _src_zooms="auto")


def test_source_grouped_targets_without_keep_layers(spark, fixture_bytes):
    """The sink contract tolerates a missing keep_layers column; the
    relational wrapper must too (rows == composite with a null keep)."""
    lbuf = fixture_bytes("linestrings-properties-16-10498-22872.mvt")
    feats = ingest.features_from_tiles(spark, [(lbuf, 4, 2, 3)])
    bare = spark.createDataFrame(
        [(5, 4, 6, 128, False)],
        "z int, x long, y long, buffer_size int, compress boolean")
    got = C.overzoom_composite_packed(feats, bare, src_zoom=4)
    want = C.composite(
        feats, bare.withColumn(
            "keep_layers", F.lit(None).cast("array<string>")),
        join_strategy="broadcast")
    assert got.columns == want.columns
    w = _canon(want)
    assert w and _canon(got) == w


def test_all_clipped_away_yields_nothing(spark, fixture_bytes):
    """A target whose window every feature misses: the packed row inlines
    to zero rows, exactly like the per-row path."""
    buf = fixture_bytes("four-points-quadrants.mvt")
    feats = ingest.features_from_tiles(spark, [(buf, 0, 0, 0)])
    # deep overzoom into a corner none of the four quadrant points hits
    targets = spark.createDataFrame(
        [(8, 129, 129, 0, None, False)],
        "z int, x long, y long, buffer_size int, "
        "keep_layers array<string>, compress boolean")
    want = C.composite(feats, targets).count()
    got = C.composite_packed(feats, targets).count()
    assert got == want == 0
