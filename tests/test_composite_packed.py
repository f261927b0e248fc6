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
    want = C.composite(feats, targets, join_strategy="broadcast",
                       src_zooms=None)
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
    predicate in both paths — the packed seam must not resurrect them.
    A dz=0 NULL-buffer target PASSES THROUGH (the fast path ignores the
    buffer) and must survive the packed seam's integer tile-column
    rebuild even when its batch also carries clip rows — the NaN-cast
    crash a review repro found."""
    lbuf = fixture_bytes("linestrings-properties-16-10498-22872.mvt")
    feats = ingest.features_from_tiles(spark, [(lbuf, 4, 2, 3)])
    targets = spark.createDataFrame(
        [(5, 4, 6, None, None, False),
         (5, 5, 7, 128, None, False),
         (4, 2, 3, None, None, False)],   # dz=0, NULL buffer: pass-through
        "z int, x long, y long, buffer_size int, "
        "keep_layers array<string>, compress boolean")
    _check(feats, targets)                      # generic packed path
    _check(feats, targets, _src_zooms="auto")   # source-grouped route
    got = C.composite_packed(feats, targets, src_zooms=None)
    assert {(r.z, r.x, r.y) for r in got.select("z", "x", "y").collect()} \
        == {(5, 5, 7), (4, 2, 3)}


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


def test_capped_packing_splits_over_cap_layer(spark, fixture_bytes):
    """Unlike the byte sinks (which must raise — splitting a layer's
    encoded message needs key/value-table merge), the relational packed
    path SPLITS an over-cap layer into bounded buckets and the inline
    union restores it: with a cap of 7 on a ~2000-feature layer the rows
    still exactly match the per-row composite()."""
    lbuf = fixture_bytes("linestrings-properties-16-10498-22872.mvt")
    feats = ingest.features_from_tiles(spark, [(lbuf, 4, 2, 3)])
    targets = spark.createDataFrame(
        [(4, 2, 3, 0, None, False), (5, 4, 6, 128, None, False)],
        "z int, x long, y long, buffer_size int, "
        "keep_layers array<string>, compress boolean")
    _check(feats, targets, max_pack_features=7)


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
    want = C.composite(feats, targets, join_strategy="broadcast",
                       src_zooms=None)
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
    want = C.composite(f2, t3, join_strategy="broadcast", src_zooms=None)
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


def test_multizoom_auto_routes_source_grouped(spark, fixture_bytes):
    """Two source zooms: auto inference routes the per-zoom source-grouped
    passes under cross-zoom winners (union merge) and stays row-identical
    to the generic composite — cross-zoom first-wins included (both
    sources contribute the same layer name; the z4 tile has the lower
    tile_idx, so it owns the layer at every target both cover)."""
    lbuf = fixture_bytes("linestrings-properties-16-10498-22872.mvt")
    pbuf = fixture_bytes("polygons-properties-16-10498-22872.mvt")
    feats = ingest.features_from_tiles(
        spark, [(lbuf, 4, 2, 3), (pbuf, 5, 4, 6)])
    targets = spark.createDataFrame(
        [(5, 4, 6, 128, None, False), (6, 8, 12, 64, None, False),
         (6, 9, 13, 128, None, False), (4, 2, 3, 0, None, False)],
        "z int, x long, y long, buffer_size int, "
        "keep_layers array<string>, compress boolean")
    _check(feats, targets, _src_zooms="auto")
    # and with explicitly declared zooms (skips the inference job)
    _check(feats, targets, _src_zooms=[4, 5])


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
        join_strategy="broadcast", src_zooms=None)
    assert got.columns == want.columns
    w = _canon(want)
    assert w and _canon(got) == w


@pytest.mark.parametrize("seed", [20, 21, 22])
def test_randomized_multizoom_relational_parity(spark, seed):
    """Randomized MIXED-ZOOM tilesets (sources at two zooms, shared layer
    names, targets descending from either or both, keep-lists, varying
    buffers) — the multi-zoom source-grouped relational route must be
    row-identical to the generic join plan on shapes no hand case pins."""
    import numpy as np

    from vtcomposite_spark.sources import mvt

    rng = np.random.default_rng(seed)

    def rand_feature(gt):
        if gt == 1:
            parts = [[(int(rng.integers(-200, 4300)),
                       int(rng.integers(-200, 4300)))]
                     for _ in range(rng.integers(1, 3))]
            rts = [0] * len(parts)
        elif gt == 2:
            parts = [[(int(x), int(y)) for x, y in
                      rng.integers(-200, 4300, size=(rng.integers(2, 6), 2))]
                     for _ in range(rng.integers(1, 3))]
            rts = [0] * len(parts)
        else:
            x, y = int(rng.integers(-100, 3800)), int(rng.integers(-100, 3800))
            w, h = int(rng.integers(50, 600)), int(rng.integers(50, 600))
            ring = [(x, y), (x, y + h), (x + w, y + h), (x + w, y), (x, y)]
            parts, rts = [ring], [1 if mvt.ring_area2(ring) > 0 else 2]
        props = {f"k{j}": v for j, v in enumerate(
            [int(rng.integers(-5, 5)), float(round(rng.normal(), 3)),
             "s" + str(rng.integers(0, 3))][:rng.integers(0, 4)])}
        return mvt.Feature(geom_type=gt, parts=parts, ring_types=rts,
                           properties=props, prop_types=None,
                           fid=int(rng.integers(0, 99)) if rng.random() < .5
                           else None)

    def rand_tile(nlayers):
        return mvt.encode_tile([
            mvt.Layer(name=f"L{li % 2}",
                      features=[rand_feature(int(rng.integers(1, 4)))
                                for _ in range(rng.integers(1, 5))])
            for li in range(nlayers)])

    ZLO, ZHI = 4, 5
    srcs = []
    for _ in range(5):
        if rng.random() < 0.5:
            srcs.append((ZLO, int(rng.integers(0, 2)), int(rng.integers(0, 2))))
        else:
            srcs.append((ZHI, int(rng.integers(0, 4)), int(rng.integers(0, 4))))
    tiles = [(rand_tile(int(rng.integers(1, 3))), *s) for s in srcs]
    feats = ingest.features_from_tiles(spark, tiles)

    trows = []
    for (sz, sx, sy) in srcs:
        for _ in range(int(rng.integers(1, 3))):
            dz = int(rng.integers(0, 3))
            trows.append((
                sz + dz,
                (sx << dz) + int(rng.integers(0, 1 << dz)),
                (sy << dz) + int(rng.integers(0, 1 << dz)),
                int(rng.choice([0, 128, 4080])),
                ["L0"] if rng.random() < 0.3 else None,
                bool(rng.random() < 0.3)))
    seen: dict = {}
    for r in trows:
        seen.setdefault(r[:3], r)
    targets = spark.createDataFrame(
        list(seen.values()), "z int, x long, y long, buffer_size int, "
        "keep_layers array<string>, compress boolean")
    _check(feats, targets, _src_zooms=[ZLO, ZHI])


def test_empty_declared_zooms_yield_empty(spark, fixture_bytes):
    """An explicitly-declared EMPTY src_zooms list (e.g. computed from an
    empty catalog) must yield an empty result with the right schema in
    both the packed relational path and the fused sink — not crash the
    multi-zoom router on zero passes."""
    buf = fixture_bytes("four-points-quadrants.mvt")
    feats = ingest.features_from_tiles(spark, [(buf, 0, 0, 0)])
    targets = spark.createDataFrame(
        [(1, 0, 0, 0, None, False)],
        "z int, x long, y long, buffer_size int, "
        "keep_layers array<string>, compress boolean")
    rel = C.composite_packed(feats, targets, src_zooms=[])
    assert rel.count() == 0
    assert rel.columns == C.composite(feats, targets).columns
    sink = C.composite_encode_tiles(feats, targets, src_zooms=[])
    assert sink.count() == 0 and sink.columns == ["z", "x", "y", "tile"]
    # the cap is a generic-path contract and [] takes the generic path —
    # combining them must not raise the declared-zooms error
    assert C.composite_packed(feats, targets, src_zooms=[],
                              max_pack_features=10).count() == 0
    # ANY empty iterable means declared-empty — a tuple must not silently
    # widen to the full generic run
    assert C.composite_packed(feats, targets, src_zooms=(),
                              max_pack_features=10).count() == 0
    assert C.composite_packed(feats, targets, src_zooms=()).count() == 0
    # a typo'd mode string reports unknown-mode, with or without the cap
    for kw in ({}, {"max_pack_features": 10}):
        with pytest.raises(ValueError, match="unknown mode"):
            C.composite_packed(feats, targets, src_zooms="atuo", **kw)


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
