"""Raster↔vector operators: burn-in semantics, exact point round-trip,
marching-squares vectorization, and raster→vector→MVT end-to-end."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vtcomposite_spark.operators import raster as R
from vtcomposite_spark.operators.multimodal import decode_pnm


def _feat_rows(spark, rows):
    """rows: (geom_type, xs, ys, part_offsets) burned into tile (8, 1, 2)."""
    data = [(8, 1, 2, 4096, int(g), [int(v) for v in xs], [int(v) for v in ys],
             [int(p) for p in po]) for g, xs, ys, po in rows]
    return spark.createDataFrame(
        data, "z int, x long, y long, extent int, geom_type tinyint, "
              "xs array<long>, ys array<long>, part_offsets array<int>")


def _grid(spark, df, res):
    out = R.rasterize_tiles(df, resolution=res).collect()
    assert len(out) == 1
    w, h, c, px = decode_pnm(bytes(out[0].raster))
    assert (w, h, c) == (res, res, 1)
    return px.reshape(res, res), out[0]


def test_rasterize_points(spark):
    df = _feat_rows(spark, [
        (1, [0], [0], [0]),            # pixel (0, 0)
        (1, [4095], [4095], [0]),      # pixel (R-1, R-1)
        (1, [2048], [1024], [0]),      # pixel (32, 16)
        (1, [2049], [1025], [0]),      # same pixel at R=64
    ])
    img, row = _grid(spark, df, 64)
    assert img[0, 0] == 1 and img[63, 63] == 1 and img[16, 32] == 2
    assert row.n_nonzero == 3 and row.total_weight == 4


def test_rasterize_polygon_fill_with_hole(spark):
    # outer ring covering pixels cols 8..23, rows 8..23 at R=32 (tile
    # coords *128), hole covering 12..19 — even-odd parity carves it
    o = [8, 24, 24, 8, 8]
    oy = [8, 8, 24, 24, 8]
    hxs = [12, 20, 20, 12, 12]
    hys = [12, 12, 20, 20, 12]
    df = _feat_rows(spark, [
        (3, [v * 128 for v in o + hxs], [v * 128 for v in oy + hys], [0, 5])])
    img, row = _grid(spark, df, 32)
    assert img[10, 10] == 1       # inside outer
    assert img[15, 15] == 0       # inside hole
    assert img[4, 4] == 0         # outside
    assert row.total_weight == 16 * 16 - 8 * 8


def test_rasterize_line_burn(spark):
    # horizontal segment across pixels (y=8) cols 4..27 at R=32
    df = _feat_rows(spark, [(2, [4 * 128, 27 * 128 + 64], [8 * 128 + 64] * 2,
                             [0])])
    img, row = _grid(spark, df, 32)
    assert img[8, 4:28].all() and img[8, :4].sum() == 0
    assert row.n_nonzero == 24


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batch_burn_equals_per_feature_reference(spark, seed):
    """The batch-global line/polygon/point burns must match the
    per-feature reference twins (_burn_points/_burn_lines/_fill_polygon)
    pixel-for-pixel on randomized mixed-geometry multi-tile batches —
    the polyclip batch==per-polygon equivalence pattern."""
    rng = np.random.default_rng(seed)
    RES = 48
    rows = []          # (z, x, y, extent, gt, xs, ys, po)
    for tx in range(3):
        for _ in range(rng.integers(1, 6)):
            gt = int(rng.integers(1, 4))
            if gt == 1:
                n = int(rng.integers(1, 4))
                xs = rng.integers(-100, 4200, n)
                ys = rng.integers(-100, 4200, n)
                po = [0]
            elif gt == 2:
                parts, po, off = [], [], 0
                for _ in range(rng.integers(1, 3)):
                    n = int(rng.integers(2, 6))
                    po.append(off)
                    parts.append(rng.integers(-200, 4300, (n, 2)))
                    off += n
                v = np.concatenate(parts)
                xs, ys = v[:, 0], v[:, 1]
            else:
                rings, po, off = [], [], 0
                for _ in range(rng.integers(1, 3)):
                    cx, cy = rng.integers(200, 3800, 2)
                    w, h = rng.integers(60, 1200, 2)
                    ring = np.array([(cx, cy), (cx, cy + h),
                                     (cx + w, cy + h), (cx + w, cy),
                                     (cx, cy)])
                    po.append(off)
                    rings.append(ring)
                    off += len(ring)
                v = np.concatenate(rings)
                xs, ys = v[:, 0], v[:, 1]
            rows.append((8, tx, 2, 4096, gt,
                         [int(v) for v in xs], [int(v) for v in ys],
                         [int(p) for p in po]))
    df = spark.createDataFrame(
        rows, "z int, x long, y long, extent int, geom_type tinyint, "
              "xs array<long>, ys array<long>, part_offsets array<int>")
    got = {(r.x): r for r in R.rasterize_tiles(df, resolution=RES).collect()}

    # per-feature reference accumulation
    want = {}
    for (z, x, y, ext, gt, xs, ys, po) in rows:
        acc = want.setdefault(x, np.zeros((RES, RES), np.int64))
        vx = np.array(xs, np.int64)
        vy = np.array(ys, np.int64)
        starts = np.concatenate([np.array(po, np.int64), [len(vx)]])
        if gt == 1:
            R._burn_points(acc, vx, vy, RES, ext)
        elif gt == 2:
            R._burn_lines(acc, vx, vy, starts, RES, ext)
        else:
            R._fill_polygon(acc, vx, vy, starts, RES, ext)
    assert set(got) == set(want)
    from vtcomposite_spark.operators.multimodal import decode_pnm as dec
    for x, acc in want.items():
        w, h, c, px = dec(bytes(got[x].raster))
        assert (px.reshape(RES, RES)
                == np.minimum(acc, 255).astype(np.uint8)).all(), x
        assert got[x].total_weight == int(acc.sum())
        assert got[x].n_nonzero == int((acc > 0).sum())


def test_raster_to_points_exact_inverse(spark):
    df = _feat_rows(spark, [(1, [i * 64 + 1] , [i * 128 + 3], [0])
                            for i in range(20)])
    ras = R.rasterize_tiles(df, resolution=64)
    pts = {(r.px, r.py): r.value for r in R.raster_to_points(ras).collect()}
    want = {}
    for i in range(20):
        k = ((i * 64 + 1) * 64 // 4096, (i * 128 + 3) * 64 // 4096)
        want[k] = want.get(k, 0) + 1
    assert pts == want


def test_contours_roundtrip_to_mvt(spark):
    """raster → vector → TILE: contour the filled-rectangle raster,
    feed the polylines through the encode sink, decode, and find the
    ring back in tile coordinates."""
    from vtcomposite_spark.operators import composite as C
    from vtcomposite_spark.sources import mvt

    o = [8, 24, 24, 8, 8]
    oy = [8, 8, 24, 24, 8]
    df = _feat_rows(spark, [(3, [v * 128 for v in o],
                             [v * 128 for v in oy], [0])])
    ras = R.rasterize_tiles(df, resolution=32)
    cont = R.raster_contours(ras, level=1, scale_to_extent=4096)
    rows = cont.collect()
    assert len(rows) == 1 and rows[0].closed
    feats = cont.select(
        F.lit(0).alias("tile_idx"), "z", "x", "y",
        F.lit("contours").alias("layer"), F.lit(2).alias("layer_version"),
        F.lit(4096).alias("extent"),
        F.col("contour_idx").alias("feature_idx"),
        F.lit(None).cast("long").alias("feature_id"),
        F.lit(2).cast("byte").alias("geom_type"),
        F.transform("xs", lambda v: F.round(v).cast("long")).alias("xs"),
        F.transform("ys", lambda v: F.round(v).cast("long")).alias("ys"),
        F.array(F.lit(0)).alias("part_offsets"),
        F.array(F.lit(0).cast("byte")).alias("ring_types"),
        F.create_map(F.lit("level"), F.lit("1")).alias("properties"),
        F.lit(False).alias("compress"))
    tiles = C.encode_tiles(feats).collect()
    assert len(tiles) == 1
    dec = mvt.decode_tile(bytes(tiles[0].tile))
    f = dec[0].features[0]
    assert f.geom_type == 2
    xs = [p[0] for p in f.parts[0]]
    ys = [p[1] for p in f.parts[0]]
    # the ring hugs the rectangle boundary (pixels 8..23 at 128/px,
    # contour at half-pixel offsets): all vertices within one pixel of it
    assert min(xs) >= 8 * 128 - 128 and max(xs) <= 24 * 128 + 128
    assert min(ys) >= 8 * 128 - 128 and max(ys) <= 24 * 128 + 128
    assert f.parts[0][0] == f.parts[0][-1]  # closed


def test_contour_shapes_unit():
    img = np.zeros((12, 12), np.uint8)
    img[2:9, 2:9] = 3
    img[4:7, 4:7] = 0
    rings = R._contour_tile(img, 1)
    assert sorted(c for _, _, c in rings) == [True, True]  # outer + hole
    assert R._contour_tile(np.zeros((4, 4), np.uint8), 1) == []


def test_contour_batch_equals_per_cell_reference():
    """Round-5: the vectorized case-table emission (_contour_tile_batch,
    what raster_contours runs) must reproduce the per-cell reference twin
    EXACTLY — chain point lists, order, closed flags (coordinates are 0.5
    multiples, so float == is exact). Random noise maximizes saddle
    density; the checkerboard is all-saddles."""
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 3, (int(rng.integers(3, 40)),
                                int(rng.integers(3, 40)))).astype(np.uint8)
            for _ in range(8)]
    hole = np.zeros((12, 12), np.uint8)
    hole[2:9, 2:9] = 3
    hole[4:7, 4:7] = 0
    imgs += [hole, np.zeros((4, 4), np.uint8), np.full((6, 6), 9, np.uint8),
             (np.indices((16, 16)).sum(0) % 2).astype(np.uint8)]
    for img in imgs:
        for level in (1, 2):
            assert R._contour_tile_batch(img, level) == \
                R._contour_tile(img, level)
