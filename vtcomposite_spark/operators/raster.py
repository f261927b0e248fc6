"""Raster↔vector conversion over tiles — the north rule's fourth spatial
primitive (BASELINE.json: "H3/S2 index, point-in-polygon, kNN,
raster↔vector").

Vector→raster: per output tile, burn composite-output features onto an
R×R pixel grid — points scatter counts, linestrings burn every pixel the
segment passes at unit steps, polygons fill by even-odd scanline (holes
carve naturally, same parity rule as the PIP kernel). The raster payload
is a real netpbm PGM (operators.multimodal codecs), counts clipped to
uint8.

Raster→vector: ``raster_to_points`` explodes nonzero pixels back to
(px, py, value) rows — the exact inverse for point rasters, which makes
the round trip SQL-replayable and oracle-gated; ``raster_contours`` runs
marching squares on a level threshold and emits stitched polyline
features in TILE coordinates, ready to flow back into the composite →
encode sinks (raster → vector → MVT end-to-end).

Kernels run over packed-per-tile Arrow batches (the encode sinks'
`_pack_tiles` pattern). The all-points case — the planet shape, since
geotagged pages ARE points — vectorizes to ONE flat bincount across the
whole batch with zero per-feature python; line burns and polygon scanline
fills iterate features in python (per-segment / per-scanline logic), so
dense line/polygon layers rasterize at interpreter speed — extend with a
vectorized edge-table fill if that ever becomes a hot path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .composite import _TILE_LEVEL_COLS, _pack_tiles, _unpack_batch
from .multimodal import decode_pnm, encode_pgm

RASTER_SCHEMA = T.StructType([
    T.StructField("z", T.IntegerType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("resolution", T.IntegerType()),
    T.StructField("raster", T.BinaryType()),   # netpbm P5, counts clipped
    T.StructField("n_nonzero", T.LongType()),
    T.StructField("total_weight", T.LongType()),
])


def _burn_points(acc, pxs, pys, R, extent):
    px = (pxs * R) // extent
    py = (pys * R) // extent
    ok = (px >= 0) & (px < R) & (py >= 0) & (py < R)
    np.add.at(acc, (py[ok], px[ok]), 1)


def _burn_lines(acc, vx, vy, starts, R, extent):
    """Unit-step sampling along each part's segments; consecutive
    duplicate pixels collapse so a segment adds ≤1 per pixel crossed."""
    for s, e in zip(starts[:-1], starts[1:]):
        if e - s < 2:
            continue
        xs = vx[s:e] * R / extent
        ys = vy[s:e] * R / extent
        pts = []
        for i in range(len(xs) - 1):
            n = int(max(abs(xs[i + 1] - xs[i]), abs(ys[i + 1] - ys[i]))) + 1
            t = np.linspace(0.0, 1.0, n + 1)
            pts.append(np.stack([xs[i] + t * (xs[i + 1] - xs[i]),
                                 ys[i] + t * (ys[i + 1] - ys[i])], axis=1))
        p = np.concatenate(pts)
        pix = np.floor(p).astype(np.int64)
        keep = np.ones(len(pix), bool)
        keep[1:] = (pix[1:] != pix[:-1]).any(axis=1)
        pix = pix[keep]
        ok = (pix[:, 0] >= 0) & (pix[:, 0] < R) \
            & (pix[:, 1] >= 0) & (pix[:, 1] < R)
        np.add.at(acc, (pix[ok, 1], pix[ok, 0]), 1)


def _fill_polygon(acc, vx, vy, starts, R, extent):
    """Even-odd scanline fill over ALL rings of one feature (holes carve
    by parity). Pixel centers sample at (c + 0.5) in pixel space."""
    sx = vx * R / extent
    sy = vy * R / extent
    xints: dict[int, list] = {}
    for s, e in zip(starts[:-1], starts[1:]):
        rx, ry = sx[s:e], sy[s:e]
        for i in range(len(rx) - 1):
            y0, y1 = ry[i], ry[i + 1]
            if y0 == y1:
                continue
            lo, hi = (y0, y1) if y0 < y1 else (y1, y0)
            r0 = max(0, int(np.ceil(lo - 0.5)))
            r1 = min(R - 1, int(np.floor(hi - 0.5 - 1e-12)))
            for r in range(r0, r1 + 1):
                yc = r + 0.5
                if (y0 > yc) != (y1 > yc):
                    xi = rx[i] + (yc - y0) / (y1 - y0) * (rx[i + 1] - rx[i])
                    xints.setdefault(r, []).append(xi)
    for r, xs in xints.items():
        xs.sort()
        for a, b in zip(xs[0::2], xs[1::2]):
            c0 = max(0, int(np.ceil(a - 0.5)))
            c1 = min(R - 1, int(np.floor(b - 0.5)))
            if c1 >= c0:
                acc[r, c0:c1 + 1] += 1


def rasterize_tiles(composited: DataFrame, resolution: int = 256) -> DataFrame:
    """Composite-output feature rows → one R×R count raster per (z, x, y).

    Same packed one-row-per-tile seam as the encode sinks; the kernel
    burns the whole batch's tiles. Counts clip to uint8 in the PGM
    payload (the full weights survive in ``total_weight``).
    """
    import pyarrow as pa

    R = int(resolution)
    # manual projection BEFORE the seam (column pruning doesn't cross
    # mapInArrow): the kernel reads geometry + 2 scalars, never the
    # property/tag maps a composite-output row carries
    need = ["z", "x", "y", "extent", "geom_type", "xs", "ys", "part_offsets"]
    packed = _pack_tiles(composited.select(*need))
    tile_cols = [c for c in _TILE_LEVEL_COLS if c in packed.columns]

    def kernel(it):
        for batch in it:
            if batch.num_rows == 0:
                continue
            cols, total = _unpack_batch(batch, tile_cols)
            if total == 0:
                continue
            xs = cols["xs"]
            xo = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            xv = xs.values.to_numpy(zero_copy_only=False).astype(np.int64)
            ys = cols["ys"]
            yv = ys.values.to_numpy(zero_copy_only=False).astype(np.int64)
            po = cols["part_offsets"]
            poo = po.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            pov = po.values.to_numpy(zero_copy_only=False).astype(np.int64)
            gt = cols["geom_type"].to_numpy(zero_copy_only=False)
            ext = cols["extent"].to_numpy(zero_copy_only=False).astype(np.int64)
            zc = cols["z"].to_numpy(zero_copy_only=False)
            xc = cols["x"].to_numpy(zero_copy_only=False)
            yc = cols["y"].to_numpy(zero_copy_only=False)

            fl = batch.column("feats")
            foff = fl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            foff = foff - foff[0]
            out = {"z": [], "x": [], "y": [], "resolution": [],
                   "raster": [], "n_nonzero": [], "total_weight": []}

            if bool((gt == 1).all()) \
                    and batch.num_rows * R * R <= (1 << 24):
                # all-points fast path (the planet shape — geotagged pages
                # ARE points): ONE flat bincount over (tile, py, px) for
                # the whole batch, zero per-feature python
                nb = batch.num_rows
                base = int(xo[0])
                xs_flat = xv[base:int(xo[-1])]
                ys_flat = yv[base:int(xo[-1])]
                vcount = np.diff(xo)
                feat_tile = np.repeat(np.arange(nb, dtype=np.int64),
                                      np.diff(foff))
                vt = np.repeat(feat_tile, vcount)
                ve = np.repeat(ext, vcount)
                ppx = (xs_flat * R) // ve
                ppy = (ys_flat * R) // ve
                ok = (ppx >= 0) & (ppx < R) & (ppy >= 0) & (ppy < R)
                lin = (vt[ok] * R + ppy[ok]) * R + ppx[ok]
                counts = np.bincount(lin, minlength=nb * R * R) \
                    .reshape(nb, R, R)
                for t in range(nb):
                    if foff[t] == foff[t + 1]:
                        continue
                    acc = counts[t]
                    f0 = int(foff[t])
                    out["z"].append(int(zc[f0]))
                    out["x"].append(int(xc[f0]))
                    out["y"].append(int(yc[f0]))
                    out["resolution"].append(R)
                    out["raster"].append(
                        encode_pgm(np.minimum(acc, 255).astype(np.uint8)))
                    out["n_nonzero"].append(int((acc > 0).sum()))
                    out["total_weight"].append(int(acc.sum()))
                if out["z"]:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(out["z"], pa.int32()),
                         pa.array(out["x"], pa.int64()),
                         pa.array(out["y"], pa.int64()),
                         pa.array(out["resolution"], pa.int32()),
                         pa.array(out["raster"], pa.binary()),
                         pa.array(out["n_nonzero"], pa.int64()),
                         pa.array(out["total_weight"], pa.int64())],
                        names=[f.name for f in RASTER_SCHEMA.fields])
                continue

            for t in range(batch.num_rows):
                f0, f1 = int(foff[t]), int(foff[t + 1])
                if f0 == f1:
                    continue
                acc = np.zeros((R, R), np.int64)
                for fi in range(f0, f1):
                    v0, v1 = int(xo[fi]), int(xo[fi + 1])
                    rel = pov[poo[fi]:poo[fi + 1]]
                    starts = np.concatenate([rel + v0, [v1]])
                    if gt[fi] == 1:
                        _burn_points(acc, xv[v0:v1], yv[v0:v1], R, int(ext[fi]))
                    elif gt[fi] == 2:
                        _burn_lines(acc, xv, yv, starts, R, int(ext[fi]))
                    else:
                        _fill_polygon(acc, xv, yv, starts, R, int(ext[fi]))
                out["z"].append(int(zc[f0]))
                out["x"].append(int(xc[f0]))
                out["y"].append(int(yc[f0]))
                out["resolution"].append(R)
                out["raster"].append(
                    encode_pgm(np.minimum(acc, 255).astype(np.uint8)))
                out["n_nonzero"].append(int((acc > 0).sum()))
                out["total_weight"].append(int(acc.sum()))
            if out["z"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out["z"], pa.int32()),
                     pa.array(out["x"], pa.int64()),
                     pa.array(out["y"], pa.int64()),
                     pa.array(out["resolution"], pa.int32()),
                     pa.array(out["raster"], pa.binary()),
                     pa.array(out["n_nonzero"], pa.int64()),
                     pa.array(out["total_weight"], pa.int64())],
                    names=[f.name for f in RASTER_SCHEMA.fields])

    return packed.mapInArrow(kernel, schema=RASTER_SCHEMA)


POINTS_SCHEMA = T.StructType([
    T.StructField("z", T.IntegerType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("px", T.IntegerType()),
    T.StructField("py", T.IntegerType()),
    T.StructField("value", T.IntegerType()),
])


def raster_to_points(rasters: DataFrame) -> DataFrame:
    """Raster→vector, exact inverse for count rasters: one row per nonzero
    pixel. For POINT rasterizations the round trip is lossless (≤255
    points per pixel), which is what the SQL oracle replays."""

    def kernel(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            zs, xs, ys, pxs, pys, vals = [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                w, h, c, px = decode_pnm(bytes(row.raster))
                img = px.reshape(h, w)
                ry, rx = np.nonzero(img)
                n = len(ry)
                zs.append(np.full(n, row.z, np.int32))
                xs.append(np.full(n, row.x, np.int64))
                ys.append(np.full(n, row.y, np.int64))
                pxs.append(rx.astype(np.int32))
                pys.append(ry.astype(np.int32))
                vals.append(img[ry, rx].astype(np.int32))
            if not zs:
                yield pd.DataFrame({f.name: [] for f in POINTS_SCHEMA.fields})
                continue
            yield pd.DataFrame({
                "z": np.concatenate(zs), "x": np.concatenate(xs),
                "y": np.concatenate(ys), "px": np.concatenate(pxs),
                "py": np.concatenate(pys), "value": np.concatenate(vals)})

    return rasters.select("z", "x", "y", "raster").mapInPandas(
        kernel, schema=POINTS_SCHEMA)


CONTOUR_SCHEMA = T.StructType([
    T.StructField("z", T.IntegerType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("contour_idx", T.IntegerType()),
    T.StructField("closed", T.BooleanType()),
    T.StructField("xs", T.ArrayType(T.DoubleType())),
    T.StructField("ys", T.ArrayType(T.DoubleType())),
])


_MS_SEGMENTS = {
    # marching-squares case table: corner bits (tl=8, tr=4, br=2, bl=1) →
    # DIRECTED segments (edge_from, edge_to); edges: 0=top 1=right
    # 2=bottom 3=left. Directions are CONSISTENTLY wound (inside kept on
    # one side), so adjacent cells' segments chain head-to-tail and
    # closed regions stitch into closed rings. Saddles (5, 10) resolve to
    # the two-corner separation.
    1: [(2, 3)], 2: [(1, 2)], 3: [(1, 3)], 4: [(0, 1)],
    5: [(0, 3), (2, 1)], 6: [(0, 2)], 7: [(0, 3)],
    8: [(3, 0)], 9: [(2, 0)], 10: [(3, 2), (1, 0)],
    11: [(1, 0)], 12: [(3, 1)], 13: [(2, 1)], 14: [(3, 2)],
}


def _edge_point(cy, cx, edge):
    if edge == 0:
        return (cx + 0.5, cy)
    if edge == 1:
        return (cx + 1.0, cy + 0.5)
    if edge == 2:
        return (cx + 0.5, cy + 1.0)
    return (cx, cy + 0.5)


def _contour_tile(img: np.ndarray, level: int):
    """Marching squares over the padded binary mask → stitched polylines
    in PIXEL-CORNER coordinates (deterministic order)."""
    b = np.pad(img >= level, 1).astype(np.int8)
    tl = b[:-1, :-1]
    tr = b[:-1, 1:]
    br = b[1:, 1:]
    bl = b[1:, :-1]
    case = tl * 8 + tr * 4 + br * 2 + bl * 1
    segs = []
    ys_, xs_ = np.nonzero((case > 0) & (case < 15))
    for cy, cx in zip(ys_.tolist(), xs_.tolist()):
        for e_in, e_out in _MS_SEGMENTS[case[cy, cx]]:
            segs.append((_edge_point(cy, cx, e_in),
                         _edge_point(cy, cx, e_out)))
    # stitch: consistent winding means every chain continues at the
    # unique unconsumed segment starting where the last one ended
    nxt: dict = {}
    for a, bpt in segs:
        nxt.setdefault(a, []).append(bpt)
    chains = []
    for a0, _ in sorted(segs):
        if not nxt.get(a0):
            continue
        chain = [a0, nxt[a0].pop()]
        while nxt.get(chain[-1]) and chain[-1] != a0:
            chain.append(nxt[chain[-1]].pop())
        chains.append((chain, chain[0] == chain[-1]))
    # -1: un-pad back to pixel coordinates
    return [([p[0] - 1 for p in c], [p[1] - 1 for p in c], closed)
            for c, closed in chains]


def raster_contours(rasters: DataFrame, level: int = 1,
                    scale_to_extent: int | None = 4096) -> DataFrame:
    """Raster→vector: marching-squares iso-contours at ``level`` over each
    tile's raster, stitched into polylines. ``scale_to_extent`` maps pixel
    corners back to tile coordinates so the output can flow into the
    composite/encode sinks (raster → vector → MVT)."""

    def kernel(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = {f.name: [] for f in CONTOUR_SCHEMA.fields}
            for row in pdf.itertuples(index=False):
                w, h, c, px = decode_pnm(bytes(row.raster))
                img = px.reshape(h, w)
                # per-axis scale: a non-square raster maps each axis to the
                # full extent independently
                sx = (scale_to_extent / w) if scale_to_extent else 1.0
                sy = (scale_to_extent / h) if scale_to_extent else 1.0
                for i, (cxs, cys, closed) in enumerate(
                        _contour_tile(img, level)):
                    out["z"].append(row.z)
                    out["x"].append(row.x)
                    out["y"].append(row.y)
                    out["contour_idx"].append(i)
                    out["closed"].append(closed)
                    out["xs"].append([v * sx for v in cxs])
                    out["ys"].append([v * sy for v in cys])
            yield pd.DataFrame(out)

    return rasters.select("z", "x", "y", "raster").mapInPandas(
        kernel, schema=CONTOUR_SCHEMA)
