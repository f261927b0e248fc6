"""Spatial joins (J2/J3): point-in-polygon and kNN over the cell grid.

The reference has no relational joins; these are the graft operators the
north rule adds (geotagged pages → tile/region polygons / POIs). Both use
the classic filter-refine pattern over the packed z/x/y cell grid
(PAPERS.md: PBSM-style partition-based spatial join):

* **pip_join** — polygons explode to their covering cells at an index zoom
  (coarse filter, pure column math); candidates come from a cell equi-join
  (shuffle on cell id — AQE skew-join handles hot cells, or pre-salt via
  plans.skew); the exact ray-cast refine runs vectorized in ONE Arrow
  crossing.
* **knn_join** — candidate generation from the 3×3 neighbor-cell
  neighborhood (grid method, scale path) or a broadcast cross join (brute
  method, exact baseline / oracle); top-k via row_number over (distance,
  site_id).

Distance is squared equirectangular-scaled degrees (dlon·cos(lat))² + dlat²
— monotone in true distance at city scale and expressible in ANSI SQL so
DuckDB oracles can replay the ranking exactly.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import geometry as geo
from .. import tilemath as tm
from .cells import encode_cells

_I64 = np.int64


# ---------------------------------------------------------------------------
# point-in-polygon
# ---------------------------------------------------------------------------

def cover_cells(polys: DataFrame, zoom: int,
                xs_col: str = "xs", ys_col: str = "ys") -> DataFrame:
    """Explode each polygon to the cells covering its bbox at ``zoom``.

    Pure column math (bbox → tile range → sequence cross product). The
    refine step removes false positives, so bbox covering is sufficient
    and keeps the build side JVM-only.
    """
    lon_min = F.array_min(xs_col)
    lon_max = F.array_max(xs_col)
    lat_min = F.array_min(ys_col)
    lat_max = F.array_max(ys_col)
    x0, y0 = tm.tile_xy_cols(lon_min, lat_max, zoom)  # y grows southward
    x1, y1 = tm.tile_xy_cols(lon_max, lat_min, zoom)
    return (
        polys
        .withColumn("_cx", F.explode(F.sequence(x0, x1)))
        .withColumn("_cy", F.explode(F.sequence(y0, y1)))
        .withColumn("cell", tm.pack_cell_col(F.lit(zoom), F.col("_cx"), F.col("_cy")))
        .drop("_cx", "_cy")
    )


def _pip_refine(it: Iterator[pa.RecordBatch], out_schema: pa.Schema):
    """Vectorized even-odd ray cast: candidate rows carry (lon, lat) and the
    polygon's packed rings (closed, lon/lat degrees)."""
    for batch in it:
        if batch.num_rows == 0:
            continue
        px = batch.column("lon").to_numpy(zero_copy_only=False)
        py = batch.column("lat").to_numpy(zero_copy_only=False)
        xs = batch.column("poly_xs")
        ys = batch.column("poly_ys")
        off = xs.offsets.to_numpy(zero_copy_only=False).astype(_I64)
        vx = xs.values.to_numpy(zero_copy_only=False)
        vy = ys.values.to_numpy(zero_copy_only=False)
        po = batch.column("poly_offsets")
        pooff = po.offsets.to_numpy(zero_copy_only=False).astype(_I64)
        povals = po.values.to_numpy(zero_copy_only=False).astype(_I64)

        n = batch.num_rows
        vcounts = np.diff(off)
        vrow = np.repeat(np.arange(n, dtype=_I64), vcounts)
        # ring starts, absolute
        prow = np.repeat(np.arange(n, dtype=_I64), np.diff(pooff))
        ring_start_abs = povals + off[prow]
        # edges: vertex i -> i+1 within the same ring; rings are closed, so
        # skip the edge that would leave the ring (last vertex of each ring)
        total_v = len(vx)
        is_edge = np.ones(total_v, bool)
        if total_v:
            is_edge[-1] = False
        # the last vertex of each ring = next ring's start - 1
        all_starts = np.concatenate([ring_start_abs, [total_v]])
        is_edge[all_starts[1:] - 1] = False

        ei = np.nonzero(is_edge)[0]
        x0, y0 = vx[ei], vy[ei]
        x1, y1 = vx[ei + 1], vy[ei + 1]
        erow = vrow[ei]
        ppx, ppy = px[erow], py[erow]
        cond = (y0 > ppy) != (y1 > ppy)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0 + (ppy - y0) / (y1 - y0) * (x1 - x0)
        cross = cond & (ppx < xint)
        crossings = np.bincount(erow[cross], minlength=n)
        inside = (crossings % 2) == 1

        keep = pa.array(inside)
        out = batch.filter(keep)
        yield pa.RecordBatch.from_arrays(
            [out.column(name) for name in out_schema.names], schema=out_schema)


def pip_join(points: DataFrame, polys: DataFrame, zoom: int = 8,
             point_cols: list[str] | None = None,
             poly_id_col: str = "poly_id") -> DataFrame:
    """J2: points (lat, lon) ⋈ polygons (poly_id, xs, ys, part_offsets).

    Polygon rings are CLOSED lon/lat arrays; multi-ring polygons (holes) use
    ``part_offsets`` (even-odd rule handles holes without ring types).
    Returns point columns + ``poly_id``.
    """
    point_cols = point_cols or [c for c in points.columns]
    pts = encode_cells(points, zoom).filter(F.col("cell").isNotNull())
    pol = cover_cells(polys, zoom).select(
        F.col(poly_id_col).alias("poly_id"),
        F.col("xs").alias("poly_xs"), F.col("ys").alias("poly_ys"),
        F.col("part_offsets").alias("poly_offsets"), "cell")
    cand = pts.join(pol, on="cell", how="inner")

    out_cols = [*point_cols, "poly_id"]
    out_spark = T.StructType(
        [cand.schema[c] for c in out_cols])
    from pyspark.sql.pandas.types import to_arrow_type
    out_arrow = pa.schema([pa.field(f.name, to_arrow_type(f.dataType))
                           for f in out_spark.fields])
    keep = [*out_cols, "lat", "lon", "poly_xs", "poly_ys", "poly_offsets"]
    seen = []
    for c in keep:
        if c not in seen:
            seen.append(c)
    return cand.select(*seen).mapInArrow(
        lambda it: _pip_refine(it, out_arrow), schema=out_spark)


# ---------------------------------------------------------------------------
# kNN
# ---------------------------------------------------------------------------

def _sq_dist(lat_a, lon_a, lat_b, lon_b):
    """Squared equirectangular-degree distance (ANSI-SQL-replayable)."""
    dlat = lat_a - lat_b
    dlon = (lon_a - lon_b) * F.cos(F.radians((lat_a + lat_b) / 2))
    return dlat * dlat + dlon * dlon


def knn_join(points: DataFrame, sites: DataFrame, k: int,
             point_id_col: str = "url", site_id_col: str = "site_id",
             method: str = "grid", zoom: int = 6) -> DataFrame:
    """J3: for each point, its k nearest sites.

    ``brute``: broadcast cross join — exact; right when sites is small
    (POI dictionaries). ``grid``: candidates from the site's 3×3
    neighbor-cell neighborhood at ``zoom`` — the scale path; exact whenever
    the true k-th neighbor lies within one cell width (pick ``zoom`` so a
    cell ≳ the max kNN radius).
    """
    s = sites.select(
        F.col(site_id_col).alias("site_id"),
        F.col("lat").alias("site_lat"), F.col("lon").alias("site_lon"))
    if method == "brute":
        cand = points.crossJoin(F.broadcast(s))
    else:
        pts = encode_cells(points, zoom).filter(F.col("cell").isNotNull())
        n_cells = 1 << zoom
        sc = encode_cells(
            s.withColumnRenamed("site_lat", "lat").withColumnRenamed("site_lon", "lon"),
            zoom)
        sc = (
            sc.withColumn("_ox", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
            .withColumn("_oy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
            .withColumn("_nx", F.pmod(F.col("tile_x") + F.col("_ox"), F.lit(n_cells)))
            .withColumn("_ny", F.col("tile_y") + F.col("_oy"))
            .filter((F.col("_ny") >= 0) & (F.col("_ny") < n_cells))
            .select(F.col("site_id"), F.col("lat").alias("site_lat"),
                    F.col("lon").alias("site_lon"),
                    tm.pack_cell_col(F.lit(zoom), F.col("_nx"), F.col("_ny")).alias("cell"))
        )
        cand = pts.join(F.broadcast(sc), on="cell", how="inner")

    cand = cand.withColumn(
        "dist_sq", _sq_dist(F.col("lat"), F.col("lon"),
                            F.col("site_lat"), F.col("site_lon")))
    w = Window.partitionBy(point_id_col).orderBy(F.col("dist_sq").asc(),
                                                 F.col("site_id").asc())
    return (
        cand.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .drop("cell", "tile_x", "tile_y", "site_lat", "site_lon")
    )
