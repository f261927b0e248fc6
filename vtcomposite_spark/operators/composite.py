"""The composite operator — vtcomposite's flagship, re-expressed Spark-first.

Reference lifecycle (src/vtcomposite.cpp:205-323): for one target tile, fold N
source tiles — ancestry check, layer keep-list, first-wins layer dedupe,
overzoom affine + box clip, serialize. Here the same semantics run as one
declarative plan over a *features* DataFrame (one row per feature) and a
*targets* DataFrame (one row per requested output tile):

1. **Ancestor equi-join (J1)** — each target explodes into its ancestor tile
   addresses (≤ z+1 rows); the join with features is a plain equi-join on
   (src_z, src_x, src_y), so Catalyst broadcasts the (small) target side and
   the big features scan never shuffles. This replaces the reference's
   ``within_target`` per-tile check (src/zxy_math.hpp:8-17).
2. **Layer keep-list (P2)** — `array_contains` filter
   (src/vtcomposite.cpp:246-249; empty list ⇒ keep all).
3. **First-wins layer dedupe (A2/J5)** — `min(tile_idx) over (partition by
   target, layer)`; the earliest input tile contributing a layer name wins
   (src/vtcomposite.cpp:210,243-251). Runs BEFORE the geometry kernel so
   dropped layers never pay transform cost (the reference's same
   optimization).
4. **Overzoom + clip kernel (F1-F7)** — same-zoom rows bypass untouched (the
   reference's ``add_existing_layer`` fast path, src/vtcomposite.cpp:253-256);
   overzoomed rows cross to Python ONCE as Arrow batches and run the
   vectorized numpy kernels from ``vtcomposite_spark.geometry``.
5. **Encode sink (S3/S4)** — optional ``groupBy(z,x,y).applyInPandas`` that
   rebuilds MVT buffers (deterministic order: tile_idx, first-seen layer,
   feature_idx) and applies the empty-tile gzip rule.

Scale notes (100 TB): with request-scale targets the only exchange in 1-4
is the broadcast of targets and the features scan streams map-side; with a
planet-scale target set (a full z14 pyramid won't broadcast) the same plan
degrades gracefully to shuffle joins — sizing is AQE's runtime decision,
not a hard-coded hint (``join_strategy``/``winners_join`` params force it
when plan-time certainty is wanted). The encode sink groups by (z,x,y) —
hot tiles there are handled by AQE + the salting helpers in
``vtcomposite_spark.plans.skew``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import geometry as geo
from .. import polyclip

_I64 = np.int64


class CompositeRequestError(ValueError):
    """Raised for the reference's hard ancestry error
    (src/vtcomposite.cpp:283-291)."""


def validate_request(tiles: list[tuple[int, int, int]], z: int, x: int, y: int) -> None:
    """Exact-error-string ancestry validation (src/vtcomposite.cpp:283-291,
    tests test/vtcomposite.test.js:105-177)."""
    for (sz, sx, sy) in tiles:
        ok = sz <= z and (x >> (z - sz)) == sx and (y >> (z - sz)) == sy
        if not ok:
            raise CompositeRequestError(
                f"Invalid tile composite request: SOURCE({sz},{sx},{sy})"
                f" TARGET({z},{x},{y})")


def ancestor_join(features: DataFrame, targets: DataFrame,
                  strategy: str = "auto",
                  src_zooms: list[int] | None = None) -> DataFrame:
    """J1: assign each source feature to every requested descendant target.

    Targets explode to (src_z, ancestor_x, ancestor_y) keys — a plain
    equi-join; no theta-join, no per-tile predicate.

    ``strategy`` picks the physical join:

    * ``"auto"`` (default, the 100-TB-safe path): no hint. Catalyst
      broadcasts small target sets at plan time; for big ones AQE reads the
      exploded side's real shuffle size at runtime and either converts to
      broadcast or keeps a shuffle join. A planet-scale target set (full
      z14 pyramid ≈ 3.6×10⁸ tiles, ×15 ancestors exploded) shuffle-joins
      instead of OOMing the driver on a forced broadcast.
    * ``"broadcast"``: force the hint — right for request-API calls where
      targets are a handful of rows and plan-time certainty beats stats.

    ``src_zooms``: when the feature table's zoom levels are known (e.g. a
    single-zoom tileset), explode targets only over those levels instead of
    0..z — shrinks the join's build side by z/len(src_zooms)×.
    """
    if src_zooms is not None:
        zs = F.array(*[F.lit(int(z)) for z in sorted(set(src_zooms))])
        src_z = F.explode(F.filter(zs, lambda z: z <= F.col("z")))
    else:
        src_z = F.explode(F.sequence(F.lit(0), F.col("z")))
    t = (
        targets
        .withColumn("src_z", src_z)
        .withColumn("src_x", F.call_function("shiftright", F.col("x"), F.col("z") - F.col("src_z")).cast("long"))
        .withColumn("src_y", F.call_function("shiftright", F.col("y"), F.col("z") - F.col("src_z")).cast("long"))
    )
    if strategy == "broadcast":
        t = F.broadcast(t)
    return features.join(t, on=["src_z", "src_x", "src_y"], how="inner")


def apply_keep_layers(df: DataFrame) -> DataFrame:
    """P2: layer keep-list; null/empty keeps all (src/vtcomposite.cpp:246-249)."""
    return df.filter(
        F.col("keep_layers").isNull()
        | (F.size("keep_layers") == 0)
        | F.array_contains("keep_layers", F.col("layer"))
    )


def first_wins(df: DataFrame, strategy: str = "agg",
               winners_join: str = "broadcast") -> DataFrame:
    """A2: first tile contributing a layer name wins, per target tile
    (src/vtcomposite.cpp:210,243-251; test/vtcomposite.test.js:50-71).

    ``agg`` (default): winners = groupBy(target, layer).min(tile_idx) —
    shuffles only the 5 key columns with map-side combine, then semi-joins
    back. ``window``: classic min-over-window; shuffles every column — only
    preferable when the winners table would rival the features table in
    size.

    ``winners_join`` sizes the semi-join. ``"broadcast"`` (default) forces
    the hint: winners are keys-only (one row per tile×layer), and the
    forced broadcast keeps the FULL-WIDTH features side shuffle-free.
    ``"auto"`` leaves it to AQE — scale-safe for planet-scale winner sets
    (>~100M tile×layer rows, where a forced broadcast OOMs the driver) but
    measurably slower below that: AQE's runtime conversion still pays the
    probe side's full-width shuffle WRITE before it can decide (measured
    2.3× on the lines-overzoom bench, 9.9s auto vs 4.3s broadcast at
    1000 tiles / 2M joined rows).
    """
    if strategy == "window":
        w = Window.partitionBy("z", "x", "y", "layer")
        return (
            df.withColumn("_min_tile", F.min("tile_idx").over(w))
            .filter(F.col("tile_idx") == F.col("_min_tile"))
            .drop("_min_tile")
        )
    winners = (
        df.groupBy("z", "x", "y", "layer")
        .agg(F.min("tile_idx").alias("tile_idx"))
    )
    if winners_join == "broadcast":
        winners = F.broadcast(winners)
    return df.join(winners, on=["z", "x", "y", "layer", "tile_idx"],
                   how="left_semi")


# ---------------------------------------------------------------------------
# the Arrow kernel: overzoom affine + clip, all three geometry types
# ---------------------------------------------------------------------------

_KERNEL_HELPER_COLS = ["dz", "disp_x", "disp_y"]


def _batch_to_packed(batch: pa.RecordBatch, rows: np.ndarray):
    """Packed arrays for the selected row subset of an Arrow batch."""
    xs = batch.column("xs")
    ys = batch.column("ys")
    po = batch.column("part_offsets")
    off = xs.offsets.to_numpy(zero_copy_only=False).astype(_I64)
    vx_all = xs.values.to_numpy(zero_copy_only=False).astype(_I64)
    vy_all = ys.values.to_numpy(zero_copy_only=False).astype(_I64)
    pooff = po.offsets.to_numpy(zero_copy_only=False).astype(_I64)
    povals = po.values.to_numpy(zero_copy_only=False).astype(_I64)

    # vertices of the selected rows, concatenated
    counts = off[rows + 1] - off[rows]
    vstart = np.concatenate([[0], np.cumsum(counts)]).astype(_I64)
    take = geo.multi_arange(off[rows], off[rows + 1])
    vx = vx_all[take] if len(take) else np.empty(0, _I64)
    vy = vy_all[take] if len(take) else np.empty(0, _I64)

    # parts: per-row relative starts -> absolute starts into vx
    pcounts = pooff[rows + 1] - pooff[rows]
    ptake = geo.multi_arange(pooff[rows], pooff[rows + 1])
    rel = povals[ptake] if len(ptake) else np.empty(0, _I64)
    part_row = np.repeat(np.arange(len(rows), dtype=_I64), pcounts)
    abs_start = rel + vstart[part_row]
    part_start = np.concatenate([abs_start, [vstart[-1]]]).astype(_I64)
    # abs_start is monotone because parts are stored in order per row
    return geo.PackedParts(vx, vy, part_start, part_row), pcounts


def _take_list_of(values: np.ndarray, offsets: np.ndarray, typ=pa.int64()):
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                    pa.array(values, typ))


def _emit_rows(batch: pa.RecordBatch, rows_sel: np.ndarray, out: geo.PackedParts,
               ring_types: np.ndarray, out_schema: pa.Schema) -> pa.RecordBatch | None:
    """Rebuild Arrow rows for surviving features.

    ``rows_sel``: original batch row index per kernel feature slot.
    ``out.part_feat`` indexes into kernel feature slots.
    """
    nslots = len(rows_sel)
    sizes = geo.part_sizes(out.part_start)
    vrow = np.repeat(out.part_feat, sizes)
    vcount = np.bincount(vrow, minlength=nslots) if len(vrow) else np.zeros(nslots, _I64)
    pcount = np.bincount(out.part_feat, minlength=nslots) if len(out.part_feat) else np.zeros(nslots, _I64)
    alive = pcount > 0
    if not alive.any():
        return None
    alive_slots = np.nonzero(alive)[0]
    orig_rows = rows_sel[alive_slots]

    v_off = np.concatenate([[0], np.cumsum(vcount[alive_slots])]).astype(_I64)
    p_off = np.concatenate([[0], np.cumsum(pcount[alive_slots])]).astype(_I64)
    # relative part offsets
    slot_vstart = np.concatenate([[0], np.cumsum(vcount)]).astype(_I64)
    rel_part = out.part_start[:-1] - slot_vstart[out.part_feat]

    arrays = []
    for name in out_schema.names:
        if name == "xs":
            arrays.append(_take_list_of(out.vx, v_off))
        elif name == "ys":
            arrays.append(_take_list_of(out.vy, v_off))
        elif name == "part_offsets":
            arrays.append(pa.ListArray.from_arrays(
                pa.array(p_off, pa.int32()), pa.array(rel_part, pa.int32())))
        elif name == "ring_types":
            arrays.append(pa.ListArray.from_arrays(
                pa.array(p_off, pa.int32()), pa.array(ring_types, pa.int8())))
        else:
            arrays.append(batch.column(name).take(pa.array(orig_rows, pa.int32())))
    return pa.RecordBatch.from_arrays(arrays, schema=out_schema)


def _overzoom_clip_batches(it: Iterator[pa.RecordBatch], out_schema: pa.Schema):
    for batch in it:
        if batch.num_rows == 0:
            continue
        gtype = batch.column("geom_type").to_numpy(zero_copy_only=False)
        dz = batch.column("dz").to_numpy(zero_copy_only=False).astype(_I64)

        # same-zoom fast path: raw pass-through, no clip
        # (reference add_existing_layer, src/vtcomposite.cpp:253-256)
        fast_mask = dz == 0
        if fast_mask.any():
            fast = batch.filter(pa.array(fast_mask))
            yield pa.RecordBatch.from_arrays(
                [fast.column(n) for n in out_schema.names], schema=out_schema)
            if fast_mask.all():
                continue
        dxc = batch.column("disp_x").to_numpy(zero_copy_only=False).astype(_I64)
        dyc = batch.column("disp_y").to_numpy(zero_copy_only=False).astype(_I64)
        extent = batch.column("extent").to_numpy(zero_copy_only=False).astype(_I64)
        # buffer_size can be NULL only on dz=0 rows (the JVM envelope
        # prune drops NULL-buffer dz>0 rows) and those take the fast path
        # above — but the COLUMN conversion is batch-wide, so a mixed
        # batch would read NaN into the int bounds without the fill
        buf = batch.column("buffer_size").fill_null(0).to_numpy(
            zero_copy_only=False).astype(_I64)
        zf = np.int64(1) << dz
        lo_all = -buf
        hi_all = extent + buf

        for gt in (1, 2, 3):
            rows = np.nonzero((gtype == gt) & ~fast_mask)[0].astype(_I64)
            if len(rows) == 0:
                continue
            g, pcounts = _batch_to_packed(batch, rows)
            g = geo.dedupe_consecutive(g)
            g = geo.affine(g, zf[rows], dxc[rows], dyc[rows])
            lo = lo_all[rows]
            hi = hi_all[rows]
            if gt == 1:
                out = geo.clip_points(g, lo, hi)
                rts = np.zeros(len(out.part_feat), np.int8)
            elif gt == 2:
                out = geo.clip_lines(g, lo, hi)
                rts = np.zeros(len(out.part_feat), np.int8)
            else:
                rt_col = batch.column("ring_types")
                rt_off = rt_col.offsets.to_numpy(zero_copy_only=False).astype(_I64)
                rt_vals = rt_col.values.to_numpy(zero_copy_only=False)
                rtake = geo.multi_arange(rt_off[rows], rt_off[rows + 1])
                in_rts = rt_vals[rtake].astype(np.int8) if len(rtake) else np.empty(0, np.int8)
                asm, kept_rt, poly = geo.assemble_polygons(g, in_rts, lo, hi)
                # exact polygon-overlay clip (boost parity): holes crossing
                # the window carve and can split the output polygons
                out, rts = polyclip.clip_polygons_packed(asm, kept_rt, poly, lo, hi)
            rb = _emit_rows(batch, rows, out, rts, out_schema)
            if rb is not None:
                yield rb


def _overzoom_prep(df: DataFrame) -> DataFrame:
    """dz + displacement columns and the JVM-side envelope prune, shared by
    the relational kernel (``overzoom_clip``), the fused sink
    (``composite_encode_tiles``) and the packed relational path
    (``composite_packed``).

    The envelope pre-filter is HOISTED out of the kernel into codegen: a
    feature whose scaled bbox misses the target clip window never crosses to
    Python. This is the reference's cheap-reject (src/feature_builder.hpp:
    232-238) applied where it pays most at scale — the ancestor join fans
    each feature out to several candidate targets, and this prunes the
    misses before the (allocation-heavy) Arrow conversion. Same-zoom rows
    (dz == 0) always survive — they are the raw-copy fast path.
    """
    df = (
        df.withColumn("dz", F.col("z") - F.col("src_z"))
        .withColumn(
            "disp_x",
            (F.col("x").bitwiseAND(F.call_function("shiftleft", F.lit(1).cast("long"), F.col("dz")) - 1)
             * F.col("extent")).cast("long"))
        .withColumn(
            "disp_y",
            (F.col("y").bitwiseAND(F.call_function("shiftleft", F.lit(1).cast("long"), F.col("dz")) - 1)
             * F.col("extent")).cast("long"))
    )
    zf = F.call_function("shiftleft", F.lit(1).cast("long"), F.col("dz"))
    bxmin = F.array_min("xs") * zf - F.col("disp_x")
    bxmax = F.array_max("xs") * zf - F.col("disp_x")
    bymin = F.array_min("ys") * zf - F.col("disp_y")
    bymax = F.array_max("ys") * zf - F.col("disp_y")
    blo = -F.col("buffer_size").cast("long")
    bhi = (F.col("extent") + F.col("buffer_size")).cast("long")
    return df.filter(
        (F.col("dz") == 0)
        | ((bxmax >= blo) & (bxmin <= bhi) & (bymax >= blo) & (bymin <= bhi))
    )


def overzoom_clip(df: DataFrame) -> DataFrame:
    """F1-F7: per-feature overzoom affine + clip as ONE Arrow crossing.

    Expects target-joined rows (columns z/x/y/buffer_size present). Same-zoom
    rows (dz == 0) pass through untouched *inside* the kernel — the
    reference's raw-copy fast path (src/vtcomposite.cpp:253-256): no clip is
    applied at same zoom. Keeping the fast path inside the single kernel
    (rather than a filter/union split) keeps the plan to ONE scan and ONE
    join — a union of filtered branches would re-execute the whole upstream
    subtree per branch, which at 100 TB doubles the dominant cost.
    """
    df = _overzoom_prep(df)

    out_fields = [f for f in df.schema.fields if f.name not in _KERNEL_HELPER_COLS]
    out_schema_spark = T.StructType(out_fields)
    out_schema_arrow = pa.schema([
        pa.field(f.name, _to_arrow(f.dataType)) for f in out_fields])

    return df.mapInArrow(
        lambda it: _overzoom_clip_batches(it, out_schema_arrow),
        schema=out_schema_spark,
    )


def _to_arrow(dt: T.DataType) -> pa.DataType:
    from pyspark.sql.pandas.types import to_arrow_type
    return to_arrow_type(dt)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def composite(features: DataFrame, targets: DataFrame,
              join_strategy: str = "auto",
              winners_join: str = "broadcast",
              src_zooms: list[int] | None | str = "auto") -> DataFrame:
    """Full composite pipeline, relational in/out.

    Output: one row per surviving feature keyed by target (z, x, y), with
    coordinates rewritten into the target tile's frame. Matches the
    reference's CompositeWorker::Execute semantics (src/vtcomposite.cpp:205-323)
    minus serialization (see ``encode_tiles``).

    ``src_zooms`` routes the physical plan exactly like
    ``composite_packed`` (the two entry points share ``_route_src_zooms``):
    ``"auto"`` (default) infers the feature zoom levels with one tiny
    column-pruned distinct scan (an eager job at call time) and routes the
    SOURCE-GROUPED plan — features shuffle ONCE by source tile (bytes ∝
    input, never input × 4^dz) and cross the python seam packed one row
    per tile both ways (measured ~3× over the per-feature-row seam of the
    generic plan at bench scale). Declared zooms skip the inference job.
    ``None`` forces the generic ancestor-join plan — the parity-test
    reference, and the scale-safe choice when the TARGET set itself is
    planet-scale (the source-grouped route force-broadcasts the grouped
    target lists; the generic join lets Catalyst/AQE shuffle-join
    instead). Row-identical either way (tests/test_composite_packed.py).

    ``join_strategy``/``winners_join`` apply to the generic plan only:
    physical-join sizing for the ancestor join and the first-wins
    semi-join — see ``ancestor_join`` / ``first_wins``. The ancestor join
    defaults to 'auto' (Catalyst+AQE pick from real sizes); the first-wins
    semi-join defaults to FORCED 'broadcast' of the keys-only winner set
    (measured 2.3× over letting AQE decide — AQE still pays the probe-side
    full-width shuffle write before converting). At planet-scale
    winner-set cardinalities pass winners_join='auto' to avoid the driver
    collecting the broadcast side.
    """
    zs = _route_src_zooms(features, src_zooms, None)
    if zs:
        if len(zs) == 1:
            return overzoom_composite_packed(features, targets,
                                             src_zoom=zs[0])
        return _multizoom_composite_packed(features, targets, zs)
    j = ancestor_join(features, targets, strategy=join_strategy,
                      src_zooms=zs)
    j = apply_keep_layers(j)
    j = first_wins(j, winners_join=winners_join)
    out = overzoom_clip(j)
    return out.drop("keep_layers")


def overzoom_clip_points_expr(df: DataFrame) -> DataFrame:
    """Point-feature overzoom+clip as PURE column expressions — no Python.

    Semantically identical to the Arrow kernel for geom_type == 1 rows
    (affine p*2^dz − d, closed-box covered_by keep/drop per point,
    same-zoom raw pass-through) but stays entirely JVM-side: the Arrow
    crossing costs ~40µs/row at scale, the expression path ~1µs. The page
    pipeline (one point per geotagged page) is exactly this shape.
    """
    dz = F.col("z") - F.col("src_z")
    zf = F.call_function("shiftleft", F.lit(1).cast("long"), dz)
    mask = zf - F.lit(1).cast("long")
    dxp = F.col("x").bitwiseAND(mask) * F.col("extent")
    dyp = F.col("y").bitwiseAND(mask) * F.col("extent")
    blo = -F.col("buffer_size").cast("long")
    bhi = (F.col("extent") + F.col("buffer_size")).cast("long")

    txs = F.transform("xs", lambda v: v * zf - dxp)
    tys = F.transform("ys", lambda v: v * zf - dyp)
    pairs = F.filter(
        F.arrays_zip(txs.alias("px"), tys.alias("py")),
        lambda p: (p["px"] >= blo) & (p["px"] <= bhi)
        & (p["py"] >= blo) & (p["py"] <= bhi))
    new_xs = F.when(dz == 0, F.col("xs")).otherwise(
        F.transform(pairs, lambda p: p["px"]))
    new_ys = F.when(dz == 0, F.col("ys")).otherwise(
        F.transform(pairs, lambda p: p["py"]))
    # withColumns (plural): both expressions bind to the ORIGINAL xs/ys —
    # sequential withColumn would make new_ys's `pairs` re-read the already
    # transformed xs and double-apply the affine
    out = (
        df.withColumns({"xs": new_xs, "ys": new_ys})
        .filter(F.size("xs") > 0)
        .withColumn("part_offsets",
                    F.sequence(F.lit(0), F.size("xs") - 1).cast("array<int>"))
        .withColumn("ring_types",
                    F.transform(F.col("part_offsets"), lambda _: F.lit(0).cast("byte")))
    )
    return out


def composite_points(features: DataFrame, targets: DataFrame,
                     join_strategy: str = "auto",
                     winners_join: str = "broadcast") -> DataFrame:
    """Composite specialization for all-point features (e.g. the page
    pipeline): same plan as ``composite`` with the geometry step in pure
    expressions — zero Python crossings end-to-end."""
    j = ancestor_join(features, targets, strategy=join_strategy)
    j = apply_keep_layers(j)
    j = first_wins(j, winners_join=winners_join)
    return overzoom_clip_points_expr(j).drop("keep_layers")


_TILE_LEVEL_COLS = ("z", "x", "y", "buffer_size", "compress")

_ENCODE_OUT_SCHEMA = T.StructType([
    T.StructField("z", T.IntegerType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("tile", T.BinaryType()),
])

# per-(target, layer) rows of the multi-zoom source-grouped sink:
# framed layer message + its first-seen order keys (spliced per tile by
# _merge_layer_rows)
_LAYER_ROWS_SCHEMA = T.StructType([
    T.StructField("z", T.IntegerType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("ord_ti", T.LongType()),
    T.StructField("ord_fi", T.LongType()),
    T.StructField("compress", T.BooleanType()),
    T.StructField("layer_bytes", T.BinaryType()),
])


def _pack_tiles(df: DataFrame, by_layer: bool = False) -> DataFrame:
    """ONE row per (z, x, y): tile-level columns + a ``feats`` list of
    feature structs. The python seam's per-ROW conversion cost (JVM
    ArrowWriter + return-path InternalRow rebuild, measured ~payload-width-
    INDEPENDENT on the lines bench: 4.5s full width vs 4.9s scalars-only
    for the same 1M rows) then applies to thousands of rows, not millions —
    the feature data rides inside nested Arrow children, which serialize
    columnar. Measured 2.26s vs 4.15s for the identical one-way seam.

    Scale note: one packed row = one tile, so a tile must fit in one
    executor's memory — the same invariant a grouped applyInPandas needs;
    hot tiles are a skew problem before they are a packing problem.
    ``by_layer=True`` shrinks the unit to one row per (z, x, y, LAYER) —
    the size-capped sink route: a hot multi-layer tile packs as several
    bounded rows whose encoded layer messages splice back byte-exactly
    (``_merge_layer_rows``); ``layer`` stays in the feature structs too
    (the encoder reads it per feature).
    """
    keys = ["z", "x", "y"] + (["layer"] if by_layer else [])
    if "_pack_bucket" in df.columns:  # relational within-layer split key
        keys.append("_pack_bucket")
    data_cols = [c for c in df.columns
                 if c not in _TILE_LEVEL_COLS and c != "_pack_bucket"]
    aggs = [F.collect_list(F.struct(*data_cols)).alias("feats")]
    for c in ("buffer_size", "compress"):
        if c in df.columns:
            aggs.append(F.first(c).alias(c))
    return df.groupBy(*keys).agg(*aggs)


def _norm_list(arr):
    """(zero-based offsets int64, trimmed values) for a possibly-sliced
    Arrow ListArray — positional use of the children requires both."""
    off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = arr.values
    if int(off[0]) != 0 or int(off[-1]) != len(vals):
        vals = vals.slice(int(off[0]), int(off[-1]) - int(off[0]))
        off = off - off[0]
    return off, vals


def _tiles_batch(tiles):
    """[(z, x, y, bytes), ...] → the _ENCODE_OUT_SCHEMA RecordBatch."""
    import pyarrow as pa

    return pa.RecordBatch.from_arrays(
        [pa.array([t[0] for t in tiles], pa.int32()),
         pa.array([t[1] for t in tiles], pa.int64()),
         pa.array([t[2] for t in tiles], pa.int64()),
         pa.array([t[3] for t in tiles], pa.binary())],
        names=["z", "x", "y", "tile"])


def _units_batch(units):
    """encode_tiles_table(per_layer=True) rows → _LAYER_ROWS_SCHEMA batch."""
    import pyarrow as pa

    return pa.RecordBatch.from_arrays(
        [pa.array([u[0] for u in units], pa.int32()),
         pa.array([u[1] for u in units], pa.int64()),
         pa.array([u[2] for u in units], pa.int64()),
         pa.array([u[3] for u in units], pa.int64()),
         pa.array([u[4] for u in units], pa.int64()),
         pa.array([u[5] for u in units], pa.bool_()),
         pa.array([u[6] for u in units], pa.binary())],
        names=["z", "x", "y", "ord_ti", "ord_fi", "compress", "layer_bytes"])


def _check_unit_cap(batch, max_pack_features: int, what: str) -> None:
    """Internal invariant assertion: with the ``_pack_bucket`` window in
    place every capped packed row holds at most ``max_pack_features``
    features (an over-cap LAYER splits into bounded bucket rows and the
    sinks byte-merge the partial layer units — ``mvt.merge_layer_parts``),
    so this can only fire on a bucketing bug. A loud kernel error beats
    silently encoding an unbounded unit; note a violating collect_list
    row has already materialized JVM-side by the time the kernel sees
    it, so the cap bounds the ENCODE unit, and executor sizing should
    still assume cap-sized rows."""
    foff, _ = _norm_list(batch.column("feats"))
    nf = np.diff(foff)
    if (nf > max_pack_features).any():
        i = int(np.argmax(nf))
        z = int(batch.column("z")[i].as_py())
        x = int(batch.column("x")[i].as_py())
        y = int(batch.column("y")[i].as_py())
        lay = batch.column("layer")[i].as_py()
        raise ValueError(
            f"{what}: layer {lay!r} of tile ({z},{x},{y}) has "
            f"{int(nf[i])} features, above max_pack_features="
            f"{max_pack_features}. The _pack_bucket window should have "
            "split this layer into bounded bucket rows — this is an "
            "internal bucketing bug, not a data problem.")


def _unpack_batch(batch, tile_cols: list[str]):
    """(flat feature RecordBatch columns dict, per-tile repeated arrays) —
    zero-copy: the packed list's struct children ARE the flat feature
    arrays; only the tile-level scalars are np.repeat'ed per feature."""
    import pyarrow as pa

    off, vals = _norm_list(batch.column("feats"))
    nfeat = np.diff(off)
    cols: dict = {}
    for i, fld in enumerate(vals.type):
        cols[fld.name] = vals.field(i)
    total = int(off[-1])
    rep_idx = pa.array(np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                                 nfeat))
    for name in tile_cols:
        # Arrow-native take, NOT to_numpy+np.repeat: a NULL tile-level
        # value (e.g. buffer_size on a dz=0 pass-through target) would
        # read as NaN and crash the integer rebuild
        cols[name] = batch.column(name).take(rep_idx)
    return cols, total, off


def _route_src_zooms(features: DataFrame, src_zooms,
                     max_pack_features: int | None) -> list[int] | None:
    """Shared ``src_zooms`` normalization for the fused sink and the
    packed relational path (ONE implementation so the two public entry
    points cannot drift). Returns:

    * a sorted NON-EMPTY zoom list — route the source-grouped strategy;
    * ``[]`` — zooms were explicitly declared empty: the generic join
      path with an empty declaration yields an empty result with the
      right schema;
    * ``None`` — the generic join path over all zooms.

    ``max_pack_features`` is a generic-path contract: combined with
    declared non-empty zooms it raises (source-grouped packing bounds
    rows by source tile content instead); with ``"auto"`` it skips the
    inference job entirely and forces the generic path. ``"auto"``
    otherwise infers the zoom levels with one column-pruned distinct
    scan — an EAGER job at call time (streaming callers declare zooms
    or pass ``None``)."""
    if max_pack_features is not None:
        if isinstance(src_zooms, str):
            if src_zooms != "auto":
                raise ValueError(f"src_zooms: unknown mode {src_zooms!r}")
            return None  # cap forces the generic path; skip inference
        if src_zooms is None:
            return None
        zooms = sorted({int(z) for z in src_zooms})
        if zooms:
            raise ValueError(
                "max_pack_features applies to the generic join path; "
                "source-grouped routing (declared src_zooms) bounds packed "
                "rows by source tile content instead")
        return zooms  # declared empty (any iterable): empty result
    if isinstance(src_zooms, str):
        if src_zooms != "auto":
            raise ValueError(f"src_zooms: unknown mode {src_zooms!r}")
        src_zooms = [r[0] for r in
                     features.select("src_z").distinct().collect()
                     if r[0] is not None]
        if not src_zooms:
            return None  # empty input: any path yields nothing
    if src_zooms is None:
        return None
    return sorted({int(z) for z in src_zooms})


def composite_encode_tiles(features: DataFrame, targets: DataFrame,
                           join_strategy: str = "auto",
                           winners_join: str = "broadcast",
                           src_zooms: list[int] | None | str = "auto",
                           partitions: int | None = None,
                           max_pack_features: int | None = None) -> DataFrame:
    """Fused composite→encode: (z, x, y, tile:binary) with ONE python seam.

    ``composite(...)`` then ``encode_tiles(...)`` crosses the seam twice
    (mapInArrow out-and-back, then the groupBy shuffle, then the encode
    seam) and pays the seam's per-row cost for every intermediate feature
    row, both ways. Tile MATERIALIZATION pipelines — the reference's only
    output shape — never look at the intermediate rows, so this fuses the
    clip kernel INTO the encode: join → first-wins → JVM envelope prune →
    groupBy(z,x,y) packing ONE row per tile (``_pack_tiles``) → mapInArrow
    batches of whole tiles → vectorized clip + MULTI-tile encode
    (``mvt_vec.encode_tiles_table``) amortizing the per-tile fixed numpy
    cost across the batch. One wide shuffle + one seam of tile-count rows.

    ``src_zooms``: declared feature zoom levels (like ``ancestor_join``'s
    param — sources at other zooms are ignored either way). Declared
    zooms route through the SOURCE-GROUPED physical strategy whose
    shuffle carries each feature once instead of once per descendant
    target (4^dz×): one zoom → ``overzoom_encode_tiles`` directly;
    several → ``_multizoom_encode_tiles`` (one source-grouped pass per
    zoom + keys-only cross-zoom first-wins + per-tile layer splicing).
    ``"auto"`` (default) INFERS them with one tiny
    ``select(src_z).distinct()`` aggregate — column-pruned to one int
    column of the scan — so the shuffle-∝-input strategy engages without
    caller knowledge; the inference job runs eagerly at call time, so
    streaming callers must declare zooms (or pass ``None``) instead.
    ``None`` is the fully LAZY no-declared-zooms plan: since r6 it is the
    grouped generic (``_grouped_generic_encode_tiles``) — a keys-only
    global winner pass + ONE source-address-grouped shuffle (bytes ∝
    input, any zoom mix, no eager job) + per-tile layer splicing — byte-
    identical to the legacy join plan under the ingest contract
    (tile_idx ↦ one input tile; parity-gated in
    tests/test_overzoom_fused.py). The legacy payload-duplicating join
    plan remains as the ``max_pack_features`` backend (the cap's
    row_number bucketing needs the target-joined relation) and via the
    private ``_generic_impl="join"`` (the parity-test reference;
    ``join_strategy``/``winners_join`` only apply there).
    ``partitions`` passes through. Results are byte-identical
    (parity-tested) — this is a physical plan choice, not a semantic
    switch.

    Byte-identical to composite()+encode_tiles() (kernel and encoder are
    the same code), parity-tested in tests/test_encode_columnar.py.

    Targets must be UNIQUE per (z, x, y): duplicate keys with conflicting
    options are undefined in every path (the packed seam takes
    first(options) and the join duplicates features).
    """
    return _composite_encode_tiles_impl(
        features, targets, join_strategy, winners_join, src_zooms,
        partitions, max_pack_features, _generic_impl="grouped")


def _composite_encode_tiles_impl(features, targets, join_strategy,
                                 winners_join, src_zooms, partitions,
                                 max_pack_features,
                                 _generic_impl="grouped"):
    import pyarrow as pa

    from ..sources import mvt_vec

    zs = _route_src_zooms(features, src_zooms, max_pack_features)
    if zs:
        if len(zs) == 1:
            return overzoom_encode_tiles(features, targets, src_zoom=zs[0],
                                         partitions=partitions)
        return _multizoom_encode_tiles(features, targets, zs,
                                       partitions=partitions)
    if zs is None and max_pack_features is None \
            and _generic_impl == "grouped":
        return _grouped_generic_encode_tiles(features, targets,
                                             partitions=partitions)
    # legacy join plan: zs is None with the cap (its bucket window needs
    # the joined relation) or the "join" parity reference, or [] —
    # explicitly declared empty (the empty target explode yields an empty
    # result with the right schema)

    j = ancestor_join(features, targets, strategy=join_strategy,
                      src_zooms=zs)
    j = apply_keep_layers(j)
    j = first_wins(j, winners_join=winners_join).drop("keep_layers")
    # same prep + envelope prune as overzoom_clip, JVM-side
    j = _overzoom_prep(j)

    clip_fields = [f for f in j.schema.fields if f.name not in _KERNEL_HELPER_COLS]
    clip_schema = pa.schema([
        pa.field(f.name, _to_arrow(f.dataType)) for f in clip_fields])
    kernel_names = [f.name for f in j.schema.fields]
    if max_pack_features is not None:
        # within-layer split: a layer beyond the cap packs as several
        # bounded bucket rows; buckets that land in one kernel batch are
        # re-unified by encode_tiles_table's (tile, layer) grouping, and
        # buckets split across batches emit partial layer units that the
        # splice byte-merges (mvt.merge_layer_parts — tag-index rewrite
        # over verbatim geometry bytes, memory ∝ wire bytes)
        j = j.withColumn("_pack_bucket", (
            (F.row_number().over(
                Window.partitionBy("z", "x", "y", "layer")
                .orderBy("tile_idx", "feature_idx")) - 1)
            / F.lit(int(max_pack_features))).cast("int"))
    packed = _pack_tiles(j, by_layer=max_pack_features is not None)
    if "_pack_bucket" in packed.columns:
        packed = packed.drop("_pack_bucket")
    tile_cols = [c for c in _TILE_LEVEL_COLS if c in packed.columns]

    def clip_encode(it):
        for batch in it:
            if batch.num_rows == 0:
                continue
            if max_pack_features is not None:
                _check_unit_cap(batch, max_pack_features,
                                "composite_encode_tiles")
            cols, total, _foff = _unpack_batch(batch, tile_cols)
            if total == 0:
                continue
            flat = pa.RecordBatch.from_arrays(
                [pa.array(cols[n]) if not isinstance(cols[n], pa.Array)
                 else cols[n] for n in kernel_names],
                names=kernel_names)
            clipped = list(_overzoom_clip_batches(iter([flat]), clip_schema))
            if not clipped:
                # every feature clipped away: no output row, exactly like
                # the unfused path (the tile never reaches encode there)
                continue
            ctbl = pa.Table.from_batches(clipped, schema=clip_schema)
            if max_pack_features is not None:
                units = mvt_vec.encode_tiles_table(ctbl, per_layer=True)
                if units:
                    yield _units_batch(units)
                continue
            tiles = mvt_vec.encode_tiles_table(ctbl)
            if tiles:
                yield _tiles_batch(tiles)

    if max_pack_features is not None:
        return _merge_layer_rows(
            packed.mapInArrow(clip_encode, schema=_LAYER_ROWS_SCHEMA))
    return packed.mapInArrow(clip_encode, schema=_ENCODE_OUT_SCHEMA)


def composite_packed(features: DataFrame, targets: DataFrame,
                     join_strategy: str = "auto",
                     winners_join: str = "broadcast",
                     src_zooms: list[int] | None | str = "auto",
                     partitions: int | None = None,
                     max_pack_features: int | None = None) -> DataFrame:
    """``composite``'s row-identical twin behind the sinks' packed seam.

    Same logical output as ``composite`` (one relational row per surviving
    feature, coordinates in the target frame); different physical plan:
    join → first-wins → envelope prune → groupBy(z, x, y) packing ONE row
    per tile (``_pack_tiles``) → ONE mapInArrow crossing whole tiles BOTH
    ways (the kernel re-packs its clipped output per input tile) → JVM-side
    ``inline`` restores the feature rows. The python seam's per-row cost is
    payload-width-independent (~µs/row, the measured floor of the per-row
    ``composite`` path — see ``_pack_tiles``), so crossing tile-count rows
    instead of feature-count rows removes the relational path's dominant
    cost; the restore is a codegen generator, not a second seam.

    ``src_zooms`` mirrors ``composite_encode_tiles``: ``"auto"`` (default)
    infers the feature zoom levels with one tiny distinct scan and routes
    the source-grouped strategy — ONE zoom through
    ``overzoom_composite_packed`` (features shuffle once, bytes ∝ input —
    and the measured fastest at bench scale too), SEVERAL through
    ``_multizoom_composite_packed`` (per-zoom source-grouped passes under
    keys-only cross-zoom winners, merged by plain union). ``None`` forces
    the generic join path here (the parity-test reference). The
    inference is an eager job at call time — streaming callers declare
    zooms or pass ``None``.

    ``max_pack_features`` bounds EVERY packed row (a generic-path
    contract, like the sink's: it forces the join route). A layer
    beyond the cap splits into bounded per-layer BUCKETS (a row_number
    window over the layer); relational output needs NO splice step —
    several packed rows per tile ``inline`` to the same rows and the
    union restores them. (The byte sinks byte-merge their bucket units
    instead — ``mvt.merge_layer_parts``.)
    """
    zs = _route_src_zooms(features, src_zooms, max_pack_features)
    if zs:
        if len(zs) == 1:
            return overzoom_composite_packed(features, targets,
                                             src_zoom=zs[0],
                                             partitions=partitions)
        return _multizoom_composite_packed(features, targets, zs,
                                           partitions=partitions)
    # zs is None (generic over all zooms) or [] (explicitly declared
    # empty — the generic join's empty target explode yields an empty
    # result with the right schema)

    j = ancestor_join(features, targets, strategy=join_strategy,
                      src_zooms=zs)
    j = apply_keep_layers(j)
    j = first_wins(j, winners_join=winners_join).drop("keep_layers")
    out_cols = [f.name for f in j.schema.fields
                if f.name not in _KERNEL_HELPER_COLS]  # == composite() order
    j = _overzoom_prep(j)

    kernel_names = [f.name for f in j.schema.fields]
    jp = j
    if max_pack_features is not None:
        # relational output needs NO splice, so a layer beyond the cap
        # simply splits into several bounded packed rows — the inline
        # restore unions them back. (The byte sinks cannot do this:
        # splitting WITHIN a layer would need key/value-table-aware
        # message merge, so they raise instead.) The bucket column is a
        # grouping key only — _pack_tiles keeps it out of the structs.
        jp = j.withColumn("_pack_bucket", (
            (F.row_number().over(
                Window.partitionBy("z", "x", "y", "layer")
                .orderBy("tile_idx", "feature_idx")) - 1)
            / F.lit(int(max_pack_features))).cast("int"))
    packed = _pack_tiles(jp, by_layer=max_pack_features is not None)
    if "_pack_bucket" in packed.columns:
        # grouping key only — the kernel never reads it; keep it off the
        # Arrow seam (manual projection on both sides of a Python seam)
        packed = packed.drop("_pack_bucket")
    tile_cols = [c for c in _TILE_LEVEL_COLS if c in packed.columns]
    feat_fields = [f for f in j.schema.fields
                   if f.name not in _KERNEL_HELPER_COLS
                   and f.name not in tile_cols]
    feat_names = [f.name for f in feat_fields]
    clip_fields = [f for f in j.schema.fields
                   if f.name not in _KERNEL_HELPER_COLS]
    clip_schema = pa.schema(
        [pa.field(f.name, _to_arrow(f.dataType)) for f in clip_fields]
        + [pa.field("tile_ord", pa.int64())])
    struct_type = pa.struct(
        [pa.field(f.name, _to_arrow(f.dataType)) for f in feat_fields])
    jfields = {f.name: f for f in j.schema.fields}
    out_schema_spark = T.StructType(
        [jfields[c] for c in tile_cols]
        + [T.StructField("feats", T.ArrayType(T.StructType(feat_fields)))])

    def clip_pack(it):
        for batch in it:
            if batch.num_rows == 0:
                continue
            if max_pack_features is not None:
                _check_unit_cap(batch, max_pack_features, "composite_packed")
            cols, total, _foff = _unpack_batch(batch, tile_cols)
            ntiles = batch.num_rows
            counts = np.zeros(ntiles, np.int64)
            taken = None
            if total:
                # packed-row ordinal per feature: carried through the clip
                # kernel as a passthrough column so re-packing is a stable
                # sort + bincount, not a key match
                cols["tile_ord"] = pa.array(
                    np.repeat(np.arange(ntiles, dtype=np.int64),
                              np.diff(_foff)), pa.int64())
                flat = pa.RecordBatch.from_arrays(
                    [cols[n] if isinstance(cols[n], pa.Array)
                     else pa.array(cols[n])
                     for n in kernel_names + ["tile_ord"]],
                    names=kernel_names + ["tile_ord"])
                clipped = list(_overzoom_clip_batches(iter([flat]),
                                                      clip_schema))
                if clipped:
                    ctbl = pa.Table.from_batches(clipped, schema=clip_schema)
                    ords = ctbl.column("tile_ord").to_numpy(
                        zero_copy_only=False)
                    order = np.argsort(ords, kind="stable")
                    counts = np.bincount(ords, minlength=ntiles)
                    taken = ctbl.take(
                        pa.array(order, pa.int64())).combine_chunks()
            offs = np.zeros(ntiles + 1, np.int64)
            np.cumsum(counts, out=offs[1:])
            if taken is not None and taken.num_rows:
                tb = taken.to_batches()[0]
                struct = pa.StructArray.from_arrays(
                    [tb.column(n) for n in feat_names], names=feat_names)
            else:
                struct = pa.array([], type=struct_type)
            feats_out = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), struct)
            yield pa.RecordBatch.from_arrays(
                [batch.column(c) for c in tile_cols] + [feats_out],
                names=tile_cols + ["feats"])

    packed_out = packed.mapInArrow(clip_pack, schema=out_schema_spark)
    return packed_out.select(*tile_cols, F.inline("feats")).select(*out_cols)


def overzoom_encode_tiles(features: DataFrame, targets: DataFrame,
                          src_zoom: int | None,
                          partitions: int | None = None,
                          _wins: bool = False,
                          _layer_rows: bool = False,
                          _packed_rows: bool = False,
                          _exploded_targets: bool = False) -> DataFrame:
    """Single-source-zoom composite→encode, grouped by SOURCE tile.

    The generic ``composite_encode_tiles`` joins features to targets first,
    so the shuffle (and every later stage) carries each feature once PER
    DESCENDANT TARGET — 4× at dz=1, 16× at dz=2. When every feature sits
    at ONE source zoom (the tileset-materialization shape: overzoom a z_s
    layer pyramid-down), each target draws from exactly one source tile,
    so the fan-out can happen INSIDE the kernel as numpy gathers instead:

    * targets group by their z_src ancestor address (tiny, broadcast);
    * features group by (src_x, src_y) — ONE shuffle of unduplicated rows,
      shuffle bytes ∝ input, not input × 4^dz (the 100-TB difference);
    * the kernel fans (feature × target) pairs vectorized — per-group
      first-wins (winners per layer are identical for every target of a
      group, because the join would hand every target the same feature
      set), per-target keep-list + envelope prune, then the shared clip
      kernel and multi-tile encoder.

    Byte-identical to ``composite_encode_tiles(features, targets)`` for
    single-zoom inputs (parity-tested). Targets above the source zoom
    (z < src_zoom) yield nothing, like the generic path's inner join.
    Reference analog: one bench run of rules 5/10/11/15 (bench/rules.js:
    35-152) — the request names its source tile explicitly.

    Private multi-zoom plumbing (used by ``composite_encode_tiles`` when
    several source zooms are declared): ``_wins=True`` replaces the
    group-local first-wins with a per-target winner LIST — targets must
    carry a ``wins: array<struct<layer,tile_idx>>`` column (globally
    computed, keep-lists already folded in), and a feature is alive for a
    target iff its (layer, tile_idx) is that target's winner.
    ``_layer_rows=True`` emits one row per (target, LAYER) — the framed
    layer message plus its first-seen order keys, uncompressed — instead
    of whole tiles, for cross-zoom splicing by ``_merge_layer_rows``.
    ``_packed_rows=True`` (the ``overzoom_composite_packed`` backend)
    skips the encoder and emits one packed row per target — tile keys +
    the clipped feature structs — for a JVM-side ``inline`` restore.
    ``_exploded_targets=True`` (with ``src_zoom=None``) is the grouped
    GENERIC plan's mode: targets arrive already exploded per candidate
    source zoom, carrying ``src_z``/``src_x``/``src_y``; both sides group
    by the full source ADDRESS (zoom included) and the kernel reads each
    group's zoom from the batch — one pass over arbitrary zoom mixes,
    shuffle still ∝ input.
    """
    import pyarrow as pa

    from ..sources import mvt_vec

    if _packed_rows and _layer_rows:
        raise ValueError("_packed_rows and _layer_rows are exclusive "
                         "output modes")
    if (src_zoom is None) != _exploded_targets:
        raise ValueError("src_zoom=None requires _exploded_targets "
                         "(and vice versa)")

    if _exploded_targets:
        keys = ["src_z", "src_x", "src_y"]
        feats = features
        t = targets
    else:
        keys = ["src_x", "src_y"]
        feats = features.filter(F.col("src_z") == src_zoom)
        t = (targets.filter(F.col("z") >= src_zoom)
             .withColumn("src_x", F.call_function(
                 "shiftright", F.col("x"), F.col("z") - F.lit(src_zoom)).cast("long"))
             .withColumn("src_y", F.call_function(
                 "shiftright", F.col("y"), F.col("z") - F.lit(src_zoom)).cast("long")))
    tgt_fields = ["z", "x", "y", "buffer_size", "compress"]
    if _wins:
        tgt_fields.append("wins")
    elif "keep_layers" in t.columns:
        tgt_fields.append("keep_layers")
    tgrp = (t.groupBy(*keys)
            .agg(F.collect_list(F.struct(*tgt_fields)).alias("tgts")))

    data_cols = [c for c in feats.columns if c not in ("src_z", "src_x", "src_y")]
    if partitions:
        # one packed row = one source tile's whole kernel+encode workload
        # (tens of ms) — with few groups per core the default shuffle
        # partitioning leaves stragglers; a finer hash partitioning on the
        # group key is inherited by the agg (no extra exchange)
        feats = feats.repartition(partitions, *keys)
    fgrp = (feats.groupBy(*keys)
            .agg(F.collect_list(F.struct(*data_cols)).alias("feats")))
    packed = fgrp.join(F.broadcast(tgrp), on=keys, how="inner")
    if _exploded_targets:
        # the kernel reads each group's zoom from this column
        packed = packed.select("src_z", "feats", "tgts")

    feat_names = data_cols
    kernel_names = feat_names + ["z", "x", "y", "buffer_size", "compress",
                                 "dz", "disp_x", "disp_y"]
    clip_fields = [f for f in features.select(*data_cols).schema.fields] + [
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("buffer_size", T.IntegerType()),
        T.StructField("compress", T.BooleanType()),
    ]
    clip_schema = pa.schema(
        [pa.field(f.name, _to_arrow(f.dataType)) for f in clip_fields
         if f.name not in _KERNEL_HELPER_COLS]
        + ([pa.field("tile_ord", pa.int64())] if _packed_rows else []))
    if _packed_rows:
        kernel_names = kernel_names + ["tile_ord"]

    def fan_clip_encode(it):
        for batch in it:
            if batch.num_rows == 0:
                continue
            foff, fvals = _norm_list(batch.column("feats"))
            toff, tvals = _norm_list(batch.column("tgts"))
            nfeat_total = int(foff[-1])
            if nfeat_total == 0:
                continue

            fcol = {f.name: fvals.field(i) for i, f in enumerate(fvals.type)}
            xs_arr = fcol["xs"]
            xo = xs_arr.offsets.to_numpy(zero_copy_only=False).astype(_I64)
            xv = xs_arr.values.to_numpy(zero_copy_only=False).astype(_I64)
            ys_arr = fcol["ys"]
            yo = ys_arr.offsets.to_numpy(zero_copy_only=False).astype(_I64)
            yv = ys_arr.values.to_numpy(zero_copy_only=False).astype(_I64)
            # per-feature bbox (xs always has >=1 vertex)
            bminx = np.minimum.reduceat(xv, xo[:-1])
            bmaxx = np.maximum.reduceat(xv, xo[:-1])
            bminy = np.minimum.reduceat(yv, yo[:-1])
            bmaxy = np.maximum.reduceat(yv, yo[:-1])
            ext = fcol["extent"].to_numpy(zero_copy_only=False).astype(_I64)
            ti = fcol["tile_idx"].to_numpy(zero_copy_only=False).astype(_I64)
            layer_codes, layer_dict = mvt_vec._dict_encode(fcol["layer"])

            tz = tvals.field(0).to_numpy(zero_copy_only=False).astype(_I64)
            tx = tvals.field(1).to_numpy(zero_copy_only=False).astype(_I64)
            ty = tvals.field(2).to_numpy(zero_copy_only=False).astype(_I64)
            # a NULL buffer_size would read as NaN→undefined int64 and
            # produce arbitrary prune bounds; fill for the conversion and
            # keep the null mask — generic-path parity (its JVM envelope
            # predicate evaluates NULL for dz>0 rows and DROPS them)
            tbuf_arr = tvals.field(3)
            tbuf_null = tbuf_arr.is_null().to_numpy(zero_copy_only=False)
            tbuf = tbuf_arr.fill_null(0).to_numpy(
                zero_copy_only=False).astype(_I64)
            tcmp = tvals.field(4).fill_null(False).to_numpy(zero_copy_only=False)
            has_keep = "keep_layers" in tgt_fields
            keep_lists = tvals.field(5).to_pylist() if has_keep else None
            win_lists = tvals.field(5).to_pylist() if _wins else None
            if _exploded_targets:
                # grouped generic: each group's source zoom rides the batch
                gz = batch.column("src_z").to_numpy(
                    zero_copy_only=False).astype(_I64)
                tgt_zoom = np.repeat(gz, np.diff(toff))
            else:
                tgt_zoom = np.full(len(tz), src_zoom, _I64)

            pair_feat: list[np.ndarray] = []
            pair_tgt: list[np.ndarray] = []
            for g in range(batch.num_rows):
                f0, f1 = int(foff[g]), int(foff[g + 1])
                if f0 == f1:
                    continue
                lc = layer_codes[f0:f1]
                nl = len(layer_dict)
                if _wins:
                    alive0 = None  # per-target, built in the loop below
                else:
                    # first-wins per layer over the WHOLE source group —
                    # the generic path's groupBy(target, layer).
                    # min(tile_idx) winners are identical for every
                    # target of the group
                    win = np.full(nl, np.iinfo(np.int64).max, _I64)
                    np.minimum.at(win, lc, ti[f0:f1])
                    alive0 = ti[f0:f1] == win[lc]
                for k in range(int(toff[g]), int(toff[g + 1])):
                    dz = int(tz[k]) - int(tgt_zoom[k])
                    if dz > 0 and tbuf_null[k]:
                        continue  # generic-path parity: NULL buffer_size
                        # fails the envelope predicate — no features
                    zf = np.int64(1) << np.int64(dz)
                    if _wins:
                        # globally-computed first-wins: a feature is alive
                        # iff (layer, tile_idx) is this target's winner
                        wd = {w["layer"]: w["tile_idx"]
                              for w in (win_lists[k] or [])}
                        wt = np.array([wd.get(layer_dict[c], -1)
                                       for c in range(nl)], _I64)
                        alive = ti[f0:f1] == wt[lc]
                    else:
                        alive = alive0
                    if has_keep and keep_lists[k] is not None \
                            and len(keep_lists[k]):
                        keep = {s for s in keep_lists[k]}
                        lmask = np.array(
                            [layer_dict[c] in keep for c in range(nl)], bool)
                        alive = alive & lmask[lc]
                    if dz > 0:
                        e = ext[f0:f1]
                        dx = (tx[k] & (int(zf) - 1)) * e
                        dy = (ty[k] & (int(zf) - 1)) * e
                        lo = -tbuf[k]
                        hi = e + tbuf[k]
                        alive = alive \
                            & (bmaxx[f0:f1] * zf - dx >= lo) \
                            & (bminx[f0:f1] * zf - dx <= hi) \
                            & (bmaxy[f0:f1] * zf - dy >= lo) \
                            & (bminy[f0:f1] * zf - dy <= hi)
                    sel = np.nonzero(alive)[0].astype(_I64) + f0
                    if len(sel):
                        pair_feat.append(sel)
                        pair_tgt.append(np.full(len(sel), k, _I64))
            if not pair_feat:
                continue
            pf = np.concatenate(pair_feat)
            pt = np.concatenate(pair_tgt)
            take = pa.array(pf, pa.int64())
            dz_arr = tz[pt] - tgt_zoom[pt]
            zf_arr = np.int64(1) << dz_arr
            ext_p = ext[pf]
            cols = {n: fvals.field(i).take(take)
                    for i, n in enumerate(fn.name for fn in fvals.type)}
            cols["z"] = pa.array(tz[pt].astype(np.int32), pa.int32())
            cols["x"] = pa.array(tx[pt], pa.int64())
            cols["y"] = pa.array(ty[pt], pa.int64())
            cols["buffer_size"] = pa.array(tbuf[pt].astype(np.int32), pa.int32())
            cols["compress"] = pa.array(tcmp[pt], pa.bool_())
            cols["dz"] = pa.array(dz_arr.astype(np.int32), pa.int32())
            cols["disp_x"] = pa.array((tx[pt] & (zf_arr - 1)) * ext_p, pa.int64())
            cols["disp_y"] = pa.array((ty[pt] & (zf_arr - 1)) * ext_p, pa.int64())
            if _packed_rows:
                # pt indexes the batch-flattened target list, so it is
                # already a batch-unique target ordinal — the re-pack key
                cols["tile_ord"] = pa.array(pt, pa.int64())
            flat = pa.RecordBatch.from_arrays(
                [cols[n] for n in kernel_names], names=kernel_names)
            clipped = list(_overzoom_clip_batches(iter([flat]), clip_schema))
            if not clipped:
                continue
            if _packed_rows:
                ctbl = pa.Table.from_batches(clipped, schema=clip_schema)
                ords = ctbl.column("tile_ord").to_numpy(zero_copy_only=False)
                order = np.argsort(ords, kind="stable")
                taken = ctbl.take(pa.array(order, pa.int64())).combine_chunks()
                uniq, ucounts = np.unique(ords, return_counts=True)
                offs = np.zeros(len(uniq) + 1, np.int64)
                np.cumsum(ucounts, out=offs[1:])
                tb = taken.to_batches()[0]
                struct = pa.StructArray.from_arrays(
                    [tb.column(n) for n in data_cols], names=data_cols)
                feats_out = pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), struct)
                take_t = pa.array(uniq, pa.int64())
                # tile-level values from the ORIGINAL target structs —
                # buffer_size/compress keep their nulls (the kernel's
                # filled copies are prune-internal), generic-path parity
                yield pa.RecordBatch.from_arrays(
                    [tvals.field(0).take(take_t), tvals.field(1).take(take_t),
                     tvals.field(2).take(take_t), tvals.field(3).take(take_t),
                     tvals.field(4).take(take_t), feats_out],
                    names=["z", "x", "y", "buffer_size", "compress", "feats"])
                continue
            if _layer_rows:
                units = mvt_vec.encode_tiles_table(
                    pa.Table.from_batches(clipped, schema=clip_schema),
                    per_layer=True)
                if units:
                    yield _units_batch(units)
                continue
            tiles = mvt_vec.encode_tiles_table(
                pa.Table.from_batches(clipped, schema=clip_schema))
            if tiles:
                yield _tiles_batch(tiles)

    if _packed_rows:
        out_schema = T.StructType([
            T.StructField("z", T.IntegerType()),
            T.StructField("x", T.LongType()),
            T.StructField("y", T.LongType()),
            T.StructField("buffer_size", T.IntegerType()),
            T.StructField("compress", T.BooleanType()),
            T.StructField("feats", T.ArrayType(T.StructType(
                features.select(*data_cols).schema.fields))),
        ])
    else:
        out_schema = _LAYER_ROWS_SCHEMA if _layer_rows else _ENCODE_OUT_SCHEMA
    return packed.mapInArrow(fan_clip_encode, schema=out_schema)


def overzoom_composite_packed(features: DataFrame, targets: DataFrame,
                              src_zoom: int,
                              partitions: int | None = None) -> DataFrame:
    """Source-grouped relational composite: ``composite``'s rows with the
    sinks' shuffle shape.

    ``composite_packed`` still pays the generic ancestor join, which
    duplicates every feature once per descendant target (4^dz×) BEFORE the
    pack shuffle. Under the single-source-zoom contract this path reuses
    ``overzoom_encode_tiles``' plan — features shuffle ONCE by source tile
    (bytes ∝ input), targets broadcast, the kernel fans (feature × target)
    pairs as numpy gathers — and emits packed per-target rows that a
    JVM-side ``inline`` restores to exactly ``composite``'s schema
    (``src_z``/``src_x``/``src_y`` are re-derived from the target address:
    at one source zoom they are ``z - dz`` arithmetic, not carried data).
    Row-identical to ``composite`` for single-zoom inputs (parity-tested in
    tests/test_composite_packed.py).
    """
    packed_out = overzoom_encode_tiles(features, targets, src_zoom=src_zoom,
                                       partitions=partitions,
                                       _packed_rows=True)
    exploded = _packed_rows_to_relational(packed_out, src_zoom)
    return exploded.select(*_relational_order(features, targets))


def _relational_order(features: DataFrame, targets: DataFrame) -> list[str]:
    """``composite``'s exact output column order — derived from the
    generic plan's SCHEMA (lazy, never executed), so the packed paths
    stay drop-in. The sink contract tolerates a missing keep_layers
    column; the schema-only twin gets a null one so the derivation
    tolerates it too."""
    tref = targets if "keep_layers" in targets.columns else \
        targets.withColumn("keep_layers",
                           F.lit(None).cast("array<string>"))
    # src_zooms=None: the generic plan — schema-only use; the default
    # "auto" routing would recurse (packed → _relational_order →
    # composite → packed) and run its eager inference job
    return composite(features, tref, src_zooms=None).columns


def _packed_rows_to_relational(packed_out: DataFrame,
                               src_zoom: int) -> DataFrame:
    """JVM-side restore of a ``_packed_rows`` sink output to relational
    feature rows: ``inline`` the feature structs (a codegen generator —
    not a second python seam) and re-derive ``src_z/src_x/src_y`` from the
    target address (at one source zoom they are z − dz arithmetic, not
    carried data). Column ordering is the caller's concern."""
    exploded = packed_out.select(
        "z", "x", "y", "buffer_size", "compress", F.inline("feats"))
    dz = F.col("z") - F.lit(src_zoom)
    return (exploded
            .withColumn("src_z", F.lit(src_zoom).cast("int"))
            .withColumn("src_x", F.call_function(
                "shiftright", F.col("x"), dz).cast("long"))
            .withColumn("src_y", F.call_function(
                "shiftright", F.col("y"), dz).cast("long")))


def _merge_layer_rows(layer_rows: DataFrame) -> DataFrame:
    """Splice per-(target, layer) messages into whole tiles: group by
    target, sort by the first-seen order keys (tile_idx, feature_idx of
    each layer's first feature — exactly the single-call encoder's layer
    order), concatenate, then apply the gzip/empty-tile rule. MVT layers
    are self-contained messages, so the concatenation is byte-identical
    to encoding the tile in one call. One shuffle of encoded layer blobs
    (∝ OUTPUT bytes) + one seam of tile-count rows."""
    import pyarrow as pa

    from ..sources import mvt

    packed = (layer_rows.groupBy("z", "x", "y")
              .agg(F.collect_list(
                       F.struct("ord_ti", "ord_fi", "layer_bytes"))
                   .alias("parts"),
                   F.first("compress").alias("compress")))

    def splice(it):
        for batch in it:
            if batch.num_rows == 0:
                continue
            zc = batch.column("z").to_numpy(zero_copy_only=False)
            xc = batch.column("x").to_numpy(zero_copy_only=False)
            yc = batch.column("y").to_numpy(zero_copy_only=False)
            cmp_ = batch.column("compress").fill_null(False) \
                .to_numpy(zero_copy_only=False)
            parts = batch.column("parts").to_pylist()
            tiles = []
            for i in range(batch.num_rows):
                ps = sorted(parts[i],
                            key=lambda p: (p["ord_ti"], p["ord_fi"]))
                names = [mvt.layer_unit_name(p["layer_bytes"]) for p in ps]
                if len(set(names)) != len(names):
                    # size-capped bucket units split across kernel
                    # batches: byte-merge each duplicated layer at its
                    # first-seen position (ord keys sort bucket 0 first,
                    # so part order IS feature order)
                    groups: dict = {}
                    order = []
                    for nm, p in zip(names, ps):
                        if nm not in groups:
                            groups[nm] = []
                            order.append(nm)
                        groups[nm].append(p["layer_bytes"])
                    buf = b"".join(
                        mvt.merge_layer_parts(groups[nm])
                        if len(groups[nm]) > 1 else groups[nm][0]
                        for nm in order)
                else:
                    buf = b"".join(p["layer_bytes"] for p in ps)
                tiles.append((int(zc[i]), int(xc[i]), int(yc[i]),
                              mvt.gzip_sink(buf, bool(cmp_[i]))))
            yield _tiles_batch(tiles)

    return packed.mapInArrow(splice, schema=_ENCODE_OUT_SCHEMA)


def _multizoom_encode_tiles(features: DataFrame, targets: DataFrame,
                            zs: list[int],
                            partitions: int | None = None) -> DataFrame:
    """Source-grouped materialization for MULTI-zoom tilesets: each
    declared zoom routes through ``overzoom_encode_tiles`` (shuffle ∝
    input, fan-out in-kernel) and the per-zoom LAYER messages splice per
    target tile. Cross-zoom first-wins is reconciled up front with a
    KEYS-ONLY plan: per-source-address layer minima → ancestor-exploded
    equi-join to target keys (5 small columns, never geometry) → global
    min(tile_idx) per (target, layer). Each target then carries its
    winner list into the kernel, so a layer encodes in exactly one
    zoom's pass. Byte-parity with the generic join path is gated in
    tests/test_overzoom_fused.py.

    Relies on the ingest contract that ``tile_idx`` identifies ONE input
    tile (its zoom mapping is functional) — reusing a tile_idx across
    source tiles at different zooms would duplicate winner rows."""
    wins, t_base = _multizoom_wins(features, targets, zs)
    # ONE source-address-grouped pass over all declared zooms (the
    # grouped-generic machinery) instead of a per-zoom pass union: same
    # shuffle bytes, half the stages/joins. Each target carries its FULL
    # winner list; the guarded tile_idx↦tile mapping means exactly one
    # zoom's group holds each winning tile, so each layer still encodes
    # once — byte parity unchanged (tests/test_overzoom_fused.py).
    winlists = (wins.groupBy("z", "x", "y")
                .agg(F.collect_list(F.struct("layer", "tile_idx"))
                     .alias("wins")))
    if "compress" not in t_base.columns:
        t_base = t_base.withColumn("compress", F.lit(False))
    tw = t_base.join(winlists, on=["z", "x", "y"], how="inner")
    zarr = F.array(*[F.lit(int(z)) for z in zs])
    te = (tw.withColumn("src_z", F.explode(
              F.filter(zarr, lambda z: z <= F.col("z"))))
          .withColumn("src_x", F.call_function(
              "shiftright", F.col("x"), F.col("z") - F.col("src_z"))
              .cast("long"))
          .withColumn("src_y", F.call_function(
              "shiftright", F.col("y"), F.col("z") - F.col("src_z"))
              .cast("long")))
    feats = features.filter(F.col("src_z").isin([int(z) for z in zs]))
    layer_rows = overzoom_encode_tiles(
        feats, te, src_zoom=None, partitions=partitions,
        _wins=True, _layer_rows=True, _exploded_targets=True)
    return _merge_layer_rows(layer_rows)


def _grouped_generic_encode_tiles(features: DataFrame, targets: DataFrame,
                                  partitions: int | None = None) -> DataFrame:
    """The no-declared-zooms fused plan, source-grouped (guide §8 shape:
    decide with small rows, move big rows once).

    The legacy generic plan joins features to exploded targets FIRST, so
    its pack shuffle carries every feature once per descendant target
    (4^dz×, full payload). Here the payload shuffles exactly once:

    * **keys-only global first-wins** — features pre-aggregate to one row
      per (src address, layer) (a column-pruned scan, 5 small columns);
      the ancestor equi-join + min(tile_idx) over THAT gives each
      target's winner list, keep-lists folded in. Identical winners to
      the joined-relation aggregation: min over per-source minima is the
      global min.
    * targets (inner-joined to their winner lists — targets with no
      features vanish, like the legacy inner join) explode per candidate
      source zoom 0..z and group by source ADDRESS — the broadcast side.
    * features group by (src_z, src_x, src_y) — the ONE payload shuffle,
      bytes ∝ input for ANY zoom mix, no eager inference job.
    * the shared fan/clip/encode kernel emits per-(target, layer) framed
      messages (a target may draw layers from groups at several zooms)
      and ``_merge_layer_rows`` splices per tile — one extra shuffle of
      OUTPUT-sized encoded blobs, the multi-zoom sink's merge contract.

    Byte-identical to the legacy join plan under the ingest contract that
    ``tile_idx`` identifies one input tile (parity-gated, mixed-zoom
    scenarios included). A tile_idx shared by two source tiles at
    different zooms on the same target+layer — the case the declared-
    multi-zoom route rejects with its guard — would emit from both
    groups here (the legacy plan interleaved such rows instead); that
    input violates the ingest contract in every documented path.

    Scale note: the broadcast side is one row per (source address) with
    target lists ∝ targets × (z+1); planet-scale TARGET sets belong on
    the legacy shuffle-join plan (``_generic_impl="join"``), same
    tradeoff as every source-grouped route."""
    has_keep = "keep_layers" in targets.columns
    fk = (features.groupBy("src_z", "src_x", "src_y", "layer")
          .agg(F.min("tile_idx").alias("tile_idx")))
    tsel = ["z", "x", "y"] + (["keep_layers"] if has_keep else [])
    cand = ancestor_join(fk, targets.select(*tsel))
    if has_keep:
        cand = apply_keep_layers(cand)
    wins = (cand.groupBy("z", "x", "y", "layer")
            .agg(F.min("tile_idx").alias("tile_idx")))
    winlists = (wins.groupBy("z", "x", "y")
                .agg(F.collect_list(F.struct("layer", "tile_idx"))
                     .alias("wins")))
    t_base = targets.drop("keep_layers") if has_keep else targets
    if "compress" not in t_base.columns:  # legacy-plan tolerance: absent
        t_base = t_base.withColumn("compress", F.lit(False))  # ⇒ no gzip
    tw = t_base.join(winlists, on=["z", "x", "y"], how="inner")
    te = (tw.withColumn("src_z", F.explode(F.sequence(F.lit(0), F.col("z"))))
          .withColumn("src_x", F.call_function(
              "shiftright", F.col("x"), F.col("z") - F.col("src_z"))
              .cast("long"))
          .withColumn("src_y", F.call_function(
              "shiftright", F.col("y"), F.col("z") - F.col("src_z"))
              .cast("long")))
    layer_rows = overzoom_encode_tiles(
        features, te, src_zoom=None, partitions=partitions,
        _wins=True, _layer_rows=True, _exploded_targets=True)
    return _merge_layer_rows(layer_rows)


def _multizoom_wins(features: DataFrame, targets: DataFrame,
                    zs: list[int]):
    """Cross-zoom first-wins reconciliation shared by the multi-zoom sink
    and the multi-zoom packed relational path: keys-only global winners
    per (target, layer) with each winner's source zoom, checkpointed, plus
    the tile_idx-functional-mapping guard. Returns (wins, t_base)."""
    has_keep = "keep_layers" in targets.columns
    fk = (features.filter(F.col("src_z").isin([int(z) for z in zs]))
          .groupBy("src_z", "src_x", "src_y", "layer")
          .agg(F.min("tile_idx").alias("tile_idx")))
    tcols = ["z", "x", "y"] + (["keep_layers"] if has_keep else [])
    cand = ancestor_join(fk, targets.select(*tcols), src_zooms=zs)
    if has_keep:
        cand = apply_keep_layers(cand)
    wins = (cand.groupBy("z", "x", "y", "layer")
            .agg(F.min("tile_idx").alias("tile_idx")))
    # zoom of each winning source tile (tile_idx ↦ one input tile). Every
    # winner tile_idx appears in fk (wins are minima over fk), so the
    # mapping derives from the SMALL aggregate — not a second full scan
    # of the feature table
    tzoom = fk.select("tile_idx", "src_z").distinct()
    # materialize ONCE: the winners subtree (a full feature-key scan)
    # feeds every per-zoom branch, and a union of branches re-executes
    # shared upstream per branch (the filter/union trap) — len(zs)× the
    # dominant scan without this. Winners are keys-only (targets×layers
    # rows), so the checkpoint is small
    wins = wins.join(tzoom, on="tile_idx", how="inner") \
        .localCheckpoint(eager=True)
    # runtime guard for the ingest contract above: a tile_idx mapping to
    # several zooms duplicates its winner rows in the join, so the same
    # (target, layer) would encode in MORE than one zoom pass and the
    # spliced tile silently diverges from the generic path. Exactly the
    # corrupting cases surface as duplicated winner keys, and the check
    # runs on the CHECKPOINTED keys-only winners — no extra feature scan.
    dup = (wins.groupBy("z", "x", "y", "layer").count()
           .filter(F.col("count") > 1).limit(1).count())
    if dup:
        raise ValueError(
            "multi-zoom composite: a tile_idx is shared by source tiles at "
            "different zooms (the winner for some (target, layer) maps to "
            "several source zooms). tile_idx must identify ONE input tile — "
            "re-ingest with features_from_tiles_df's default per-zoom "
            "ordinal or pass a distinct tile_idx per input tile.")
    t_base = targets.drop("keep_layers") if has_keep else targets
    return wins, t_base


def _wins_for_zoom(wins: DataFrame, z_s: int) -> DataFrame:
    """One zoom's winner lists: (z, x, y, wins: array<struct<layer,
    tile_idx>>) for targets where zoom ``z_s`` won at least one layer."""
    return (wins.filter(F.col("src_z") == F.lit(int(z_s)))
            .groupBy("z", "x", "y")
            .agg(F.collect_list(F.struct("layer", "tile_idx"))
                 .alias("wins")))


def _multizoom_composite_packed(features: DataFrame, targets: DataFrame,
                                zs: list[int],
                                partitions: int | None = None) -> DataFrame:
    """Multi-zoom packed RELATIONAL twin of ``_multizoom_encode_tiles``:
    the same keys-only cross-zoom winner plan and per-zoom source-grouped
    passes, but each pass emits packed relational rows (``_packed_rows``)
    and the merge is a plain UNION — relational output needs no byte
    splicing, several passes' rows for one target are just that target's
    rows. Row-identical to the generic ``composite`` (parity-tested)."""
    wins, t_base = _multizoom_wins(features, targets, zs)
    parts = []
    for z_s in zs:
        t_z = t_base.join(_wins_for_zoom(wins, z_s),
                          on=["z", "x", "y"], how="inner")
        packed_out = overzoom_encode_tiles(
            features, t_z, src_zoom=int(z_s), partitions=partitions,
            _wins=True, _packed_rows=True)
        parts.append(_packed_rows_to_relational(packed_out, int(z_s)))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return merged.select(*_relational_order(features, targets))


def encode_tiles(composited: DataFrame, impl: str = "columnar",
                 max_pack_features: int | None = None) -> DataFrame:
    """S3/S4 terminal sink: (z, x, y, tile:binary).

    Deterministic feature order: input-tile order, then first-seen layer
    order, then feature order within layer (O3, src/vtcomposite.cpp:239,742).
    Compression per the `compress` flag with the empty-tile rule
    (src/vtcomposite.cpp:300-311).

    ``impl="columnar"`` (default): tiles PACK to one nested row each
    (``_pack_tiles``) and cross mapInArrow in multi-tile batches; the
    MULTI-tile encoder (sources.mvt_vec.encode_tiles_table) amortizes the
    per-tile fixed numpy cost across the batch (6.0 → 1.8 ms/tile vs the
    per-group applyInArrow it replaced) and the seam pays its per-row cost
    once per TILE, not per feature. One packed row = one tile, so a tile
    must fit in executor memory — the invariant a grouped applyInArrow
    needed anyway; Arrow batch BYTES are capped by
    spark.sql.execution.arrow.maxBytesPerBatch (schema.get_spark).

    ``max_pack_features``: the HOT-TILE bound. When set, tiles pack one
    row per (z, x, y, LAYER, bucket) — a hot tile becomes several
    bounded rows even within one layer (buckets of ``max_pack_features``
    features in (tile_idx, feature_idx) order), encoded as
    self-contained framed layer messages
    (``encode_tiles_table(per_layer=True)``) and spliced back per tile
    by ``_merge_layer_rows`` in first-seen order. Same-layer bucket
    units that meet in one kernel batch re-unify inside the encoder;
    units split across batches byte-merge in the splice
    (``mvt.merge_layer_parts`` — key/value-table-aware tag rewrite over
    verbatim geometry bytes, memory ∝ wire bytes). Byte-identical to the
    whole-tile pack either way (parity gated in
    tests/test_encode_columnar.py). Cost vs the default: one extra
    shuffle of encoded layer blobs (∝ output bytes).
    ``impl="rows"``: the original applyInPandas + mvt.Feature path, kept
    as the byte-parity reference.
    """
    import pandas as pd

    from ..sources import mvt

    out_schema = _ENCODE_OUT_SCHEMA

    if impl == "columnar":
        import pyarrow as pa

        from ..sources import mvt_vec

        src = composited
        if max_pack_features is not None:
            src = composited.withColumn("_pack_bucket", (
                (F.row_number().over(
                    Window.partitionBy("z", "x", "y", "layer")
                    .orderBy("tile_idx", "feature_idx")) - 1)
                / F.lit(int(max_pack_features))).cast("int"))
        packed = _pack_tiles(src, by_layer=max_pack_features is not None)
        if "_pack_bucket" in packed.columns:
            packed = packed.drop("_pack_bucket")
        tile_cols = [c for c in _TILE_LEVEL_COLS if c in packed.columns]
        flat_names = composited.columns

        if max_pack_features is not None:
            def encode_units(it):
                for batch in it:
                    if batch.num_rows == 0:
                        continue
                    _check_unit_cap(batch, max_pack_features, "encode_tiles")
                    cols, total, _foff = _unpack_batch(batch, tile_cols)
                    if total == 0:
                        continue
                    flat = pa.Table.from_arrays(
                        [cols[n] for n in flat_names], names=flat_names)
                    units = mvt_vec.encode_tiles_table(flat, per_layer=True)
                    if units:
                        yield _units_batch(units)

            layer_rows = packed.mapInArrow(encode_units,
                                           schema=_LAYER_ROWS_SCHEMA)
            return _merge_layer_rows(layer_rows)

        def encode_packed(it):
            for batch in it:
                if batch.num_rows == 0:
                    continue
                cols, total, _foff = _unpack_batch(batch, tile_cols)
                if total == 0:
                    continue
                flat = pa.Table.from_arrays(
                    [cols[n] for n in flat_names], names=flat_names)
                tiles = mvt_vec.encode_tiles_table(flat)
                if tiles:
                    yield _tiles_batch(tiles)

        return packed.mapInArrow(encode_packed, schema=out_schema)

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["tile_idx", "feature_idx"], kind="stable")
        z = int(pdf["z"].iloc[0]); x = int(pdf["x"].iloc[0]); y = int(pdf["y"].iloc[0])
        compress = bool(pdf["compress"].iloc[0]) if "compress" in pdf else False
        has_types = "prop_types" in pdf.columns
        layers: dict[str, mvt.Layer] = {}
        order: list[str] = []
        for row in pdf.itertuples(index=False):
            name = row.layer
            if name not in layers:
                layers[name] = mvt.Layer(name=name, extent=int(row.extent),
                                         version=int(row.layer_version or 2))
                order.append(name)
            starts = list(row.part_offsets) + [len(row.xs)]
            parts = [list(zip([int(v) for v in row.xs[starts[i]:starts[i + 1]]],
                              [int(v) for v in row.ys[starts[i]:starts[i + 1]]]))
                     for i in range(len(starts) - 1)]
            raw = dict(row.properties) if row.properties is not None else {}
            if has_types and row.prop_types is not None:
                # typed re-materialization: canonical string + tag → the
                # original MVT value variant (parity with the reference's
                # property_mapper, src/feature_builder.hpp:169-180); keys
                # with no tag (engine-generated, e.g. localize outputs)
                # encode as strings
                tags = {k: int(t) for k, t in dict(row.prop_types).items()}
                props = {k: mvt.from_canonical(tags.get(k, mvt.TAG_STRING), v)
                         for k, v in raw.items()}
                ptypes = {k: tags.get(k, mvt.TAG_STRING) for k in raw}
            else:
                props, ptypes = raw, None
            layers[name].features.append(mvt.Feature(
                geom_type=int(row.geom_type), parts=parts,
                ring_types=[int(r) for r in
                            (row.ring_types if row.ring_types is not None else [])],
                properties=props, prop_types=ptypes,
                fid=int(row.feature_id) if row.feature_id is not None and not pd.isna(row.feature_id) else None))
        buf = mvt.encode_tile([layers[n] for n in order])
        buf = mvt.gzip_sink(buf, compress)
        return pd.DataFrame({"z": [z], "x": [x], "y": [y], "tile": [buf]})

    return composited.groupBy("z", "x", "y").applyInPandas(encode, schema=out_schema)
