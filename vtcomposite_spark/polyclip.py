"""Exact polygon-with-holes ∩ rectangle clipping (Weiler–Atherton for a
convex window) — the boost::geometry::intersection parity path.

Per-ring Sutherland–Hodgman (geometry.clip_rings) cannot reproduce two
reference behaviors (test/vtcomposite-polygons.test.js:133-167):

* a hole crossing the clip boundary must CARVE the clipped outer ring
  (the hole's inside-window arcs become part of the output boundary);
* that carving can SPLIT the clipped polygon into multiple output
  polygons.

Algorithm (window = closed box [lo, hi]²; screen coords, y down; exterior
rings have positive shoelace area in this orientation — MVT spec 4.3.3.3):

1. Every ring of the polygon (outer first, then holes) is cut into
   *chains*: maximal runs of the ring inside the window, with entry/exit
   points computed by parametric edge clipping and rounded to int64.
   Rings that never touch the window contribute either nothing (fully
   outside, not surrounding), full untouched rings (fully inside), or —
   for an outer that surrounds the whole window — the window itself.
2. All chains from all rings participate in ONE trace: follow a chain to
   its exit, walk the window boundary in canonical orientation
   (right → down → left → up, which preserves the positive-area
   convention) to the next entry point of any chain (inserting window
   corners passed), continue that chain; repeat until the ring closes.
3. Untouched full holes are attached to whichever traced/untouched outer
   contains them (even-odd point test).

Degeneracy policy: the window is closed (boundary points are inside,
matching covered_by in src/feature_builder.hpp:42-45); intersection
points are rounded half-to-even; consecutive duplicates and sub-3-vertex
rings are dropped after rounding (the reference's >3-closed filter,
src/feature_builder.hpp:255-266).
"""

from __future__ import annotations

import numpy as np

from . import geometry as geo

_I64 = np.int64


def _ring_area2(xs: np.ndarray, ys: np.ndarray) -> int:
    """Twice the shoelace area of a CLOSED ring (positive = exterior)."""
    return int(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))


def _point_in_ring(px: int, py: int, xs: np.ndarray, ys: np.ndarray) -> bool:
    x0, y0 = xs[:-1], ys[:-1]
    x1, y1 = xs[1:], ys[1:]
    cond = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = x0 + (py - y0) / (y1 - y0) * (x1 - x0)
    return bool(np.count_nonzero(cond & (px < xi)) % 2)


def _perimeter_pos(x: float, y: float, lo: float, hi: float) -> float:
    """Position along the window boundary in canonical orientation.

    side 0: y=lo, x lo→hi ; side 1: x=hi, y lo→hi ;
    side 2: y=hi, x hi→lo ; side 3: x=lo, y hi→lo.
    Corners are assigned to the side they START (s = k*w).
    """
    w = hi - lo
    if y == lo and x < hi:
        return x - lo
    if x == hi and y < hi:
        return w + (y - lo)
    if y == hi and x > lo:
        return 2 * w + (hi - x)
    if x == lo and y > lo:
        return 3 * w + (hi - y)
    return 0.0  # (lo, lo)


_CORNERS = ((1, (None, None)),)


def _corners_between(s0: float, s1: float, lo: int, hi: int):
    """Window corners strictly between perimeter positions s0 → s1
    (walking forward, cyclic)."""
    w = hi - lo
    corners = [(0.0, (lo, lo)), (w, (hi, lo)), (2 * w, (hi, hi)), (3 * w, (lo, hi))]
    total = 4 * w
    out = []
    if s1 <= s0:
        s1 += total
    for k in range(0, 8):
        s, (cx, cy) = corners[k % 4]
        s += (k // 4) * total
        if s0 < s < s1:
            out.append((cx, cy))
    return out


def _ring_chains(xs: np.ndarray, ys: np.ndarray, lo: int, hi: int):
    """Cut a CLOSED ring into inside-window chains.

    Returns (status, chains): status ∈ {"inside", "outside", "crossing"};
    chains = list of (points list, s_entry, s_exit).
    """
    oxs, oys = xs[:-1], ys[:-1]  # open ring
    ins = (oxs >= lo) & (oxs <= hi) & (oys >= lo) & (oys <= hi)
    n = len(oxs)

    # fast classifications
    if ins.all():
        return "inside", []

    # rotate so vertex 0 is strictly outside (exists when not all inside)
    start = int(np.argmax(~ins))
    rx = np.concatenate([oxs[start:], oxs[:start]])
    ry = np.concatenate([oys[start:], oys[:start]])

    # walk edges (closed): vertex i -> i+1 (mod n)
    ex0 = rx.astype(np.float64)
    ey0 = ry.astype(np.float64)
    ex1 = np.concatenate([ex0[1:], ex0[:1]])
    ey1 = np.concatenate([ey0[1:], ey0[:1]])
    dx, dy = ex1 - ex0, ey1 - ey0
    t0 = np.zeros(n)
    t1 = np.ones(n)
    visible = np.ones(n, bool)
    for p, q in ((-dx, ex0 - lo), (dx, hi - ex0), (-dy, ey0 - lo), (dy, hi - ey0)):
        nz = p != 0
        r = np.where(nz, q / np.where(nz, p, 1.0), 0.0)
        visible &= nz | (q >= 0)
        t0 = np.where(nz & (p < 0), np.maximum(t0, r), t0)
        t1 = np.where(nz & (p > 0), np.minimum(t1, r), t1)
    visible &= t0 <= t1

    if not visible.any():
        return "outside", []

    ax = np.where(t0 == 0.0, ex0, np.rint(ex0 + t0 * dx))
    ay = np.where(t0 == 0.0, ey0, np.rint(ey0 + t0 * dy))
    bx = np.where(t1 == 1.0, ex1, np.rint(ex0 + t1 * dx))
    by = np.where(t1 == 1.0, ey1, np.rint(ey0 + t1 * dy))

    rins = np.concatenate([ins[start:], ins[:start]])
    rins_next = np.concatenate([rins[1:], rins[:1]])

    chains = []
    cur: list[tuple[int, int]] | None = None
    for i in range(n):
        if not visible[i]:
            continue
        a = (int(ax[i]), int(ay[i]))
        b = (int(bx[i]), int(by[i]))
        if cur is None:
            cur = [a]
        elif not rins[i]:  # edge starts outside: previous chain ended earlier
            # (can happen when visibility is a single touching point)
            chains.append(cur)
            cur = [a]
        if not cur or cur[-1] != b:
            cur.append(b)
        if not rins_next[i]:  # edge leaves the window (or ends outside)
            chains.append(cur)
            cur = None
    if cur is not None:
        chains.append(cur)

    out = []
    for ch in chains:
        # drop consecutive dups already handled; degenerate single points out
        if len(ch) < 2 and True:
            # a touch-point chain: keep only if it truly has extent
            if len(ch) == 1:
                continue
        s_in = _perimeter_pos(ch[0][0], ch[0][1], lo, hi)
        s_out = _perimeter_pos(ch[-1][0], ch[-1][1], lo, hi)
        out.append((ch, s_in, s_out))
    if not out:
        return "outside", []
    return "crossing", out


def clip_polygon(rings: list[tuple[np.ndarray, np.ndarray]], lo: int, hi: int):
    """Clip one polygon (ring 0 = outer, rest holes; CLOSED int64 arrays)
    to the window. Returns a list of output polygons, each a list of CLOSED
    (xs, ys) rings (ring 0 outer)."""
    full_inside_rings: list[int] = []
    chains = []  # (points, s_entry, s_exit)
    outer_status = None
    window_is_inside_outer = False

    for ri, (xs, ys) in enumerate(rings):
        status, ch = _ring_chains(xs, ys, lo, hi)
        if ri == 0:
            outer_status = status
        if status == "inside":
            full_inside_rings.append(ri)
        elif status == "crossing":
            chains.extend(ch)
        else:  # outside: may still surround the window
            cx, cy = (lo + hi) / 2.0, (lo + hi) / 2.0
            if _point_in_ring(cx, cy, xs.astype(np.float64), ys.astype(np.float64)):
                if ri == 0:
                    window_is_inside_outer = True
                else:
                    return []  # a hole swallows the whole window

    traced: list[list[tuple[int, int]]] = []
    if chains:
        entries = sorted(range(len(chains)), key=lambda i: chains[i][1])
        used = [False] * len(chains)

        total = 4 * (hi - lo)

        def next_entry(s: float):
            """Nearest entry point strictly forward (cyclic) along the
            boundary from s, over ALL chains — reaching a used chain's
            entry closes the ring."""
            best = None
            best_d = None
            for i in entries:
                si = chains[i][1]
                d = (si - s) % total
                if best is None or d < best_d:
                    best, best_d = i, d
            return best

        for si in range(len(chains)):
            if used[si]:
                continue
            ring_pts: list[tuple[int, int]] = []
            cur = si
            while True:
                used[cur] = True
                pts, s_in, s_out = chains[cur]
                ring_pts.extend(pts)
                nxt = next_entry(s_out)
                if nxt is None:
                    nxt = si
                target_s = chains[nxt][1]
                # walk window boundary s_out -> target_s inserting corners
                for c in _corners_between(s_out, target_s, lo, hi):
                    ring_pts.append(c)
                if nxt == si or used[nxt]:
                    break
                cur = nxt
            # close + clean ring
            if ring_pts[0] != ring_pts[-1]:
                ring_pts.append(ring_pts[0])
            cleaned = [ring_pts[0]]
            for p in ring_pts[1:]:
                if p != cleaned[-1]:
                    cleaned.append(p)
            if len(cleaned) > 1 and cleaned[0] == cleaned[-1]:
                pass
            else:
                cleaned.append(cleaned[0])
            if len(cleaned) >= 4:  # closed ring with ≥3 distinct vertices
                traced.append(cleaned)
    elif window_is_inside_outer:
        w_ring = [(lo, lo), (hi, lo), (hi, hi), (lo, hi), (lo, lo)]
        traced.append(w_ring)

    # assemble outputs: traced rings classified by area sign
    outers: list[list[tuple[int, int]]] = []
    traced_holes: list[list[tuple[int, int]]] = []
    for ring in traced:
        xs = np.array([p[0] for p in ring], _I64)
        ys = np.array([p[1] for p in ring], _I64)
        if _ring_area2(xs, ys) > 0:
            outers.append(ring)
        else:
            traced_holes.append(ring)

    if outer_status == "inside":
        outers.insert(0, [tuple(p) for p in zip(*[
            rings[0][0].tolist(), rings[0][1].tolist()])])

    if not outers:
        return []

    polygons = [[o] for o in outers]

    def attach(hole_pts):
        hx, hy = hole_pts[0]
        for poly in polygons:
            oxs = np.array([p[0] for p in poly[0]], np.float64)
            oys = np.array([p[1] for p in poly[0]], np.float64)
            if _point_in_ring(hx, hy, oxs, oys):
                poly.append(hole_pts)
                return

    for ri in full_inside_rings:
        if ri == 0:
            continue
        xs, ys = rings[ri]
        attach(list(zip(xs.tolist(), ys.tolist())))
    for hole in traced_holes:
        attach(hole)

    # final ring arrays, dropping degenerate rings
    out = []
    for poly in polygons:
        rr = []
        for ring in poly:
            xs = np.array([p[0] for p in ring], _I64)
            ys = np.array([p[1] for p in ring], _I64)
            if len(xs) >= 4:
                rr.append((xs, ys))
        if rr:
            out.append(rr)
    return out


def clip_polygons_packed(g: "geo.PackedParts", ring_type: np.ndarray,
                         poly_id: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """Batch driver over packed arrays (the composite kernel's polygon path).

    ``g``/``ring_type``/``poly_id`` as produced by geometry.assemble_polygons
    (rings of a polygon are contiguous). ``lo``/``hi`` are per-FEATURE clip
    bounds. Fully-inside polygons pass through with zero work (vectorized
    bbox test); only boundary polygons run the exact tracer.

    Returns (PackedParts, ring_types) with output polygons' rings contiguous
    (outer first).
    """
    nrings = len(g.part_feat)
    if nrings == 0:
        return (geo.PackedParts(geo.EMPTY_I64, geo.EMPTY_I64,
                                np.zeros(1, _I64), geo.EMPTY_I64),
                np.empty(0, np.int8))

    minx, miny, maxx, maxy = geo.ring_bboxes(g)
    flo = lo[g.part_feat]
    fhi = hi[g.part_feat]
    ring_inside = (minx >= flo) & (maxx <= fhi) & (miny >= flo) & (maxy <= fhi)

    # polygon boundaries: change of (feature, poly_id)
    key_change = np.ones(nrings, bool)
    key_change[1:] = (g.part_feat[1:] != g.part_feat[:-1]) | (poly_id[1:] != poly_id[:-1])
    poly_starts = np.nonzero(key_change)[0]
    poly_ends = np.concatenate([poly_starts[1:], [nrings]])

    out_x: list[np.ndarray] = []
    out_y: list[np.ndarray] = []
    out_feat: list[int] = []
    out_rt: list[int] = []
    out_sizes: list[int] = []

    for ps, pe in zip(poly_starts, poly_ends):
        feat = int(g.part_feat[ps])
        if ring_inside[ps:pe].all():
            for ri in range(ps, pe):
                s, e = g.part_start[ri], g.part_start[ri + 1]
                out_x.append(g.vx[s:e])
                out_y.append(g.vy[s:e])
                out_feat.append(feat)
                out_rt.append(1 if ri == ps else 2)
                out_sizes.append(int(e - s))
            continue
        rings = []
        for ri in range(ps, pe):
            s, e = g.part_start[ri], g.part_start[ri + 1]
            rings.append((g.vx[s:e], g.vy[s:e]))
        for poly in clip_polygon(rings, int(flo[ps]), int(fhi[ps])):
            for k, (xs, ys) in enumerate(poly):
                out_x.append(xs)
                out_y.append(ys)
                out_feat.append(feat)
                out_rt.append(1 if k == 0 else 2)
                out_sizes.append(len(xs))

    if not out_x:
        return (geo.PackedParts(geo.EMPTY_I64, geo.EMPTY_I64,
                                np.zeros(1, _I64), geo.EMPTY_I64),
                np.empty(0, np.int8))
    vx = np.concatenate(out_x).astype(_I64)
    vy = np.concatenate(out_y).astype(_I64)
    part_start = np.concatenate([[0], np.cumsum(out_sizes)]).astype(_I64)
    return (geo.PackedParts(vx, vy, part_start, np.array(out_feat, _I64)),
            np.array(out_rt, np.int8))
