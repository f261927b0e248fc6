"""Columnar MVT encoder — the S3 sink's hot path, numpy over Arrow buffers.

Byte-identical to ``mvt.encode_tile`` over ``mvt.Feature`` objects (the
row-at-a-time reference path, kept for tests), but built from the flat
Arrow arrays a grouped tile arrives as, with NO per-feature python:

* ONE vectorized pass builds the geometry command stream for every feature
  of a layer (MoveTo/LineTo/ClosePath headers scattered between zigzag'd
  per-feature-cursor deltas), ONE vectorized varint pass emits the blob.
* property key/value tables factorize first-seen (np.unique + stable
  reorder — NUL-safe, unlike pandas' C-string hashing) with a typed
  post-dedupe so the value table is keyed on (tag, typed value) exactly
  like the row path.
* feature protobuf framing is assembled by scattering constant bytes,
  vectorized length varints, and bulk blob gathers into one output buffer.

Measured ~9× over the itertuples row path on the 2000-feature
linestrings-properties fixture (45 → ~5 ms/tile single-thread).
"""

from __future__ import annotations

import struct

import numpy as np

from . import mvt

_I64 = np.int64
_U64 = np.uint64
_U8 = np.uint8


def _multi_arange(starts, stops):
    starts = np.asarray(starts, _I64)
    stops = np.asarray(stops, _I64)
    lens = stops - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, _I64)
    shift = np.repeat(starts - np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
    return shift + np.arange(total, dtype=_I64)


def varint_encode(vals: np.ndarray):
    """Vectorized protobuf varints: (blob uint8 array, per-value counts)."""
    vals = vals.astype(_U64)
    n = len(vals)
    if n == 0:
        return np.empty(0, _U8), np.zeros(0, _I64)
    nb = np.ones(n, _I64)
    for k in range(1, 10):
        more = vals >= (_U64(1) << _U64(7 * k))
        if not more.any():
            break
        nb += more.astype(_I64)
    pos = np.concatenate([[0], np.cumsum(nb)]).astype(_I64)
    out = np.zeros(int(pos[-1]), _U8)
    for k in range(10):
        mask = nb > k
        if not mask.any():
            break
        v = (vals[mask] >> _U64(7 * k)) & _U64(0x7F)
        cont = (nb[mask] - 1 > k).astype(_U8)
        out[pos[:-1][mask] + k] = v.astype(_U8) | (cont << 7)
    return out, nb


def _zigzag(v: np.ndarray) -> np.ndarray:
    return ((v << 1) ^ (v >> 63)).astype(_U64)


_UV_SMALL = [bytes([i]) for i in range(128)]


def _uv(n: int) -> bytes:
    if n < 128:
        return _UV_SMALL[n]
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _factorize_first_seen(arr: np.ndarray):
    """(codes, uniques-in-first-seen-order). np.unique-based: python-object
    comparison, so strings with embedded NULs factorize correctly (pandas'
    factorize hashes object strings as NUL-terminated C strings)."""
    uniq, first_idx, inv = np.unique(arr, return_index=True,
                                     return_inverse=True)
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty(len(uniq), _I64)
    rank[order] = np.arange(len(uniq), dtype=_I64)
    return rank[inv], uniq[order]


def _encode_value_fast(tag: int, tv) -> bytes:
    """MVT Value message, minimal-overhead twin of mvt._encode_value."""
    if tag == mvt.TAG_STRING:
        b = str(tv).encode("utf-8")
        return b"\x0a" + _uv(len(b)) + b
    if tag == mvt.TAG_DOUBLE:
        return b"\x19" + struct.pack("<d", tv)
    if tag == mvt.TAG_FLOAT:
        return b"\x15" + struct.pack("<f", tv)
    if tag == mvt.TAG_INT:
        return b"\x20" + _uv(tv + (1 << 64) if tv < 0 else tv)
    if tag == mvt.TAG_UINT:
        return b"\x28" + _uv(tv)
    if tag == mvt.TAG_SINT:
        return b"\x30" + _uv(((tv << 1) ^ (tv >> 63)) & ((1 << 64) - 1))
    if tag == mvt.TAG_BOOL:
        return b"\x38" + _uv(int(bool(tv)))
    raise TypeError(f"unsupported property value tag {tag}")


def _geometry_blob(gt, vst, ven, xs_vals, ys_vals, pst, pen, po_vals):
    """Vectorized geometry command stream for one layer's features.

    Returns (blob uint8 array, per-feature byte offsets int64[F+1]).
    Replicates mvt._encode_geometry exactly: per-feature cursor, points
    collapse multipoint parts into one MoveTo of their first vertices,
    polygons drop the closing vertex and append ClosePath.
    """
    F = len(gt)
    nparts = pen - pst
    pf = np.repeat(np.arange(F, dtype=_I64), nparts)
    if len(pf) == 0:
        return np.empty(0, _U8), np.zeros(F + 1, _I64)
    rel = po_vals[_multi_arange(pst, pen)].astype(_I64)
    abs_start = rel + vst[pf]
    abs_end = np.empty_like(abs_start)
    abs_end[:-1] = abs_start[1:]
    last_part = np.cumsum(nparts)[nparts > 0] - 1
    abs_end[last_part] = ven[nparts > 0]

    pk = gt[pf]
    sizes = abs_end - abs_start
    closed = np.zeros(len(pf), bool)
    poly = pk == 3
    if poly.any():
        s = abs_start[poly]
        e = abs_end[poly]
        closed[poly] = (sizes[poly] > 1) & (xs_vals[s] == xs_vals[e - 1]) \
            & (ys_vals[s] == ys_vals[e - 1])
    kept_end = np.where(pk == 1, np.minimum(abs_start + 1, abs_end),
                        abs_end - closed.astype(_I64))
    kept_end = np.maximum(kept_end, abs_start)

    # units: one per part, except consecutive point-parts of a feature merge
    new_unit = np.ones(len(pf), bool)
    new_unit[1:] = (pf[1:] != pf[:-1]) | (pk[1:] != 1) | (pk[:-1] != 1)
    unit_id = np.cumsum(new_unit) - 1
    nunits = int(unit_id[-1]) + 1
    unit_feat = pf[new_unit]
    unit_kind = pk[new_unit]

    nkept_part = kept_end - abs_start
    unit_nv = np.bincount(unit_id, weights=nkept_part, minlength=nunits).astype(_I64)
    is_pt = unit_kind == 1
    has_cmd2 = (~is_pt) & (unit_nv >= 2)
    words_per_unit = np.where(
        is_pt, 1 + 2 * unit_nv,
        3 + has_cmd2.astype(_I64) + 2 * np.maximum(unit_nv - 1, 0)
        + (unit_kind == 3).astype(_I64))
    unit_off = np.concatenate([[0], np.cumsum(words_per_unit)]).astype(_I64)
    words = np.zeros(int(unit_off[-1]), _U64)

    cmd1 = np.where(is_pt, (unit_nv.astype(_U64) << _U64(3)) | _U64(1), _U64(9))
    words[unit_off[:-1]] = cmd1
    c2 = np.nonzero(has_cmd2)[0]
    words[unit_off[:-1][c2] + 3] = \
        ((unit_nv[c2] - 1).astype(_U64) << _U64(3)) | _U64(2)
    cp = np.nonzero(unit_kind == 3)[0]
    words[unit_off[1:][cp] - 1] = _U64(7)

    kept_take = _multi_arange(abs_start, kept_end)
    kx = xs_vals[kept_take].astype(_I64)
    ky = ys_vals[kept_take].astype(_I64)
    kv_part = np.repeat(np.arange(len(pf), dtype=_I64), nkept_part)
    kv_unit = unit_id[kv_part]
    kv_feat = pf[kv_part]
    dx = np.empty_like(kx)
    dy = np.empty_like(ky)
    dx[0] = kx[0]
    dy[0] = ky[0]
    dx[1:] = kx[1:] - kx[:-1]
    dy[1:] = ky[1:] - ky[:-1]
    feat_first = np.ones(len(kx), bool)
    feat_first[1:] = kv_feat[1:] != kv_feat[:-1]
    dx[feat_first] = kx[feat_first]
    dy[feat_first] = ky[feat_first]

    unit_kv_start = np.concatenate([[0], np.cumsum(unit_nv)]).astype(_I64)
    j = np.arange(len(kx), dtype=_I64) - unit_kv_start[kv_unit]
    posx = unit_off[kv_unit] + 1 + 2 * j \
        + ((unit_kind[kv_unit] != 1) & (j >= 1)).astype(_I64)
    words[posx] = _zigzag(dx)
    words[posx + 1] = _zigzag(dy)

    blob, nb = varint_encode(words)
    wf = np.repeat(unit_feat, words_per_unit)
    feat_bytes = np.bincount(wf, weights=nb, minlength=F).astype(_I64)
    return blob, np.concatenate([[0], np.cumsum(feat_bytes)]).astype(_I64)


def encode_layer_columnar(name, version, extent, gt, fid_vals, fid_valid,
                          vst, ven, xs_vals, ys_vals, pst, pen, po_vals,
                          keys_flat, svals_flat, tags_flat, est, een) -> bytes:
    """One MVT layer from flat arrays; features in the given order."""
    F = len(gt)
    # --- property tables (first-seen; value table typed like the row path)
    nent = een - est
    tag_starts = np.zeros(F + 1, _I64)
    tagblob = np.empty(0, _U8)
    key_table: list = []
    value_bytes: list[bytes] = []
    if int(nent.sum()) > 0:
        take = _multi_arange(est, een)
        ef = np.repeat(np.arange(F, dtype=_I64), nent)
        k_codes, key_uniq = _factorize_first_seen(keys_flat[take])
        key_table = list(key_uniq)
        tg = tags_flat[take]
        s_codes, s_uniq = _factorize_first_seen(svals_flat[take])
        # int combo (tag, string code) — second factorize on int64, cheap
        M = _I64(len(s_uniq) + 1)
        c_codes, c_uniq = _factorize_first_seen(tg * M + s_codes)
        # typed dedupe over the (few) uniques — (tag, typed value) keyed,
        # matching mvt._encode_layer's val_idx
        remap = np.empty(len(c_uniq), _I64)
        seen: dict = {}
        s_uniq_l = list(s_uniq)
        for u, c in enumerate(c_uniq.tolist()):
            tag, sc = divmod(c, int(M))
            tv = mvt.from_canonical(tag, s_uniq_l[sc])
            kk = (tag, tv)
            if kk not in seen:
                seen[kk] = len(value_bytes)
                value_bytes.append(_encode_value_fast(tag, tv))
            remap[u] = seen[kk]
        v_final = remap[c_codes]
        twords = np.empty(2 * len(take), _U64)
        twords[0::2] = k_codes.astype(_U64)
        twords[1::2] = v_final.astype(_U64)
        tagblob, tnb = varint_encode(twords)
        tb = np.bincount(np.repeat(ef, 2), weights=tnb, minlength=F).astype(_I64)
        tag_starts = np.concatenate([[0], np.cumsum(tb)]).astype(_I64)

    geoblob, geo_starts = _geometry_blob(gt, vst, ven, xs_vals, ys_vals,
                                         pst, pen, po_vals)

    # --- vectorized feature framing ---
    # per feature: 0x12 uv(fb_len) [0x08 uv(fid)] [0x12 uv(taglen) tags]
    #              0x18 gt 0x22 uv(geolen) geom        (gt < 128 always)
    taglen = np.diff(tag_starts)
    geolen = np.diff(geo_starts)
    has_tags = taglen > 0
    fid_uv, fid_nb_p = varint_encode(fid_vals[fid_valid])
    fid_nb = np.zeros(F, _I64)
    fid_nb[fid_valid] = fid_nb_p
    fid_len = np.where(fid_valid, 1 + fid_nb, 0)
    taglen_uv, tagl_nb_p = varint_encode(taglen[has_tags])
    tag_hdr = np.zeros(F, _I64)
    tag_hdr[has_tags] = 1 + tagl_nb_p
    geolen_uv, geol_nb = varint_encode(geolen)
    fb_len = fid_len + tag_hdr + taglen + 2 + 1 + geol_nb + geolen
    fb_uv, fb_nb = varint_encode(fb_len)
    total = int((1 + fb_nb + fb_len).sum())
    out = np.zeros(total, _U8)
    fstart = np.concatenate([[0], np.cumsum(1 + fb_nb + fb_len)]).astype(_I64)[:-1]

    out[fstart] = 0x12
    p = fstart + 1
    out[_multi_arange(p, p + fb_nb)] = fb_uv
    p = p + fb_nb
    pv = p[fid_valid]
    out[pv] = 0x08
    out[_multi_arange(pv + 1, pv + 1 + fid_nb[fid_valid])] = fid_uv
    p = p + fid_len
    pt = p[has_tags]
    out[pt] = 0x12
    out[_multi_arange(pt + 1, pt + tag_hdr[has_tags])] = taglen_uv
    out[_multi_arange(p + tag_hdr, p + tag_hdr + taglen)] = tagblob
    p = p + tag_hdr + taglen
    out[p] = 0x18
    out[p + 1] = gt.astype(_U8)
    out[p + 2] = 0x22
    out[_multi_arange(p + 3, p + 3 + geol_nb)] = geolen_uv
    out[_multi_arange(p + 3 + geol_nb, p + 3 + geol_nb + geolen)] = geoblob

    head = [b"\x78" + _uv(int(version)),
            b"\x0a" + _uv(len(name.encode("utf-8"))) + name.encode("utf-8")]
    tail = []
    for k in key_table:
        kb = k.encode("utf-8")
        tail.append(b"\x1a" + _uv(len(kb)) + kb)
    for vb in value_bytes:
        tail.append(b"\x22" + _uv(len(vb)) + vb)
    tail.append(b"\x28" + _uv(int(extent)))
    body = b"".join(head) + out.tobytes() + b"".join(tail)
    return b"\x1a" + _uv(len(body)) + body  # tile-level field 3


def _np_col(tbl, name):
    import pyarrow as pa
    col = tbl.column(name)
    return col.chunk(0) if isinstance(col, pa.ChunkedArray) else col


def encode_tile_table(tbl) -> tuple[int, int, int, bytes]:
    """One grouped tile (pa.Table with the composite output columns) →
    (z, x, y, tile bytes). Feature order: tile_idx, feature_idx (stable);
    layers in first-seen order (O3, reference src/vtcomposite.cpp:239,742).
    """
    import pyarrow.compute as pc

    tbl = tbl.combine_chunks()
    order = pc.sort_indices(tbl, sort_keys=[("tile_idx", "ascending"),
                                            ("feature_idx", "ascending")])
    tbl = tbl.take(order).combine_chunks()

    z = tbl.column("z")[0].as_py()
    x = tbl.column("x")[0].as_py()
    y = tbl.column("y")[0].as_py()
    compress = bool(tbl.column("compress")[0].as_py()) \
        if "compress" in tbl.column_names else False

    def list_parts(colname, dtype):
        arr = _np_col(tbl, colname)
        off = arr.offsets.to_numpy(zero_copy_only=False).astype(_I64)
        vals = arr.values.to_numpy(zero_copy_only=False).astype(dtype)
        return off, vals

    xs_off, xs_vals = list_parts("xs", _I64)
    _, ys_vals = list_parts("ys", _I64)
    po_off, po_vals = list_parts("part_offsets", _I64)
    gt_all = _np_col(tbl, "geom_type").to_numpy(zero_copy_only=False).astype(_I64)
    layer_all = _np_col(tbl, "layer").to_numpy(zero_copy_only=False)
    lv_arr = _np_col(tbl, "layer_version").fill_null(2) \
        .to_numpy(zero_copy_only=False).astype(_I64)
    ext_arr = _np_col(tbl, "extent").to_numpy(zero_copy_only=False).astype(_I64)
    fid_arr = _np_col(tbl, "feature_id")
    fid_valid_all = ~fid_arr.is_null().to_numpy(zero_copy_only=False)
    fid_all = fid_arr.fill_null(0).to_numpy(zero_copy_only=False).astype(_I64)

    has_types = "prop_types" in tbl.column_names
    parr = _np_col(tbl, "properties")
    p_off = parr.offsets.to_numpy(zero_copy_only=False).astype(_I64)
    p_keys = parr.keys.to_numpy(zero_copy_only=False)
    p_vals = parr.items.to_numpy(zero_copy_only=False)
    if has_types:
        tarr = _np_col(tbl, "prop_types")
        t_off = tarr.offsets.to_numpy(zero_copy_only=False).astype(_I64)
        t_keys = tarr.keys.to_numpy(zero_copy_only=False)
        if tarr.items.null_count == 0:
            t_vals = tarr.items.to_numpy(zero_copy_only=False).astype(_I64)
        else:
            t_vals = np.array(
                [mvt.TAG_STRING if v is None else int(v)
                 for v in tarr.items.to_pylist()], dtype=_I64)
        # fast path: both maps share entry order (ingestion + localize keep
        # them aligned); else per-row dict matching
        if (len(t_keys) == len(p_keys) and np.array_equal(t_off, p_off)
                and bool(np.all(t_keys == p_keys))):
            p_tags = t_vals
        else:
            p_tags = np.empty(len(p_keys), _I64)
            for r in range(len(p_off) - 1):
                d = {t_keys[i]: t_vals[i] for i in range(t_off[r], t_off[r + 1])}
                for i in range(p_off[r], p_off[r + 1]):
                    p_tags[i] = d.get(p_keys[i]) or mvt.TAG_STRING
    else:
        p_tags = np.full(len(p_keys), mvt.TAG_STRING, _I64)

    # layers in first-seen order; rows within a layer keep global order
    l_codes, l_uniq = _factorize_first_seen(layer_all)
    parts = []
    for li, nm in enumerate(l_uniq):
        ridx = np.nonzero(l_codes == li)[0].astype(_I64)
        parts.append(encode_layer_columnar(
            nm, lv_arr[ridx[0]], ext_arr[ridx[0]],
            gt_all[ridx], fid_all[ridx], fid_valid_all[ridx],
            xs_off[ridx], xs_off[ridx + 1], xs_vals, ys_vals,
            po_off[ridx], po_off[ridx + 1], po_vals,
            p_keys, p_vals, p_tags, p_off[ridx], p_off[ridx + 1]))
    buf = b"".join(parts)
    return z, x, y, mvt.gzip_sink(buf, compress)
