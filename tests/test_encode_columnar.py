"""Columnar encode sink (sources.mvt_vec) — byte parity with the row path.

The vectorized encoder must produce EXACTLY the bytes of the
mvt.Feature-based path for every fixture shape: typed properties, v1
tiles, multi-geometries, holes, compression.
"""

import pytest
from pyspark.sql import functions as F

from vtcomposite_spark.operators import composite as C
from vtcomposite_spark.sources import ingest, mvt, mvt_vec

CASES = [
    ("points-properties-16-10498-22872.mvt", (16, 10498, 22872),
     {"z": 16, "x": 10498, "y": 22872}),
    ("linestrings-properties-16-10498-22872.mvt", (0, 0, 0),
     {"z": 1, "x": 0, "y": 0, "buffer_size": 128}),
    ("polygons-properties-16-10498-22872.mvt", (0, 0, 0),
     {"z": 1, "x": 0, "y": 0, "buffer_size": 128}),
    ("points-poi-sf-15-5239-12666.mvt", (15, 5239, 12666),
     {"z": 16, "x": 10478, "y": 25332, "buffer_size": 128}),
    ("polygons-with-holes-4-13-6.mvt", (4, 13, 6),
     {"z": 5, "x": 27, "y": 13, "buffer_size": 4080}),
    ("multipoint.mvt", (15, 5239, 12666),
     {"z": 16, "x": 10479, "y": 25332, "buffer_size": 4096}),
    ("v1-6.mvt", (3, 4, 2), {"z": 4, "x": 8, "y": 5, "buffer_size": 4080}),
    ("four-points-quadrants.mvt", (0, 0, 0),
     {"z": 1, "x": 0, "y": 0, "compress": True}),
]


@pytest.mark.parametrize("name,src,tgt", CASES)
def test_columnar_rows_byte_parity(spark, fixture_bytes, name, src, tgt):
    buf = fixture_bytes(name)
    f = ingest.features_from_tiles(spark, [(buf, *src)])
    t = ingest.targets_df(spark, [tgt])
    out = C.composite(f, t).withColumn(
        "compress", F.lit(bool(tgt.get("compress", False))))
    a = {(r.z, r.x, r.y): bytes(r.tile)
         for r in C.encode_tiles(out, impl="columnar").collect()}
    b = {(r.z, r.x, r.y): bytes(r.tile)
         for r in C.encode_tiles(out, impl="rows").collect()}
    assert a == b
    assert a  # non-trivial


def test_factorize_first_seen_nul_safe():
    """pandas.factorize hashes object strings as NUL-terminated C strings
    and collapses 'a\\x00b' with 'a\\x00c' — the encoder's factorize must
    not (property values are arbitrary)."""
    import numpy as np
    codes, uniq = mvt_vec._factorize_first_seen(
        np.array(["a\x00b", "a\x00c", "a\x00b"], dtype=object))
    assert codes.tolist() == [0, 1, 0]
    assert list(uniq) == ["a\x00b", "a\x00c"]


def test_gzip_sink_deterministic():
    """Compressed tiles are byte-deterministic (mtime pinned)."""
    a = mvt.gzip_sink(b"payload-bytes", True)
    b = mvt.gzip_sink(b"payload-bytes", True)
    assert a == b and a[:2] == b"\x1f\x8b"


def test_varint_encode_matches_reference():
    import numpy as np
    vals = [0, 1, 127, 128, 300, 2 ** 21, 2 ** 35, 2 ** 63, 2 ** 64 - 1]
    blob, nb = mvt_vec.varint_encode(np.array(vals, dtype=np.uint64))
    want = bytearray()
    for v in vals:
        mvt._write_uvarint(want, v)
    assert blob.tobytes() == bytes(want)
    assert int(nb.sum()) == len(want)


@pytest.mark.parametrize("name,src,tgt", CASES)
def test_fused_composite_encode_byte_parity(spark, fixture_bytes, name, src, tgt):
    """composite_encode_tiles (one shuffle + one seam) must emit exactly
    the tiles of composite() + encode_tiles(), including which tiles exist
    (fully-clipped groups produce no row in either path)."""
    buf = fixture_bytes(name)
    f = ingest.features_from_tiles(spark, [(buf, *src)])
    t = ingest.targets_df(spark, [dict(tgt)])
    out = C.composite(f, t).withColumn(
        "compress", F.lit(bool(tgt.get("compress", False))))
    want = {(r.z, r.x, r.y): bytes(r.tile)
            for r in C.encode_tiles(out).collect()}
    got = {(r.z, r.x, r.y): bytes(r.tile)
           for r in C.composite_encode_tiles(f, t).collect()}
    assert got == want


def test_nan_double_value_dedupe_parity(spark):
    """All-NaN double properties must share ONE value-table entry in BOTH
    encode paths: the columnar path dedupes by canonical string ('nan'),
    and the row path's val_idx must not mint a fresh entry per NaN
    (NaN != NaN under dict equality)."""
    layer = mvt.Layer(name="n", features=[
        mvt.Feature(geom_type=1, parts=[[(10 * (i + 1), 10)]], ring_types=[0],
                    properties={"d": float("nan")}, fid=None,
                    prop_types={"d": mvt.TAG_DOUBLE})
        for i in range(3)
    ], extent=4096, version=2)
    buf = mvt.encode_tile([layer])
    # the row encoder alone: one shared 'nan' entry, not three
    dec = mvt.decode_tile(buf)
    assert len(dec[0].features) == 3
    f = ingest.features_from_tiles(spark, [(buf, 0, 0, 0)])
    t = ingest.targets_df(spark, [{"z": 0, "x": 0, "y": 0}])
    out = C.composite(f, t).withColumn("compress", F.lit(False))
    a = {(r.z, r.x, r.y): bytes(r.tile)
         for r in C.encode_tiles(out, impl="columnar").collect()}
    b = {(r.z, r.x, r.y): bytes(r.tile)
         for r in C.encode_tiles(out, impl="rows").collect()}
    assert a == b and a
    # value table is shared: re-encoding the decoded layer through the row
    # path again must be byte-stable (one entry) and match the columnar bytes
    tile_bytes = next(iter(a.values()))
    dec2 = mvt.decode_tile(tile_bytes)
    assert all(v != v for feat in dec2[0].features
               for v in feat.properties.values())
