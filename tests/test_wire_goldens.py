"""Wire-format freeze: SHA-256 regression goldens of the ENGINE'S OWN
encoded bytes across the four byte-identical encode paths.

These pin OUR bytes, not the reference's — the reference addon is
unbuildable in this environment and ships no expected-output buffers
(test/vtcomposite.test.js asserts length, not bytes), so true
byte-equality against a reference-produced buffer remains unattainable
here. What these goldens DO give: any silent encoder drift (a change
that preserves lengths, decode-values and path self-consistency — the
residual exposure VERDICT r4 item 1 names) now fails loudly. If a
deliberate wire change lands, regenerate with
tools (the hash recipe is in _tileset_sha below) and say so in the
commit.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from vtcomposite_spark.operators import composite as C
from vtcomposite_spark.sources import ingest

# (fixture, source zxy, target row) → sha256 of the sorted
# "z/x/y:"+bytes concatenation (engine bytes frozen 2026-08-17)
GOLDENS = {
    ("points-properties-16-10498-22872.mvt", (16, 10498, 22872),
     (16, 10498, 22872, 0, False)):
        "70866d95670fd30f6fb8828be8915a6405bc17658c890f713d04518947d3ef1b",
    ("linestrings-properties-16-10498-22872.mvt", (0, 0, 0),
     (1, 0, 0, 128, False)):
        "4b020b02d9b2b4542078bf04b96d220253523edd96e0ceeb0d2965aa4df3071c",
    ("polygons-properties-16-10498-22872.mvt", (0, 0, 0),
     (1, 0, 0, 128, False)):
        "9b4da6a7f59774a13371d10a99f82a69c65f839f294b926246d09c9eabd0e210",
    ("points-poi-sf-15-5239-12666.mvt", (15, 5239, 12666),
     (16, 10478, 25332, 128, False)):
        "d36b37c0bdfb59b1cd6ea35fc7412fd316dfdac9b4f2c2cf8f47a41861564777",
    ("polygons-with-holes-4-13-6.mvt", (4, 13, 6),
     (5, 27, 13, 4080, False)):
        "79efdbe83ed3d4f091c9db56f8291601ac6f95dc737917847e9cac1d79996977",
    ("multipoint.mvt", (15, 5239, 12666),
     (16, 10479, 25332, 4096, False)):
        "b9f0e7454f63706d7c980044ffb5dbf3e1983048ab21fff93f702ae1bf08bf55",
    ("v1-6.mvt", (3, 4, 2), (4, 8, 5, 4080, False)):
        "41c7d00412d39fc17992ffe7646bcb15c43d3121e589f525f2a1baccab817584",
    ("four-points-quadrants.mvt", (0, 0, 0), (1, 0, 0, 0, True)):
        "da8134edcd7f5a76b214df23ddc53e98e3d318eb839142145a2ae815cad538e5",
    ("linestrings-properties-16-10498-22872.mvt", (4, 2, 3),
     (6, 9, 13, 64, True)):
        "ef5a6b029a109cb54ffe8872c92d6dc080087db2c940abf184079ce0954496f2",
    ("polygons-properties-16-10498-22872.mvt", (4, 2, 3),
     (6, 8, 12, 4080, False)):
        "81e3f5413cc7386bab9a3dca9574faf7fb1dd974be934643148304aefb5352a9",
}


def _tileset_sha(tiles: dict) -> str:
    h = hashlib.sha256()
    for (z, x, y), b in sorted(tiles.items()):
        h.update(f"{z}/{x}/{y}:".encode())
        h.update(b)
    return h.hexdigest()


def _collect(df) -> dict:
    return {(r.z, r.x, r.y): bytes(r.tile) for r in df.collect()}


@pytest.mark.parametrize("case", list(GOLDENS), ids=[
    f"{c[0].split('.')[0]}-{c[2][0]}-{c[2][1]}-{c[2][2]}" for c in GOLDENS])
def test_wire_bytes_frozen_all_paths(spark, fixture_bytes, case):
    """Every encode path must hash to the frozen golden: generic fused,
    source-grouped, unfused columnar, unfused rows, and the capped
    per-layer splice."""
    name, src, (z, x, y, buf_sz, compress) = case
    golden = GOLDENS[case]
    f = ingest.features_from_tiles(spark, [(fixture_bytes(name), *src)])
    t = ingest.targets_df(spark, [{
        "z": z, "x": x, "y": y, "buffer_size": buf_sz,
        "compress": compress}])

    got = {
        "fused_generic": _collect(
            C.composite_encode_tiles(f, t, src_zooms=None)),
        "source_grouped": _collect(
            C.composite_encode_tiles(f, t, src_zooms=[src[0]])),
        "fused_capped": _collect(
            C.composite_encode_tiles(f, t, max_pack_features=1 << 20)),
    }
    un = C.composite(f, t, src_zooms=None).withColumn(
        "compress", F.lit(bool(compress)))
    got["unfused_columnar"] = _collect(C.encode_tiles(un))
    got["unfused_rows"] = _collect(C.encode_tiles(un, impl="rows"))
    for path, tiles in got.items():
        assert _tileset_sha(tiles) == golden, (path, case)
