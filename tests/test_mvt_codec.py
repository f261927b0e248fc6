"""MVT codec tests: decode the reference's binary fixtures (read-only data
inputs) and verify against the values its tests assert; roundtrip encode.

Fixture-derived golden values:
* four-points-quadrants.mvt: layer 'quadrants', 4 point features, first at
  (640, 832) (implied by 2× == (1280,1664), test/vtcomposite-points.test.js:41-73)
* simple-line.mvt: layer 'quadrants', 1 linestring
"""

import os

import pytest

from vtcomposite_spark.sources import mvt

FIXTURES = "/root/reference/test/fixtures"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not available")


def load(name):
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


@needs_fixtures
def test_decode_four_points():
    layers = mvt.decode_tile(load("four-points-quadrants.mvt"))
    assert [l.name for l in layers] == ["quadrants"]
    feats = layers[0].features
    assert len(feats) == 4
    assert feats[0].geom_type == 1
    assert feats[0].parts[0][0] == (640, 832)
    assert feats[0].properties == {"quadrant": "top-left"}


@needs_fixtures
def test_decode_simple_line():
    layers = mvt.decode_tile(load("simple-line.mvt"))
    f = layers[0].features[0]
    assert f.geom_type == 2
    assert f.parts[0][0] == (392, 924)
    assert f.parts[0][1] == (2380, 1820)


@needs_fixtures
def test_decode_polygon_with_hole():
    layers = mvt.decode_tile(load("polygon-with-hole.mvt"))
    f = layers[0].features[0]
    assert f.geom_type == 3
    assert len(f.parts) == 2
    assert f.ring_types == [1, 2]
    for ring in f.parts:
        assert ring[0] == ring[-1]  # closed


@needs_fixtures
def test_roundtrip_reencode():
    for name in ["four-points-quadrants.mvt", "simple-line.mvt",
                 "polygon-with-hole.mvt", "points-poi-sf-15-5239-12666.mvt"]:
        layers = mvt.decode_tile(load(name))
        buf = mvt.encode_tile(layers)
        layers2 = mvt.decode_tile(buf)
        assert [l.name for l in layers] == [l.name for l in layers2]
        for a, b in zip(layers, layers2):
            assert a.extent == b.extent and a.version == b.version
            assert len(a.features) == len(b.features)
            for fa, fb in zip(a.features, b.features):
                assert fa.geom_type == fb.geom_type
                assert fa.parts == fb.parts
                assert fa.properties == fb.properties
                assert fa.fid == fb.fid


def test_gzip_rules():
    raw = b"\x1a\x05hello"
    gz = mvt.gzip_sink(raw, True)
    assert gz[:2] == b"\x1f\x8b"
    assert mvt.maybe_gunzip(gz) == raw
    assert mvt.maybe_gunzip(raw) == raw
    # empty tile stays 0-byte raw (src/vtcomposite.cpp:300-311)
    assert mvt.gzip_sink(b"", True) == b""
