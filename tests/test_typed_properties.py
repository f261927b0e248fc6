"""Typed MVT property values end-to-end (S2/S3/F12).

The reference decodes property values as a typed union and re-emits them
with their original wire types (src/vtcomposite.cpp:768-828,
src/feature_builder.hpp:169-180). These tests pin the engine's equivalent:
canonical-string transport + prop_types tag map through
ingest → composite/localize → encode, with values AND types preserved.
"""

import pytest
from pyspark.sql import functions as F

from vtcomposite_spark.operators import composite as C
from vtcomposite_spark.operators.localize import localize
from vtcomposite_spark.sources import ingest, mvt

TYPED_PROPS = {
    "name": "pond",            # string (tag 1)
    "temp": 19.25,             # float32-representable
    "area": 0.1,               # double (0.1 is not float32-exact)
    "population": 12000,       # int
    "huge": (1 << 63) + 5,     # uint (doesn't fit int64)
    "delta": -42,              # sint
    "wet": True,               # bool
    "dry": False,
}
TYPED_TAGS = {
    "name": mvt.TAG_STRING, "temp": mvt.TAG_FLOAT, "area": mvt.TAG_DOUBLE,
    "population": mvt.TAG_INT, "huge": mvt.TAG_UINT, "delta": mvt.TAG_SINT,
    "wet": mvt.TAG_BOOL, "dry": mvt.TAG_BOOL,
}


def typed_tile(extra=None, geom=((100, 100),)):
    props = dict(TYPED_PROPS)
    tags = dict(TYPED_TAGS)
    for k, (v, t) in (extra or {}).items():
        props[k] = v
        tags[k] = t
    layer = mvt.Layer(name="typed", features=[mvt.Feature(
        geom_type=1, parts=[[tuple(p) for p in geom]],
        ring_types=[0] * len(geom), properties=props, prop_types=tags)])
    return mvt.encode_tile([layer])


def test_codec_typed_roundtrip_bytes():
    """decode(encode(x)) preserves every value, every tag — and re-encoding
    the decode is byte-identical (tags drive the exact wire variant)."""
    buf = typed_tile()
    layers = mvt.decode_tile(buf)
    f = layers[0].features[0]
    assert f.properties == TYPED_PROPS
    assert f.prop_types == TYPED_TAGS
    assert mvt.encode_tile(layers) == buf


def test_float32_tag_reencodes_as_float32():
    """A float32 value must come back as the 4-byte variant, not double."""
    buf = typed_tile()
    f = mvt.decode_tile(buf)[0].features[0]
    import struct
    assert f.properties["temp"] == struct.unpack("<f", struct.pack("<f", 19.25))[0]
    assert f.prop_types["temp"] == mvt.TAG_FLOAT
    # value-table dedupe is type-aware: int 1 / uint 1 / bool true distinct
    buf2 = typed_tile(extra={"one_i": (1, mvt.TAG_INT), "one_u": (1, mvt.TAG_UINT),
                             "one_b": (True, mvt.TAG_BOOL)})
    f2 = mvt.decode_tile(buf2)[0].features[0]
    assert (f2.prop_types["one_i"], f2.prop_types["one_u"], f2.prop_types["one_b"]) \
        == (mvt.TAG_INT, mvt.TAG_UINT, mvt.TAG_BOOL)


@pytest.mark.parametrize("tag,val", [
    (mvt.TAG_STRING, "héllo"), (mvt.TAG_FLOAT, 19.25), (mvt.TAG_DOUBLE, 0.1),
    (mvt.TAG_DOUBLE, 1e300), (mvt.TAG_DOUBLE, -1.7976931348623157e308),
    (mvt.TAG_INT, -(1 << 62)), (mvt.TAG_UINT, (1 << 64) - 1),
    (mvt.TAG_SINT, -1), (mvt.TAG_BOOL, True), (mvt.TAG_BOOL, False),
])
def test_canonical_string_roundtrip(tag, val):
    assert mvt.from_canonical(tag, mvt.to_canonical(tag, val)) == val


def _composite_decode(spark, tiles, target):
    f = ingest.features_from_tiles(spark, tiles)
    t = ingest.targets_df(spark, [target])
    df = C.composite(f, t).withColumn("compress", F.lit(False))
    out = C.encode_tiles(df).collect()
    assert len(out) == 1
    return mvt.decode_tile(bytes(out[0].tile))


def test_composite_preserves_types_synthetic_overzoom(spark):
    """VERDICT r1 done-criterion: composite a tile with numeric/bool
    properties; decoded output values AND types must match the input."""
    buf = typed_tile(geom=((100, 100),))  # top-left quadrant at z0
    layers = _composite_decode(spark, [(buf, 0, 0, 0)], {"z": 1, "x": 0, "y": 0})
    f = layers[0].features[0]
    assert f.properties == TYPED_PROPS
    assert f.prop_types == TYPED_TAGS


def test_composite_preserves_types_real_fixture(spark, fixture_bytes):
    """Golden: the reference's own typed bench fixture (string/float/double/
    int values) through same-zoom composite — every feature's properties
    and types survive byte-faithfully."""
    buf = fixture_bytes("points-properties-16-10498-22872.mvt")
    want = mvt.decode_tile(buf)
    got = _composite_decode(spark, [(buf, 16, 10498, 22872)],
                            {"z": 16, "x": 10498, "y": 22872})
    want_feats = [(l.name, f.properties, f.prop_types)
                  for l in want for f in l.features]
    got_feats = [(l.name, f.properties, f.prop_types)
                 for l in got for f in l.features]
    assert got_feats == want_feats
    tag_set = {t for _, _, tags in want_feats for t in tags.values()}
    assert {mvt.TAG_FLOAT, mvt.TAG_DOUBLE, mvt.TAG_INT} <= tag_set  # really typed


def _localize_decode(spark, buf, **kwargs):
    f = ingest.features_from_tiles(spark, [(buf, 0, 0, 0)])
    out = localize(f, **kwargs)
    rows = (out.withColumn("z", F.lit(0)).withColumn("x", F.lit(0).cast("long"))
            .withColumn("y", F.lit(0).cast("long"))
            .withColumn("compress", F.lit(False)))
    tiles = C.encode_tiles(rows).collect()
    if not tiles:
        return []
    return mvt.decode_tile(bytes(tiles[0].tile))


def _one_feature_tile(props, tags):
    layer = mvt.Layer(name="places", features=[mvt.Feature(
        geom_type=1, parts=[[(10, 10)]], ring_types=[0],
        properties=props, prop_types=tags)])
    return mvt.encode_tile([layer])


def test_localize_passthrough_keeps_types(spark):
    """Localized mode: class/population keep their original types; generated
    worldview/name keys are strings (the reference carries property values
    typed through final_properties, src/vtcomposite.cpp:944-998)."""
    buf = _one_feature_tile(
        {"name": "pond", "population": 12000, "elevation": 0.5, "wet": True,
         "_mbx_class": 7, "_mbx_worldview": "US,JP"},
        {"name": 1, "population": 4, "elevation": 3, "wet": 7,
         "_mbx_class": 4, "_mbx_worldview": 1})
    layers = _localize_decode(spark, buf, languages=["en"], worldviews=["US"])
    f = layers[0].features[0]
    assert f.properties == {"population": 12000, "elevation": 0.5, "wet": True,
                            "class": 7, "name": "pond", "name_local": "pond",
                            "worldview": "US"}
    assert f.prop_types == {"population": mvt.TAG_INT, "elevation": mvt.TAG_DOUBLE,
                            "wet": mvt.TAG_BOOL, "class": mvt.TAG_INT,
                            "name": mvt.TAG_STRING, "name_local": mvt.TAG_STRING,
                            "worldview": mvt.TAG_STRING}


def test_localize_drops_nonstring_worldview(spark):
    """F12: a non-string worldview value drops the feature — in localized
    mode for both the plain and hidden key (src/vtcomposite.cpp:787-799,
    805-807), in non-localized mode with the roles swapped (:694-699)."""
    keep = _one_feature_tile({"name": "ok", "_mbx_worldview": "US"},
                             {"name": 1, "_mbx_worldview": 1})
    hidden_int = _one_feature_tile({"name": "bad", "_mbx_worldview": 5},
                                   {"name": 1, "_mbx_worldview": 4})
    plain_int = _one_feature_tile({"name": "bad", "worldview": 5},
                                  {"name": 1, "worldview": 4})
    assert _localize_decode(spark, keep, worldviews=["US"])[0].features
    assert _localize_decode(spark, hidden_int, worldviews=["US"]) == []
    assert _localize_decode(spark, plain_int, worldviews=["US"]) == []
    # non-localized: plain worldview is the compatible key — non-string drops
    assert _localize_decode(spark, plain_int) == []
    # ...but a string plain worldview passes through (moved last)
    plain_str = _one_feature_tile({"worldview": "US,JP", "name": "ok"},
                                  {"worldview": 1, "name": 1})
    layers = _localize_decode(spark, plain_str)
    assert layers[0].features[0].properties == {"name": "ok", "worldview": "US,JP"}


def test_non_localized_output_key_order(spark):
    """Non-localized mode re-emits class, name, worldview at the END, in
    that order, after the inline pass-through keys
    (src/vtcomposite.cpp:944-998 + build_new_feature :617-643)."""
    buf = _one_feature_tile(
        {"zeta": "z", "worldview": "US", "class": "park", "name": "pond",
         "alpha": "a", "name_de": "teich"},
        {"zeta": 1, "worldview": 1, "class": 1, "name": 1, "alpha": 1,
         "name_de": 1})
    layers = _localize_decode(spark, buf)
    f = layers[0].features[0]
    assert list(f.properties) == ["zeta", "alpha", "name_de",
                                  "class", "name", "worldview"]
    assert f.properties["worldview"] == "US"


def test_localized_output_key_order(spark):
    """Localized mode order: inline base, class, name, name_local,
    worldview last."""
    buf = _one_feature_tile(
        {"zeta": "z", "_mbx_worldview": "US", "class": "park", "name": "pond",
         "alpha": "a"},
        {"zeta": 1, "_mbx_worldview": 1, "class": 1, "name": 1, "alpha": 1})
    layers = _localize_decode(spark, buf, languages=["en"], worldviews=["US"])
    f = layers[0].features[0]
    assert list(f.properties) == ["zeta", "alpha", "class", "name",
                                  "name_local", "worldview"]


def test_languages_all_output_key_order(spark):
    """languages=['all'] key order (VERDICT r3 item 3): the raw ``name``
    key stays INLINE at its input position — the reference emplaces it
    mid-scan (src/vtcomposite.cpp:862-868) and never re-emits it after
    class — followed by class, name_local, the re-keyed family, worldview
    last. Tag map order must track the properties map exactly."""
    buf = _one_feature_tile(
        {"zeta": "z", "_mbx_worldview": "US", "name": "pond",
         "class": "park", "alpha": "a", "_mbx_name_de": "teich",
         "name_en": "pond-en"},
        {"zeta": 1, "_mbx_worldview": 1, "name": 1, "class": 1, "alpha": 1,
         "_mbx_name_de": 1, "name_en": 1})
    layers = _localize_decode(spark, buf, languages=["all"], worldviews=["US"])
    f = layers[0].features[0]
    assert list(f.properties) == ["zeta", "name", "alpha", "class",
                                  "name_local", "name_de", "name_en",
                                  "worldview"]
    assert list(f.prop_types) == list(f.properties)
    assert f.properties["name"] == "pond"
    assert f.properties["name_local"] == "pond"


def test_localize_languages_all_keeps_language_value_types(spark):
    """languages=all: re-keyed name_xx values keep their tags (the reference
    stores property.value() typed in the temp hashmap, :870-877)."""
    buf = _one_feature_tile(
        {"name": "pond", "_mbx_name_de": "teich", "name_num": 7},
        {"name": 1, "_mbx_name_de": 1, "name_num": 4})
    layers = _localize_decode(spark, buf, languages=["all"])
    f = layers[0].features[0]
    assert f.properties["name_de"] == "teich"
    assert f.properties["name_num"] == 7
    assert f.prop_types["name_num"] == mvt.TAG_INT
