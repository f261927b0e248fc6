"""Request-level API tests: reference call shapes, exact validation error
strings (test/vtcomposite-composite-param-validation.test.js and
-localize-param-validation.test.js cases), end-to-end buffers."""

import gzip

import pytest

from vtcomposite_spark import api
from vtcomposite_spark.sources import mvt


def test_composite_api_end_to_end(spark, fixture_bytes):
    buf = fixture_bytes("four-points-quadrants.mvt")
    out = api.composite([{"buffer": buf, "z": 0, "x": 0, "y": 0}],
                        {"z": 1, "x": 0, "y": 0}, spark=spark)
    layers = mvt.decode_tile(out)
    assert layers[0].features[0].parts == [[(1280, 1664)]]


def test_composite_api_compress_and_per_tile_layers(spark, fixture_bytes):
    buf = fixture_bytes("points-poi-sf-15-5239-12666.mvt")
    out = api.composite(
        [{"buffer": buf, "z": 15, "x": 5239, "y": 12666, "layers": ["poi_label"]}],
        {"z": 15, "x": 5239, "y": 12666}, {"compress": True}, spark=spark)
    assert out[:2] == b"\x1f\x8b"
    layers = mvt.decode_tile(out)
    assert [l.name for l in layers] == ["poi_label"]


def test_composite_api_empty_output_compress(spark, fixture_bytes):
    # empty result stays a 0-byte NON-gzipped buffer (test/vtcomposite.test.js:386-399)
    buf = fixture_bytes("four-points-quadrants.mvt")
    # target z14 tile in an empty quadrant region (descendant of 0/0/0 with no points)
    out = api.composite([{"buffer": buf, "z": 0, "x": 0, "y": 0}],
                        {"z": 14, "x": 0, "y": 0}, {"compress": True}, spark=spark)
    assert out == b""


def test_localize_api_end_to_end(spark, fixture_bytes):
    buf = fixture_bytes("points-poi-sf-15-5239-12666.mvt")
    out = api.localize({"buffer": buf, "languages": ["zh-Hans"]}, spark=spark)
    layers = mvt.decode_tile(out)
    props = layers[0].features[0].properties
    assert "name" in props and "name_local" in props
    assert not any(k.startswith("_mbx_") for k in props)


VALIDATION_CASES = [
    (("nope", {"z": 0, "x": 0, "y": 0}, None),
     "first arg 'tiles' must be an array of tile objects"),
    (([], {"z": 0, "x": 0, "y": 0}, None),
     "'tiles' array must be of length greater than 0"),
    ((["nope"], {"z": 0, "x": 0, "y": 0}, None),
     "items in 'tiles' array must be objects"),
    (([{"z": 0, "x": 0, "y": 0}], {"z": 0, "x": 0, "y": 0}, None),
     "item in 'tiles' array does not include a buffer value"),
    (([{"buffer": None, "z": 0, "x": 0, "y": 0}], {"z": 0, "x": 0, "y": 0}, None),
     "buffer value in 'tiles' array item is null or undefined"),
    (([{"buffer": "str", "z": 0, "x": 0, "y": 0}], {"z": 0, "x": 0, "y": 0}, None),
     "buffer value in 'tiles' array item is not a true buffer"),
    (([{"buffer": b"", "x": 0, "y": 0}], {"z": 0, "x": 0, "y": 0}, None),
     "item in 'tiles' array does not include a 'z' value"),
    (([{"buffer": b"", "z": "0", "x": 0, "y": 0}], {"z": 0, "x": 0, "y": 0}, None),
     "'z' value in 'tiles' array item is not an int32"),
    (([{"buffer": b"", "z": -1, "x": 0, "y": 0}], {"z": 0, "x": 0, "y": 0}, None),
     "'z' value must not be less than zero"),
    (([{"buffer": b"", "z": 0, "x": 0, "y": 0, "layers": "water"}],
      {"z": 0, "x": 0, "y": 0}, None),
     "'layers' value in the 'tiles' array must be an array"),
    (([{"buffer": b"", "z": 0, "x": 0, "y": 0, "layers": []}],
      {"z": 0, "x": 0, "y": 0}, None),
     "'layers' array must be of length greater than 0"),
    (([{"buffer": b"", "z": 0, "x": 0, "y": 0, "layers": [1]}],
      {"z": 0, "x": 0, "y": 0}, None),
     "items in 'layers' array must be strings"),
    (([{"buffer": b"", "z": 0, "x": 0, "y": 0}], "zxy", None),
     "'zxy_maprequest' must be an object"),
    (([{"buffer": b"", "z": 0, "x": 0, "y": 0}], {"z": 0, "x": 0, "y": 0}, "opts"),
     "'options' arg must be an object"),
    (([{"buffer": b"", "z": 0, "x": 0, "y": 0}], {"z": 0, "x": 0, "y": 0},
      {"buffer_size": "big"}),
     "'buffer_size' must be an int32"),
    (([{"buffer": b"", "z": 0, "x": 0, "y": 0}], {"z": 0, "x": 0, "y": 0},
      {"buffer_size": -1}),
     "'buffer_size' must be a positive int32"),
    (([{"buffer": b"", "z": 0, "x": 0, "y": 0}], {"z": 0, "x": 0, "y": 0},
      {"compress": 1}),
     "'compress' must be a boolean"),
]


@pytest.mark.parametrize("args,msg", VALIDATION_CASES)
def test_composite_validation_messages(args, msg):
    from vtcomposite_spark.validate import validate_composite_request
    with pytest.raises(ValueError) as ei:
        validate_composite_request(*args)
    assert str(ei.value) == msg


LOCALIZE_CASES = [
    ({}, "params.buffer is required"),
    ({"buffer": 42}, "params.buffer must be a Buffer"),
    ({"buffer": b"", "hidden_prefix": ""},
     "params.hidden_prefix must be a non-empty string"),
    ({"buffer": b"", "omit_scripts": "Han"},
     "params.omit_scripts must be an array"),
    ({"buffer": b"", "omit_scripts": [""]},
     "params.omit_scripts must be an array of non-empty strings"),
    ({"buffer": b"", "language": "en"},
     "params.language is an invalid param... do you mean params.languages?"),
    ({"buffer": b"", "languages": "en"}, "params.languages must be an array"),
    ({"buffer": b"", "languages": [1]},
     "params.languages must be an array of non-empty strings"),
    ({"buffer": b"", "worldview": "US"},
     "params.worldview is an invalid param... do you mean params.worldviews?"),
    ({"buffer": b"", "worldviews": "US"}, "params.worldviews must be an array"),
    ({"buffer": b"", "worldviews": [""]},
     "params.worldviews must be an array of non-empty strings"),
    ({"buffer": b"", "worldview_default": ""},
     "params.worldview_default must be a non-empty string"),
    ({"buffer": b"", "class_property": ""},
     "params.class_property must be a non-empty string"),
    ({"buffer": b"", "compress": "yes"}, "params.compress must be a boolean"),
]


@pytest.mark.parametrize("params,msg", LOCALIZE_CASES)
def test_localize_validation_messages(params, msg):
    from vtcomposite_spark.validate import validate_localize_request
    with pytest.raises(ValueError) as ei:
        validate_localize_request(params)
    assert str(ei.value) == msg


def test_ancestry_error_through_api(spark, fixture_bytes):
    from vtcomposite_spark.operators.composite import CompositeRequestError
    buf = fixture_bytes("four-points-quadrants.mvt")
    with pytest.raises(CompositeRequestError) as ei:
        api.composite([{"buffer": buf, "z": 3, "x": 1, "y": 1}],
                      {"z": 2, "x": 1, "y": 1}, spark=spark)
    assert str(ei.value) == "Invalid tile composite request: SOURCE(3,1,1) TARGET(2,1,1)"


def _multi_layer_tile(order):
    layers = []
    for i, name in enumerate(order):
        layers.append(mvt.Layer(name=name, features=[mvt.Feature(
            geom_type=1, parts=[[(100 * (i + 1), 100)]], ring_types=[0],
            properties={"n": name})]))
    return mvt.encode_tile(layers)


def test_output_layer_order_is_source_order_not_keep_order(spark):
    """test/vtcomposite.test.js:326-339: output layer order follows the
    source tile's stream order, regardless of the keep-list order."""
    buf = _multi_layer_tile(["water", "building", "poi_label"])
    out = api.composite(
        [{"buffer": buf, "z": 3, "x": 1, "y": 1,
          "layers": ["poi_label", "building"]}],  # keep-list reversed
        {"z": 3, "x": 1, "y": 1}, spark=spark)
    assert [l.name for l in mvt.decode_tile(out)] == ["building", "poi_label"]


def test_output_layer_order_across_tiles(spark):
    """test/vtcomposite.test.js:371-384 ('reversed'): tile order decides."""
    buf = _multi_layer_tile(["building", "poi_label"])
    out = api.composite(
        [{"buffer": buf, "z": 3, "x": 1, "y": 1, "layers": ["poi_label"]},
         {"buffer": buf, "z": 3, "x": 1, "y": 1, "layers": ["building"]}],
        {"z": 3, "x": 1, "y": 1}, spark=spark)
    assert [l.name for l in mvt.decode_tile(out)] == ["poi_label", "building"]
    out2 = api.composite(
        [{"buffer": buf, "z": 3, "x": 1, "y": 1, "layers": ["building"]},
         {"buffer": buf, "z": 3, "x": 1, "y": 1, "layers": ["poi_label"]}],
        {"z": 3, "x": 1, "y": 1}, spark=spark)
    assert [l.name for l in mvt.decode_tile(out2)] == ["building", "poi_label"]
