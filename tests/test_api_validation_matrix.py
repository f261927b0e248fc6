"""Full port of the reference's two param-validation suites (S5).

Case-count parity:

* ``test/vtcomposite-composite-param-validation.test.js`` — 32 exact-
  message assertions (+1 regex callback-shape case that has no analog in a
  synchronous python API). All 32 ported below; JS ``undefined`` and
  ``null`` both map to python ``None`` where a key is present.
* ``test/vtcomposite-localize-param-validation.test.js`` — 44 exact-
  message assertions (+4 regex arg-shape cases, callback-specific). All 44
  ported; ``buffer: Object()`` maps to ``object()``.

Beyond the suites, the source defines four more localize error strings the
JS tests never exercise (omit_scripts ×2 and the params.language /
params.worldview did-you-mean hints, src/vtcomposite.cpp:1165-1180,1226);
those are covered at the bottom.
"""

import pytest

from vtcomposite_spark import validate as V

BUF = b"howdy"


def _composite_err(tiles, zxy, options=None):
    with pytest.raises(ValueError) as ei:
        V.validate_composite_request(tiles, zxy, options)
    return str(ei.value)


def _localize_err(params):
    with pytest.raises(ValueError) as ei:
        V.validate_localize_request(params)
    return str(ei.value)


def tile(**over):
    t = {"buffer": BUF, "z": 0, "x": 0, "y": 0}
    t.update(over)
    return t


ZXY = {"z": 3, "x": 1, "y": 0}

COMPOSITE_CASES = [
    # tiles arg shape (test.js:20,29,40)
    ("not an array", ZXY, None, "first arg 'tiles' must be an array of tile objects"),
    ([], ZXY, None, "'tiles' array must be of length greater than 0"),
    (["not an object"], ZXY, None, "items in 'tiles' array must be objects"),
    # buffer member (:55,71,87)
    ([{"z": 0, "x": 0, "y": 0}], ZXY, None,
     "item in 'tiles' array does not include a buffer value"),
    ([tile(buffer=None)], ZXY, None,
     "buffer value in 'tiles' array item is null or undefined"),
    ([tile(buffer="not a buffer")], ZXY, None,
     "buffer value in 'tiles' array item is not a true buffer"),
    # tile z/x/y presence (:103,119,135)
    ([{"buffer": BUF, "x": 0, "y": 0}], ZXY, None,
     "item in 'tiles' array does not include a 'z' value"),
    ([{"buffer": BUF, "z": 0, "y": 0}], ZXY, None,
     "item in 'tiles' array does not include a 'x' value"),
    ([{"buffer": BUF, "z": 0, "x": 0}], ZXY, None,
     "item in 'tiles' array does not include a 'y' value"),
    # tile z/x/y int32 (:151,167,183)
    ([tile(z="zero")], ZXY, None, "'z' value in 'tiles' array item is not an int32"),
    ([tile(x="zero")], ZXY, None, "'x' value in 'tiles' array item is not an int32"),
    ([tile(y="zero")], ZXY, None, "'y' value in 'tiles' array item is not an int32"),
    # tile z/x/y sign (:199,215,231)
    ([tile(z=-1)], ZXY, None, "'z' value must not be less than zero"),
    ([tile(x=-1)], ZXY, None, "'x' value must not be less than zero"),
    ([tile(y=-1)], ZXY, None, "'y' value must not be less than zero"),
    # layers keep-list (:248,265,282)
    ([tile(layers="not an array")], ZXY, None,
     "'layers' value in the 'tiles' array must be an array"),
    ([tile(layers=[])], ZXY, None, "'layers' array must be of length greater than 0"),
    ([tile(layers=[1, 2, 3])], ZXY, None, "items in 'layers' array must be strings"),
    # zxy_maprequest member checks reuse the tile messages (:300-428)
    ([tile()], {"x": 1, "y": 0}, None,
     "item in 'tiles' array does not include a 'z' value"),
    ([tile()], {"z": 3, "y": 0}, None,
     "item in 'tiles' array does not include a 'x' value"),
    ([tile()], {"z": 3, "x": 1}, None,
     "item in 'tiles' array does not include a 'y' value"),
    ([tile()], {"z": "zero", "x": 1, "y": 0}, None,
     "'z' value in 'tiles' array item is not an int32"),
    ([tile()], {"z": 3, "x": "zero", "y": 0}, None,
     "'x' value in 'tiles' array item is not an int32"),
    ([tile()], {"z": 3, "x": 1, "y": "zero"}, None,
     "'y' value in 'tiles' array item is not an int32"),
    ([tile()], {"z": -3, "x": 1, "y": 0}, None, "'z' value must not be less than zero"),
    ([tile()], {"z": 3, "x": -1, "y": 0}, None, "'x' value must not be less than zero"),
    ([tile()], {"z": 3, "x": 1, "y": -1}, None, "'y' value must not be less than zero"),
    # zxy shape (:444)
    ([tile()], "not an object", None, "'zxy_maprequest' must be an object"),
    # options (:460,476,492,508)
    ([tile()], ZXY, {"compress": 1}, "'compress' must be a boolean"),
    ([tile()], ZXY, "not an object", "'options' arg must be an object"),
    ([tile()], ZXY, {"buffer_size": "big"}, "'buffer_size' must be an int32"),
    ([tile()], ZXY, {"buffer_size": -1}, "'buffer_size' must be a positive int32"),
]


@pytest.mark.parametrize("tiles,zxy,options,msg", COMPOSITE_CASES)
def test_composite_validation_matrix(tiles, zxy, options, msg):
    assert _composite_err(tiles, zxy, options) == msg


def test_composite_valid_requests_pass():
    V.validate_composite_request([tile()], ZXY, None)
    V.validate_composite_request(
        [tile(layers=["water"])], ZXY, {"buffer_size": 128, "compress": True})


LOCALIZE_CASES = [
    # params.buffer (test.js:42-79: missing, 1, null, undefined, Object())
    ({}, "params.buffer is required"),
    ({"buffer": 1}, "params.buffer must be a Buffer"),
    ({"buffer": None}, "params.buffer must be a Buffer"),  # null
    ({"buffer": None, "_js": "undefined"}, "params.buffer must be a Buffer"),
    ({"buffer": object()}, "params.buffer is not a true Buffer"),
    # params.hidden_prefix (:82-113: 1, null, undefined, '')
    ({"buffer": BUF, "hidden_prefix": 1}, "params.hidden_prefix must be a non-empty string"),
    ({"buffer": BUF, "hidden_prefix": None}, "params.hidden_prefix must be a non-empty string"),
    ({"buffer": BUF, "hidden_prefix": None, "_js": "undefined"},
     "params.hidden_prefix must be a non-empty string"),
    ({"buffer": BUF, "hidden_prefix": ""}, "params.hidden_prefix must be a non-empty string"),
    # params.languages array shape (:116-170: undefined, null, 1, '', 'hi', {})
    ({"buffer": BUF, "languages": None, "_js": "undefined"}, "params.languages must be an array"),
    ({"buffer": BUF, "languages": None}, "params.languages must be an array"),
    ({"buffer": BUF, "languages": 1}, "params.languages must be an array"),
    ({"buffer": BUF, "languages": ""}, "params.languages must be an array"),
    ({"buffer": BUF, "languages": "hi"}, "params.languages must be an array"),
    ({"buffer": BUF, "languages": {}}, "params.languages must be an array"),
    # params.languages element shape (:172-205: [1,2,3], ['hi',null],
    # [undefined,'hi'], ['hi',''])
    ({"buffer": BUF, "languages": [1, 2, 3]},
     "params.languages must be an array of non-empty strings"),
    ({"buffer": BUF, "languages": ["hi", None]},
     "params.languages must be an array of non-empty strings"),
    ({"buffer": BUF, "languages": [None, "hi"]},
     "params.languages must be an array of non-empty strings"),
    ({"buffer": BUF, "languages": ["hi", ""]},
     "params.languages must be an array of non-empty strings"),
    # params.language_property (4: 1, null, undefined, '')
    ({"buffer": BUF, "language_property": 1}, "params.language_property must be a non-empty string"),
    ({"buffer": BUF, "language_property": None}, "params.language_property must be a non-empty string"),
    ({"buffer": BUF, "language_property": None, "_js": "undefined"},
     "params.language_property must be a non-empty string"),
    ({"buffer": BUF, "language_property": ""}, "params.language_property must be a non-empty string"),
    # params.worldviews array shape (5: null, undefined, 1, '', 'US')
    ({"buffer": BUF, "worldviews": None}, "params.worldviews must be an array"),
    ({"buffer": BUF, "worldviews": None, "_js": "undefined"}, "params.worldviews must be an array"),
    ({"buffer": BUF, "worldviews": 1}, "params.worldviews must be an array"),
    ({"buffer": BUF, "worldviews": ""}, "params.worldviews must be an array"),
    ({"buffer": BUF, "worldviews": "US"}, "params.worldviews must be an array"),
    # params.worldviews element shape (4)
    ({"buffer": BUF, "worldviews": [1, 2, 3]},
     "params.worldviews must be an array of non-empty strings"),
    ({"buffer": BUF, "worldviews": ["hi", None]},
     "params.worldviews must be an array of non-empty strings"),
    ({"buffer": BUF, "worldviews": [None, "howdy"]},
     "params.worldviews must be an array of non-empty strings"),
    ({"buffer": BUF, "worldviews": ["howdy", ""]},
     "params.worldviews must be an array of non-empty strings"),
    # params.worldview_property (4)
    ({"buffer": BUF, "worldview_property": 1}, "params.worldview_property must be a non-empty string"),
    ({"buffer": BUF, "worldview_property": None}, "params.worldview_property must be a non-empty string"),
    ({"buffer": BUF, "worldview_property": None, "_js": "undefined"},
     "params.worldview_property must be a non-empty string"),
    ({"buffer": BUF, "worldview_property": ""}, "params.worldview_property must be a non-empty string"),
    # params.worldview_default (4)
    ({"buffer": BUF, "worldview_default": 1}, "params.worldview_default must be a non-empty string"),
    ({"buffer": BUF, "worldview_default": None}, "params.worldview_default must be a non-empty string"),
    ({"buffer": BUF, "worldview_default": None, "_js": "undefined"},
     "params.worldview_default must be a non-empty string"),
    ({"buffer": BUF, "worldview_default": ""}, "params.worldview_default must be a non-empty string"),
    # params.class_property (4)
    ({"buffer": BUF, "class_property": 1}, "params.class_property must be a non-empty string"),
    ({"buffer": BUF, "class_property": None}, "params.class_property must be a non-empty string"),
    ({"buffer": BUF, "class_property": None, "_js": "undefined"},
     "params.class_property must be a non-empty string"),
    ({"buffer": BUF, "class_property": ""}, "params.class_property must be a non-empty string"),
    # params.compress (:435-441)
    ({"buffer": BUF, "compress": 1}, "params.compress must be a boolean"),
]


@pytest.mark.parametrize("params,msg", LOCALIZE_CASES)
def test_localize_validation_matrix(params, msg):
    params = {k: v for k, v in params.items() if k != "_js"}
    assert _localize_err(params) == msg


def test_localize_valid_request_passes():
    V.validate_localize_request({
        "buffer": BUF, "hidden_prefix": "whatever", "languages": ["en"],
        "language_property": "lang", "worldviews": ["US"],
        "worldview_property": "wv", "class_property": "klass",
        "compress": True})


# --- source-only error strings the JS suites never exercise ---

@pytest.mark.parametrize("params,msg", [
    ({"buffer": BUF, "omit_scripts": "Latn"}, "params.omit_scripts must be an array"),
    ({"buffer": BUF, "omit_scripts": [1]},
     "params.omit_scripts must be an array of non-empty strings"),
    ({"buffer": BUF, "omit_scripts": [""]},
     "params.omit_scripts must be an array of non-empty strings"),
    ({"buffer": BUF, "language": "en"},
     "params.language is an invalid param... do you mean params.languages?"),
    ({"buffer": BUF, "worldview": "US"},
     "params.worldview is an invalid param... do you mean params.worldviews?"),
])
def test_localize_source_only_errors(params, msg):
    assert _localize_err(params) == msg
