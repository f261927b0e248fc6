"""Request validation (S5) — the reference's exhaustive param checks with
the exact error strings (src/vtcomposite.cpp:351-605 for composite,
:1074-1331 for localize; tested by the two *-param-validation test suites).

These run driver-side before any plan is built; they validate dict-shaped
requests (the Python analog of the JS call signature). The DataFrame APIs
stay permissive — validation is the entry-point concern, as in the
reference.
"""

from __future__ import annotations

INT32_MAX = 2 ** 31 - 1


def _is_int32(v) -> bool:
    return isinstance(v, int) and not isinstance(v, bool) and -(2 ** 31) <= v <= INT32_MAX


def _check_zxy(obj: dict) -> None:
    for key in ("z", "x", "y"):
        if key not in obj:
            raise ValueError(f"item in 'tiles' array does not include a '{key}' value")
        v = obj[key]
        if not _is_int32(v):
            raise ValueError(f"'{key}' value in 'tiles' array item is not an int32")
        if v < 0:
            raise ValueError(f"'{key}' value must not be less than zero")


def validate_composite_request(tiles, zxy, options=None) -> None:
    """Mirror of src/vtcomposite.cpp:351-601."""
    if not isinstance(tiles, list):
        raise ValueError("first arg 'tiles' must be an array of tile objects")
    if len(tiles) == 0:
        raise ValueError("'tiles' array must be of length greater than 0")
    for t in tiles:
        if not isinstance(t, dict):
            raise ValueError("items in 'tiles' array must be objects")
        if "buffer" not in t:
            raise ValueError("item in 'tiles' array does not include a buffer value")
        if t["buffer"] is None:
            raise ValueError("buffer value in 'tiles' array item is null or undefined")
        if not isinstance(t["buffer"], (bytes, bytearray)):
            raise ValueError("buffer value in 'tiles' array item is not a true buffer")
        _check_zxy(t)
        if "layers" in t:
            layers = t["layers"]
            if not isinstance(layers, list):
                raise ValueError("'layers' value in the 'tiles' array must be an array")
            if len(layers) == 0:
                raise ValueError("'layers' array must be of length greater than 0")
            for l in layers:
                if not isinstance(l, str):
                    raise ValueError("items in 'layers' array must be strings")
    if not isinstance(zxy, dict):
        raise ValueError("'zxy_maprequest' must be an object")
    _check_zxy(zxy)
    if options is not None:
        if not isinstance(options, dict):
            raise ValueError("'options' arg must be an object")
        if "buffer_size" in options:
            if not _is_int32(options["buffer_size"]):
                raise ValueError("'buffer_size' must be an int32")
            if options["buffer_size"] < 0:
                raise ValueError("'buffer_size' must be a positive int32")
        if "compress" in options and not isinstance(options["compress"], bool):
            raise ValueError("'compress' must be a boolean")


def _non_empty_str(params, key) -> None:
    if key in params:
        v = params[key]
        if not isinstance(v, str) or v == "":
            raise ValueError(f"params.{key} must be a non-empty string")


def validate_localize_request(params: dict) -> None:
    """Mirror of src/vtcomposite.cpp:1074-1331."""
    if "buffer" not in params:
        raise ValueError("params.buffer is required")
    buf = params["buffer"]
    if not isinstance(buf, (bytes, bytearray)):
        # the reference distinguishes non-objects ("must be a Buffer",
        # src/vtcomposite.cpp:1129) from buffer-shaped objects that aren't
        # true buffers (:1134); python analog: primitives vs objects
        if buf is None or isinstance(buf, (bool, int, float, str)):
            raise ValueError("params.buffer must be a Buffer")
        raise ValueError("params.buffer is not a true Buffer")
    _non_empty_str(params, "hidden_prefix")
    if "omit_scripts" in params:
        v = params["omit_scripts"]
        if not isinstance(v, list):
            raise ValueError("params.omit_scripts must be an array")
        for s in v:
            if not isinstance(s, str) or s == "":
                raise ValueError("params.omit_scripts must be an array of non-empty strings")
    if "language" in params:
        raise ValueError("params.language is an invalid param... do you mean params.languages?")
    if "languages" in params:
        v = params["languages"]
        if not isinstance(v, list):
            raise ValueError("params.languages must be an array")
        for s in v:
            if not isinstance(s, str) or s == "":
                raise ValueError("params.languages must be an array of non-empty strings")
    _non_empty_str(params, "language_property")
    if "worldview" in params:
        raise ValueError("params.worldview is an invalid param... do you mean params.worldviews?")
    if "worldviews" in params:
        v = params["worldviews"]
        if not isinstance(v, list):
            raise ValueError("params.worldviews must be an array")
        for s in v:
            if not isinstance(s, str) or s == "":
                raise ValueError("params.worldviews must be an array of non-empty strings")
    _non_empty_str(params, "worldview_property")
    _non_empty_str(params, "worldview_default")
    _non_empty_str(params, "class_property")
    if "compress" in params and not isinstance(params["compress"], bool):
        raise ValueError("params.compress must be a boolean")
