"""Non-default worldview_property / class_property / language_property /
hidden_prefix overrides (src/vtcomposite.cpp:1099-1103) interacting with
TYPED property tags — the full pipeline (encode → ingest → localize →
encode → decode), both modes.

The default-name matrices (test_localize_worldview_matrix /
test_localize_class_matrix) port the reference's own cases; this grid
pins that every key-role computation keys off the PARAMETER, not the
default literal, and that the F12 typed-value drop and tag carry follow
the custom names too.
"""

import pytest

from pyspark.sql import functions as F

from vtcomposite_spark.operators import composite as C
from vtcomposite_spark.operators.localize import localize
from vtcomposite_spark.sources import ingest, mvt

WP, CP, LP, HP = "view", "category", "title", "_x_"
PARAMS = dict(worldview_property=WP, class_property=CP,
              language_property=LP, hidden_prefix=HP)


def _tile(props, tags):
    layer = mvt.Layer(name="places", features=[mvt.Feature(
        geom_type=1, parts=[[(10, 10)]], ring_types=[0],
        properties=props, prop_types=tags)])
    return mvt.encode_tile([layer])


def run(spark, props, tags=None, **kwargs):
    """→ (properties, prop_types) of the surviving feature, or None."""
    tags = tags or {k: mvt.infer_tag(v) for k, v in props.items()}
    f = ingest.features_from_tiles(spark, [(_tile(props, tags), 0, 0, 0)])
    out = localize(f, **PARAMS, **kwargs)
    rows = (out.withColumn("z", F.lit(0)).withColumn("x", F.lit(0).cast("long"))
            .withColumn("y", F.lit(0).cast("long"))
            .withColumn("compress", F.lit(False)))
    tiles = C.encode_tiles(rows).collect()
    if not tiles:
        return None
    dec = mvt.decode_tile(bytes(tiles[0].tile))
    if not dec or not dec[0].features:
        return None
    ft = dec[0].features[0]
    return ft.properties, ft.prop_types


# --- worldview key roles under custom names ---

def test_localized_custom_hidden_worldview_wins(spark):
    out = run(spark, {f"{HP}{WP}": "CN,US"}, worldviews=["US"])
    assert out == ({WP: "US"}, {WP: mvt.TAG_STRING})


def test_localized_custom_plain_worldview_drops(spark):
    assert run(spark, {WP: "US"}, worldviews=["US"]) is None


def test_localized_default_named_keys_are_ordinary_props(spark):
    """With custom names active, the DEFAULT 'worldview'/'_mbx_worldview'
    keys are plain pass-through data, not key roles."""
    out = run(spark, {"worldview": "JP", f"{HP}{WP}": "all"},
              worldviews=["US"])
    assert out == ({"worldview": "JP", WP: "all"},
                   {"worldview": mvt.TAG_STRING, WP: mvt.TAG_STRING})


def test_nonlocalized_custom_hidden_worldview_list_drops(spark):
    assert run(spark, {f"{HP}{WP}": "CN,US"}) is None


def test_nonlocalized_custom_hidden_all_kept(spark):
    out = run(spark, {f"{HP}{WP}": "all", "whatever": "blah"})
    assert out == ({"whatever": "blah"}, {"whatever": mvt.TAG_STRING})


def test_nonlocalized_custom_plain_worldview_passes(spark):
    out = run(spark, {WP: "CN,US"})
    assert out == ({WP: "CN,US"}, {WP: mvt.TAG_STRING})


# --- F12 typed drop follows the custom worldview names ---

@pytest.mark.parametrize("key,localized", [
    (f"{HP}{WP}", True), (WP, True), (f"{HP}{WP}", False), (WP, False),
])
def test_nonstring_custom_worldview_drops_feature(spark, key, localized):
    kwargs = {"worldviews": ["US"]} if localized else {}
    assert run(spark, {key: 5}, {key: mvt.TAG_INT}, **kwargs) is None


def test_nonstring_default_worldview_key_is_ignored(spark):
    """A typed value under the DEFAULT name must NOT trigger the drop when
    the role was renamed."""
    out = run(spark, {"worldview": 5, f"{HP}{WP}": "all"},
              {"worldview": mvt.TAG_INT, f"{HP}{WP}": mvt.TAG_STRING},
              worldviews=["US"])
    assert out == ({"worldview": 5, WP: "all"},
                   {"worldview": mvt.TAG_INT, WP: mvt.TAG_STRING})


# --- class precedence under custom names, tag carried from the winner ---

def test_custom_class_override_typed(spark):
    out = run(spark, {f"{HP}{CP}": 7, CP: "plain", f"{HP}{WP}": "all"},
              {f"{HP}{CP}": mvt.TAG_INT, CP: mvt.TAG_STRING,
               f"{HP}{WP}": mvt.TAG_STRING},
              worldviews=["US"])
    assert out == ({CP: 7, WP: "all"},
                   {CP: mvt.TAG_INT, WP: mvt.TAG_STRING})


def test_custom_class_passthrough_non_localized(spark):
    out = run(spark, {f"{HP}{CP}": "hidden", CP: "plain"})
    assert out == ({CP: "plain"}, {CP: mvt.TAG_STRING})


# --- language family under custom language_property + hidden_prefix ---

def test_custom_language_precedence_typed(spark):
    out = run(spark, {LP: "hello", f"{LP}_de": 7, f"{HP}{WP}": "all"},
              {LP: mvt.TAG_STRING, f"{LP}_de": mvt.TAG_INT,
               f"{HP}{WP}": mvt.TAG_STRING},
              languages=["de"], worldviews=["US"])
    assert out == ({LP: 7, f"{LP}_local": "hello", WP: "all"},
                   {LP: mvt.TAG_INT, f"{LP}_local": mvt.TAG_STRING,
                    WP: mvt.TAG_STRING})


def test_custom_language_hidden_fallback(spark):
    out = run(spark, {LP: "hello", f"{HP}{LP}_de": "hallo",
                      f"{HP}{WP}": "all"},
              languages=["de"], worldviews=["US"])
    assert out == ({LP: "hallo", f"{LP}_local": "hello", WP: "all"},
                   {LP: mvt.TAG_STRING, f"{LP}_local": mvt.TAG_STRING,
                    WP: mvt.TAG_STRING})


def test_custom_languages_all_rekeys_family(spark):
    out = run(spark, {LP: "x", f"{HP}{LP}_de": "y", f"{LP}_fr": "z",
                      "name_de": "NOT-a-family-key", f"{HP}{WP}": "all"},
              languages=["all"], worldviews=["US"])
    props, tags = out
    assert props == {LP: "x", f"{LP}_local": "x", f"{LP}_de": "y",
                     f"{LP}_fr": "z", "name_de": "NOT-a-family-key",
                     WP: "all"}
    assert tags[f"{LP}_de"] == mvt.TAG_STRING


def test_default_name_keys_pass_through_with_custom_lp(spark):
    """'name'/'name_en' are ordinary data when language_property='title'."""
    out = run(spark, {"name": "n", "name_en": "e", LP: "t",
                      f"{HP}{WP}": "all"},
              languages=["en"], worldviews=["US"])
    props, _ = out
    assert props == {"name": "n", "name_en": "e", LP: "t",
                     f"{LP}_local": "t", WP: "all"}
