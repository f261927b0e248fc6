"""Localize operator golden tests — property matrices ported from the
reference test suite (FIXTURES.md §5 cites exact test file:line per case)."""

import pytest
from pyspark.sql import types as T

from vtcomposite_spark.operators.localize import localize

SCHEMA = T.StructType([
    T.StructField("fid", T.IntegerType()),
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
])


def ordered_props_df(spark, props):
    """Build a map column that PRESERVES entry order (createDataFrame from a
    python dict does not — see sources.ingest.features_from_tiles)."""
    from itertools import chain

    from pyspark.sql import functions as F
    args = [F.lit(x) for x in chain.from_iterable(props.items())]
    return spark.range(1).select(F.create_map(*args).alias("properties"))


def run(spark, props, **params):
    df = ordered_props_df(spark, props)
    rows = localize(df, **params).collect()
    if not rows:
        return None
    return dict(rows[0].properties)


# --- language (test/vtcomposite-localize-language.test.js) ---

def test_translate_via_name_lang(spark):
    # :117-148
    props = {"name": "Espana", "_mbx_name_de": "Spanien", "name_fr": "Espagne",
             "_mbx_name_fr": "Espagne", "name_en": "Spain", "population": "20"}
    out = run(spark, props, languages=["en"])
    assert out == {"name": "Spain", "name_local": "Espana", "population": "20"}


def test_translate_via_hidden_name_lang(spark):
    # :150-180
    props = {"name": "Germany", "name_en": "Germany", "name_fr": "Allemagne",
             "_mbx_name_fr": "La Allemagne", "_mbx_name_de": "Deutschland",
             "_mbx_other": "Alemania"}
    out = run(spark, props, languages=["de"])
    assert out == {"name": "Deutschland", "name_local": "Germany"}


def test_name_x_beats_hidden_name_x(spark):
    # :182-212
    props = {"name": "Germany", "name_en": "Germany", "name_fr": "Allemagne",
             "_mbx_name_fr": "La Allemagne", "_mbx_name_de": "Deutschland",
             "_mbx_other": "Alemania"}
    out = run(spark, props, languages=["fr"])
    assert out == {"name": "Allemagne", "name_local": "Germany"}


def test_fallback_second_language_custom_props(spark):
    # :480-522
    props = {"language": "hello", "_pre_language_zh-Hant": "Ni hao"}
    out = run(spark, props, languages=["en", "zh-Hant"],
              language_property="language", hidden_prefix="_pre_")
    assert out == {"language": "Ni hao", "language_local": "hello"}


def test_local_language(spark):
    # :576-620
    props = {"name": "你好", "name_script": "Han", "name_zh-Hant": "Ni hao",
             "name_en": "hello"}
    out = run(spark, props, languages=["local"])
    assert out == {"name": "你好", "name_local": "你好"}


def test_local_language_omitted_script(spark):
    # :668-713 — original script omitted ⇒ fall to 'en'
    props = {"name": "你好", "name_script": "Han", "name_zh-Hant": "Ni hao",
             "name_en": "hello"}
    out = run(spark, props, languages=["local", "en"], omit_scripts=["Han"])
    assert out == {"name": "hello", "name_local": "你好"}


def test_input_name_local_outranks_substitution(spark):
    # src/vtcomposite.cpp:964-971 — existing name_local property wins
    props = {"name": "你好", "name_local": "pre-existing", "name_en": "hello"}
    out = run(spark, props, languages=["local", "en"])
    assert out["name"] == "pre-existing"


def test_languages_all(spark):
    # :864-935
    props = {"name": "你好", "name_script": "Han", "name_zh-Hant": "Ni hao",
             "name_en": "hello", "name_de": "hallo", "_mbx_name_it": "ciao",
             "_mbx_name_fr": "bonjour"}
    out = run(spark, props, languages=["all"])
    assert out == {"name": "你好", "name_local": "你好", "name_zh-Hant": "Ni hao",
                   "name_en": "hello", "name_de": "hallo", "name_it": "ciao",
                   "name_fr": "bonjour"}


def test_languages_all_drops_values_equal_to_name(spark):
    # values equal to the original name are dropped (:864-935)
    props = {"name": "same", "name_en": "same", "name_de": "anders"}
    out = run(spark, props, languages=["all"])
    assert out == {"name": "same", "name_local": "same", "name_de": "anders"}


def test_languages_all_last_wins(spark):
    # "returns the last value of the same language properties"
    # (unordered_map assignment, src/vtcomposite.cpp:871-877)
    props = {"name_fr": "premier", "_mbx_name_fr": "dernier", "name": "x"}
    out = run(spark, props, languages=["all"])
    assert out["name_fr"] == "dernier"


def test_hidden_prefix_dropped_both_modes(spark):
    # :524-574
    props = {"name": "x", "_mbx_other": "blah", "keep": "yes"}
    assert run(spark, props, languages=["en"]) == {
        "name": "x", "name_local": "x", "keep": "yes"}
    assert run(spark, props) == {"name": "x", "keep": "yes"}


# --- worldview (test/vtcomposite-localize-worldview.test.js) ---

def test_non_localized_hidden_worldview_all_kept(spark):
    # :90-130, non-localize.test.js:12-77
    props = {"_mbx_worldview": "all", "worldview": "every"}
    out = run(spark, props)
    assert out == {"worldview": "every"}


def test_non_localized_hidden_worldview_list_dropped(spark):
    # :132-166
    props = {"_mbx_worldview": "CN,JP,US"}
    assert run(spark, props) is None


def test_localized_worldview_match(spark):
    # :249-285
    props = {"_mbx_worldview": "CN,JP,TR,US"}
    out = run(spark, props, worldviews=["US"])
    assert out == {"worldview": "US"}


def test_localized_legacy_worldview_dropped(spark):
    # :364-398 — legacy non-hidden 'worldview' key is incompatible
    props = {"worldview": "US"}
    assert run(spark, props, worldviews=["US"]) is None


def test_localized_no_partial_match(spark):
    # :287-321
    props = {"_mbx_worldview": "USSR"}
    assert run(spark, props, worldviews=["US"]) is None


def test_localized_worldview_all_value_kept(spark):
    props = {"_mbx_worldview": "all"}
    out = run(spark, props, worldviews=["US"])
    assert out == {"worldview": "all"}


def test_worldviews_ALL_passes_whole_list(spark):
    # L2 (src/vtcomposite.cpp:705-708,811-814)
    props = {"_mbx_worldview": "CN,JP,US"}
    out = run(spark, props, worldviews=["ALL"])
    assert out == {"worldview": "CN,JP,US"}


def test_worldview_winner_is_sorted_first(spark):
    # O1: intersection sorted ascending, element [0] wins
    # (src/module_utils.hpp:42-52, src/vtcomposite.cpp:1001-1008)
    props = {"_mbx_worldview": "US,JP,CN"}
    out = run(spark, props, worldviews=["US", "JP", "CN"])
    assert out["worldview"] == "CN"


def test_default_worldview_injected_when_languages_only(spark):
    # src/vtcomposite.cpp:1307-1314: localized without worldviews ⇒ ['US']
    props = {"_mbx_worldview": "CN,US", "name": "x"}
    out = run(spark, props, languages=["en"])
    assert out["worldview"] == "US"
    props_cn = {"_mbx_worldview": "CN", "name": "x"}
    assert run(spark, props_cn, languages=["en"]) is None


# --- class (test/vtcomposite-localize-class.test.js) ---

def test_class_override_localized(spark):
    props = {"_mbx_class": "city", "class": "disputed_city", "name": "x"}
    out = run(spark, props, worldviews=["US"])
    assert out["class"] == "city"
    assert "_mbx_class" not in out


def test_class_passthrough_non_localized(spark):
    props = {"_mbx_class": "city", "class": "disputed_city"}
    out = run(spark, props)
    assert out["class"] == "disputed_city"


def test_localized_drops_untranslated_name_variants(spark):
    # localized mode keeps only resolved name + name_local
    props = {"name": "a", "name_en": "b", "name_fr": "c"}
    out = run(spark, props, worldviews=["US"])
    assert out == {"name": "a", "name_local": "a"}


# --- additional exact ports from test/vtcomposite-localize-language.test.js ---

def test_custom_property_and_prefix_jp(spark):
    # :390-434
    props = {"language": "hello", "_drop_me_language_jp": "kon'nichiwa",
             "language_es": "hola"}
    out = run(spark, props, languages=["jp"], language_property="language",
              hidden_prefix="_drop_me_")
    assert out == {"language": "kon'nichiwa", "language_local": "hello"}


def test_local_with_fallback_original_script_ok(spark):
    # :622-666 — 'local' ranks above 'en' and the script is acceptable
    props = {"name": "你好", "name_script": "Han", "name_zh-Hant": "Nǐ hǎo",
             "name_en": "hello"}
    out = run(spark, props, languages=["local", "en"])
    assert out == {"name": "你好", "name_local": "你好"}


def test_omitted_script_no_fallback_found(spark):
    # :717-764 — script omitted, no requested translation exists ⇒ the
    # original name is the last resort
    props = {"name": "你好", "name_script": "Han", "name_zh-Hant": "Nǐ hǎo",
             "name_en": "hello", "_mbx_name_fi": "moi"}
    out = run(spark, props, languages=["de", "local", "fr"], omit_scripts=["Han"])
    assert out == {"name": "你好", "name_local": "你好"}


def test_name_local_in_input_tile(spark):
    # :766-813 — input name_local matches the 'local' precedence slot
    props = {"name": "你好", "name_script": "Han", "name_local": "Nǐ hǎo",
             "name_en": "hello", "_mbx_name_fi": "moi"}
    out = run(spark, props, languages=["de", "local", "fi"], omit_scripts=["Han"])
    assert out == {"name": "Nǐ hǎo", "name_local": "你好"}


def test_mbx_name_local_in_input_tile(spark):
    # :815-862
    props = {"name": "你好", "name_script": "Han", "_mbx_name_local": "Nǐ hǎo",
             "name_en": "hello", "_mbx_name_fi": "moi"}
    out = run(spark, props, languages=["de", "local", "fi"], omit_scripts=["Han"])
    assert out == {"name": "Nǐ hǎo", "name_local": "你好"}


def test_languages_all_without_name_property(spark):
    # :1019-1068 — name missing entirely: no name/name_local in output,
    # later duplicates of a cleaned key overwrite earlier
    props = {"name_script": "Han", "name_zh-Hant": "Nǐ hǎo",
             "name_en": "EN first value - to be overwritten",
             "_mbx_name_de": "DE first value - to be overwritten",
             "name_de": "hallo", "_mbx_name_it": "ciao",
             "_mbx_name_fr": "bonjour", "_mbx_name_en": "hello"}
    out = run(spark, props, languages=["all"])
    assert out == {"name_zh-Hant": "Nǐ hǎo", "name_en": "hello",
                   "name_de": "hallo", "name_it": "ciao", "name_fr": "bonjour"}
