"""The localize operator — vtcomposite's property algebra, as pure column
expressions (zero shuffle, zero Python in the hot path).

Re-expresses ``LocalizeWorker::Execute`` (reference src/vtcomposite.cpp:
617-1046) over a ``properties: map<string,string>`` column. The reference
scans each feature's properties once, classifying every key as worldview /
class / language / other and resolving precedence afterwards; here each rule
is a Catalyst expression over the map column (SURVEY.md §2.9, rules L1-L9):

* L1 worldview filter + winner: ``array_sort(array_intersect(split(v, ','),
  requested ∪ {'all'}))[0]`` (src/vtcomposite.cpp:646-654,780-834,1001-1012)
* L2 worldviews=['ALL'] passes the whole comma-list through (:705-708,811-814)
* L3 class override precedence [_mbx_class, class] (localized) vs [class]
  (:687-688,716,836-848,944-947)
* L4 language precedence [name_l1, _mbx_name_l1, …, name] via ``coalesce``
  (:691-703,852-924,949-977)
* L5 'local' pseudo-language + omit_scripts (:898-912,949-977)
* L6 languages=['all']: every name_xx/_mbx_name_xx re-keyed (prefix stripped),
  name_script excluded by raw key, values equal to the original name dropped,
  later duplicates overwrite earlier (:691-694,857-880,986-998) — the
  last-wins comes from spark.sql.mapKeyDedupPolicy=LAST_WIN (set by
  ``schema.get_spark``).
* L7 hidden-prefix drop in both modes (:928-933)
* L9 skip_feature short-circuit is a row filter.

Known deviation: the relational model carries string-typed properties only
(the reference enforces string-only for this algebra and *drops* features
whose worldview value is non-string, src/vtcomposite.cpp:787-799; ingestion
stringifies, so that drop cannot trigger here).

Mode selection (src/vtcomposite.cpp:681-720, :1188, :1234, :1307-1314):
``return_localized_tile`` is true iff a ``languages`` or ``worldviews``
array was passed; in that mode an absent worldviews list defaults to
``[worldview_default]``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _entry(key: str, val: Column) -> Column:
    """A 0-or-1-entry map: {key: val} when val is non-null."""
    return F.map_filter(F.create_map(F.lit(key), val), lambda _, v: v.isNotNull())


def localize(
    df: DataFrame,
    *,
    languages: list[str] | None = None,
    language_property: str = "name",
    worldviews: list[str] | None = None,
    worldview_property: str = "worldview",
    worldview_default: str = "US",
    class_property: str = "class",
    hidden_prefix: str = "_mbx_",
    omit_scripts: list[str] | None = None,
    properties_col: str = "properties",
) -> DataFrame:
    # the languages=all last-wins semantics and the final map_concat rely on
    # LAST_WIN map-key dedupe; set it here so the operator works on any
    # session (runtime-settable SQL conf), not only ones from schema.get_spark
    try:
        df.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    except Exception:
        pass

    lp, hp, wp, cp = language_property, hidden_prefix, worldview_property, class_property
    omit_scripts = omit_scripts or []
    return_localized = languages is not None or worldviews is not None
    if return_localized and not worldviews:
        worldviews = [worldview_default]

    props = F.col(properties_col)

    def get(key: str) -> Column:
        return F.element_at(props, F.lit(key))

    original = get(lp)

    if not return_localized:
        # non-localized mode: drop feature when the HIDDEN worldview key is
        # present with value != 'all'; keep everything non-hidden
        # (src/vtcomposite.cpp:715-720 mode flags; tests vtcomposite-non-localize)
        incompat = get(hp + wp)
        out = df.filter(incompat.isNull() | (incompat == "all"))
        new_props = F.map_filter(
            props,
            lambda k, v: (~F.startswith(k, F.lit(hp))) & v.isNotNull(),
        )
        return out.withColumn(properties_col, new_props)

    # ----- localized mode -----
    incompat = get(wp)
    compat = get(hp + wp)
    all_worldviews = worldviews == ["ALL"]
    all_languages = languages is not None and list(languages) == ["all"]

    # L1/L2: worldview winner + drops
    skip = incompat.isNotNull() & (incompat != "all")
    if all_worldviews:
        wv_winner = compat
    else:
        matching = F.array_sort(F.array_intersect(
            F.split(compat, ","), F.array(*[F.lit(w) for w in [*worldviews, "all"]])))
        skip = skip | (compat.isNotNull() & (F.size(matching) == 0))
        wv_winner = F.element_at(matching, 1)

    # L3: class precedence [_mbx_class, class]
    class_val = F.coalesce(get(hp + cp), get(cp))

    # language family
    lang_map = None
    if all_languages:
        # L6: every name_* / _mbx_name_* except raw 'name' and raw
        # 'name_script'; keys cleaned of the hidden prefix; later duplicate
        # of a cleaned key overwrites (LAST_WIN); values equal to original
        # name dropped
        fam = F.map_filter(
            props,
            lambda k, v: (F.startswith(k, F.lit(lp)) | F.startswith(k, F.lit(hp + lp)))
            & (k != F.lit(lp)) & (k != F.lit(lp + "_script")) & v.isNotNull(),
        )
        cleaned = F.transform_keys(
            fam,
            lambda k, _: F.when(F.startswith(k, F.lit(hp)),
                                F.substring(k, len(hp) + 1, 2 ** 30)).otherwise(k),
        )
        lang_map = F.map_filter(
            cleaned, lambda _, v: original.isNull() | (v != original))
        name_val = original
    else:
        langs = list(languages or [])
        keys: list[str] = []
        for lang in langs:
            keys.append(f"{lp}_{lang}")
            keys.append(f"{hp}{lp}_{lang}")
        keys.append(lp)
        candidates = [get(k) for k in keys]
        language_value = F.coalesce(*candidates)
        # index of the first non-null candidate (len(keys) when none)
        language_key_idx: Column = F.lit(len(keys))
        for i in range(len(keys) - 1, -1, -1):
            language_key_idx = F.when(candidates[i].isNotNull(), F.lit(i)) \
                .otherwise(language_key_idx)
        # L5: rank of the requested 'local' pseudo-language
        local_idx = 2 * langs.index("local") if "local" in langs else len(keys)
        if omit_scripts:
            omit_local = F.coalesce(get(f"{lp}_script").isin(omit_scripts), F.lit(False))
        else:
            omit_local = F.lit(False)
        name_val = (
            F.when(omit_local, language_value)
            .when(F.lit(local_idx) < language_key_idx,
                  F.coalesce(original, language_value))
            .otherwise(language_value)
        )

    # base: every key not consumed by the worldview/class/language branches,
    # hidden-prefixed keys dropped (L7)
    base = F.map_filter(
        props,
        lambda k, v: (~F.startswith(k, F.lit(hp)))
        & (k != F.lit(wp)) & (k != F.lit(cp))
        & (~F.startswith(k, F.lit(lp)))
        & v.isNotNull(),
    )

    pieces = [
        base,
        _entry(cp, class_val),
        _entry(lp, name_val),
        _entry(f"{lp}_local", original),
    ]
    if lang_map is not None:
        pieces.append(lang_map)
    pieces.append(_entry(wp, wv_winner))
    new_props = F.map_concat(*pieces)  # LAST_WIN dedupe

    return df.filter(~F.coalesce(skip, F.lit(False))) \
        .withColumn(properties_col, new_props)
