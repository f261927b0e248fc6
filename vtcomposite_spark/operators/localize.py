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

Typed values (F12): property VALUES travel as canonical strings (see
sources.ingest) with a parallel ``prop_types`` tag map. The algebra itself
is string-only — exactly like the reference, which drops any feature whose
worldview value is a non-string (src/vtcomposite.cpp:787-799,805-807 for
localized mode; :694-699 key roles swap in non-localized mode). All other
values pass through with their original tags; keys this operator generates
(name, name_local, worldview, the languages=all family) are strings in the
reference's output too. When the input has no ``prop_types`` column the
all-string model applies unchanged.

Output property ORDER matches the reference in every mode: pass-through
keys in input order, then class, then name(+name_local), then worldview
LAST (build_new_feature appends it, src/vtcomposite.cpp:617-643;
non-localized re-emits class/name/worldview at the end, :944-998). In
languages=['all'] the raw ``name`` key sits INLINE at its input position
(the reference emplaces it during the property scan, :862-868, and the
post-loop language emission never fires in that mode) with name_local
after class and the re-keyed family after that. The family keys' RELATIVE
order is input order here; the reference iterates an unordered_map there
(:986-998), which is not a stable contract on its side.

Mode selection (src/vtcomposite.cpp:681-720, :1188, :1234, :1307-1314):
``return_localized_tile`` is true iff a ``languages`` or ``worldviews``
array was passed; in that mode an absent worldviews list defaults to
``[worldview_default]``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.mvt import TAG_STRING


def _entry(key: str, val: Column) -> Column:
    """A 0-or-1-entry map: {key: val} when val is non-null."""
    return F.map_filter(F.create_map(F.lit(key), val), lambda _, v: v.isNotNull())


def _tag_entry(key: str, val: Column, tag: Column) -> Column:
    """Types-map twin of ``_entry``: {key: tag} present iff val is non-null."""
    return F.map_filter(
        F.create_map(F.lit(key), F.when(val.isNotNull(), tag).cast("byte")),
        lambda _, v: v.isNotNull())


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
    has_types = "prop_types" in df.columns
    types = F.col("prop_types") if has_types else None

    def get(key: str) -> Column:
        return F.element_at(props, F.lit(key))

    def tag_of(key: str) -> Column:
        # absent tag ⇒ string (engine-generated or legacy all-string input)
        if not has_types:
            return F.lit(TAG_STRING).cast("byte")
        return F.coalesce(F.element_at(types, F.lit(key)),
                          F.lit(TAG_STRING)).cast("byte")

    def is_nonstring(key: str) -> Column:
        """Key present with a non-string value ⇒ the reference's typed-
        worldview drop can trigger (src/vtcomposite.cpp:787-799,805-807)."""
        if not has_types:
            return F.lit(False)
        return get(key).isNotNull() & (tag_of(key) != TAG_STRING)

    original = get(lp)
    orig_tag = tag_of(lp)

    if not return_localized:
        # ----- non-localized mode (keep_all_non_hidden_*) -----
        # key roles swap (src/vtcomposite.cpp:712-720): incompatible =
        # HIDDEN worldview key, compatible = plain worldview key.
        incompat = get(hp + wp)
        compat = get(wp)
        skip = (incompat.isNotNull() & (incompat != "all")) \
            | is_nonstring(hp + wp) | is_nonstring(wp)
        out = df.filter(~skip)
        # pass-through keys in input order, minus the consumed {wp, cp, lp}
        # and all hidden keys; then class, name, worldview re-emitted at the
        # END (final_properties assembly, :944-998 + build_new_feature)
        def keep_key(k: Column, v: Column) -> Column:
            return ((~F.startswith(k, F.lit(hp))) & (k != F.lit(wp))
                    & (k != F.lit(cp)) & (k != F.lit(lp)) & v.isNotNull())
        base = F.map_filter(props, keep_key)
        new_props = F.map_concat(
            base,
            _entry(cp, get(cp)),
            _entry(lp, original),
            _entry(wp, compat),
        )
        # ONE withColumns so every expression binds to the ORIGINAL
        # properties/prop_types — sequential withColumn would rebind the
        # types expressions to the already-replaced properties column
        new_cols = {properties_col: new_props}
        if has_types:
            base_t = F.map_filter(
                types, lambda k, t: keep_key(k, F.element_at(props, k)))
            new_cols["prop_types"] = F.map_concat(
                base_t,
                _tag_entry(cp, get(cp), tag_of(cp)),
                _tag_entry(lp, original, orig_tag),
                _tag_entry(wp, compat, F.lit(TAG_STRING)),
            )
        return out.withColumns(new_cols)

    # ----- localized mode -----
    incompat = get(wp)
    compat = get(hp + wp)
    all_worldviews = worldviews == ["ALL"]
    all_languages = languages is not None and list(languages) == ["all"]

    # L1/L2: worldview winner + drops; non-string worldview values drop the
    # feature in the reference regardless of mode (F12)
    skip = (incompat.isNotNull() & (incompat != "all")) \
        | is_nonstring(wp) | is_nonstring(hp + wp)
    if all_worldviews:
        wv_winner = compat
    else:
        matching = F.array_sort(F.array_intersect(
            F.split(compat, ","), F.array(*[F.lit(w) for w in [*worldviews, "all"]])))
        skip = skip | (compat.isNotNull() & ~is_nonstring(hp + wp)
                       & (F.size(matching) == 0))
        wv_winner = F.element_at(matching, 1)

    # L3: class precedence [_mbx_class, class] — value AND tag follow the
    # same choice (class_value is carried typed, :836-848,944-947)
    class_val = F.coalesce(get(hp + cp), get(cp))
    class_tag = F.when(get(hp + cp).isNotNull(), tag_of(hp + cp)) \
        .otherwise(tag_of(cp))

    # language family
    lang_map = None
    lang_types = None
    if all_languages:
        # L6: every name_* / _mbx_name_* except raw 'name' and raw
        # 'name_script'; keys cleaned of the hidden prefix; later duplicate
        # of a cleaned key overwrites (LAST_WIN); values equal to original
        # name dropped
        def fam_key(k: Column, v: Column) -> Column:
            return ((F.startswith(k, F.lit(lp)) | F.startswith(k, F.lit(hp + lp)))
                    & (k != F.lit(lp)) & (k != F.lit(lp + "_script"))
                    & v.isNotNull())
        clean = lambda k: F.when(  # noqa: E731
            F.startswith(k, F.lit(hp)),
            F.substring(k, len(hp) + 1, 2 ** 30)).otherwise(k)
        fam = F.map_filter(props, fam_key)
        cleaned = F.transform_keys(fam, lambda k, _: clean(k))
        lang_map = F.map_filter(
            cleaned, lambda _, v: original.isNull() | (v != original))
        if has_types:
            # same pipeline over the tag map: identical key predicates and
            # entry order ⇒ LAST_WIN picks the same winner per cleaned key
            fam_t = F.map_filter(
                types, lambda k, t: fam_key(k, F.element_at(props, k)))
            cleaned_t = F.transform_keys(fam_t, lambda k, _: clean(k))
            lang_types = F.map_filter(
                cleaned_t,
                lambda k, _: original.isNull()
                | (F.element_at(cleaned, k) != original))
        name_val = original
        name_tag = orig_tag
    else:
        langs = list(languages or [])
        keys: list[str] = []
        for lang in langs:
            keys.append(f"{lp}_{lang}")
            keys.append(f"{hp}{lp}_{lang}")
        keys.append(lp)
        candidates = [get(k) for k in keys]
        language_value = F.coalesce(*candidates)
        # index of the first non-null candidate (len(keys) when none) and
        # the matching tag — both mirror the same precedence walk
        language_key_idx: Column = F.lit(len(keys))
        language_tag: Column = F.lit(TAG_STRING).cast("byte")
        for i in range(len(keys) - 1, -1, -1):
            nonnull = candidates[i].isNotNull()
            language_key_idx = F.when(nonnull, F.lit(i)).otherwise(language_key_idx)
            language_tag = F.when(nonnull, tag_of(keys[i])).otherwise(language_tag)
        # L5: rank of the requested 'local' pseudo-language
        local_idx = 2 * langs.index("local") if "local" in langs else len(keys)
        if omit_scripts:
            omit_local = F.coalesce(get(f"{lp}_script").isin(omit_scripts), F.lit(False))
        else:
            omit_local = F.lit(False)
        take_local = (~omit_local) & (F.lit(local_idx) < language_key_idx)
        name_val = (
            F.when(take_local, F.coalesce(original, language_value))
            .otherwise(language_value)
        )
        name_tag = (
            F.when(take_local & original.isNotNull(), orig_tag)
            .otherwise(language_tag)
        )

    # base: every key not consumed by the worldview/class/language branches,
    # hidden-prefixed keys dropped (L7). languages=['all'] keeps the raw
    # ``name`` key INLINE at its input position — the reference emplaces it
    # during the property scan (src/vtcomposite.cpp:862-868) and its
    # post-loop language emission never fires in that mode (the family
    # branch `continue`s before the precedence walk, :879-880), so `name`
    # lands mid-scan, not after class.
    def base_key(k: Column, v: Column) -> Column:
        not_lang = ((k == F.lit(lp)) | ~F.startswith(k, F.lit(lp))) \
            if all_languages else (~F.startswith(k, F.lit(lp)))
        return ((~F.startswith(k, F.lit(hp)))
                & (k != F.lit(wp)) & (k != F.lit(cp))
                & not_lang
                & v.isNotNull())
    base = F.map_filter(props, base_key)

    pieces = [base, _entry(cp, class_val)]
    if not all_languages:
        pieces.append(_entry(lp, name_val))
    pieces.append(_entry(f"{lp}_local", original))
    if lang_map is not None:
        pieces.append(lang_map)
    pieces.append(_entry(wp, wv_winner))
    new_props = F.map_concat(*pieces)  # LAST_WIN dedupe

    # ONE withColumns so the types expressions bind to the ORIGINAL
    # properties column (sequential withColumn = self-reference trap)
    new_cols = {properties_col: new_props}
    if has_types:
        base_t = F.map_filter(
            types, lambda k, t: base_key(k, F.element_at(props, k)))
        t_pieces = [base_t, _tag_entry(cp, class_val, class_tag)]
        if not all_languages:
            t_pieces.append(_tag_entry(lp, name_val, name_tag))
        t_pieces.append(_tag_entry(f"{lp}_local", original, orig_tag))
        if lang_types is not None:
            t_pieces.append(lang_types)
        t_pieces.append(_tag_entry(wp, wv_winner, F.lit(TAG_STRING)))
        new_cols["prop_types"] = F.map_concat(*t_pieces)
    return df.filter(~F.coalesce(skip, F.lit(False))).withColumns(new_cols)
