"""The reference's class test matrix (test/vtcomposite-localize-class.test.js,
19 cases) as a parametrized table with the exact inputs/expectations."""

import pytest
from pyspark.sql import types as T

from vtcomposite_spark.operators.localize import localize

SCHEMA = T.StructType([
    T.StructField("fid", T.IntegerType()),
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
])

MATRIX = [
    ("nonloc compat all :14", {"worldview": "all", "class": "fancy_affogato"}, {},
     {"worldview": "all", "class": "fancy_affogato"}),
    ("nonloc compat one :56", {"worldview": "US", "class": "fancy_affogato"}, {},
     {"worldview": "US", "class": "fancy_affogato"}),
    ("nonloc incompat all :98",
     {"_mbx_worldview": "all", "worldview": "every_wv", "class": "fancy_affogato"},
     {}, {"worldview": "every_wv", "class": "fancy_affogato"}),
    ("nonloc incompat one :142", {"_mbx_worldview": "US", "_mbx_class": "affogato"},
     {}, None),
    ("loc wv compat all :189", {"_mbx_worldview": "all", "_mbx_class": "affogato"},
     {"worldviews": ["US"]}, {"worldview": "all", "class": "affogato"}),
    ("loc wv compat requested :231",
     {"_mbx_worldview": "US", "_mbx_class": "affogato",
      "classes": "should_not_change"},
     {"worldviews": ["US"]},
     {"worldview": "US", "class": "affogato", "classes": "should_not_change"}),
    ("loc wv compat irrelevant :275",
     {"_mbx_worldview": "US", "_mbx_class": "affogato"},
     {"worldviews": ["JP"]}, None),
    ("loc wv incompat all :315",
     {"_mbx_worldview": "all", "_mbx_class": "affogato",
      "worldview": "all", "class": "fancy_affogato"},
     {"worldviews": ["US"]}, {"worldview": "all", "class": "affogato"}),
    ("loc wv incompat requested :360", {"worldview": "US", "class": "fancy_affogato"},
     {"worldviews": ["US"]}, None),
    ("loc wv incompat irrelevant :400", {"worldview": "US", "class": "fancy_affogato"},
     {"worldviews": ["JP"]}, None),
    ("loc lang compat all :446", {"_mbx_worldview": "all", "_mbx_class": "affogato"},
     {"languages": ["en"]}, {"worldview": "all", "class": "affogato"}),
    ("loc quirk worldviews=[en] :488",
     {"_mbx_worldview": "US", "_mbx_class": "affogato"},
     {"worldviews": ["en"]}, None),
    ("loc lang incompat all :528",
     {"_mbx_worldview": "all", "_mbx_class": "affogato",
      "worldview": "all", "class": "fancy_affogato"},
     {"languages": ["ja"]}, {"worldview": "all", "class": "affogato"}),
    ("loc lang incompat one :573", {"worldview": "US", "class": "fancy_affogato"},
     {"languages": ["ja"]}, None),
    ("nonloc class only :618", {"class": "affogato"}, {}, {"class": "affogato"}),
    ("loc wv class only :658", {"class": "affogato"},
     {"worldviews": ["US"]}, {"class": "affogato"}),
    ("loc lang class only :698", {"class": "affogato"},
     {"languages": ["en"]}, {"class": "affogato"}),
    ("custom nonloc :742", {"worldview": "all", "ccllaassss": "fancy_affogato"},
     {"class_property": "ccllaassss", "hidden_prefix": "mmbbxx_"},
     {"worldview": "all", "ccllaassss": "fancy_affogato"}),
    ("custom loc lang :786",
     {"_mmbbxx_worldview": "all", "_mmbbxx_ccllaassss": "affogato",
      "worldview": "all", "ccllaassss": "fancy_affogato"},
     {"class_property": "ccllaassss", "hidden_prefix": "_mmbbxx_",
      "languages": ["ja"]},
     {"worldview": "all", "ccllaassss": "affogato"}),
]


@pytest.mark.parametrize("name,props,params,expected",
                         MATRIX, ids=[m[0] for m in MATRIX])
def test_class_matrix(spark, name, props, params, expected):
    from tests.test_localize import ordered_props_df
    df = ordered_props_df(spark, props)
    rows = localize(df, **params).collect()
    if expected is None:
        assert rows == [], name
    else:
        assert len(rows) == 1, name
        assert dict(rows[0].properties) == expected, name
