"""The reference's worldview test matrix (test/vtcomposite-localize-
worldview.test.js, 34 cases) as a parametrized table: input properties ×
params → expected output properties (None = feature dropped)."""

import pytest
from pyspark.sql import types as T

from vtcomposite_spark.operators.localize import localize

SCHEMA = T.StructType([
    T.StructField("fid", T.IntegerType()),
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
])

# (test name @ line, props, params, expected)
MATRIX = [
    # set 1: non-localized (:14-209)
    ("nonlocalized compat all :14", {"worldview": "all"}, {}, {"worldview": "all"}),
    ("nonlocalized compat list :52", {"worldview": "US,CN"}, {}, {"worldview": "US,CN"}),
    ("nonlocalized incompat all :90", {"_mbx_worldview": "all"}, {}, {}),
    ("nonlocalized incompat list :132", {"_mbx_worldview": "CN,JP,US"}, {}, None),
    ("nonlocalized no worldview :168", {"whatever": "blah"}, {}, {"whatever": "blah"}),
    # set 2: localized via worldviews (:211-473)
    ("localized compat all :211", {"_mbx_worldview": "all"},
     {"worldviews": ["US"]}, {"worldview": "all"}),
    ("localized compat list :249", {"_mbx_worldview": "CN,JP,TR,US"},
     {"worldviews": ["US"]}, {"worldview": "US"}),
    ("localized compat partial :287", {"_mbx_worldview": "USSR"},
     {"worldviews": ["US"]}, None),
    ("localized incompat all :323", {"worldview": "all"},
     {"worldviews": ["US"]}, {}),
    ("localized incompat requested :364", {"worldview": "US"},
     {"worldviews": ["US"]}, None),
    ("localized incompat irrelevant :400", {"worldview": "JP"},
     {"worldviews": ["US"]}, None),
    ("localized no worldview :436", {"whatever": "blah"},
     {"worldviews": ["US"]}, {"whatever": "blah"}),
    # set 3: worldviews=[] → default injected (:474)
    ("empty worldviews uses default :474", {"_mbx_worldview": "US,CN"},
     {"worldviews": []}, {"worldview": "US"}),
    # set 4: localized via languages only (default worldview US) (:518-713)
    ("languages compat all :518", {"_mbx_worldview": "all", "name": "x"},
     {"languages": ["ja"]}, {"worldview": "all", "name": "x", "name_local": "x"}),
    ("languages compat list :556", {"_mbx_worldview": "CN,JP,TR,US"},
     {"languages": ["ja"]}, {"worldview": "US"}),
    ("languages incompat all :595", {"worldview": "all"},
     {"languages": ["ja"]}, {}),
    ("languages incompat one :636", {"worldview": "US"},
     {"languages": ["ja"]}, None),
    ("languages no worldview :672", {"whatever": "blah"},
     {"languages": ["ja"]}, {"whatever": "blah"}),
    # set 5: custom worldview property key + hidden prefix (:714-1006)
    ("custom nonlocalized compat+incompat all :714",
     {"mmbbxx_wwoorrllddvviieeww": "all", "wwoorrllddvviieeww": "all"},
     {"worldview_property": "wwoorrllddvviieeww", "hidden_prefix": "mmbbxx_"},
     {"wwoorrllddvviieeww": "all"}),
    ("custom nonlocalized compat one :757", {"wwoorrllddvviieeww": "US"},
     {"worldview_property": "wwoorrllddvviieeww", "hidden_prefix": "mmbbxx_"},
     {"wwoorrllddvviieeww": "US"}),
    ("custom nonlocalized incompat :799",
     {"mmbbxx_wwoorrllddvviieeww": "US", "wwoorrllddvviieeww": "US"},
     {"worldview_property": "wwoorrllddvviieeww", "hidden_prefix": "mmbbxx_"},
     None),
    ("custom localized compat all :840", {"mmbbxx_wwoorrllddvviieeww": "all"},
     {"worldview_property": "wwoorrllddvviieeww", "hidden_prefix": "mmbbxx_",
      "worldviews": ["US"]},
     {"wwoorrllddvviieeww": "all"}),
    ("custom localized requested :880", {"mmbbxx_wwoorrllddvviieeww": "JP,US"},
     {"worldview_property": "wwoorrllddvviieeww", "hidden_prefix": "mmbbxx_",
      "worldviews": ["US"]},
     {"wwoorrllddvviieeww": "US"}),
    ("custom localized irrelevant :922", {"mmbbxx_wwoorrllddvviieeww": "CN,TR"},
     {"worldview_property": "wwoorrllddvviieeww", "hidden_prefix": "mmbbxx_",
      "worldviews": ["US"]},
     None),
    ("custom localized incompat :962",
     {"mmbbxx_wwoorrllddvviieeww": "US", "wwoorrllddvviieeww": "US"},
     {"worldview_property": "wwoorrllddvviieeww", "hidden_prefix": "mmbbxx_",
      "worldviews": ["JP"]},
     None),
    # set 6: worldview_default interplay (:1007-1273)
    ("nonlocalized compat default wv :1007", {"worldview": "US"},
     {"worldview_default": "US"}, {"worldview": "US"}),
    ("nonlocalized compat other wv :1045", {"worldview": "JP"},
     {"worldview_default": "US"}, {"worldview": "JP"}),
    ("localized default not requested :1083", {"_mbx_worldview": "US"},
     {"worldviews": ["JP"], "worldview_default": "US"}, None),
    ("localized requested not default :1120", {"_mbx_worldview": "JP"},
     {"worldviews": ["JP"], "worldview_default": "US"}, {"worldview": "JP"}),
    ("localized default and requested :1159", {"_mbx_worldview": "JP"},
     {"worldviews": ["JP"], "worldview_default": "JP"}, {"worldview": "JP"}),
    ("languages feature in default :1198", {"_mbx_worldview": "JP"},
     {"languages": ["en"], "worldview_default": "JP"}, {"worldview": "JP"}),
    ("languages feature not in default :1237", {"_mbx_worldview": "JP"},
     {"languages": ["en"], "worldview_default": "US"}, None),
    # set 7: worldviews=ALL (:1274-1379)
    ("ALL drops legacy key :1274", {"worldview": "US"},
     {"worldviews": ["ALL"]}, None),
    ("ALL passes whole list :1327", {"_mbx_worldview": "CN,JP,US"},
     {"worldviews": ["ALL"]}, {"worldview": "CN,JP,US"}),
]


@pytest.mark.parametrize("name,props,params,expected",
                         MATRIX, ids=[m[0] for m in MATRIX])
def test_worldview_matrix(spark, name, props, params, expected):
    from tests.test_localize import ordered_props_df
    df = ordered_props_df(spark, props)
    rows = localize(df, **params).collect()
    if expected is None:
        assert rows == [], name
    else:
        assert len(rows) == 1, name
        assert dict(rows[0].properties) == expected, name
