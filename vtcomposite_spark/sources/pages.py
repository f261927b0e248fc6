"""Pages source — Common-Crawl-style web pages (BASELINE.json input_hint).

Schema: (url string, warc_ts timestamp, html binary, text string, lang string).
Two producers:

* ``synthesize_pages`` — deterministic generator (seeded); embeds the geotag
  in the html as ``<meta name="geo.position" content="lat;lon">``, gzips
  ~30% of the html payloads to exercise the gzip-sniff path (the binary
  analog of src/vtcomposite.cpp:224-235), leaves ~20% of rows ungeotagged,
  and concentrates ≥50% of geotagged rows inside one z12 tile (the SF
  cluster) so hot-tile skew is real (FIXTURES.md §1).
* ``pages_from_documents`` — derives a pages frame from the driver's
  ``documents`` parquet with the same deterministic geo distribution keyed
  on doc_id (no external data; reproducible in ANSI SQL for oracles).

``extract_geotags`` pulls (lat, lon) back out of the html with ONE
Arrow-vectorized pandas UDF (gzip sniff + regex over bytes) — the
scan→extract step of the 100 TB pipeline. The ``text`` column is never
touched: byte-identical text per url is the pipeline invariant.
"""

from __future__ import annotations

import gzip

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..schema import PAGES_SCHEMA

SF_LAT, SF_LON = 37.76, -122.44
LANGS = ["en", "de", "fr", "ja", "zh-Hant", "es"]


# deterministic integer-arithmetic geo assignment (also expressible in SQL):
#   h = (i * 2654435761) mod 2^31          (Knuth multiplicative hash)
#   geotagged      iff  h mod 10 < 8       (~80%)
#   SF cluster     iff  h mod 10 < 4       (half of the geotagged rows)
#   cluster:  lat = 37.76 + ((h//10) mod 1000 - 500) * 1e-5   (~±0.005°, one z12 tile)
#   sprinkle: lat = ((h//10) mod 16000) / 100 - 80 ; lon = ((h//100) mod 36000)/100 - 180
KNUTH = 2654435761


def _geo_for_ids(ids: np.ndarray):
    h = (ids.astype(np.int64) * KNUTH) % (1 << 31)
    tagged = (h % 10) < 8
    in_sf = (h % 10) < 4
    lat_sf = SF_LAT + (((h // 10) % 1000) - 500) * 1e-5
    lon_sf = SF_LON + (((h // 100) % 1000) - 500) * 1e-5
    lat_sp = ((h // 10) % 16000) / 100.0 - 80.0
    lon_sp = ((h // 100) % 36000) / 100.0 - 180.0
    lat = np.where(in_sf, lat_sf, lat_sp)
    lon = np.where(in_sf, lon_sf, lon_sp)
    return tagged, lat, lon


def geo_sql_exprs(id_col: str) -> dict[str, str]:
    """The same assignment as ANSI SQL snippets (used by DuckDB oracles)."""
    h = f"(({id_col} * {KNUTH}) % 2147483648)"
    return {
        "tagged": f"({h} % 10) < 8",
        "in_sf": f"({h} % 10) < 4",
        "lat": (f"CASE WHEN ({h} % 10) < 4 THEN {SF_LAT} + ((({h}//10) % 1000) - 500) * 1e-5 "
                f"ELSE (({h}//10) % 16000) / 100.0 - 80.0 END"),
        "lon": (f"CASE WHEN ({h} % 10) < 4 THEN {SF_LON} + ((({h}//100) % 1000) - 500) * 1e-5 "
                f"ELSE (({h}//100) % 36000) / 100.0 - 180.0 END"),
    }


def geo_cols(id_col):
    """Same assignment as Spark Columns (stays JVM-side; matches the SQL)."""
    h = (F.col(id_col).cast("long") * F.lit(KNUTH)) % F.lit(1 << 31)
    in_sf = (h % 10) < 4
    tagged = (h % 10) < 8
    lat = F.when(in_sf, F.lit(SF_LAT) + (((h / 10).cast("long") % 1000) - 500) * 1e-5) \
        .otherwise(((h / 10).cast("long") % 16000) / 100.0 - 80.0)
    lon = F.when(in_sf, F.lit(SF_LON) + (((h / 100).cast("long") % 1000) - 500) * 1e-5) \
        .otherwise(((h / 100).cast("long") % 36000) / 100.0 - 180.0)
    return tagged, lat, lon


def _html_for(i: int, lat: float, lon: float, tagged: bool, text: str) -> bytes:
    meta = (f'<meta name="geo.position" content="{lat:.6f};{lon:.6f}">'
            if tagged else "")
    html = (f"<html><head><title>page {i}</title>{meta}</head>"
            f"<body>{text}</body></html>").encode("utf-8")
    if i % 10 < 3:  # ~30% gzipped
        return gzip.compress(html, compresslevel=1)
    return html


def synthesize_pages(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic synthetic pages (distributed generation via spark.range)."""

    def gen(pdfs):
        for pdf in pdfs:
            ids = pdf["id"].to_numpy()
            tagged, lat, lon = _geo_for_ids(ids)
            rows = {
                "url": [f"https://example.org/{i:08d}" for i in ids],
                "warc_ts": pd.to_datetime(1_600_000_000 + ids, unit="s"),
                "html": [
                    _html_for(int(i), float(la), float(lo), bool(t), f"text body {int(i)} lorem")
                    for i, la, lo, t in zip(ids, lat, lon, tagged)
                ],
                "text": [f"text body {int(i)} lorem" for i in ids],
                "lang": [LANGS[int(i) % len(LANGS)] for i in ids],
            }
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, schema=PAGES_SCHEMA)


def pages_from_documents(documents: DataFrame) -> DataFrame:
    """Pages frame derived from the driver's documents table (doc_id keyed)."""
    tagged, lat, lon = geo_cols("doc_id")
    return documents.select(
        F.concat(F.lit("https://example.org/"), F.lpad(F.col("doc_id").cast("string"), 8, "0")).alias("url"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("doc_id")).alias("warc_ts"),
        F.encode(F.concat(
            F.lit("<html><head>"),
            F.when(tagged, F.concat(
                F.lit('<meta name="geo.position" content="'),
                F.format_string("%.6f", lat), F.lit(";"), F.format_string("%.6f", lon),
                F.lit('">'))).otherwise(F.lit("")),
            F.lit("</head><body>"), F.col("text"), F.lit("</body></html>"),
        ), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def extract_geotags(pages: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """pages + (lat, lon) columns; null for ungeotagged rows.

    Single mapInPandas pass (a struct-returning pandas_udf would risk one
    UDF evaluation per extracted field): gzip-sniff each html payload
    (0x1f8b, the binary analog of src/vtcomposite.cpp:224-235), regex out
    the geo.position meta tag.

    ``keep``: columns to carry through the Python crossing (default: all).
    Catalyst's column pruning cannot see inside mapInPandas, so at scale
    pass the minimal set — shipping the html payload back OUT of the worker
    doubles the Arrow traffic for nothing.
    """
    import re

    from pyspark.sql import types as T

    if keep is not None:
        in_cols = list(dict.fromkeys([*keep, "html"]))
        pages = pages.select(*in_cols)
        out_cols = list(keep)
    else:
        out_cols = list(pages.columns)

    out_schema = T.StructType(
        [pages.schema[c] for c in out_cols]
        + [T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())])
    pat = re.compile(rb'geo\.position"\s+content="(-?[\d.]+);(-?[\d.]+)"')

    def kernel(pdfs):
        for pdf in pdfs:
            html = pdf["html"]
            lats = np.full(len(html), np.nan)
            lons = np.full(len(html), np.nan)
            for i, buf in enumerate(html):
                if buf is None:
                    continue
                b = bytes(buf)
                if len(b) >= 2 and b[0] == 0x1F and b[1] == 0x8B:
                    b = gzip.decompress(b)
                m = pat.search(b)
                if m:
                    lats[i] = float(m.group(1))
                    lons[i] = float(m.group(2))
            out = pdf[out_cols].copy()
            out["lat"] = lats
            out["lon"] = lons
            yield out

    return pages.mapInPandas(kernel, schema=out_schema)
