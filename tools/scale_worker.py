"""One scaling-bench run at a fixed parallelism (own process → cold JVM for
both runs, no JIT-warmness bias between cluster sizes).

Usage: python tools/scale_worker.py <cpus> <n_pages> <sf_dir>
Prints one JSON line: {"cpus": N, "seconds": {...}, "total": T, counters}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def main() -> None:
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2])
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from vtcomposite_spark.operators import dedupe as D
    from vtcomposite_spark.operators.cells import encode_cells, rollup_counts, tile_pixels
    from vtcomposite_spark.operators.composite import composite
    from vtcomposite_spark.schema import get_spark
    from vtcomposite_spark.sources.pages import extract_geotags, synthesize_pages

    spark = get_spark(app=f"scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")

    pages_path = f"/tmp/vtc_scale_pages_{n_pages}"
    if not os.path.isdir(pages_path):
        synthesize_pages(spark, n_pages, partitions=64).write.mode("overwrite") \
            .parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    seconds: dict[str, float] = {}
    counters: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        seconds[name] = round(time.perf_counter() - t0, 2)

    def geocode():
        geo = extract_geotags(pages).filter(F.col("lat").isNotNull())
        counters["pages_geocoded"] = encode_cells(geo, 12).count()

    def composite_overzoom():
        geo = extract_geotags(pages).filter(F.col("lat").isNotNull())
        src = tile_pixels(encode_cells(geo, 8), 8)
        feats = src.select(
            F.lit(0).alias("tile_idx"), F.lit(8).alias("src_z"),
            F.col("tile_x").alias("src_x"), F.col("tile_y").alias("src_y"),
            F.lit("pages").alias("layer"), F.lit(2).alias("layer_version"),
            F.lit(4096).alias("extent"),
            # deterministic ordinal WITHOUT a per-tile window: the SF hot
            # tile holds ~50% of rows, so row_number() over it would
            # serialize half the stage in one task (the exact skew the
            # north rule targets); a url-hash ordinal is order-free
            F.pmod(F.xxhash64("url"), F.lit(1 << 30)).cast("int").alias("feature_idx"),
            F.lit(None).cast("long").alias("feature_id"),
            F.lit(1).cast("byte").alias("geom_type"),
            F.array(F.col("px")).alias("xs"), F.array(F.col("py")).alias("ys"),
            F.array(F.lit(0)).alias("part_offsets"),
            F.array(F.lit(0).cast("byte")).alias("ring_types"),
            F.create_map(F.lit("url"), F.col("url")).alias("properties"))
        t10 = encode_cells(geo, 10).select("tile_x", "tile_y").distinct()
        targets = t10.select(
            F.lit(10).alias("z"), F.col("tile_x").alias("x"),
            F.col("tile_y").alias("y"), F.lit(128).alias("buffer_size"),
            F.lit(None).cast("array<string>").alias("keep_layers"),
            F.lit(False).alias("compress"))
        out = composite(feats, targets)
        counters["tiles_composited"] = out.select("z", "x", "y").distinct().count()

    def rollup():
        geo = extract_geotags(pages).filter(F.col("lat").isNotNull())
        counters["rollup_rows"] = rollup_counts(encode_cells(geo, 12), 12, 2).count()

    def minhash():
        counters["lsh_pairs"] = D.minhash_candidate_pairs(docs, k=8, bands=4).count()

    timed("pages_geocode", geocode)
    timed("tile_composite_overzoom", composite_overzoom)

    total = round(sum(seconds.values()), 2)
    print(json.dumps({"cpus": cpus, "seconds": seconds, "total": total,
                      "counters": counters, "n_pages": n_pages}))
    spark.stop()


if __name__ == "__main__":
    main()
