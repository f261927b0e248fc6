"""Deterministic sketch summaries: linear-counting distinct estimation
and the count-min frequency sketch — the bounded-memory cardinality /
heavy-hitter machinery a 100-TB corpus profiles itself with (Spark's
own ``approx_count_distinct`` is HLL++, whose register layout is not
replayable outside the JVM; these sketches hash with md5 + integer
arithmetic, so DuckDB rebuilds them bit-identically and the full
oracle gate verifies estimates value-exact).

Both follow the repo's engine-exactness discipline: bucket assignment
is ``_hex4_to_int(md5(...))`` arithmetic, counts are integer sums, and
the one libm call (linear counting's ln) rounds to integer micros at
the end — the bm25 rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import _hex4_to_int_col, hex4_to_int_sql


def _bucket_col(val, salt: str, k: int):
    h = F.md5(F.concat(F.lit(salt), val.cast("string")))
    return (_hex4_to_int_col(h) % k).cast("int")


def linear_count(df: DataFrame, col: str, k: int = 4096) -> DataFrame:
    """Linear-counting distinct estimate (Whang et al., TODS 1990):
    hash every value into ``k`` buckets, count the buckets HIT, and
    estimate n_distinct ≈ −k·ln(empty/k). One row out:
    (n_buckets_hit, est_micro) with the estimate in integer micros
    (null when every bucket is hit — the sketch is saturated and the
    estimate diverges; size k ≥ the expected cardinality).

    Accuracy note: the 16-bit md5 prefix caps distinguishable hash
    values at 65,536 — with k near or above that the hash itself
    saturates first; k ≤ 2^14 keeps the load factor honest. 100-TB
    shape: one map-side-combinable distinct-bucket count; the sketch
    state IS the k-bucket bitmap, never the values."""
    if not 1 <= k <= 65536:
        raise ValueError("linear_count: k must be in [1, 65536]")
    hit = (df.select(_bucket_col(F.col(col), "lc", k).alias("b"))
           .agg(F.count_distinct("b").alias("n_buckets_hit")))
    est = F.when(
        F.col("n_buckets_hit") < k,
        F.round(-F.lit(float(k))
                * F.log((k - F.col("n_buckets_hit")) / F.lit(float(k)))
                * 1_000_000).cast("long"))
    return hit.select("n_buckets_hit", est.alias("est_micro"))


def linear_count_sql(src_sql: str, col: str, k: int = 4096) -> str:
    """DuckDB twin of ``linear_count``."""
    h = hex4_to_int_sql(f"md5('lc' || CAST({col} AS VARCHAR))")
    b = f"{h} % {k}"
    return (
        f"WITH h AS (SELECT count(DISTINCT ({b})) AS n_buckets_hit "
        f"FROM ({src_sql})) "
        "SELECT n_buckets_hit, CASE WHEN n_buckets_hit < "
        f"{k} THEN CAST(round(-{float(k)} * ln((CAST({k} AS DOUBLE) - "
        f"n_buckets_hit) / {float(k)}) * 1000000) AS BIGINT) END "
        "AS est_micro FROM h"
    )


def countmin_build(df: DataFrame, col: str, depth: int = 4,
                   width: int = 1024) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over a value
    column: ``depth`` independent md5 hash rows × ``width`` buckets →
    at most depth·width rows (row, bucket, cnt) — the broadcastable
    frequency summary (4×1024 longs ≈ 32 KB regardless of corpus
    size). Estimates only ever OVERCOUNT (collisions add), never
    undercount — tested. 100-TB shape: one explode by depth (rows ∝
    depth·N) with a map-side-combinable sum; the sketch, not the
    values, is what downstream joins or broadcasts."""
    if depth < 1 or width < 1 or width > 65536:
        raise ValueError("countmin: depth >= 1, 1 <= width <= 65536")
    r = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    d = df.select(F.col(col).cast("string").alias("_v"), r)
    h = F.md5(F.concat(F.lit("cm"), F.col("row").cast("string"),
                       F.lit("_"), F.col("_v")))
    return (d.select("row", (_hex4_to_int_col(h) % width)
                     .cast("int").alias("bucket"))
            .groupBy("row", "bucket").agg(F.count("*").alias("cnt")))


def countmin_estimate(sketch: DataFrame, items: DataFrame,
                      col: str, depth: int = 4,
                      width: int = 1024) -> DataFrame:
    """Point-query the sketch for every row of ``items``: the estimate
    is min over the depth rows of the hashed bucket's count →
    (item, est). The sketch side is tiny — broadcast — so the query
    is one map-side join + a keys-only min agg."""
    r = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row")
    q = items.select(F.col(col).cast("string").alias("item"), r)
    h = F.md5(F.concat(F.lit("cm"), F.col("row").cast("string"),
                       F.lit("_"), F.col("item")))
    q = q.select("item", "row", (_hex4_to_int_col(h) % width)
                 .cast("int").alias("bucket"))
    return (q.join(F.broadcast(sketch), ["row", "bucket"], "left")
            .groupBy("item")
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est")))


def countmin_sql(src_sql: str, col: str, items_sql: str,
                 depth: int = 4, width: int = 1024) -> str:
    """DuckDB twin: build + estimate in one statement — (item, est)
    for every row of ``items_sql`` (one column named ``item``)."""
    rows = ", ".join(str(i) for i in range(depth))
    hb = hex4_to_int_sql(
        f"md5('cm' || r || '_' || CAST({col} AS VARCHAR))")
    hq = hex4_to_int_sql("md5('cm' || r || '_' || item)")
    return (
        f"WITH d AS (SELECT CAST({col} AS VARCHAR) AS {col}, r "
        f"FROM ({src_sql}), (SELECT unnest([{rows}]) AS r)), "
        f"sk AS (SELECT r AS row, ({hb}) % {width} AS bucket, "
        "count(*) AS cnt FROM d GROUP BY 1, 2), "
        f"q AS (SELECT CAST(item AS VARCHAR) AS item, r AS row, "
        f"({hq}) % {width} AS bucket "
        f"FROM ({items_sql}), (SELECT unnest([{rows}]) AS r)) "
        "SELECT q.item, CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est "
        "FROM q LEFT JOIN sk ON q.row = sk.row AND q.bucket = sk.bucket "
        "GROUP BY 1"
    )


def bloom_build(df: DataFrame, col: str, m_bits: int = 8192,
                k_hashes: int = 4) -> DataFrame:
    """Bloom filter (Bloom 1970) over a value column: ``k_hashes`` md5
    hash functions set bits in an ``m_bits`` bitmap, stored as
    ``m_bits/32`` (word_idx, bits) 32-bit words built with a
    ``bit_or`` aggregate (32-bit words because DuckDB range-checks
    ``1::BIGINT << 63`` — shifts stay ≤ 31 in both engines) — the
    broadcastable membership summary (8,192 bits = 256 words = 1 KB
    regardless of corpus size). NO false negatives
    ever (property-tested); false-positive rate ~(1−e^(−kn/m))^k.
    Absent words (no bit set) are omitted — readers coalesce to 0.

    100-TB shape: rows ∝ k·N into a map-side-combinable bit_or on at
    most m/64 groups; the filter, not the values, is what ships to the
    probe side (the classic join-pruning / "have we crawled this url"
    pre-filter)."""
    if m_bits < 32 or m_bits % 32 != 0:
        raise ValueError("bloom_build: m_bits must be a multiple of 32")
    if not 1 <= k_hashes <= 16:
        raise ValueError("bloom_build: k_hashes must be in [1, 16]")
    r = F.explode(F.array(*[F.lit(i) for i in range(k_hashes)])).alias("r")
    d = df.select(F.col(col).cast("string").alias("_v"), r)
    h = F.md5(F.concat(F.lit("bl"), F.col("r").cast("string"),
                       F.lit("_"), F.col("_v")))
    bit = _hex4_to_int_col(h) % m_bits
    return (d.select((bit / 32).cast("int").alias("word_idx"),
                     F.call_function(
                         "shiftleft", F.lit(1).cast("long"),
                         (bit % 32).cast("int")).alias("_b"))
            .groupBy("word_idx").agg(F.bit_or("_b").alias("bits")))


def bloom_contains(bloom: DataFrame, items: DataFrame, col: str,
                   m_bits: int = 8192, k_hashes: int = 4) -> DataFrame:
    """Probe the filter for every row of ``items`` → (item, maybe):
    ``maybe`` false is DEFINITE absence; true is presence up to the
    false-positive rate. The filter broadcasts; the probe is one
    map-side join + a keys-only conjunction per item."""
    r = F.explode(F.array(*[F.lit(i) for i in range(k_hashes)])).alias("r")
    q = items.select(F.col(col).cast("string").alias("item"), r)
    h = F.md5(F.concat(F.lit("bl"), F.col("r").cast("string"),
                       F.lit("_"), F.col("item")))
    bit = _hex4_to_int_col(h) % m_bits
    q = q.select("item", (bit / 32).cast("int").alias("word_idx"),
                 F.call_function(
                     "shiftleft", F.lit(1).cast("long"),
                     (bit % 32).cast("int")).alias("_b"))
    hit = (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_b"))
           != 0).cast("int")
    return (q.join(F.broadcast(bloom), "word_idx", "left")
            .select("item", hit.alias("_hit"))
            .groupBy("item")
            .agg((F.min("_hit") == 1).alias("maybe")))


def bloom_sql(src_sql: str, col: str, items_sql: str,
              m_bits: int = 8192, k_hashes: int = 4) -> str:
    """DuckDB twin: build + probe in one statement → (item, maybe)."""
    rows = ", ".join(str(i) for i in range(k_hashes))
    hb = hex4_to_int_sql(
        f"md5('bl' || r || '_' || CAST({col} AS VARCHAR))")
    hq = hex4_to_int_sql("md5('bl' || r || '_' || item)")
    return (
        f"WITH d AS (SELECT ({hb}) % {m_bits} AS bit "
        f"FROM ({src_sql}), (SELECT unnest([{rows}]) AS r)), "
        "bl AS (SELECT CAST(bit // 32 AS INTEGER) AS word_idx, "
        "bit_or(CAST(1 AS BIGINT) << CAST(bit % 32 AS INTEGER)) AS bits "
        "FROM d GROUP BY 1), "
        f"q AS (SELECT CAST(item AS VARCHAR) AS item, "
        f"({hq}) % {m_bits} AS bit "
        f"FROM ({items_sql}), (SELECT unnest([{rows}]) AS r)) "
        "SELECT q.item, min(CASE WHEN coalesce(bl.bits, 0) & "
        "(CAST(1 AS BIGINT) << CAST(q.bit % 32 AS INTEGER)) != 0 "
        "THEN 1 ELSE 0 END) = 1 AS maybe "
        "FROM q LEFT JOIN bl ON CAST(q.bit // 32 AS INTEGER) = bl.word_idx "
        "GROUP BY 1"
    )


def exact_quantiles(df: DataFrame, col: str, qs: "list[float]",
                    buckets: int = 256) -> DataFrame:
    """EXACT type-1 (discrete) quantiles without a global sort — the
    order-statistics complement to the sketches: for each q the value
    at rank ⌈q·n⌉ of the ascending order, (q_milli, rank, value).

    Two-phase, the pack_sequences prefix-sum discipline applied to
    order statistics: (1) an affine value histogram — global min/max
    (one map-side agg) split into ``buckets`` ranges, per-bucket
    counts, cumulative over the ≤``buckets``-row histogram only; the
    bucket containing each rank is exact bookkeeping; (2) a rank
    window over the ONE bucket holding the target rank — work ∝ that
    bucket's rows, never a single global sort partition. Heavy value
    skew degrades phase 2 toward n rows in one task (the histogram is
    affine, not equi-depth); recursive refinement is the production
    answer and out of scope — documented, and the VALUE is exact
    either way.

    Engine-exact: ranks are integers, bucket edges are the identical
    IEEE affine expression in both engines, ties share the value, so
    ``exact_quantiles_sql`` (the naive global row_number — fine at
    oracle scale) replays value-identically."""
    from pyspark.sql import Window

    if not qs or any(not 0 < q <= 1 for q in qs):
        raise ValueError("exact_quantiles: every q must be in (0, 1]")
    if buckets < 1:
        raise ValueError("exact_quantiles: buckets must be >= 1")
    v = df.select(F.col(col).cast("double").alias("v")) \
        .filter(F.col("v").isNotNull())
    stats = v.agg(F.count("*").alias("n"), F.min("v").alias("lo"),
                  F.max("v").alias("hi"))
    b = v.crossJoin(F.broadcast(stats)).select(
        "v",
        F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.least(F.lit(buckets - 1),
                    F.floor((F.col("v") - F.col("lo"))
                            / (F.col("hi") - F.col("lo")) * buckets)
                    .cast("int"))).alias("b"))
    hist = b.groupBy("b").agg(F.count("*").alias("c"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    hist = hist.select(
        "b", "c", F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("cum0"))
    targets = (stats.select("n").crossJoin(
        F.broadcast(df.sparkSession.createDataFrame(
            [(int(round(q * 1000)),) for q in sorted(set(qs))],
            "q_milli long")))
        .select("q_milli",
                F.ceil(F.col("q_milli") / 1000.0 * F.col("n"))
                .cast("long").alias("rank")))
    hit = (targets.join(F.broadcast(hist),
                        (F.col("rank") > F.col("cum0"))
                        & (F.col("rank") <= F.col("cum0") + F.col("c")))
           .select("q_milli", "rank", "b",
                   (F.col("rank") - F.col("cum0")).alias("off")))
    wv = Window.partitionBy("b").orderBy("v")
    ranked = b.withColumn("rn", F.row_number().over(wv))
    return (ranked.join(F.broadcast(hit),
                        (ranked["b"] == hit["b"])
                        & (ranked["rn"] == hit["off"]))
            .select("q_milli", "rank", F.col("v").alias("value")))


def exact_quantiles_sql(src_sql: str, col: str,
                        qs: "list[float]") -> str:
    """DuckDB twin of ``exact_quantiles`` — the naive global
    row_number rank (oracle scale only)."""
    qrows = ", ".join(f"({int(round(q * 1000))})" for q in sorted(set(qs)))
    return (
        f"WITH v AS (SELECT CAST({col} AS DOUBLE) AS v FROM ({src_sql}) "
        f"WHERE {col} IS NOT NULL), "
        "r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v), "
        "n AS (SELECT count(*) AS n FROM v), "
        f"t AS (SELECT q_milli, CAST(ceil(q_milli / 1000.0 * n.n) "
        f"AS BIGINT) AS rank FROM (VALUES {qrows}) AS _q(q_milli), n) "
        "SELECT t.q_milli, t.rank, r.v AS value "
        "FROM t JOIN r ON r.rn = t.rank"
    )
