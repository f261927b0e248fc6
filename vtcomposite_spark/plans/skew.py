"""Skew handling for hot tiles (dense urban zooms) — the north rule's
explicit partitioning/skew requirement.

AQE's skew-join splitter covers joins, but a ``groupBy`` on tile keys with a
hot tile (the SF cluster holds ≥50% of geotagged pages) still lands one
monster partition. The classic fix is the two-phase salted aggregate:

    phase 1: group by (key, salt)   — hot key splits across NSALT reducers,
                                      map-side combine shrinks each
    phase 2: group by key           — re-aggregates NSALT partials

Salt = pmod(xxhash64(row-identity), nsalt): deterministic, no RNG, stable
under retries (a Spark-side physical concern only — never part of operator
semantics, so engine-specific hashing is fine here). For first-wins
composite ordering the salt is applied AFTER winner selection, so it cannot
reorder tile_idx precedence (SURVEY.md §7 hard-point d).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, identity_cols: list[str], nsalt: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in identity_cols]),
                         F.lit(nsalt)))


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]],
               identity_cols: list[str], nsalt: int = 16) -> DataFrame:
    """Two-phase aggregate. ``aggs``: out_col -> (in_expr, kind) where kind ∈
    {sum, count, min, max}. Phase-2 re-aggregation: count → sum of partial
    counts; sum/min/max → same op over partials."""
    d = with_salt(df, identity_cols, nsalt)
    phase1 = []
    for out, (expr, kind) in aggs.items():
        col = F.expr(expr)
        p = {"sum": F.sum(col), "count": F.count(col),
             "min": F.min(col), "max": F.max(col)}[kind]
        phase1.append(p.alias(out))
    part = d.groupBy(*keys, "_salt").agg(*phase1)
    phase2 = []
    for out, (_, kind) in aggs.items():
        c = F.col(out)
        p = {"sum": F.sum(c), "count": F.sum(c),
             "min": F.min(c), "max": F.max(c)}[kind]
        phase2.append(p.alias(out))
    return part.groupBy(*keys).agg(*phase2)


def salted_tile_counts(df: DataFrame, tile_cols: list[str],
                       identity_cols: list[str], nsalt: int = 16) -> DataFrame:
    """Per-tile row counts, hot-tile safe."""
    return salted_agg(df, tile_cols, {"n": ("1", "count")},
                      identity_cols, nsalt)
