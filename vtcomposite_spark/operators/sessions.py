"""Event-log sessionization: gap-based sessions over a (user, ts)
event table — the classic web-analytics operator (a crawl/user log is
the `events` twin of the pages tables; the reference engine has no
analog — graft surface, like the dedupe family).

Semantics: within a user, an event starts a NEW session when it is the
user's first event or arrives more than ``gap_us`` after the previous
one; ``session_id`` is the user-scoped 1-based session ordinal. Events
order by the TOTAL (epoch_us, event_id) key, so simultaneous events
are deterministic and both engines replay the same assignment.

Timestamps follow the latest_snapshot discipline (web.py): the epoch
is built from the NTZ timestamp's FIELDS (date, h, m, exact-decimal
seconds), never unix_micros over a session-timezone cast — parquet
event logs are timezone-naive and a tz cast would make session breaks
depend on driver configuration.

100-TB shape: ONE shuffle on the user key; the lag + running-sum
windows run inside each user partition (users are small next to the
corpus — a pathological bot user is a data-quality problem upstream,
not a plan problem here, and stays on one task by the semantics'
nature: sessions are sequential per user). ``session_stats`` is a
map-side-combinable groupBy on the assignment's own keys — no second
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # the classic 30-minute rule


def _epoch_us(ts_col: str) -> F.Column:
    # NTZ fields → exact integer micros (see module docstring)
    return F.expr(
        f"unix_date(cast({ts_col} as date)) * 86400000000 + "
        f"CAST(hour({ts_col}) * 3600 + minute({ts_col}) * 60 AS BIGINT) "
        f"* 1000000 + "
        f"CAST(extract(SECOND FROM {ts_col}) * 1000000 AS BIGINT)")


def sessionize(events: DataFrame, gap_us: int = DEFAULT_GAP_US,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """Per-event session assignment: (id, user, ts_us, session_id) with
    ``session_id`` the user-scoped 1-based ordinal. One lag() + one
    running sum() over the same (user ORDER BY ts_us, id) window."""
    from pyspark.sql.window import Window

    if gap_us < 0:
        raise ValueError("gap_us must be >= 0")
    w = Window.partitionBy("_u").orderBy("_ts", "_id")
    c = events.select(F.col(id_col).alias("_id"),
                      F.col(user_col).alias("_u"),
                      _epoch_us(ts_col).alias("_ts"))
    brk = F.when(
        F.lag("_ts").over(w).isNull()
        | ((F.col("_ts") - F.lag("_ts").over(w)) > gap_us),
        F.lit(1)).otherwise(F.lit(0))
    return (c.withColumn("_brk", brk)
            .withColumn("session_id",
                        F.sum("_brk").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)))
            .select(F.col("_id").alias(id_col),
                    F.col("_u").alias(user_col),
                    F.col("_ts").alias("ts_us"),
                    F.col("session_id").cast("long")))


def sessionize_sql(src_sql: str, gap_us: int = DEFAULT_GAP_US,
                   user_col: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id") -> str:
    """DuckDB twin of ``sessionize`` (``src_sql`` yields id, user, ts)."""
    return (
        f"WITH c AS (SELECT {id_col}, {user_col}, "
        f"epoch_us({ts_col}) AS ts_us FROM ({src_sql})), "
        "b AS (SELECT *, CASE WHEN lag(ts_us) OVER "
        f"(PARTITION BY {user_col} ORDER BY ts_us, {id_col}) IS NULL "
        f"OR ts_us - lag(ts_us) OVER (PARTITION BY {user_col} "
        f"ORDER BY ts_us, {id_col}) > {gap_us} THEN 1 ELSE 0 END AS brk "
        "FROM c) "
        f"SELECT {id_col}, {user_col}, ts_us, "
        f"CAST(sum(brk) OVER (PARTITION BY {user_col} "
        f"ORDER BY ts_us, {id_col} ROWS UNBOUNDED PRECEDING) AS BIGINT) "
        "AS session_id FROM b"
    )


def session_stats(events: DataFrame, gap_us: int = DEFAULT_GAP_US,
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id") -> DataFrame:
    """Per-session rollup: (user, session_id, n_events, start_us,
    end_us, duration_us) — all exact integers."""
    s = sessionize(events, gap_us, user_col, ts_col, id_col)
    return (s.groupBy(user_col, "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts_us").alias("start_us"),
                 F.max("ts_us").alias("end_us"))
            .withColumn("duration_us",
                        F.col("end_us") - F.col("start_us")))


def session_stats_sql(src_sql: str, gap_us: int = DEFAULT_GAP_US,
                      user_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id") -> str:
    """DuckDB twin of ``session_stats``."""
    inner = sessionize_sql(src_sql, gap_us, user_col, ts_col, id_col)
    return (
        f"SELECT {user_col}, session_id, count(*)::BIGINT AS n_events, "
        "min(ts_us) AS start_us, max(ts_us) AS end_us, "
        "max(ts_us) - min(ts_us) AS duration_us "
        f"FROM ({inner}) GROUP BY 1, 2"
    )


def event_window_counts(events: DataFrame, window_minutes: int = 60,
                        type_col: str = "event_type",
                        ts_col: str = "ts") -> DataFrame:
    """Tumbling-window event counts — the BATCH twin of the streaming
    pipeline's watermarked windowed aggregation, on the same exact
    integer epochs: (window_start_us, type, n_events) with
    window_start_us = floor(epoch_us / W)·W. One map-side-combinable
    groupBy; windows align identically in both engines because the
    epoch is integer micros from the NTZ fields."""
    if window_minutes < 1:
        raise ValueError("window_minutes must be >= 1")
    w_us = window_minutes * 60 * 1_000_000
    ws = _epoch_us(ts_col)
    start = (ws - (ws % w_us)).alias("window_start_us")
    return (events.select(start, F.col(type_col).alias("type"))
            .groupBy("window_start_us", "type")
            .agg(F.count("*").alias("n_events")))


def event_window_counts_sql(src_sql: str, window_minutes: int = 60,
                            type_col: str = "event_type",
                            ts_col: str = "ts") -> str:
    """DuckDB twin of ``event_window_counts``."""
    w_us = window_minutes * 60 * 1_000_000
    e = f"epoch_us({ts_col})"
    return (
        f"SELECT {e} - ({e} % {w_us}) AS window_start_us, "
        f"{type_col} AS type, count(*) AS n_events "
        f"FROM ({src_sql}) GROUP BY 1, 2"
    )
