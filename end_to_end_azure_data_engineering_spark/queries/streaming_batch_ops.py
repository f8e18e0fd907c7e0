"""Batch runs of the STREAMING module's transformations.

`streaming/ingest.py::windowed_counts` / `session_windows` are plain
DataFrame functions — handed a streaming frame they run incrementally with
watermark state; handed a batch frame they compute the identical result in
one pass. Registering the batch runs here puts that unification under the
driver's oracle gate: the same code path the streaming tests drive is
hash-verified against DuckDB.

(The watermark clause is late-data policy only — on a bounded batch frame
nothing is late, so results equal the pure windowed aggregation.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.ingest import session_windows, windowed_counts
from . import load, register

_WIN_US = 5 * 60 * 1_000_000
_GAP = "30 minutes"
_GAP_US = 30 * 60 * 1_000_000


@register(
    "tumbling_window_counts",
    oracle=f"""
    SELECT CAST(to_timestamp(epoch_us(ts) // {_WIN_US} * {_WIN_US} / 1e6) AS TIMESTAMP) AS window_start,
           CAST(to_timestamp((epoch_us(ts) // {_WIN_US} + 1) * {_WIN_US} / 1e6) AS TIMESTAMP) AS window_end,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2, event_type
    """,
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = windowed_counts(ev, window="5 minutes")
    return out.withColumn("total_value", F.round("total_value", 4))


@register(
    "session_window_rollup",
    oracle=f"""
    WITH t AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_GAP_US}
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM t
    )
    SELECT min(ts) AS session_start,
           CAST(to_timestamp((epoch_us(max(ts)) + {_GAP_US}) / 1e6) AS TIMESTAMP) AS session_end,
           user_id,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM s
    GROUP BY user_id, session_id
    """,
)
def session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.session_window on a batch frame. Oracle replays the identical
    semantics as gaps-and-islands SQL: a session's window is
    [min(ts), max(ts) + gap) — events within `gap` of each other merge."""
    ev = load(spark, sf_dir, "events")
    out = session_windows(ev, gap=_GAP)
    return out.withColumn("total_value", F.round("total_value", 4))


_SLIDE_US = 5 * 60 * 1_000_000
_SWIN_US = 10 * 60 * 1_000_000
_OVERLAP = _SWIN_US // _SLIDE_US  # windows each event belongs to


@register(
    "sliding_window_counts",
    oracle=f"""
    WITH assigned AS (
      SELECT e.event_type, e.value,
             (epoch_us(e.ts) // {_SLIDE_US} - i.i) * {_SLIDE_US} AS ws
      FROM events e
      CROSS JOIN (SELECT unnest(range({_OVERLAP})) AS i) i
    )
    SELECT CAST(to_timestamp(ws / 1e6) AS TIMESTAMP) AS window_start,
           CAST(to_timestamp((ws + {_SWIN_US}) / 1e6) AS TIMESTAMP) AS window_end,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM assigned
    GROUP BY 1, 2, event_type
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows — 10-minute window every 5 minutes — via
    the same streaming-module code path (`windowed_counts` with a slide).
    Spark expands each event into window/slide overlapping windows before
    the aggregation (Expand node, the streaming-compatible plan); the
    oracle replays that expansion arithmetically: an event at t belongs to
    the window starting at floor(t/slide)*slide − i*slide for
    i ∈ [0, window/slide)."""
    ev = load(spark, sf_dir, "events")
    out = windowed_counts(ev, window="10 minutes", slide="5 minutes")
    return out.withColumn("total_value", F.round("total_value", 4))


@register(
    "stream_interval_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lag_us,
           round(p.value, 4) AS purchase_value
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch run of streaming/ingest.py::interval_join_events — the
    click→purchase attribution pairs within a 30-minute horizon. The same
    function joins two live streams with bounded state
    (tests/test_streaming.py::test_interval_join_streams); here the driver
    hash-verifies its join semantics against DuckDB."""
    from . import epoch_us
    from ..streaming.ingest import interval_join_events

    ev = load(spark, sf_dir, "events")
    out = interval_join_events(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        horizon="30 minutes",
    )
    return out.select(
        "user_id",
        F.col("l_id").alias("click_id"),
        F.col("r_id").alias("purchase_id"),
        (epoch_us("r_ts") - epoch_us("l_ts")).alias("lag_us"),
        F.round(F.col("r_value"), 4).alias("purchase_value"),
    )
