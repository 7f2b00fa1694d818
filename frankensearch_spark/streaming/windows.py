"""Watermarked tumbling-window aggregation over the events stream.

The streaming twin of ``driver_queries.q_events_windowed``: events arrive
on an unbounded stream; a watermark bounds how late data may be, so state
for closed windows is dropped and each finalized window emits EXACTLY
ONCE in append mode (the shape a 100-TB telemetry ingest needs — state is
bounded by (watermark span / window) x |event_type|, not by stream
length).  Stragglers older than the watermark are dropped once their
window's state is evicted (Spark's filter is best-effort while state
still lives) — the documented, tested tradeoff.

Timezone contract: Spark requires the watermark column to be TIMESTAMP
(with timezone) — EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE for NTZ — so an
NTZ ``ts`` is cast through the SESSION zone here.  Unlike the batch twin
(which stays NTZ-pure and is tz-invariant by construction), a streaming
deployment must pin ``spark.sql.session.timeZone`` (UTC on clusters);
the test pins UTC explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """ts/event_type/value stream -> per-(window, event_type) stats.

    In append mode a row emits only when the watermark passes its
    window's end; rows later than the watermark are dropped.  Works on a
    batch DataFrame too (withWatermark is a no-op there), where it
    reduces to the q_events_windowed expression shape.
    """
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value_r"),
            F.round(F.avg("value"), 6).alias("avg_value_r"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
            "sum_value_r",
            "avg_value_r",
        )
    )
