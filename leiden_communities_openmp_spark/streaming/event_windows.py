"""Event-time windowed aggregation with watermarked late-data handling.

The link-event stream (crawl events, edge mutations) carries an event-time
timestamp; downstream consumers want per-window counts that tolerate
out-of-order arrival without unbounded state. This is the canonical
Structured Streaming shape: ``withWatermark`` bounds how late an event may
arrive (state for windows older than the watermark is dropped), and the
tumbling-window aggregation emits one row per (window, key).

Design notes for the 100 TB stream:
- The aggregation is a streaming-state hash agg keyed by (window, key) —
  state size is O(active windows × keys), independent of stream length,
  BECAUSE of the watermark; without it Spark must keep every window ever
  seen.
- ``update`` output mode emits refinements as late rows arrive;
  ``append`` emits a window only once it is finalized (watermark passed) —
  exactly-once sinks (files) require append.
- The same plan runs in batch (tests, backfill): `windowed_event_counts`
  is pure DataFrame ops, so a batch DataFrame flows through identically
  (minus the watermark, which is a no-op in batch mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          late: str = "2 hours",
                          key: str = "event_type") -> DataFrame:
    """Tumbling event-time window counts with a late-data watermark.

    ``events`` needs a ``ts`` timestamp column and a ``key`` column. Works
    on both a streaming DataFrame (bounded state via the watermark) and a
    batch DataFrame (watermark is a no-op) — the SAME function backfills
    history and serves the live stream, so the two paths cannot drift.
    """
    return (
        events.withWatermark("ts", late)
        .groupBy(F.window("ts", window).alias("win"), key)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), key, "n")
    )


def stream_windowed_counts(events_stream: DataFrame, out_path: str,
                           checkpoint_path: str, window: str = "1 hour",
                           late: str = "2 hours", key: str = "event_type"):
    """Run the windowed aggregation as a streaming query appending
    FINALIZED windows (watermark-closed, each exactly once) to parquet.
    Returns the StreamingQuery handle."""
    agg = windowed_event_counts(events_stream, window, late, key)
    return (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )
