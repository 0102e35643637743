"""Custom stateful streaming operator: applyInPandasWithState sessions."""

import datetime as dt

from credit_ocr_system_spark.streaming.stateful import stream_sessionize

SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double, props string")
BASE = dt.datetime(2024, 1, 1, 8, 0, 0)


def _ev(i, user, minutes, v=1.0):
    return (i, BASE + dt.timedelta(minutes=minutes), user, "click", v, "{}")


def _run_once(spark, d):
    stream = spark.readStream.schema(SCHEMA).parquet(f"{d}/in")
    q = (stream_sessionize(stream).writeStream.format("parquet")
         .option("path", f"{d}/out")
         .option("checkpointLocation", f"{d}/ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)


def test_stream_sessionize_gap_and_timeout(spark, tmp_path):
    """Two availableNow runs over a growing input dir: session state
    persists in the checkpointed state store across restarts; sessions
    close either on an in-stream gap or an event-time timeout."""
    d = str(tmp_path)
    spark.createDataFrame(
        [_ev(1, 1, 0), _ev(2, 1, 5), _ev(3, 1, 10), _ev(4, 2, 0)],
        SCHEMA).coalesce(1).write.mode("append").parquet(f"{d}/in")
    _run_once(spark, d)  # batch 1: all sessions still open

    spark.createDataFrame(
        [_ev(5, 1, 100), _ev(6, 1, 105), _ev(7, 3, 300)],
        SCHEMA).coalesce(1).write.mode("append").parquet(f"{d}/in")
    _run_once(spark, d)  # batch 2: gap closes A; watermark closes B, u2

    rows = sorted(
        ((r["user_id"], r["t_start"], r["t_end"], r["n_events"],
          r["sum_value"])
         for r in spark.read.parquet(f"{d}/out").collect()))
    assert rows == [
        # user 1, session A: 3 events 08:00-08:10, closed by the >30min
        # gap to the 09:40 event
        (1, BASE, BASE + dt.timedelta(minutes=10), 3, 3.0),
        # user 1, session B: closed by event-time timeout when the
        # watermark (driven by user 3's 13:00 event) passed end+gap
        (1, BASE + dt.timedelta(minutes=100),
         BASE + dt.timedelta(minutes=105), 2, 2.0),
        # user 2: single-event session, closed by timeout
        (2, BASE, BASE, 1, 1.0),
        # user 3's session stays OPEN (no later watermark) — not emitted
    ]
