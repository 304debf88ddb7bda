"""Watermark late-data semantics, pinned end-to-end: an event whose
window was already FINALIZED (emitted and evicted once the watermark
passed its end) is dropped when it arrives late, while the batch plane
over the same files counts every row. This is the one
Structured-Streaming behavior the batch-equivalence entries (x12-x15)
cannot show — they drain well-ordered backlogs where nothing is late.

The sequence matters (verified empirically on pyspark 4.1.2): a late
row whose window is STILL OPEN in the state store is accepted — the
drop only happens after the window was evicted. Hence three
micro-batches: (1) seed the day-5 window and advance the watermark
past its end, (2) a quiet batch whose close evicts+emits the day-5
window, (3) the late day-5 row — now dropped, visible in
numRowsDroppedByWatermark.
"""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    ).coalesce(1).write.mode("append").parquet(path)
    # file-source batch order follows modification time
    time.sleep(1.2)


def test_late_event_dropped_after_window_finalized(spark, tmp_path):
    src = str(tmp_path / "incoming")
    d = dt.datetime
    # b0: day-5 window gets one row; the day-8 row pushes the
    # watermark to day 7 (> day-5 window end)
    _write_batch(spark, src, [(1, d(2024, 1, 5, 12), 1), (2, d(2024, 1, 8, 13), 2)])
    # b1: quiet batch; closing it evicts + emits the day-5 window
    _write_batch(spark, src, [(3, d(2024, 1, 9, 9), 3)])
    # b2: the LATE day-5 row (window already finalized) + one on time
    _write_batch(spark, src, [(4, d(2024, 1, 5, 14), 4), (5, d(2024, 1, 10, 14), 5)])

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 day")
    )
    agg = stream.groupBy(F.window("ts", "1 day").alias("w")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_data_agg")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1, "the late row must be dropped by the watermark"

    got = {
        r["w"]["start"].date().isoformat(): r["cnt"]
        for r in spark.sql("SELECT * FROM late_data_agg").collect()
    }
    # streaming: the finalized day-5 window holds ONLY the on-time row
    assert got["2024-01-05"] == 1, got

    # batch plane over the same files counts every row, late or not
    batch_by_day = {
        r["w"]["start"].date().isoformat(): r["cnt"]
        for r in (
            spark.read.parquet(src)
            .groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
    }
    assert batch_by_day["2024-01-05"] == 2
