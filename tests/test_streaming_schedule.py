"""streaming_fetch_schedule must equal the batch fetch_schedule
answer when each url arrives once and per-host arrivals are
(priority, url)-ordered across micro-batch boundaries — slot
counters carry across batches (one state row per host)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_schedule_matches_batch(spark, tmp_path):
    from osm_jl_spark.operators.web import fetch_schedule
    from osm_jl_spark.streaming.incremental import streaming_fetch_schedule

    # deterministic frontier: 120 urls over 7 hosts, priority mostly
    # increasing per host so split-by-priority delivery is ordered
    rows = [
        (f"h{i % 7}.net/p/{i}", f"h{i % 7}.net", i // 7)
        for i in range(120)
    ]
    frontier = spark.createDataFrame(rows, "url STRING, host STRING, priority BIGINT")

    src = str(tmp_path / "src")
    # batch 1: each host's LOW-priority half; batch 2: the rest —
    # per-host (priority, url) order holds across the boundary
    frontier.filter("priority < 9").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(
        "url STRING, host STRING, priority BIGINT"
    ).parquet(src)
    q = (
        streaming_fetch_schedule(stream, delay_sec=10, start_epoch=500)
        .writeStream.format("memory")
        .queryName("sched_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    frontier.filter("priority >= 9").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {
        r.url: (r.host, r.slot, r.fetch_at)
        for r in spark.table("sched_stream").collect()
    }
    want = {
        r.url: (r.host, r.slot, r.fetch_at)
        for r in fetch_schedule(
            frontier, delay_sec=10, start_epoch=500
        ).collect()
    }
    assert got == want
    assert len(got) == 120
