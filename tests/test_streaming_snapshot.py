"""Streaming latest-capture-per-url must equal the batch
snapshot_latest answer, with recrawls SPANNING micro-batch boundaries
(a url's newer capture in batch 2 must replace its batch-1 winner in
the state store)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_snapshot_matches_batch(spark, tmp_path):
    from osm_jl_spark import datagen as G
    from osm_jl_spark.operators.dedup import snapshot_latest
    from osm_jl_spark.streaming.incremental import (
        streaming_snapshot_latest,
    )

    crawls = G.load_crawls(spark, 120, caps=3)
    src = str(tmp_path / "src")
    # batch 1: the first two captures of every url; batch 2: the final
    # (winning) capture — every url's winner crosses the boundary
    first_two = crawls.join(
        crawls.groupBy("url").agg(F.max("warc_ts").alias("mx")), "url"
    ).filter(F.col("warc_ts") < F.col("mx")).drop("mx")
    winners = crawls.join(
        crawls.groupBy("url").agg(F.max("warc_ts").alias("mx")), "url"
    ).filter(F.col("warc_ts") == F.col("mx")).drop("mx")

    first_two.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "url STRING, warc_ts TIMESTAMP_NTZ, fetch_h BIGINT"
    ).parquet(src)
    q = (
        streaming_snapshot_latest(stream)
        .writeStream.format("memory")
        .queryName("snap_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    mid = {
        r["url"]: r["fetch_h"]
        for r in spark.table("snap_stream").collect()
    }
    winners.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {
        (r["url"], r["fetch_h"], r["n_caps"])
        for r in spark.table("snap_stream").collect()
    }
    want = {
        (r["url"], r["fetch_h"], r["n_caps"])
        for r in snapshot_latest(crawls).collect()
    }
    assert got == want
    # the boundary was real: every url's batch-1 interim winner was
    # REPLACED by the batch-2 capture
    final = {u: f for (u, f, _n) in got}
    assert final and all(mid[u] != final[u] for u in final)
