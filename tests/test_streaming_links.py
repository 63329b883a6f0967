"""Streaming host in-link census must track the batch answer with
link-bearing pages SPANNING micro-batch boundaries (a host's batch-2
links must add to its batch-1 state, not replace it)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_host_census_matches_batch(spark, tmp_path):
    from osm_jl_spark import datagen as G
    from osm_jl_spark.operators.links import extract_links, host_in_links
    from osm_jl_spark.streaming.incremental import streaming_host_in_links

    pages = G.load_pages(spark, 120).select("url", "html")
    src = str(tmp_path / "src")
    # split so most hosts receive links in BOTH batches (doc parity)
    b1 = pages.filter(F.regexp_extract("url", r"/p/([0-9]+)$", 1)
                      .cast("long") % 2 == 0)
    b2 = pages.filter(F.regexp_extract("url", r"/p/([0-9]+)$", 1)
                      .cast("long") % 2 == 1)
    b1.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("url STRING, html BINARY").parquet(src)
    q = (
        streaming_host_in_links(stream)
        .writeStream.format("memory")
        .queryName("host_census")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    mid = {r["dst_host"]: r["n_links"]
           for r in spark.table("host_census").collect()}
    b2.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {r["dst_host"]: (r["n_links"], r["n_src_docs_approx"])
           for r in spark.table("host_census").collect()}
    want = {r["dst_host"]: (r["n_links"], r["n_src_docs"])
            for r in host_in_links(extract_links(pages)).collect()}

    assert set(got) == set(want)
    crossed = 0
    for host, (n_links, approx) in got.items():
        exact_links, exact_src = want[host]
        # exact count state accumulated across the boundary
        assert n_links == exact_links, host
        # HLL estimate within its standard error (rsd default 5%;
        # tiny per-host cardinalities are exact in practice)
        assert abs(approx - exact_src) <= max(1, int(0.1 * exact_src)), host
        if host in mid and mid[host] < n_links:
            crossed += 1
    # the boundary was real: many hosts grew after batch 2
    assert crossed > 10
