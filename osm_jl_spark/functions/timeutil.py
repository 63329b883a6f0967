"""Time helpers shared by the batch and streaming operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_sec(col: Column | str) -> Column:
    """Floored epoch seconds from a TIMESTAMP/TIMESTAMP_NTZ column,
    computed from wall-clock fields.

    Why not cast/unix_timestamp: TIMESTAMP_NTZ (what parquet naive
    timestamps load as under Spark 4) cannot cast to double, and
    ``unix_timestamp`` interprets the wall time in the SESSION timezone
    — the result would silently shift between differently-configured
    sessions. Field extraction (date/hour/minute/second) is
    timezone-free on NTZ, so this expression equals DuckDB's
    ``floor(epoch(ts))`` on the same naive parquet value regardless of
    either engine's zone setting.

    Contract: the input should be TIMESTAMP_NTZ (or a DATE). On an
    LTZ column the extracted fields are rendered in
    ``spark.sql.session.timeZone``, so the result is UTC-epoch only
    under a UTC session pin — ADVICE r2. Loaders in this repo
    (e.g. ``datagen.load_crawls``) emit NTZ for exactly this reason.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.unix_date(c.cast("date")).cast("long") * 86400
        + F.hour(c).cast("long") * 3600
        + F.minute(c).cast("long") * 60
        + F.second(c).cast("long")
    )
