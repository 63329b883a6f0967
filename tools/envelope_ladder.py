"""Envelope-join volume-ladder datapoint (BASELINE.md "scale path").

envelope_join's strict grid path: each compact rectangle explodes
into at most 2x2 cells and equi-joins on the cell key — per-rect cost
is bounded by local density, so with a FIXED probe dimension the
fact side scales linearly and throughput should RISE with volume as
fixed per-job costs amortize (the signature every other ladder
records). Rectangles derive from the same stored node tables the
radius ladder uses (half-widths 10..199 from id arithmetic, cell_w
500 — the registered `bbox_overlap_join` shape); the A side is fixed
at ~2,006 rects (every 997th node among the first 2M ids).

Usage:
    python tools/envelope_ladder.py [n_rects ...]   # default: 2M 8M
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_jl_spark import datagen as G  # noqa: E402
from osm_jl_spark.operators.joins import _micro, envelope_join  # noqa: E402
from osm_jl_spark.session import get_spark  # noqa: E402

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/osm_jl_spark_bench")


def _nodes(spark, m: int):
    path = os.path.join(SCRATCH, f"nodes_{m}.parquet")
    if not os.path.exists(path):
        os.makedirs(SCRATCH, exist_ok=True)
        G.load_nodes(spark, m).select("id", "lon", "lat").write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.parquet(path)


def _rects(nodes, kx: int, ky: int):
    rx = F.lit(10) + (F.col("id") * kx) % 190
    ry = F.lit(10) + (F.col("id") * ky) % 190
    x, y = _micro("lon"), _micro("lat")
    return nodes.select(
        "id",
        (x - rx).alias("minx"), (y - ry).alias("miny"),
        (x + rx).alias("maxx"), (y + ry).alias("maxy"),
    )


def rung(spark, m: int) -> None:
    nodes = _nodes(spark, m)
    a = _rects(
        nodes.filter((F.col("id") % 997 == 0)
                     & (F.col("id") <= 2_000_000)), 37, 61)
    b = _rects(nodes, 53, 29)
    best = float("inf")
    pairs = 0
    for _ in range(2):  # min-of-2: first run pays codegen/JIT
        t0 = time.time()
        pairs = envelope_join(a, b, cell_w=500, oversize="strict").count()
        best = min(best, time.time() - t0)
    print(
        f"ENVELOPE rects={m} dim~{min(m, 2_000_000) // 997} "
        f"wall={best:.1f}s rects_per_sec={m / best:,.0f} pairs={pairs}",
        flush=True,
    )


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [2_000_000, 8_000_000]
    spark = get_spark(app="envelope-ladder", cores=32,
                      shuffle_partitions=32, driver_memory="48g")
    for m in rungs:
        rung(spark, m)
    spark.stop()


if __name__ == "__main__":
    main()
