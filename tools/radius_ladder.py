"""Radius-join volume-ladder datapoint (BASELINE.md "scale path").

within_distance_join's cost profile: the center dimension explodes
into 3x3 radius-width cell rings and BROADCASTS; the point side
computes its own cell in the scan projection and hash-joins the
broadcast — the fact table never shuffles, so per-point cost is flat
and throughput should RISE with volume as fixed per-job costs
amortize (the same signature the minhash/window/links/lm ladders
record). This tool measures the join over stored synthetic node
tables (radius 300 micro-degree units, the registered `radius_join`
query's shape) and prints points/sec per rung. The center dimension
is FIXED across rungs (every 997th node among the first 2M ids,
~2006 centers) so the ladder isolates the fact-side cost: letting
centers grow with points makes output pairs — and therefore wall
time — quadratic, which measures result-set materialization, not the
join. With centers fixed, pairs grow linearly with points.

Usage:
    python tools/radius_ladder.py [n_points ...]    # default: 2M 8M
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_jl_spark import datagen as G  # noqa: E402
from osm_jl_spark.operators.joins import within_distance_join  # noqa: E402
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


def rung(spark, m: int) -> None:
    nodes = _nodes(spark, m)
    centers = nodes.filter(
        (F.col("id") % 997 == 0) & (F.col("id") <= 2_000_000)
    )
    best = float("inf")
    pairs = 0
    for _ in range(2):  # min-of-2: first run pays codegen/JIT
        t0 = time.time()
        pairs = within_distance_join(nodes, centers, 300).count()
        best = min(best, time.time() - t0)
    print(
        f"RADIUS points={m} centers~{min(m, 2_000_000) // 997} "
        f"wall={best:.1f}s "
        f"points_per_sec={m / best:,.0f} pairs={pairs}",
        flush=True,
    )


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [2_000_000, 8_000_000]
    spark = get_spark(app="radius-ladder", cores=32, shuffle_partitions=32,
                      driver_memory="48g")
    for m in rungs:
        rung(spark, m)
    spark.stop()


if __name__ == "__main__":
    main()
