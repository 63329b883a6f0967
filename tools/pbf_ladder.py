"""PBF ingest volume-ladder datapoint (BASELINE.md "scale path").

parse_pbf's cost model: the driver's blob-index walk is O(blob count)
metadata reads; decode parallelism is one task per ~independent blob,
so wall time is (blobs / cores) x per-blob decode cost and throughput
should RISE with volume while blobs outnumber cores (fixed per-job
cost amortizes; per-element cost is flat). The per-blob decode is
pure-Python varint work — the honest price of a binary format with no
protobuf codegen in the sandbox — so the ladder records the REAL
elements/sec a deployment would size executors against, not a
best-case native number.

Usage:
    python tools/pbf_ladder.py [n_nodes ...]    # default: 1M 4M
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_jl_spark.session import get_spark  # noqa: E402
from osm_jl_spark.sources.osm_pbf import parse_pbf, write_pbf  # noqa: E402

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/osm_jl_spark_bench")
BLOCK = 8000  # elements per blob — the ~real-world OSMData blob grain


def _fixture(n: int) -> str:
    path = os.path.join(SCRATCH, f"pbf_{n}.osm.pbf")
    if not os.path.exists(path):
        os.makedirs(SCRATCH, exist_ok=True)
        # xor-shift-mixed coordinates: a pure multiplicative stride has
        # CONSTANT deltas between modular wraps and zlib crushes the
        # delta stream to nothing; the shift-xor breaks linearity so
        # varint widths and the compression ratio look like a real
        # extract
        def mix(i: int, mult: int) -> int:
            x = (i * mult) & 0xFFFFFFFFFFFFFFFF
            return x ^ (x >> 31)

        els = [
            {
                "kind": "node",
                "id": i + 1,
                "lon": (mix(i, 0x9E3779B97F4A7C15) % 36000000
                        - 18000000) / 1e5,
                "lat": (mix(i, 0xC2B2AE3D27D4EB4F) % 17000000
                        - 8500000) / 1e5,
                "tags": {},
            }
            for i in range(n)
        ]
        write_pbf(path, els, block_size=BLOCK)
    return path


def rung(spark, n: int) -> None:
    path = _fixture(n)
    best = float("inf")
    rows = 0
    for _ in range(2):  # min-of-2: first run pays worker spawn/JIT
        t0 = time.time()
        rows = parse_pbf(spark, path).count()
        best = min(best, time.time() - t0)
    mb = os.path.getsize(path) / 1e6
    print(
        f"PBF elements={n} blobs={-(-n // BLOCK)} file={mb:.1f}MB "
        f"wall={best:.1f}s elements_per_sec={n / best:,.0f} rows={rows}",
        flush=True,
    )


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    spark = get_spark(app="pbf-ladder", cores=32, shuffle_partitions=32,
                      driver_memory="48g")
    for n in rungs:
        rung(spark, n)
    spark.stop()


if __name__ == "__main__":
    main()
