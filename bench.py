"""Benchmark harness.

Times the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], then evidences the north rule's scaling
criterion by running the flagship pipeline at two parallelism levels
(local[8] vs local[32]) on identical input and reporting throughput at
both plus scaling efficiency = T32 / (4 * T8) where T = docs/sec.

Prints ONE JSON line:
  {"metric": "flagship_e2e_sec", "value": <sec>, "unit": "sec",
   "queries": {...}, "sf": <sf>, "docs_per_sec": ..., "tiles_per_sec":
   ..., "scaling": {"cores_lo": 8, "cores_hi": 32, ...}}

Internal mode: ``python bench.py --scaling-run <cores>`` times the
flagship only and prints "SCALING <cores> <sec> <docs>".
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "geoparse_points",
    "pip_polygons",
    "tile_rollup",
    "bbox_vitoria_nodes",
    "waynodes_join",
    "knn_ring",
    "dedup_exact_keep",
    "minhash_pairs",
    "embedding_knn",
    "text_quality",
    "tpch_q1",
    "events_top3",
]


def _force(df) -> int:
    """Execute the full plan; count() is enough to materialize every
    operator upstream of the final aggregation."""
    return df.count()


def _flagship(spark, sf_dir):
    from osm_jl_spark import datagen as G
    from osm_jl_spark.operators.pipeline import flagship
    from osm_jl_spark.session import sf_from_dir

    n_docs = G.counts_for_sf(sf_from_dir(sf_dir))["docs"]
    pages = G.load_pages(spark, n_docs)
    return flagship(pages, G.POLYGONS, 2), n_docs


def scaling_run(cores: int) -> None:
    from osm_jl_spark.session import get_spark

    spark = get_spark(app=f"bench-scale-{cores}", cores=cores,
                      shuffle_partitions=max(8, cores),
                      driver_memory="48g")
    # warmup at the SAME scale: spawns all Python workers, JITs the
    # codegen, touches every operator — so the timed run measures the
    # pipeline, not process startup
    df, _ = _flagship(spark, SF_DIR)
    df.count()
    t0 = time.time()
    df, n_docs = _flagship(spark, SF_DIR)
    df.count()
    dt = time.time() - t0
    print(f"SCALING {cores} {dt:.3f} {n_docs}", flush=True)
    spark.stop()


def main() -> None:
    import __spark_entry__ as entry
    from osm_jl_spark.session import get_spark, sf_from_dir

    sf = sf_from_dir(SF_DIR)
    spark = get_spark(app="bench", cores=CPUS, shuffle_partitions=CPUS,
                      driver_memory="48g")

    # warmup
    _force(entry.queries()["tpch_q1"](spark, SF_DIR))

    qs = entry.queries()
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        _force(qs[name](spark, SF_DIR))
        times[name] = round(time.time() - t0, 3)

    # flagship end-to-end + tile throughput
    t0 = time.time()
    df, n_docs = _flagship(spark, SF_DIR)
    df.count()
    flagship_sec = time.time() - t0
    t0 = time.time()
    from osm_jl_spark import datagen as G
    from osm_jl_spark.operators.pipeline import geoparse_points
    from osm_jl_spark.operators.tiling import tile_rollup

    pts = geoparse_points(G.load_pages(spark, n_docs))
    n_tiles = tile_rollup(pts, [0, 1, 2]).count()
    tiling_sec = time.time() - t0
    spark.stop()

    # scaling: same job, identical input, two parallelism levels
    scaling = {}
    lo_cores, hi_cores = 8, 32
    for cores in (lo_cores, hi_cores):
        env = dict(os.environ)
        env["SPARK_GRAFT_SF_DIR"] = SF_DIR
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-run", str(cores)],
            capture_output=True, text=True, env=env, timeout=1200,
        )
        for line in out.stdout.splitlines():
            if line.startswith("SCALING"):
                _, c, dt, nd = line.split()
                scaling[int(c)] = (float(dt), int(nd))
    result = {
        "metric": "flagship_e2e_sec",
        "value": round(flagship_sec, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / flagship_sec, 1),
        "tiles": n_tiles,
        "tiles_per_sec": round(n_tiles / tiling_sec, 1),
    }
    if len(scaling) == 2:
        t_lo, nd = scaling[lo_cores]
        t_hi, _ = scaling[hi_cores]
        thr_lo = nd / t_lo
        thr_hi = nd / t_hi
        result["scaling"] = {
            "cores_lo": lo_cores,
            "cores_hi": hi_cores,
            "sec_lo": round(t_lo, 3),
            "sec_hi": round(t_hi, 3),
            "docs_per_sec_lo": round(thr_lo, 1),
            "docs_per_sec_hi": round(thr_hi, 1),
            "efficiency": round(thr_hi / (thr_lo * (hi_cores / lo_cores)), 3),
            "speedup": round(thr_hi / thr_lo, 2),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--scaling-run":
        scaling_run(int(sys.argv[2]))
    else:
        main()
