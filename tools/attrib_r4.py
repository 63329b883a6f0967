"""One-off A/B attribution for the three BENCH_r04 regressions
(VERDICT r4 'What's wrong' #1 and next-round #2):

1. waynodes_join 0.573 -> 0.815 s: never touches the html column, so
   the v2-pages explanation cannot apply. Measure it ISOLATED (fresh
   session, warm + min-of-3) at identical machine state to decide
   weather vs real cost.
2. geoparse_points +54% / pip_polygons +44%: attributed to the v2
   pages table's larger html column (link anchors added in r4 for the
   link-graph family). Pin that claim with a v1-vs-v2 A/B: the same
   sf0.1 corpus stored twice — html WITH anchors (v2) and WITH the
   anchors stripped (v1 shape) — timed interleaved in one session,
   min-of-3 per variant, so the only difference is the html bytes.

Prints one JSON line; the numbers land as sentences in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/osm_jl_spark_bench")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _timed(fn, runs: int = 3) -> float:
    fn()  # warm: codegen + python workers
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    import __spark_entry__ as entry
    from osm_jl_spark import datagen as G
    from osm_jl_spark.session import get_spark, sf_from_dir

    from pyspark.sql import functions as F

    sf = sf_from_dir(SF_DIR)
    n_docs = G.counts_for_sf(sf)["docs"]
    os.makedirs(SCRATCH, exist_ok=True)
    os.environ["SPARK_GRAFT_PAGES_CACHE"] = SCRATCH

    out: dict = {"sf": sf, "docs": n_docs}

    # -- 1. waynodes_join isolated, fresh session
    spark = get_spark(app="attrib-waynodes", cores=CPUS,
                      shuffle_partitions=CPUS, driver_memory="48g")
    q = entry.queries()["waynodes_join"]
    out["waynodes_join_isolated_sec"] = _timed(
        lambda: q(spark, SF_DIR).count()
    )
    spark.stop()

    # -- 2. v1-vs-v2 pages A/B for the geoparse family
    spark = get_spark(app="attrib-pages-ab", cores=CPUS,
                      shuffle_partitions=CPUS, driver_memory="48g")
    v2_path = os.path.join(
        SCRATCH, f"pages_v{G.PAGES_CACHE_VERSION}_{n_docs}.parquet")
    if not os.path.exists(v2_path):
        G.load_pages(spark, n_docs).write.mode("overwrite").parquet(v2_path)
    v1_path = os.path.join(SCRATCH, f"pages_v1shape_{n_docs}.parquet")
    if not os.path.exists(v1_path):
        # v1 shape: same rows, html rebuilt WITHOUT the trailing
        # anchors — <html><body><p>text</p></body></html> exactly as
        # the r3 generator emitted it
        (spark.read.parquet(v2_path)
         .withColumn("html", F.encode(F.concat(
             F.lit("<html><body><p>"), F.col("text"),
             F.lit("</p></body></html>")), "utf-8"))
         .write.mode("overwrite").parquet(v1_path))

    sizes = {}
    for tag, p in (("v1", v1_path), ("v2", v2_path)):
        sizes[tag] = sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p) if f.endswith(".parquet")
        )
    out["pages_bytes"] = sizes

    from osm_jl_spark.operators.joins import nodes_in_polygons
    from osm_jl_spark.operators.pipeline import geoparse_points_from_html

    def geoparse(path):
        return lambda: geoparse_points_from_html(
            spark.read.parquet(path)).count()

    def pip(path):
        return lambda: nodes_in_polygons(
            geoparse_points_from_html(spark.read.parquet(path)),
            G.POLYGONS, 2,
        ).count()

    # interleave v1/v2 so machine weather hits both variants equally
    res: dict[str, float] = {}
    for name, mk in (("geoparse", geoparse), ("pip", pip)):
        fns = {"v1": mk(v1_path), "v2": mk(v2_path)}
        for v in fns.values():
            v()  # warm both variants before any timing
        best = {"v1": float("inf"), "v2": float("inf")}
        for _ in range(3):
            for tag in ("v1", "v2"):
                t0 = time.time()
                fns[tag]()
                best[tag] = min(best[tag], time.time() - t0)
        res[f"{name}_v1_sec"] = round(best["v1"], 3)
        res[f"{name}_v2_sec"] = round(best["v2"], 3)
        res[f"{name}_v2_over_v1"] = round(best["v2"] / best["v1"], 3)
    out.update(res)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
