"""Cluster entry point for the flagship spatial-join + tiling job.

Run via spark-submit (no master/conf here — the launcher provides
them; see tools/package.sh). Resumable: work is split into cell-range
units tracked by the checkpoint manifest, so a re-submit after failure
skips completed units (plans/manifest.py).

    spark-submit --py-files dist/osm_jl_spark.zip \
        tools/submit_flagship.py \
        --input <pages table path> --output <tiles path> \
        --manifest <manifest path> [--precision 2] [--units 64]
"""

from __future__ import annotations

import argparse
import os
import sys

try:  # cluster mode: --py-files puts the zip on sys.path already
    import osm_jl_spark  # noqa: F401
except ImportError:  # local/dev runs from the repo checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--precision", type=int, default=2)
    ap.add_argument("--units", type=int, default=64)
    args = ap.parse_args()

    # cluster mode: spark-submit supplies master/deploy conf
    spark = SparkSession.builder.appName("osm-jl-spark-flagship").getOrCreate()

    from pyspark.sql import functions as F
    from pyspark.sql import Observation  # noqa: F401 (re-export check)

    from osm_jl_spark import datagen as G
    from osm_jl_spark.operators.pipeline import flagship
    from osm_jl_spark.plans.manifest import plan_units, run_with_manifest

    pages = spark.read.parquet(args.input)
    p10 = 10 ** args.precision

    def run_unit(unit, obs):
        df = flagship(pages, G.POLYGONS, args.precision)
        df = df.filter((df.cx >= unit.lo) & (df.cx <= unit.hi))
        return df.observe(obs, F.count(F.lit(1)).alias("rows"))

    result = run_with_manifest(
        spark,
        plan_units(-180 * p10, 180 * p10 - 1, args.units),
        run_unit,
        out_dir=args.output,
        manifest_path=args.manifest,
    )
    print(f"ran {len(result['ran'])} units, "
          f"skipped {len(result['skipped'])} (already complete)")
    spark.stop()


if __name__ == "__main__":
    main()
