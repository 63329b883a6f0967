"""AS-OF join volume-ladder datapoint (BASELINE.md "scale path").

asof_join's contract is ONE exchange on the key plus a per-key window
scan — cost linear in (captures + snapshots), never the
captures x snapshots candidate blow-up of the naive range-join
formulation (operators/temporal.py docstring). This tool measures
that claim at volume: each rung materializes a recrawl history of
``n_urls`` urls x ``caps`` captures to parquet, splits it into
capture/policy streams by fetch-hash (exactly the registered
``crawl_asof`` workload), and times the full as-of join, printing
rows/sec per rung. Flat-or-rising rows/sec = no volume cliff.

Usage:
    python tools/asof_ladder.py [n_urls ...]    # default: 1M 4M
    SPARK_GRAFT_ASOF_CAPS=10 ...                # recrawl depth per url
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_jl_spark import datagen as G  # noqa: E402
from osm_jl_spark.operators.temporal import asof_join  # noqa: E402
from osm_jl_spark.session import get_spark  # noqa: E402

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/osm_jl_spark_bench")
CAPS = int(os.environ.get("SPARK_GRAFT_ASOF_CAPS", "3"))


def rung(spark, n_urls: int) -> tuple[float, int, int]:
    path = os.path.join(SCRATCH, f"crawls_{n_urls}x{CAPS}.parquet")
    if not os.path.exists(path):
        os.makedirs(SCRATCH, exist_ok=True)
        G.load_crawls(spark, n_urls, caps=CAPS).write.mode(
            "overwrite"
        ).parquet(path)
    crawls = spark.read.parquet(path)
    pol = crawls.where(F.col("fetch_h") % 3 == 0).select(
        "url",
        F.col("warc_ts").alias("pol_ts"),
        (F.col("fetch_h") % 1000).alias("policy_val"),
    )
    caps = crawls.where(F.col("fetch_h") % 3 != 0)
    best, rows = float("inf"), 0
    for _ in range(2):  # min-of-2: first run pays codegen/JIT
        t0 = time.time()
        rows = asof_join(
            caps, pol, on="url", left_ts="warc_ts", right_ts="pol_ts",
            value_cols=["policy_val"],
        ).count()
        best = min(best, time.time() - t0)
    return best, rows, n_urls * CAPS


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    for n in sizes:
        sec, rows, total = rung(spark, n)
        print(
            f"ASOF urls={n} caps={CAPS} input_rows={total} "
            f"wall={sec:.1f}s rows_per_sec={total / sec:,.0f} "
            f"joined={rows}",
            flush=True,
        )


if __name__ == "__main__":
    main()
