"""Window-dedup volume-ladder datapoint (BASELINE.md "scale path").

duplicated_window_stats is the heaviest new round-4 operator: every
document expands to ~n_tokens distinct 8-token window hashes through
ONE uniform-key exchange (operators/dedup.py docstring). This tool
measures that claim at volume: the full profile (tokenize -> window
hash -> distinct -> document-frequency -> per-doc dup counts) over the
same stored synthetic pages table the scaling bench uses, at one or
more document counts, printing docs/sec per rung. A flat-or-rising
docs/sec curve is the evidence that the plan's cost is linear in input
with no volume cliff (the signature of an accidental quadratic or a
skewed key).

Usage:
    python tools/window_ladder.py [n_docs ...]    # default: 1M 4M
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_jl_spark import datagen as G  # noqa: E402
from osm_jl_spark.operators.dedup import duplicated_window_stats  # noqa: E402
from osm_jl_spark.session import get_spark  # noqa: E402

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/osm_jl_spark_bench")


def rung(spark, n_docs: int) -> tuple[float, int]:
    path = os.path.join(SCRATCH, f"pages_v{G.PAGES_CACHE_VERSION}_{n_docs}.parquet")
    if not os.path.exists(path):
        os.makedirs(SCRATCH, exist_ok=True)
        G.load_pages(spark, n_docs).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path).select(
        F.col("url").alias("doc_id"), "text"
    )
    best, rows = float("inf"), 0
    for _ in range(2):  # min-of-2: first run pays codegen/JIT
        t0 = time.time()
        rows = duplicated_window_stats(docs, w=8, min_df=2).count()
        best = min(best, time.time() - t0)
    return best, rows


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    for n in sizes:
        sec, rows = rung(spark, n)
        print(
            f"WINDOWS docs={n} wall={sec:.1f}s "
            f"docs_per_sec={n / sec:,.0f} docs_with_windows={rows}",
            flush=True,
        )


if __name__ == "__main__":
    main()
