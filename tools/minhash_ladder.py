"""MinHash-LSH volume-ladder datapoint (BASELINE.md "scale path").

ngram_jaccard_pairs is the EXACT near-dup path and carries quadratic
hot-shingle risk (operators/dedup.py docstring); minhash_dedup_pairs is
the declared web-scale path because its banded join shuffles on the
(band, band-hash) bucket key only. This tool measures that claim at
volume: it runs the full minhash pipeline (shingle -> 32-hash signature
-> 8-band LSH candidates -> signature-estimated Jaccard filter) over
the same stored synthetic pages table the scaling bench uses, at one
or more document counts, and prints docs/sec per rung.

Usage:
    python tools/minhash_ladder.py [n_docs ...]    # default: 1M 8M
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_jl_spark import datagen as G  # noqa: E402
from osm_jl_spark.operators.dedup import minhash_dedup_pairs  # noqa: E402
from osm_jl_spark.session import get_spark  # noqa: E402

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/osm_jl_spark_bench")


def rung(spark, n_docs: int) -> tuple[float, int]:
    path = os.path.join(SCRATCH, f"pages_v{G.PAGES_CACHE_VERSION}_{n_docs}.parquet")
    if not os.path.exists(path):
        os.makedirs(SCRATCH, exist_ok=True)
        G.load_pages(spark, n_docs).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path).select(
        "url", "text"
    ).withColumnsRenamed({"url": "doc_id"})
    best, pairs = float("inf"), 0
    for _ in range(2):  # min-of-2: first run pays codegen/JIT
        t0 = time.time()
        pairs = minhash_dedup_pairs(docs, threshold=0.7).count()
        best = min(best, time.time() - t0)
    return best, pairs


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 8_000_000]
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    for n in sizes:
        sec, pairs = rung(spark, n)
        print(
            f"MINHASH docs={n} wall={sec:.1f}s "
            f"docs_per_sec={n / sec:,.0f} pairs={pairs}",
            flush=True,
        )


if __name__ == "__main__":
    main()
