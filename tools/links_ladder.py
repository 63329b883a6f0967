"""Link-graph volume-ladder datapoint (BASELINE.md "scale path").

extract_links is a zero-exchange narrow map (plan-pinned in
tests/test_links.py) — its throughput should RISE with volume as
fixed per-job costs amortize, the same signature the minhash and
window ladders record. pagerank adds per-iteration shuffles whose
keys are doc ids (uniform by construction), so its cost should stay
linear in the edge count. This tool measures both over the same
stored synthetic pages table the scaling bench uses, at one or more
document counts, and prints docs/sec per rung.

Usage:
    python tools/links_ladder.py [n_docs ...]      # default: 1M 4M
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_jl_spark import datagen as G  # noqa: E402
from osm_jl_spark.operators.links import (  # noqa: E402
    extract_links,
    host_in_links,
    pagerank_scaled,
)
from osm_jl_spark.session import get_spark  # noqa: E402

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/osm_jl_spark_bench")


def _pages(spark, n_docs: int):
    path = os.path.join(
        SCRATCH, f"pages_v{G.PAGES_CACHE_VERSION}_{n_docs}.parquet"
    )
    if not os.path.exists(path):
        os.makedirs(SCRATCH, exist_ok=True)
        G.load_pages(spark, n_docs).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def rung(spark, n_docs: int) -> None:
    pages = _pages(spark, n_docs)
    # extraction + census: the stateless web-graph build
    best, hosts = float("inf"), 0
    for _ in range(2):  # min-of-2: first run pays codegen/JIT
        t0 = time.time()
        hosts = host_in_links(extract_links(pages)).count()
        best = min(best, time.time() - t0)
    print(
        f"LINKS docs={n_docs} wall={best:.1f}s "
        f"docs_per_sec={n_docs / best:,.0f} hosts={hosts}",
        flush=True,
    )
    # PageRank (3 exact-scaled iterations) over the doc graph
    links = extract_links(pages)
    edges = links.select(
        F.regexp_extract("url", r"/p/([0-9]+)$", 1).cast("long").alias("src"),
        F.regexp_extract("href", r"/d/([0-9]+)$", 1).cast("long").alias("dst"),
    )
    nodes = pages.select(
        F.regexp_extract("url", r"/p/([0-9]+)$", 1).cast("long").alias("node")
    )
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        pagerank_scaled(edges, nodes, iters=3).count()
        best = min(best, time.time() - t0)
    print(
        f"PAGERANK docs={n_docs} iters=3 wall={best:.1f}s "
        f"docs_per_sec={n_docs / best:,.0f}",
        flush=True,
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    for n in sizes:
        rung(spark, n)


if __name__ == "__main__":
    main()
