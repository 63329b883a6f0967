"""LM-perplexity volume-ladder datapoint (BASELINE.md "scale path").

perplexity_filter's cost profile: trigram training is two uniform
word-count-shaped groupBys over the train half; scoring joins the
corpus token stream against the BROADCAST pruned LM (no shuffle) and
aggregates once per doc; banding re-aggregates the already-reduced
per-doc scores. Throughput should RISE with volume as fixed per-job
costs amortize — the same signature the minhash/window/links ladders
record. This tool measures the full pipeline over the same stored
synthetic pages table the scaling bench uses (doc_id derived from the
url, min_count=2 so the LM dimension stays pruned), and prints
docs/sec per rung.

Usage:
    python tools/lm_ladder.py [n_docs ...]      # default: 1M 4M
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_jl_spark import datagen as G  # noqa: E402
from osm_jl_spark.operators.lm import perplexity_filter  # noqa: E402
from osm_jl_spark.session import get_spark  # noqa: E402

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/osm_jl_spark_bench")


def _docs(spark, n_docs: int):
    path = os.path.join(
        SCRATCH, f"pages_v{G.PAGES_CACHE_VERSION}_{n_docs}.parquet"
    )
    if not os.path.exists(path):
        os.makedirs(SCRATCH, exist_ok=True)
        G.load_pages(spark, n_docs).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).select(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
        .alias("doc_id"),
        "lang", "text",
    )


def rung(spark, n_docs: int) -> None:
    docs = _docs(spark, n_docs)
    best = float("inf")
    kept = 0
    for _ in range(2):  # min-of-2: first run pays codegen/JIT
        t0 = time.time()
        kept = (
            perplexity_filter(docs, min_count=2)
            .where(F.col("keep") == 1).count()
        )
        best = min(best, time.time() - t0)
    print(
        f"LM docs={n_docs} wall={best:.1f}s "
        f"docs_per_sec={n_docs / best:,.0f} kept={kept}",
        flush=True,
    )


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    spark = get_spark(app="lm-ladder", cores=32, shuffle_partitions=32,
                      driver_memory="48g")
    for n in rungs:
        rung(spark, n)
    spark.stop()


if __name__ == "__main__":
    main()
