"""kNN join via grid-cell ring expansion (SURVEY.md §2.3 last row,
north rule: "kNN via neighboring-cell ring expansion").

The reference has no kNN; this is the engine's own operator. Semantics:
for each query point, the k nearest data points by squared planar
degree distance, ties broken by (distance, id) — deterministic.

Algorithm (driver-coordinated, data-parallel):

  1. Cache the cell-encoded points table ONCE (at deployment scale this
     is the cell-clustered stored table; nothing is re-shuffled across
     rounds).
  2. Round r: each pending query cell expands to its Chebyshev disk of
     radius r via a native sequence/explode (no UDF); the exploded
     query set (small dimension) broadcasts into a hash join against
     points on (cx, cy); per-query top-k by (d2, id) window.
  3. Sound stop rule: any point OUTSIDE the disk of radius r lies at
     least (r-1)*step away in some axis from anywhere inside the
     query's own cell (worst case: query at its cell edge), so a query
     is finished once it has k candidates with d_k <= ((r-1)*step)^2.
     Only the per-query (count, d_k) stats — one row per query — come
     back to the driver; pending queries shrink geometrically and r
     doubles (so the total work across rounds is a constant factor of
     the final round).
  4. Stragglers past max_r (empty regions) fall back to a brute-force
     broadcast cross join — correct anywhere, hit only for degenerate
     neighborhoods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_jl_spark.functions.cells import with_cell


def _disk_join_topk(pts: DataFrame, queries: DataFrame, r: int, k: int
                    ) -> DataFrame:
    """Top-k candidates per query within the Chebyshev disk of radius r.

    (query_id, id, d2, rn). The exploded query side broadcasts; points
    arrive through a hash join on the exact cell pair.
    """
    offsets = F.expr(
        f"flatten(transform(sequence(-{r}, {r}), dx ->"
        f" transform(sequence(-{r}, {r}), dy -> struct(dx, dy))))"
    )
    qx = queries.withColumn("_o", F.explode(offsets)).select(
        "query_id",
        "qlon",
        "qlat",
        (F.col("qcx") + F.col("_o.dx")).alias("cx"),
        (F.col("qcy") + F.col("_o.dy")).alias("cy"),
    )
    cand = pts.join(F.broadcast(qx), ["cx", "cy"], "inner")
    dx = F.col("lon") - F.col("qlon")
    dy = F.col("lat") - F.col("qlat")
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("id").asc()
    )
    return (
        cand.withColumn("d2", dx * dx + dy * dy)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "id", "d2", "rn")
    )


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    precision: int = 2,
    max_r: int = 64,
) -> DataFrame:
    """kNN join: queries (query_id, qlon, qlat) x points (id, lon, lat)
    -> (query_id, id, rank) with rank 1..k by (distance, id)."""
    spark = points.sparkSession
    step = 10.0 ** (-precision)
    pts = with_cell(points.select("id", "lon", "lat"), precision).cache()
    q_all = with_cell(
        queries.select("query_id", "qlon", "qlat"),
        precision, lon="qlon", lat="qlat", cx="qcx", cy="qcy",
    ).cache()
    q_all.count()  # materialize once

    import math

    done_parts: list[DataFrame] = []
    pending_ids = [
        row["query_id"] for row in q_all.select("query_id").collect()
    ]
    pending = q_all
    r = 2
    for round_no in (1, 2):
        topk = _disk_join_topk(pts, pending, r, k)
        bound = ((r - 1) * step) ** 2
        # one tiny row per PENDING query: (n candidates, k-th distance).
        # Queries are the small dimension, so driver-side bookkeeping
        # is the cheap direction.
        stats = {
            row["query_id"]: (row["n"], row["dk"])
            for row in topk.groupBy("query_id").agg(
                F.count(F.lit(1)).alias("n"), F.max("d2").alias("dk")
            ).collect()
        }
        finished = [
            qid for qid in pending_ids
            if qid in stats and stats[qid][0] >= k and stats[qid][1] <= bound
        ]
        if finished:
            fin_df = spark.createDataFrame(
                [(int(i),) for i in finished], "query_id BIGINT"
            )
            done_parts.append(
                topk.join(F.broadcast(fin_df), "query_id", "left_semi")
                .select("query_id", "id", F.col("rn").alias("rank"))
            )
        pending_ids = [q for q in pending_ids if q not in set(finished)]
        if not pending_ids or round_no == 2:
            break
        # adaptive jump (round 2): a query with k candidates at max
        # distance dk is provably finished once (r-1)*step >= sqrt(dk)
        # — go straight to the largest such radius. Queries with FEWER
        # than k candidates sit in near-empty regions where ring
        # expansion cannot bound the answer cheaply; they skip to the
        # brute-force fallback instead of spiraling.
        jump_ids = [
            qid for qid in pending_ids
            if qid in stats and stats[qid][0] >= k
        ]
        if not jump_ids:
            break
        need = [
            int(math.ceil(math.sqrt(stats[qid][1]) / step)) + 1
            for qid in jump_ids
        ]
        r = min(max(max(need), r + 1), max_r)
        pend_df = spark.createDataFrame(
            [(int(i),) for i in jump_ids], "query_id BIGINT"
        )
        # only the jump set runs round 2; the rest stays in pending_ids
        # for the brute fallback below
        pending = q_all.join(F.broadcast(pend_df), "query_id", "left_semi")
    if pending_ids:
        pend_df = spark.createDataFrame(
            [(int(i),) for i in pending_ids], "query_id BIGINT"
        )
        pending = q_all.join(F.broadcast(pend_df), "query_id", "left_semi")
        dx = F.col("lon") - F.col("qlon")
        dy = F.col("lat") - F.col("qlat")
        w = Window.partitionBy("query_id").orderBy(
            F.col("d2").asc(), F.col("id").asc()
        )
        brute = (
            pts.crossJoin(F.broadcast(pending.select("query_id", "qlon", "qlat")))
            .withColumn("d2", dx * dx + dy * dy)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "id", "rank")
        )
        done_parts.append(brute)
    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.unionByName(part)
    # materialize before unpersisting the inputs the plan depends on
    out = out.cache()
    out.count()
    pts.unpersist()
    q_all.unpersist()
    return out
