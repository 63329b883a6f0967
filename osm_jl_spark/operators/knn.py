"""kNN join via grid-cell ring expansion (SURVEY.md §2.3 last row,
north rule: "kNN via neighboring-cell ring expansion").

The reference has no kNN; this is the engine's own operator. Semantics:
for each query point, the k nearest data points by squared planar
degree distance, ties broken by (distance, id) — deterministic.

Algorithm (driver-coordinated, data-parallel):
  1. Encode query points to cells. Start with radius r covering ring 0.
  2. Candidate join: query cells expanded to their Chebyshev disk of
     radius r (explode a generated neighbor array — native, no UDF)
     joined against the points table on (cx, cy). The points side is
     the big side and arrives hash-partitioned by cell; the exploded
     query side is small and broadcasts.
  3. Per query, count candidates with PROVEN distance bound: a point in
     a cell at Chebyshev ring <= r-1 of the query cell is at most
     r*cell_step away in each axis... the sound stop rule: after
     taking top-k among candidates within disk r, the k-th candidate
     distance d_k must satisfy d_k <= (r * step)^2 (the minimum
     possible distance to any cell OUTSIDE disk r is (r-1)*step>... we
     use the conservative bound: min distance to outside-disk points is
     (r)*step - wait, see below) — otherwise expand r and retry only
     the unfinished queries.

  Sound bound: if the query point sits anywhere in its cell, any point
  outside the Chebyshev disk of radius r lies at planar distance
  >= (r-1) * step in some axis (worst case: query at the far edge of
  its own cell). So candidates with sqrt(d) <= (r-1)*step are
  guaranteed closer than anything outside the disk; a query finishes
  when its k-th best candidate satisfies that. r grows doubling from 2
  until all queries finish (or the disk exceeds the data extent).

At 10^12 scale the expensive side (points) is never re-shuffled across
iterations: unfinished queries shrink geometrically, and each round is
a broadcast join against the cell-clustered points table with cell
pruning on the joined cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_jl_spark.functions.cells import with_cell


def _disk_join_topk(
    points: DataFrame,
    queries: DataFrame,
    r: int,
    k: int,
    precision: int,
) -> DataFrame:
    """Top-k candidates per query within the Chebyshev disk of radius r.

    Expands each query cell to its (2r+1)^2 neighbor cells with a
    native sequence/explode (no UDF), broadcasts the result, and joins
    points on the exact cell pair.
    """
    offsets = F.expr(
        f"flatten(transform(sequence(-{r}, {r}), dx ->"
        f" transform(sequence(-{r}, {r}), dy -> struct(dx, dy))))"
    )
    qx = (
        queries.withColumn("_o", F.explode(offsets))
        .select(
            "query_id",
            F.col("qlon"),
            F.col("qlat"),
            (F.col("qcx") + F.col("_o.dx")).alias("cx"),
            (F.col("qcy") + F.col("_o.dy")).alias("cy"),
        )
    )
    cand = points.join(F.broadcast(qx), ["cx", "cy"], "inner")
    dx = F.col("lon") - F.col("qlon")
    dy = F.col("lat") - F.col("qlat")
    d2 = dx * dx + dy * dy
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("id").asc()
    )
    return (
        cand.withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "qlon", "qlat", "id", "d2", "rn")
    )


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    precision: int = 2,
    max_r: int = 64,
) -> DataFrame:
    """kNN join: queries (query_id, qlon, qlat) x points (id, lon, lat)
    -> (query_id, id, rank) with rank 1..k by (distance, id).

    Iterative ring expansion with a sound completion bound; falls back
    to a full scan for queries still unfinished at max_r (empty or
    near-empty regions)."""
    step = 10.0 ** (-precision)
    pts = with_cell(points.select("id", "lon", "lat"), precision)
    q = with_cell(
        queries.select("query_id", F.col("qlon"), F.col("qlat")),
        precision, lon="qlon", lat="qlat", cx="qcx", cy="qcy",
    ).cache()

    done_parts: list[DataFrame] = []
    pending = q
    r = 2
    while r <= max_r:
        topk = _disk_join_topk(pts, pending, r, k, precision).cache()
        # a query is finished when it has k candidates and the k-th
        # distance is within the proven bound ((r-1)*step)^2
        bound = ((r - 1) * step) ** 2
        stats = topk.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("_n"), F.max("d2").alias("_dk")
        )
        finished_ids = stats.filter(
            (F.col("_n") >= k) & (F.col("_dk") <= F.lit(bound))
        ).select("query_id")
        done_parts.append(
            topk.join(finished_ids, "query_id", "left_semi").select(
                "query_id", "id", F.col("rn").alias("rank")
            )
        )
        pending = pending.join(finished_ids, "query_id", "left_anti").cache()
        if pending.limit(1).count() == 0:
            pending = None
            break
        r *= 2
    if pending is not None and pending.limit(1).count() > 0:
        # brute-force the stragglers (cross join against all points);
        # correct anywhere, only hit for sparse/empty neighborhoods
        dx = F.col("lon") - F.col("qlon")
        dy = F.col("lat") - F.col("qlat")
        d2 = dx * dx + dy * dy
        w = Window.partitionBy("query_id").orderBy(
            F.col("d2").asc(), F.col("id").asc()
        )
        brute = (
            pts.crossJoin(F.broadcast(pending.select("query_id", "qlon", "qlat")))
            .withColumn("d2", d2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "id", "rank")
        )
        done_parts.append(brute)
    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.unionByName(part)
    return out
