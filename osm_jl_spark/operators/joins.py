"""Join operators: way↔node geometry joins, spatial (PIP) joins with
cell-cover prefilter, relation membership, and bbox extraction.

Scale notes (the part the reference, being single-machine, never had
to answer):

- J1 waynodes: ways posexplode to (way_id, pos, ref) then equi-join
  nodes on ref — a plain shuffle/sort-merge join Catalyst plans; order
  restored via sort_array over (pos, …) structs, because shuffle
  destroys array order (SURVEY.md §7.3 "ordered-array join reassembly").
- J4 polygon extract: the candidate set comes from a BROADCAST hash
  join on (cx, cy) against the polygon cell cover (a few-thousand-row
  dimension), so the 10^12-point fact table never shuffles; the exact
  PIP pandas UDF touches only boundary-cell candidates.
- J6 bbox: a pure cell-range filter — on a cell-clustered table this
  is partition pruning + row-group skipping, zero shuffle
  (src/OSM.jl:246-257 semantics; the reference's unfiltered-ways TODO
  at src/OSM.jl:252-256 is fixed here: ways are semi-joined too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_jl_spark.functions.cells import bbox_cell_range, with_cell
from osm_jl_spark.functions.geo import (
    Ring,
    cell_cover,
    pip_edges_fold_expr,
    pip_test_or_full_expr,
    pip_test_or_full_udf,
)


def explode_way_refs(ways: DataFrame) -> DataFrame:
    """(way_id, pos, ref) from the ordered node_refs array; pos 1-based."""
    return ways.select(
        F.col("id").alias("way_id"),
        F.posexplode("node_refs").alias("pos0", "ref"),
    ).select("way_id", (F.col("pos0") + 1).alias("pos"), "ref")


def waynodes(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """J1 (src/OSM.jl:131): each way's ordered node coordinates.

    Returns (way_id, pos, node_id, lon, lat). The reference raises
    KeyError on a dangling ref; distributed we use an INNER join (the
    dangling row drops) — callers needing the assert can anti-join.
    """
    refs = explode_way_refs(ways)
    return (
        refs.join(nodes, refs.ref == nodes.id, "inner")
        .select(
            "way_id",
            "pos",
            F.col("id").alias("node_id"),
            "lon",
            "lat",
        )
    )


def way_geometries(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """(way_id, coords ARRAY<STRUCT<lon,lat>>) in node_refs order —
    order restored AFTER the shuffle via sort_array over pos-keyed
    structs (never trust collect_list order)."""
    wn = waynodes(ways, nodes)
    return (
        wn.groupBy("way_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("pos", "lon", "lat"))
                ),
                lambda s: F.struct(s["lon"].alias("lon"), s["lat"].alias("lat")),
            ).alias("coords")
        )
    )


def way_lengths(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """Great-circle path length of every way in meters — the road-length
    query OSM.jl users compute downstream of waynodes (src/OSM.jl:131
    gives the ordered coordinates; the reference leaves the metric to
    the caller). Returns (way_id, n_pts, length_m).

    Plan: rides `way_geometries` (one shuffle, the J1 join + regroup);
    the pairwise haversine and the in-order fold are pure native array
    math over the assembled coords — no extra exchange, no Python.

    Float contract: segments are summed LEFT-TO-RIGHT in node order
    (``F.aggregate`` over the pos-sorted array), so the result is
    deterministic across partitionings — a groupBy SUM over exploded
    segments would be cheaper by one array build but order-dependent
    in the last ulp. The DuckDB oracle mirrors the exact fold
    (list_reduce over a pos-ordered list) and the exact operation
    order inside the haversine (explicit multiplies, radians taken
    per-endpoint before differencing), so the comparison holds
    bit-for-bit before the cm rounding.
    """
    geo = way_geometries(ways, nodes)
    pts = F.col("coords")
    n = F.size(pts)

    def seg(p, q):
        dp = (F.radians(q["lat"]) - F.radians(p["lat"])) / 2
        dl = (F.radians(q["lon"]) - F.radians(p["lon"])) / 2
        h = (
            F.sin(dp) * F.sin(dp)
            + F.cos(F.radians(p["lat"])) * F.cos(F.radians(q["lat"]))
            * F.sin(dl) * F.sin(dl)
        )
        return F.lit(2.0 * 6371008.8) * F.asin(F.sqrt(h))

    segs = F.zip_with(F.slice(pts, 1, n - 1), F.slice(pts, 2, n - 1), seg)
    length = F.aggregate(segs, F.lit(0.0), lambda acc, x: acc + x)
    return geo.select(
        "way_id", n.alias("n_pts"), length.alias("length_m")
    )


def nodes_for_ways(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """J2 (src/OSM.jl:264-267): all nodes referenced by a way set —
    left-semi join on the exploded distinct refs (the reference's
    vcat+Dict dedup collapses duplicates the same way)."""
    refs = ways.select(F.explode("node_refs").alias("id")).distinct()
    return nodes.join(refs, "id", "left_semi")


def nodes_in_polygons(
    points: DataFrame,
    polygons: dict[int, Ring],
    precision: int = 2,
    lon: str = "lon",
    lat: str = "lat",
    exact: str = "native",
    unroll_limit: int = 32,
) -> DataFrame:
    """J3 (src/OSM.jl:210-218) as a scalable spatial join.

    points: any DataFrame with lon/lat columns. Output: input columns +
    ``polygon_id`` (one row per containing polygon; even-odd rule,
    exact reference boundary semantics src/coords.jl:69-78).

    Plan: encode cells natively -> broadcast-join the precomputed cover
    (polygon_id, cx, cy, is_full, polygon bbox) -> bbox pre-test ->
    exact even-odd only on surviving boundary candidates. At 10^12
    points this is a map-side-only pipeline: no shuffle of the fact
    table at all.

    ``exact`` picks the boundary-candidate test:
    - "native" (default): <= unroll_limit polygons use the UNROLLED
      per-edge codegen CASE (fastest for small sets); larger sets
      switch to "edges" automatically — the CASE's plan size and
      branch chain grow with the polygon count until codegen gives up.
    - "edges": broadcast a (polygon_id, edges array) dim and fold it
      with F.aggregate — interpreted, but O(own edges) per row and
      constant plan size; the many-polygon scale path.
    - "udf": the Arrow/NumPy parity kernel.
    """
    from osm_jl_spark.functions.geo import COVER_BUDGET, cell_bbox_range

    spark = points.sparkSession
    # Budgets (geo.COVER_BUDGET is the single shared constant — round 3
    # duplicated the value here, and a drift would have sent continent
    # polygons into cell_cover's driver-side enumeration):
    # - per polygon: an over-budget bbox never enumerates; it becomes
    #   ONE broadcast range row.
    # - AGGREGATE (ADVICE r3): N medium polygons can each stay under
    #   the per-polygon budget yet sum to an executor-OOM broadcast
    #   (N x 250k rows x ~60 B). Once the running total crosses
    #   4 x COVER_BUDGET (~60 MB), later polygons spill to the range
    #   path too — deterministic (sorted pid order), and exactness is
    #   untouched: range-joined candidates run the same bbox pre-test
    #   + exact even-odd, they just skip the full-cell short-circuit.
    max_cells = COVER_BUDGET
    agg_budget = 4 * COVER_BUDGET
    cover_rows = []
    big_rows = []
    for pid, ring in sorted(polygons.items()):
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        bbox = (min(xs), max(xs), min(ys), max(ys))
        xlo, xhi, ylo, yhi = cell_bbox_range(ring, precision)
        n_bbox = (xhi - xlo + 1) * (yhi - ylo + 1)
        if n_bbox > max_cells or len(cover_rows) + n_bbox > agg_budget:
            # CONTINENT-SCALE polygon (or aggregate budget exhausted):
            # enumerating the cover would broadcast millions of cell
            # rows (a world polygon at precision 2 is ~648M). One
            # RANGE row per polygon instead; the join becomes a
            # broadcast cell-range predicate — same candidates, O(1)
            # broadcast size per big polygon.
            big_rows.append((pid, xlo, xhi, ylo, yhi, False, *bbox))
            continue
        full, boundary = cell_cover(ring, precision)
        cover_rows += [
            (pid, cx, cy, True, *bbox) for cx, cy in sorted(full)
        ]
        cover_rows += [
            (pid, cx, cy, False, *bbox) for cx, cy in sorted(boundary)
        ]

    pts = with_cell(points, precision, lon=lon, lat=lat)
    parts = []
    if cover_rows:
        cover = spark.createDataFrame(
            cover_rows,
            "polygon_id BIGINT, ccx BIGINT, ccy BIGINT, is_full BOOLEAN, "
            "bminx DOUBLE, bmaxx DOUBLE, bminy DOUBLE, bmaxy DOUBLE",
        )
        parts.append(
            pts.join(
                F.broadcast(cover),
                (pts.cx == cover.ccx) & (pts.cy == cover.ccy),
                "inner",
            ).drop("ccx", "ccy")
        )
    if big_rows:
        bigd = spark.createDataFrame(
            big_rows,
            "polygon_id BIGINT, cxlo BIGINT, cxhi BIGINT, "
            "cylo BIGINT, cyhi BIGINT, is_full BOOLEAN, "
            "bminx DOUBLE, bmaxx DOUBLE, bminy DOUBLE, bmaxy DOUBLE",
        )
        parts.append(
            pts.join(
                F.broadcast(bigd),
                (pts.cx >= bigd.cxlo) & (pts.cx <= bigd.cxhi)
                & (pts.cy >= bigd.cylo) & (pts.cy <= bigd.cyhi),
                "inner",
            ).drop("cxlo", "cxhi", "cylo", "cyhi")
        )
    if not parts:  # empty polygon set: no rows, stable schema
        return (
            pts.drop("cx", "cy")
            .withColumn("polygon_id", F.lit(None).cast("long"))
            .limit(0)
        )
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    # Polygon-bbox pre-test (rides the broadcast cover — 4 doubles per
    # cover row): a boundary CELL is a superset of the polygon's
    # extent inside it, so when polygons are small relative to cells
    # (fine admin boundaries, tile squares) most cell-matched
    # candidates are nowhere near the polygon — measured 385k -> ~13k
    # rows into the even-odd fold on the 96-square grid workload. A
    # strict superset test (BETWEEN is inclusive; even-odd's strict
    # inequalities exclude boundary points anyway), so semantics are
    # untouched; full cells skip it like they skip the exact test.
    cand = cand.filter(
        F.col("is_full")
        | (
            (F.col(lon) >= F.col("bminx"))
            & (F.col(lon) <= F.col("bmaxx"))
            & (F.col(lat) >= F.col("bminy"))
            & (F.col(lat) <= F.col("bmaxy"))
        )
    )
    # Single pass: FULL-cell rows short-circuit to true, boundary rows
    # run the exact even-odd test via the mode picked in the docstring
    # (unrolled codegen CASE / edges-array fold / Arrow parity kernel).
    if exact == "native" and len(polygons) > unroll_limit:
        exact = "edges"
    if exact == "native":
        keep = pip_test_or_full_expr(
            polygons, F.col(lon), F.col(lat),
            F.col("polygon_id"), F.col("is_full"),
        )
    elif exact == "edges":
        edge_rows = []
        for pid, ring in sorted(polygons.items()):
            n = len(ring)
            edge_rows.append((
                pid,
                [
                    (
                        float(ring[i - 1][0]), float(ring[i - 1][1]),
                        float(ring[i][0]), float(ring[i][1]),
                    )
                    for i in range(n)
                ],
            ))
        edims = spark.createDataFrame(
            edge_rows,
            "polygon_id BIGINT, edges ARRAY<STRUCT<"
            "ax: DOUBLE, ay: DOUBLE, bx: DOUBLE, by: DOUBLE>>",
        )
        cand = cand.join(F.broadcast(edims), "polygon_id")
        keep = F.col("is_full") | pip_edges_fold_expr(
            F.col(lon), F.col(lat), F.col("edges")
        )
        return cand.filter(keep).drop(
            "ccx", "ccy", "is_full", "cx", "cy",
            "bminx", "bmaxx", "bminy", "bmaxy", "edges",
        )
    else:
        test = pip_test_or_full_udf(polygons)
        keep = test(
            F.col(lon), F.col(lat), F.col("polygon_id"), F.col("is_full")
        )
    return cand.filter(keep).drop(
        "ccx", "ccy", "is_full", "cx", "cy",
        "bminx", "bmaxx", "bminy", "bmaxy",
    )


def ways_in_polygon(
    ways: DataFrame,
    nodes: DataFrame,
    ring: Ring,
    precision: int = 2,
    polygon_id: int = 1,
) -> DataFrame:
    """J4 (src/OSM.jl:225-239): ways with ANY node inside the polygon.

    The reference's O(W·N) nested membership scan becomes: PIP-filter
    nodes (cell-cover prefilter + exact UDF) -> explode way refs ->
    left-semi join on the inside-node ids. Returns the way rows.
    """
    inside = nodes_in_polygons(
        nodes.select("id", "lon", "lat"), {polygon_id: ring}, precision
    ).select(F.col("id").alias("ref"))
    refs = explode_way_refs(ways).select("way_id", "ref")
    hit_ways = refs.join(inside, "ref", "left_semi").select(
        F.col("way_id").alias("id")
    ).distinct()
    return ways.join(hit_ways, "id", "left_semi")


def relation_members_exploded(relations: DataFrame) -> DataFrame:
    """(relation_id, pos, ref, type, role) — ordered member explode."""
    return relations.select(
        F.col("id").alias("relation_id"),
        F.posexplode("members").alias("pos0", "m"),
    ).select(
        "relation_id",
        (F.col("pos0") + 1).alias("pos"),
        F.col("m.ref").alias("ref"),
        F.col("m.type").alias("type"),
        F.col("m.role").alias("role"),
    )


def ismember(relations: DataFrame, element_ids: DataFrame, etype: str) -> DataFrame:
    """J5 (src/elements.jl:325-338): relations containing any of the
    given elements of type etype — typed (ref, type) semi-join."""
    mem = relation_members_exploded(relations).filter(F.col("type") == etype)
    hits = mem.join(
        element_ids.withColumnRenamed("id", "ref"), "ref", "left_semi"
    )
    return relations.join(
        hits.select(F.col("relation_id").alias("id")).distinct(), "id", "left_semi"
    )


def extract_bbox(
    nodes: DataFrame,
    ways: DataFrame,
    ul: tuple[float, float],
    lr: tuple[float, float],
    precision: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """J6 (src/OSM.jl:246-257): bbox extraction via the cell index.

    Matches the reference's *intended* semantics: nodes whose CELL lies
    in the corner-cell range (note: cell-granular, not exact-coordinate
    bbox — a cell straddling the boundary is included whole, exactly as
    the index-matrix slice does). Ways: any-ref semi-join (the
    reference left ways unfiltered, a TODO at src/OSM.jl:252-256 —
    implemented here as the TODO describes).
    """
    xlo, xhi, ylo, yhi = bbox_cell_range(ul, lr, precision)
    pts = with_cell(nodes, precision)
    inside = pts.filter(
        F.col("cx").between(xlo, xhi) & F.col("cy").between(ylo, yhi)
    ).drop("cx", "cy")
    refs = explode_way_refs(ways).select("way_id", "ref")
    hit = refs.join(
        inside.select(F.col("id").alias("ref")), "ref", "left_semi"
    ).select(F.col("way_id").alias("id")).distinct()
    return inside, ways.join(hit, "id", "left_semi")


def _micro(col: str | F.Column) -> F.Column:
    """Recover the EXACT integer micro-degree coordinate from the
    stored double: datagen materializes lon = lon_u / 1e5 (one IEEE
    division of an integer), and round(lon * 1e5) inverts it exactly
    for |u| < 2^53-scale in any IEEE engine — Spark and DuckDB execute
    the identical two ops on the identical stored double, so both
    recover the identical BIGINT (pinned in tests/test_distance_join.py
    against the generator's own integers)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(100000.0)).cast("long")


def within_distance_join(
    points: DataFrame,
    centers: DataFrame,
    radius_u: int,
    point_id: str = "id",
    center_id: str = "center_id",
) -> DataFrame:
    """Radius (distance) join: every (center, point) pair with planar
    integer distance² ≤ radius_u² in micro-degree units — the
    all-pairs-within-d companion to the kNN ring join (operators/
    knn.py), extending the reference's single-cell getindex
    (/root/reference/src/index.jl:55-58) the same way knn_join does.

    Semantics: PLANAR distance on the integer micro-degree grid, so
    the predicate ``dx² + dy² ≤ r²`` is pure BIGINT arithmetic —
    hash-exact across engines (a geodesic variant would swap the final
    filter for haversine and lose oracle bit-parity at the boundary;
    at city radii the planar form is the standard web-mercator-style
    approximation). Returns (center_id, point_id, d2).

    Scale shape (the 10^12-point design):
    - the CENTER side is the dimension: each center explodes into the
      3×3 ring of radius-width cells covering its disk (cell width =
      radius_u ⇒ any point within r of the center lies in cell ± 1 on
      both axes) and BROADCASTS — 9 rows per center;
    - the point side computes its own single cell (floor division via
      pmod, exact for negatives) and hash-joins the broadcast: the
      fact table NEVER shuffles, exactly like the polygon cell-cover
      join (nodes_in_polygons above);
    - candidates are bounded by points-per-cell × centers-per-ring;
      a dense urban cell costs its own density only (no global skew
      key), and the exact integer filter runs inside the same codegen
      stage. Zero exchanges on the fact side, zero Python.
    """
    if radius_u <= 0:
        raise ValueError(f"radius_u must be positive, got {radius_u}")
    w = int(radius_u)  # cell width = radius: ring halfwidth 1 suffices

    def fdiv(col: F.Column) -> F.Column:
        # exact floor division for signed integers: (x - pmod(x, w))/w
        return ((col - F.pmod(col, F.lit(w))) / F.lit(w)).cast("long")

    off = F.explode(
        F.array(*[F.lit(i) for i in (-1, 0, 1)])
    )
    cdim = (
        centers.select(
            F.col(point_id).alias(center_id),
            _micro("lon").alias("_cx_u"),
            _micro("lat").alias("_cy_u"),
        )
        .withColumn("_dx", off)
        .withColumn("_dy", off)
        .select(
            center_id, "_cx_u", "_cy_u",
            (fdiv(F.col("_cx_u")) + F.col("_dx")).alias("_gx"),
            (fdiv(F.col("_cy_u")) + F.col("_dy")).alias("_gy"),
        )
    )
    pts = points.select(
        F.col(point_id).alias("point_id"),
        _micro("lon").alias("_px_u"),
        _micro("lat").alias("_py_u"),
    ).select(
        "point_id", "_px_u", "_py_u",
        fdiv(F.col("_px_u")).alias("_gx"),
        fdiv(F.col("_py_u")).alias("_gy"),
    )
    d2 = (
        (F.col("_px_u") - F.col("_cx_u")) * (F.col("_px_u") - F.col("_cx_u"))
        + (F.col("_py_u") - F.col("_cy_u")) * (F.col("_py_u") - F.col("_cy_u"))
    )
    return (
        pts.join(F.broadcast(cdim), ["_gx", "_gy"])
        .select(center_id, "point_id", d2.alias("d2"))
        .where(F.col("d2") <= F.lit(int(radius_u) ** 2))
    )


def envelope_join(
    a: DataFrame,
    b: DataFrame,
    cell_w: int,
    oversize: str = "broadcast",
) -> DataFrame:
    """Rectangle-overlap (envelope intersection) join — the R-tree-probe
    analogue for axis-aligned bounding boxes, grid-partitioned the same
    way the PIP cell cover (nodes_in_polygons) and the radius join
    partition points. Inputs are (id, minx, miny, maxx, maxy) in EXACT
    micro-degree BIGINTs; returns (a_id, b_id, ix_area) for every pair
    whose CLOSED rectangles intersect (touching edges count), with
    ix_area the exact integer overlap area (0 when they only touch).

    Plan (the 10^12-rect design):

    - COMPACT rectangles (both extents < ``cell_w``) explode into their
      grid-cell cover — at most 2x2 cells each by the extent bound —
      and equi-join on the cell key: candidates are bounded by local
      rectangle density per cell, never all-pairs, and the overlap
      predicate plus area run in the same codegen stage.
    - Exact-once WITHOUT a distinct shuffle: a pair spanning several
      shared cells is emitted only in its REPORTING CELL — the cell of
      the intersection's lower-left corner (max(minx), max(miny)),
      which lies inside both rectangles and hence both covers. The
      classic partitioned-spatial-join dedup (Sedona/SpatialHadoop do
      the same), one comparison instead of a global distinct.
    - OVERSIZED rectangles (either extent >= cell_w) can't bound their
      cover, so they route to a broadcast sidecar: oversized-A crosses
      ALL of B, compact-A crosses oversized-B (no double count). The
      contract is that oversized rectangles are DIMENSION-sized
      (pick cell_w >= the common extent; a world-spanning envelope is
      a data bug at scale) — ``oversize='strict'`` enforces it with a
      raise_error instead, keeping the plan free of the nested-loop
      branch when the caller guarantees compactness.
    """
    if oversize not in ("broadcast", "strict"):
        raise ValueError(f"oversize must be broadcast|strict: {oversize}")
    w = int(cell_w)
    if w <= 0:
        raise ValueError(f"cell_w must be positive, got {cell_w}")

    def fdiv(col: F.Column) -> F.Column:
        return ((col - F.pmod(col, F.lit(w))) / F.lit(w)).cast("long")

    def is_compact(p: str) -> F.Column:
        return (
            (F.col(f"{p}maxx") - F.col(f"{p}minx") < w)
            & (F.col(f"{p}maxy") - F.col(f"{p}miny") < w)
        )

    def prep(df: DataFrame, p: str) -> DataFrame:
        cols = ["id", "minx", "miny", "maxx", "maxy"]
        out = df.select(*[F.col(c).alias(f"{p}{c}") for c in cols])
        if oversize == "strict":
            # fail fast on contract violation, zero plan pollution
            out = out.withColumn(
                f"{p}minx",
                F.when(is_compact(p), F.col(f"{p}minx")).otherwise(
                    F.raise_error(F.lit(
                        f"envelope_join(strict): rectangle extent >= "
                        f"cell_w={w}; use oversize='broadcast' or a "
                        f"larger cell_w"))),
            )
        return out

    pa, pb = prep(a, "a_"), prep(b, "b_")

    def cover(df: DataFrame, p: str) -> DataFrame:
        return (
            df.withColumn(
                "_gx",
                F.explode(F.sequence(fdiv(F.col(f"{p}minx")),
                                     fdiv(F.col(f"{p}maxx")))),
            )
            .withColumn(
                "_gy",
                F.explode(F.sequence(fdiv(F.col(f"{p}miny")),
                                     fdiv(F.col(f"{p}maxy")))),
            )
        )

    overlap = (
        (F.col("a_minx") <= F.col("b_maxx"))
        & (F.col("b_minx") <= F.col("a_maxx"))
        & (F.col("a_miny") <= F.col("b_maxy"))
        & (F.col("b_miny") <= F.col("a_maxy"))
    )
    area = (
        (F.least("a_maxx", "b_maxx") - F.greatest("a_minx", "b_minx"))
        * (F.least("a_maxy", "b_maxy") - F.greatest("a_miny", "b_miny"))
    )
    out_cols = [
        F.col("a_id").alias("a_id"),
        F.col("b_id").alias("b_id"),
        area.alias("ix_area"),
    ]

    if oversize == "strict":
        ca, cb = cover(pa, "a_"), cover(pb, "b_")
        return (
            ca.join(cb, ["_gx", "_gy"])
            .where(
                overlap
                & (F.col("_gx")
                   == fdiv(F.greatest("a_minx", "b_minx")))
                & (F.col("_gy")
                   == fdiv(F.greatest("a_miny", "b_miny")))
            )
            .select(*out_cols)
        )

    a_c, a_o = pa.filter(is_compact("a_")), pa.filter(~is_compact("a_"))
    b_c, b_o = pb.filter(is_compact("b_")), pb.filter(~is_compact("b_"))
    grid = (
        cover(a_c, "a_").join(cover(b_c, "b_"), ["_gx", "_gy"])
        .where(
            overlap
            & (F.col("_gx") == fdiv(F.greatest("a_minx", "b_minx")))
            & (F.col("_gy") == fdiv(F.greatest("a_miny", "b_miny")))
        )
        .select(*out_cols)
    )
    # oversized sidecar: a_over x ALL b, plus compact-a x b_over —
    # covers every oversized pair exactly once
    side1 = F.broadcast(a_o).join(pb, overlap).select(*out_cols)
    side2 = a_c.join(F.broadcast(b_o), overlap).select(*out_cols)
    return grid.unionByName(side1).unionByName(side2)


def route_lengths(
    relations: DataFrame, ways: DataFrame, nodes: DataFrame
) -> DataFrame:
    """Route-relation assembly: per type=route relation, the member
    count and total great-circle length of its WAY members, summed in
    member order — the "how long is this bus/hiking route" query the
    reference's relation support (src/elements.jl:325-338) stops just
    short of. Returns (relation_id, n_way_members, route_m).

    Member semantics: only ``type='way'`` members contribute (node and
    sub-relation members have no path length; recursive sub-relation
    expansion is out of scope and documented, matching how most OSM
    consumers flatten route masters). A way listed twice adds twice —
    member order is a real route's traversal order. A member ref with
    no matching way DROPS from both the count and the total (inner
    join) — the same dangling-ref semantics as the J1 waynodes join.

    Plan: way lengths compute ONCE via :func:`way_lengths` (the J1
    shuffle + in-order haversine fold); the relation member explode is
    dimension-sized next to the way/node fact tables, joins the
    lengths on the uniform way-id key, and reassembles per relation
    with the same sort_array-then-fold used everywhere order matters
    after a shuffle. Float contract: member lengths are cm-rounded
    BEFORE the fold (cm-rounded doubles are the values `way_lengths`
    proves bit-equal across engines), the fold is LEFT-TO-RIGHT in
    member position order, and the total rounds to cm again — the
    DuckDB oracle replays the identical op sequence, so the match is
    exact, not tolerance-based.
    """
    mem = relation_members_exploded(relations).filter(
        F.col("type") == "way"
    )
    routes = relations.filter(
        F.col("tags")["type"] == "route"
    ).select(F.col("id").alias("relation_id"))
    lens = way_lengths(ways, nodes).select(
        F.col("way_id").alias("ref"),
        F.round("length_m", 2).alias("_len"),
    )
    joined = (
        mem.join(routes, "relation_id", "left_semi")
        .join(lens, "ref")
    )
    folded = (
        joined.groupBy("relation_id")
        .agg(
            F.count(F.lit(1)).alias("n_way_members"),
            F.sort_array(
                F.collect_list(F.struct("pos", "_len"))
            ).alias("_ord"),
        )
        .select(
            "relation_id",
            "n_way_members",
            F.round(
                F.aggregate(
                    F.col("_ord"),
                    F.lit(0.0),
                    lambda acc, s: acc + s["_len"],
                ),
                2,
            ).alias("route_m"),
        )
    )
    return folded
