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
) -> DataFrame:
    """J3 (src/OSM.jl:210-218) as a scalable spatial join.

    points: any DataFrame with lon/lat columns. Output: input columns +
    ``polygon_id`` (one row per containing polygon; even-odd rule,
    exact reference boundary semantics src/coords.jl:69-78).

    Plan: encode cells natively -> broadcast-join the precomputed cover
    (polygon_id, cx, cy, is_full) -> accept FULL matches, run the exact
    pandas UDF only on boundary candidates. At 10^12 points this is a
    map-side-only pipeline: no shuffle of the fact table at all.
    """
    spark = points.sparkSession
    cover_rows = []
    for pid, ring in sorted(polygons.items()):
        full, boundary = cell_cover(ring, precision)
        cover_rows += [(pid, cx, cy, True) for cx, cy in sorted(full)]
        cover_rows += [(pid, cx, cy, False) for cx, cy in sorted(boundary)]
    cover = spark.createDataFrame(
        cover_rows, "polygon_id BIGINT, ccx BIGINT, ccy BIGINT, is_full BOOLEAN"
    )

    pts = with_cell(points, precision, lon=lon, lat=lat)
    cand = pts.join(
        F.broadcast(cover),
        (pts.cx == cover.ccx) & (pts.cy == cover.ccy),
        "inner",
    )
    # Single pass: FULL-cell rows short-circuit to true, boundary rows
    # run the exact even-odd test. exact="native" (default) evaluates
    # it as UNROLLED per-edge literal expressions inside codegen
    # (higher-order folds have no codegen — see pip_ring_expr) — the
    # whole join is then Python-free; exact="udf" keeps the Arrow/NumPy
    # kernel (parity reference; also the path for polygon sets too
    # large to inline as plan literals).
    if exact == "native":
        keep = pip_test_or_full_expr(
            polygons, F.col(lon), F.col(lat),
            F.col("polygon_id"), F.col("is_full"),
        )
    else:
        test = pip_test_or_full_udf(polygons)
        keep = test(
            F.col(lon), F.col(lat), F.col("polygon_id"), F.col("is_full")
        )
    return cand.filter(keep).drop("ccx", "ccy", "is_full", "cx", "cy")


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
