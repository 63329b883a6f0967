"""Determinism under parallelism (SURVEY.md §5, §7.3): identical join
rows and tile assignments regardless of partitioning — the property the
reference's threaded extraction did NOT have (src/elements.jl:117-126).

Same session, but input partition count and shuffle partitions vary
wildly between runs; every order-sensitive spot in the engine
(collect_list, window ties, float summation groupings) would show up
as a diff here.
"""

from __future__ import annotations

from osm_jl_spark import datagen as G
from osm_jl_spark.operators.joins import nodes_in_polygons
from osm_jl_spark.operators.pipeline import flagship, geoparse_points


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_flagship_and_pip_stable_across_parallelism(spark):
    pages = G.load_pages(spark, 2000)
    results = []
    pip_results = []
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n_parts, shuffle in [(3, 5), (17, 32)]:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
            p = pages.repartition(n_parts)
            results.append(_rows(flagship(p, G.POLYGONS, 2)))
            pip_results.append(
                _rows(
                    nodes_in_polygons(
                        geoparse_points(p), G.POLYGONS, 2
                    ).select("url", "pt_idx", "polygon_id")
                )
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert results[0] == results[1]
    assert pip_results[0] == pip_results[1]
    assert len(results[0]) > 0 and len(pip_results[0]) > 0


def test_way_geometries_order_stable_across_parallelism(spark):
    from osm_jl_spark.operators.joins import way_geometries

    nodes = G.load_nodes(spark, 1000)
    ways = G.load_ways(spark, 100, 1000)
    outs = []
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n_parts, shuffle in [(2, 4), (13, 29)]:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
            g = way_geometries(
                ways.repartition(n_parts), nodes.repartition(n_parts + 1)
            )
            outs.append(
                sorted(
                    (r["way_id"], tuple((c["lon"], c["lat"])
                                        for c in r["coords"]))
                    for r in g.collect()
                )
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    # ordered coords per way identical -> the posexplode/sort_array
    # reassembly really restores node_refs order after any shuffle
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0
