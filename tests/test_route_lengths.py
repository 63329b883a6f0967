"""route_lengths (operators/joins.py): member semantics pinned —
only way members of type=route relations contribute, a way listed
twice adds twice (traversal order is real), node/relation members and
non-route relations are ignored, and the total equals the in-order
fold of the cm-rounded member lengths."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from osm_jl_spark.operators.joins import route_lengths, way_lengths


def _fixture(spark):
    # two ways on the equator: way 1 spans 0.1 deg of longitude, way 2
    # spans 0.2 deg — lengths ~11.1 km and ~22.3 km, distinct enough
    # that any member-selection bug changes the total
    nodes = spark.createDataFrame(
        [Row(id=i, lon=lon, lat=0.0) for i, lon in
         [(1, 0.0), (2, 0.1), (3, 1.0), (4, 1.2)]]
    )
    ways = spark.createDataFrame(
        [Row(id=1, node_refs=[1, 2]), Row(id=2, node_refs=[3, 4])]
    )

    def member(ref, mtype, role=""):
        return Row(ref=ref, type=mtype, role=role)

    relations = spark.createDataFrame(
        [
            # route: way 1 twice + way 2 once + a node member (ignored)
            Row(id=10,
                members=[member(1, "way"), member(1, "node"),
                         member(2, "way"), member(1, "way")],
                tags={"type": "route"}),
            # multipolygon: same members, must NOT appear in output
            Row(id=11,
                members=[member(1, "way"), member(2, "way")],
                tags={"type": "multipolygon"}),
            # route with only non-way members: no row (inner join)
            Row(id=12, members=[member(3, "node")],
                tags={"type": "route"}),
        ]
    )
    return relations, ways, nodes


def test_member_semantics(spark):
    relations, ways, nodes = _fixture(spark)
    out = {r.relation_id: r for r in
           route_lengths(relations, ways, nodes).collect()}
    assert set(out) == {10}
    r = out[10]
    assert r.n_way_members == 3  # way 1 twice + way 2 once

    lens = {row.way_id: round(row.length_m, 2) for row in
            way_lengths(ways, nodes).collect()}
    assert r.route_m == round(lens[1] + lens[2] + lens[1], 2)
    # sanity: the duplicate really doubled way 1's contribution
    assert r.route_m > lens[1] + lens[2]


def test_dangling_way_refs_drop(spark):
    """A route member pointing at a way id that doesn't exist drops
    from both the count and the total (inner join) — same dangling-ref
    semantics as the J1 waynodes join."""
    _, ways, nodes = _fixture(spark)
    relations = spark.createDataFrame([
        Row(id=20,
            members=[Row(ref=1, type="way", role=""),
                     Row(ref=999, type="way", role="")],
            tags={"type": "route"}),
    ])
    out = route_lengths(relations, ways, nodes).collect()
    assert len(out) == 1 and out[0].n_way_members == 1
