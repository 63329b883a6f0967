"""OSM XML ingestion (S1-S10) and GeoJSON emission (K1/K2)."""

import json

from pyspark.sql import functions as F

from osm_jl_spark.sources.geojson import feature_collection, way_features
from osm_jl_spark.sources.osm_xml import SAMPLE_OSM_XML, parse_osm_xml


def test_parse_osm_xml(spark):
    nodes, ways, rels = parse_osm_xml(spark, SAMPLE_OSM_XML)
    n = {r["id"]: r for r in nodes.collect()}
    assert set(n) == {1, 2, 3, 4}
    assert n[1]["tags"] == {"name": "frogner-corner", "amenity": "cafe"}
    assert n[4]["lon"] == -40.3554 and n[4]["lat"] == -20.2273

    w = {r["id"]: r for r in ways.collect()}
    assert w[10]["node_refs"] == [1, 2, 3, 1]  # document order preserved
    assert w[10]["visible"] is True
    assert w[11]["visible"] is False  # default "false" like the reference
    assert w[11]["tags"]["highway"] == "residential"

    r = {x["id"]: x for x in rels.collect()}
    assert [(m["ref"], m["type"], m["role"]) for m in r[20]["members"]] == [
        (10, "way", "outer"),
        (1, "node", ""),
    ]
    assert r[20]["tags"]["type"] == "multipolygon"


def test_geojson_feature(spark):
    nodes, ways, _ = parse_osm_xml(spark, SAMPLE_OSM_XML)
    feats = way_features(ways, nodes).collect()
    by_id = {r["way_id"]: json.loads(r["feature"]) for r in feats}
    f = by_id[10]
    assert f["type"] == "Feature" and f["id"] == 10
    assert f["geometry"]["type"] == "Polygon"
    ring = f["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1] == [10.71299, 59.92589]  # closed, ordered
    assert len(ring) == 4
    assert f["properties"]["name"] == "block"

    fc = json.loads(
        feature_collection(way_features(ways, nodes))
    )
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == 2
