"""Element predicates F2-F12 (SURVEY.md §2.2) against the generated
tables' arithmetic ground truth."""

from pyspark.sql import functions as F

from osm_jl_spark.datagen import load_nodes, load_ways
from osm_jl_spark.operators import elements as E

M = 400
W = 60


def test_hastag_gettag(spark):
    nodes = load_nodes(spark, M)
    with_hw = nodes.filter(E.hastag(E.HIGHWAY))
    # generation rule: highway present iff h % 7 == 0
    ids = {r["id"] for r in with_hw.select("id").collect()}
    from osm_jl_spark.datagen import KNUTH, M32

    want = {
        i + 1
        for i in range(M)
        if ((i + 1) * KNUTH) % M32 % 7 == 0
    }
    assert ids == want
    # gettag returns NULL when absent (missing semantics)
    row = nodes.filter(~E.hastag(E.HIGHWAY)).select(
        E.gettag(E.HIGHWAY).alias("v")
    ).first()
    assert row["v"] is None


def test_tag_eq_null_safe(spark):
    nodes = load_nodes(spark, M)
    # coalesce(name == x, false): rows without the tag never match
    n = nodes.filter(E.tag_eq(E.NAME, "definitely-absent")).count()
    assert n == 0


def test_search_and_address(spark):
    nodes = load_nodes(spark, M)
    ways = load_ways(spark, W, M)
    w, nd = E.search(ways, nodes, "name_0")
    for r in nd.collect():
        assert r["tags"]["name"] == "name_0"
    w2, n2 = E.search_address(ways, nodes, "street_7", "107")
    for r in n2.collect():
        assert r["tags"]["addr:street"] == "street_7"
        assert r["tags"]["addr:housenumber"] == "107"


def test_is_closed_area_road(spark):
    ways = load_ways(spark, W, M)
    rows = ways.select(
        "id", "node_refs", E.is_closed().alias("c"),
        E.is_area().alias("a"), E.is_road().alias("r"),
    ).collect()
    n_closed = 0
    for r in rows:
        want = r["node_refs"][0] == r["node_refs"][-1]
        assert r["c"] == want
        assert r["a"] == want and r["r"] == (not want)
        n_closed += want
    assert 0 < n_closed < len(rows)


def test_highway_class_filter(spark):
    from osm_jl_spark.datagen import HIGHWAY_CLASSES

    ways = load_ways(spark, W, M)
    sel = E.highways_of_class(ways, HIGHWAY_CLASSES[:2])
    for r in sel.collect():
        assert r["tags"]["highway"] in HIGHWAY_CLASSES[:2]


def test_tag_set_updates_and_overwrites(spark):
    ways = load_ways(spark, W, M).limit(20)
    touched = ways.select(
        "id", "tags", E.tag_set("touched", "yes").alias("t2")
    )
    for r in touched.collect():
        assert r["t2"]["touched"] == "yes"
        for k, v in r["tags"].items():
            assert r["t2"][k] == v
    # overwriting an existing key must not raise (map_concat would)
    # and must keep exactly one entry
    over = ways.select(E.tag_set("name", "NEW").alias("t2"))
    for r in over.collect():
        assert r["t2"]["name"] == "NEW"
        assert list(r["t2"].keys()).count("name") == 1


def test_with_enu_geometry(spark):
    from osm_jl_spark.functions.geo import with_enu

    ref_lon, ref_lat = 10.71299, 59.92589
    pts = spark.createDataFrame(
        [(1, ref_lon, ref_lat),           # the reference point itself
         (2, ref_lon + 0.01, ref_lat),    # due east
         (3, ref_lon, ref_lat + 0.01)],   # due north
        "id LONG, lon DOUBLE, lat DOUBLE",
    )
    rows = {r["id"]: r for r in with_enu(
        pts, ref_lon, ref_lat).collect()}
    assert abs(rows[1]["enu_e"]) < 1e-6
    assert abs(rows[1]["enu_n"]) < 1e-6
    assert abs(rows[1]["enu_u"]) < 1e-6
    # 0.01 deg lon at 60N ~ 559 m east; 0.01 deg lat ~ 1112 m north
    assert 500 < rows[2]["enu_e"] < 600 and abs(rows[2]["enu_n"]) < 5
    assert 1050 < rows[3]["enu_n"] < 1150 and abs(rows[3]["enu_e"]) < 5
