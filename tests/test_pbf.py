"""OSM PBF source round-trip: the generator's Data triple encoded as
a spec-conformant multi-blob .osm.pbf (delta-coded dense nodes, way
refs, relation memids; zlib blobs; string tables), then ingested back
through the splittable parse_pbf path — ids, coordinates (to the
micro-degree integer), orderings, tags, members all exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_jl_spark import datagen as G
from osm_jl_spark.sources.osm_pbf import parse_pbf, pbf_blob_index, write_pbf
from osm_jl_spark.sources.osm_xml import split_elements

N_NODES, N_WAYS, N_RELS = 500, 120, 60


@pytest.fixture(scope="module")
def triple(spark):
    nodes = G.load_nodes(spark, N_NODES).collect()
    ways = G.load_ways(spark, N_WAYS, N_NODES).collect()
    rels = G.load_relations(spark, N_RELS, N_WAYS, N_NODES).collect()
    return nodes, ways, rels


@pytest.fixture(scope="module")
def pbf_path(spark, triple, tmp_path_factory):
    nodes, ways, rels = triple
    elements = (
        [{"kind": "node", "id": r.id, "lon": r.lon, "lat": r.lat,
          "tags": dict(r.tags)} for r in nodes]
        + [{"kind": "way", "id": r.id, "node_refs": list(r.node_refs),
            "tags": dict(r.tags)} for r in ways]
        + [{"kind": "relation", "id": r.id,
            "members": [{"ref": m.ref, "type": m.type, "role": m.role}
                        for m in r.members],
            "tags": dict(r.tags)} for r in rels]
    )
    path = str(tmp_path_factory.mktemp("pbf") / "fixture.osm.pbf")
    # small blocks force MULTIPLE OSMData blobs -> real parallel decode
    return write_pbf(path, elements, block_size=150)


def test_blob_index_is_metadata_only(pbf_path):
    idx = pbf_blob_index(pbf_path)
    assert idx[0]["type"] == "OSMHeader"
    data = [b for b in idx if b["type"] == "OSMData"]
    assert len(data) >= 4  # multi-blob: the parallel unit is real
    assert all(b["size"] > 0 for b in data)


def test_roundtrip_nodes_exact(spark, triple, pbf_path):
    nodes, _, _ = triple
    got_n, _, _ = split_elements(parse_pbf(spark, pbf_path))
    got = {
        r.id: r
        for r in got_n.withColumn(
            "lon_u", F.round(F.col("lon") * 1e5).cast("long")
        ).withColumn(
            "lat_u", F.round(F.col("lat") * 1e5).cast("long")
        ).collect()
    }
    assert len(got) == len(nodes)
    for src in nodes:
        g = got[src.id]
        assert g.lon_u == round(src.lon * 1e5), src.id
        assert g.lat_u == round(src.lat * 1e5), src.id
        assert dict(g.tags) == dict(src.tags), src.id


def test_roundtrip_ways_ordered(spark, triple, pbf_path):
    _, ways, _ = triple
    _, got_w, _ = split_elements(parse_pbf(spark, pbf_path))
    got = {r.id: r for r in got_w.collect()}
    assert len(got) == len(ways)
    for src in ways:
        g = got[src.id]
        assert list(g.node_refs) == list(src.node_refs), src.id
        assert dict(g.tags) == dict(src.tags), src.id
        assert g.visible  # PBF non-history default


def test_roundtrip_relations_members(spark, triple, pbf_path):
    _, _, rels = triple
    _, _, got_r = split_elements(parse_pbf(spark, pbf_path))
    got = {r.id: r for r in got_r.collect()}
    assert len(got) == len(rels)
    for src in rels:
        g = got[src.id]
        assert [(m.ref, m.type, m.role) for m in g.members] == [
            (m.ref, m.type, m.role) for m in src.members
        ], src.id
        assert dict(g.tags) == dict(src.tags), src.id


def test_one_decode_task_per_blob(spark, pbf_path):
    """The scale contract: decode parallelism equals the OSMData blob
    count (a planet file fans out to its tens of thousands of blobs),
    with exactly the one repartition exchange that assigns them."""
    from osm_jl_spark.sources.osm_pbf import parse_pbf, pbf_blob_index

    n_data = sum(
        1 for b in pbf_blob_index(pbf_path) if b["type"] == "OSMData"
    )
    els = parse_pbf(spark, pbf_path)
    assert els.rdd.getNumPartitions() == n_data


def test_parse_rejects_non_pbf(spark, tmp_path):
    p = tmp_path / "not.pbf"
    p.write_bytes(b"")
    with pytest.raises(ValueError, match="OSMData"):
        parse_pbf(spark, str(p))


def test_unsupported_required_feature_rejected(spark, tmp_path):
    """A header REQUIRING a feature this decoder can't decode
    faithfully (e.g. HistoricalInformation's per-element visibility)
    must fail fast, not silently misreport; optional features are
    ignored per spec."""
    from osm_jl_spark.sources.osm_pbf import (
        _enc_blob,
        _enc_bytes,
        _enc_block,
        parse_pbf,
    )

    header = (_enc_bytes(4, b"OsmSchema-V0.6")
              + _enc_bytes(4, b"HistoricalInformation"))
    data = _enc_block([{"kind": "node", "id": 1, "lon": 1.0,
                        "lat": 2.0, "tags": {}}])
    p = tmp_path / "hist.osm.pbf"
    p.write_bytes(_enc_blob("OSMHeader", header)
                  + _enc_blob("OSMData", data))
    with pytest.raises(ValueError, match="HistoricalInformation"):
        parse_pbf(spark, str(p))

    ok = tmp_path / "opt.osm.pbf"
    opt_header = (_enc_bytes(4, b"OsmSchema-V0.6")
                  + _enc_bytes(5, b"Sort.Type_then_ID"))
    ok.write_bytes(_enc_blob("OSMHeader", opt_header)
                   + _enc_blob("OSMData", data))
    assert parse_pbf(spark, str(ok)).count() == 1
