"""Overpass/Nominatim parity layer (S11-S14): request strings must
match the reference byte-for-byte; responses land via the engine's own
parsers. All offline — canned fixtures, no network."""

from __future__ import annotations

from osm_jl_spark.sources.remote import (
    ingest_nominatim_json,
    ingest_overpass_xml,
    nominatim_search_request,
    overpass_bbox_ql,
    overpass_interpreter_request,
    overpass_map_request,
)

NOMINATIM_FIXTURE = """[
  {"place_id": 123, "osm_type": "way", "osm_id": 42,
   "lat": "59.92589", "lon": "10.71299", "class": "highway",
   "type": "residential", "display_name": "Frogner, Oslo"},
  {"place_id": 456, "osm_type": "node", "osm_id": 7,
   "lat": "-20.2273", "lon": "-40.3554", "class": "place",
   "type": "city", "display_name": "Vitoria, Brazil"}
]"""


def test_overpass_bbox_ql_exact_reference_string():
    # src/Overpass.jl:21-24 — lat-first nwr() with trailing "out;"
    q = overpass_bbox_ql(-20.3243, -20.2273, -40.3554, -40.2554)
    assert q == "nwr(-20.3243,-40.3554,-20.2273,-40.2554);\nout;\n"


def test_overpass_requests():
    m, url, body = overpass_interpreter_request("nwr(1,2,3,4);\nout;\n")
    assert (m, url) == ("POST", "https://overpass-api.de/api/interpreter")
    assert body.startswith("nwr(")

    # map endpoint flips to lon-first in the bbox PARAM
    # (src/Overpass.jl:39-48)
    m, url, body = overpass_map_request(-20.32, -20.23, -40.36, -40.26)
    assert m == "GET" and body is None
    assert url == (
        "https://overpass-api.de/api/map?"
        "bbox=-40.36%2C-20.32%2C-40.26%2C-20.23"
    )


def test_nominatim_request_forces_json_format():
    m, url, _ = nominatim_search_request(q="frogner oslo", format="xml")
    assert m == "GET"
    assert "format=json" in url and "format=xml" not in url
    assert "q=frogner+oslo" in url


def test_ingest_overpass_xml_uses_engine_parser(spark):
    from osm_jl_spark.sources.osm_xml import SAMPLE_OSM_XML

    df = ingest_overpass_xml(spark, SAMPLE_OSM_XML)
    kinds = {r["kind"] for r in df.select("kind").distinct().collect()}
    assert kinds == {"node", "way", "relation"}


def test_ingest_nominatim_json_typed(spark):
    df = ingest_nominatim_json(spark, NOMINATIM_FIXTURE)
    rows = {r["place_id"]: r for r in df.collect()}
    assert rows[123]["lat"] == 59.92589  # string -> DOUBLE
    assert rows[456]["lon"] == -40.3554
    assert df.schema["lat"].dataType.simpleString() == "double"
