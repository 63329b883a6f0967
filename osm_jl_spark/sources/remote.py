"""Offline-testable parity layer for the reference's HTTP sources
(S11-S14: src/Overpass.jl, src/Nominatim.jl).

The engine's own data comes from stored tables (SURVEY.md §2.1), but a
user of the reference also pulls OSM data straight from the Overpass
and Nominatim public APIs. This module reproduces that request surface
byte-for-byte and routes the responses into the engine's parsers:

- ``overpass_bbox_ql`` builds the exact Overpass-QL string the
  reference builds (src/Overpass.jl:20-26: ``nwr(min_lat,min_lon,
  max_lat,max_lon);\\nout;``).
- ``overpass_interpreter_request`` / ``overpass_map_request`` /
  ``nominatim_search_request`` build the method/url/payload triples of
  src/Overpass.jl:9-18, 39-48 and src/Nominatim.jl:14-24 (Nominatim
  forces ``format=json`` over any caller value, like the reference's
  Dict merge).
- ``ingest_overpass_xml`` feeds a response document through the
  engine's distributed OSM-XML parser (sources/osm_xml.py);
  ``ingest_nominatim_json`` lands geocoding results as a typed
  DataFrame ready to join against nodes/ways.

Network I/O is confined to ``fetch`` (stdlib urllib, no extra deps) so
every builder and ingest function is unit-tested with canned fixtures
— no network in CI, same as the reference's own (absent) tests.
"""

from __future__ import annotations

import json
from urllib.parse import urlencode

from pyspark.sql import DataFrame, SparkSession

OVERPASS_API = "https://overpass-api.de/api"
NOMINATIM_API = "https://nominatim.openstreetmap.org"


def overpass_bbox_ql(
    min_lat: float, max_lat: float, min_lon: float, max_lon: float
) -> str:
    """The reference's bbox query string, exactly (src/Overpass.jl:21-24
    — note its argument order: nwr(min_lat, min_lon, max_lat, max_lon))."""
    return f"nwr({min_lat},{min_lon},{max_lat},{max_lon});\nout;\n"


def overpass_interpreter_request(q: str) -> tuple[str, str, str | None]:
    """(method, url, body) for a raw Overpass-QL POST
    (src/Overpass.jl:9-18)."""
    return ("POST", f"{OVERPASS_API}/interpreter", q)


def overpass_map_request(
    min_lat: float, max_lat: float, min_lon: float, max_lon: float
) -> tuple[str, str, str | None]:
    """(method, url, body) for the map download; the reference flips to
    lon-first in the bbox query PARAM (src/Overpass.jl:39-48)."""
    bbox = f"{min_lon},{min_lat},{max_lon},{max_lat}"
    return ("GET", f"{OVERPASS_API}/map?{urlencode({'bbox': bbox})}", None)


def nominatim_search_request(**params: str) -> tuple[str, str, str | None]:
    """(method, url, body) for forward geocoding; ``format=json`` wins
    over any caller-supplied value (src/Nominatim.jl:17-22)."""
    merged = {**params, "format": "json"}
    return ("GET", f"{NOMINATIM_API}/search?{urlencode(merged)}", None)


def fetch(request: tuple[str, str, str | None], timeout: float = 30.0) -> bytes:
    """Execute a built request. The ONLY networked function here —
    everything else is pure and fixture-testable."""
    from urllib.request import Request, urlopen

    method, url, body = request
    req = Request(
        url,
        data=body.encode() if body is not None else None,
        method=method,
    )
    with urlopen(req, timeout=timeout) as resp:  # noqa: S310 (fixed hosts)
        return resp.read()


def ingest_overpass_xml(spark: SparkSession, xml: str) -> DataFrame:
    """Overpass XML response -> the engine's elements DataFrame
    (distributed parse; S1-S10 semantics incl. relations)."""
    from osm_jl_spark.sources.osm_xml import parse_elements

    return parse_elements(spark.createDataFrame([(xml,)], "xml STRING"))


NOMINATIM_SCHEMA = (
    "place_id BIGINT, osm_type STRING, osm_id BIGINT, lat DOUBLE, "
    "lon DOUBLE, class STRING, type STRING, display_name STRING"
)


def ingest_nominatim_json(spark: SparkSession, payload: str) -> DataFrame:
    """Nominatim JSON response -> typed DataFrame (lat/lon arrive as
    strings in the API; cast here so downstream joins see DOUBLE)."""
    rows = []
    for r in json.loads(payload):
        rows.append(
            (
                int(r["place_id"]),
                r.get("osm_type"),
                int(r["osm_id"]) if "osm_id" in r else None,
                float(r["lat"]),
                float(r["lon"]),
                r.get("class"),
                r.get("type"),
                r.get("display_name"),
            )
        )
    return spark.createDataFrame(rows, NOMINATIM_SCHEMA)
