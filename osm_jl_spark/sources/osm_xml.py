"""OSM XML ingestion — the distributed replacement for the reference's
SAX/DOM parsers (S1-S10, src/OSM.jl:59-92, src/elements.jl).

Design: a text column (or files) of OSM XML documents is parsed with
``xml.etree.iterparse`` inside mapInPandas — streaming per batch
(constant memory like the reference's SAX path), emitting one typed row
per element. Dispatch mirrors the reference's start-element callback
(node/way/relation/nd/member/tag, src/OSM.jl:66-85) but emits columnar
batches instead of mutating driver-side vectors, and is embarrassingly
parallel across documents/files.

Unlike the reference's DOM path, relations are parsed here too (the
reference silently drops them, src/OSM.jl:37 — SURVEY.md §7.3).
Output order within a partition is document order (deterministic; the
reference's threaded extraction was not, src/elements.jl:117-126).
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# small OSM XML fixture shaped like the reference's inputs (node with
# tags, a closed way, a relation with typed members)
SAMPLE_OSM_XML = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6">
  <node id="1" lon="10.71299" lat="59.92589">
    <tag k="name" v="frogner-corner"/><tag k="amenity" v="cafe"/>
  </node>
  <node id="2" lon="10.72496" lat="59.92589"/>
  <node id="3" lon="10.72496" lat="59.91941"/>
  <node id="4" lon="-40.3554" lat="-20.2273">
    <tag k="highway" v="primary"/>
  </node>
  <way id="10" visible="true">
    <nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="1"/>
    <tag k="building" v="yes"/><tag k="name" v="block"/>
  </way>
  <way id="11">
    <nd ref="2"/><nd ref="3"/>
    <tag k="highway" v="residential"/>
  </way>
  <relation id="20">
    <member ref="10" type="way" role="outer"/>
    <member ref="1" type="node" role=""/>
    <tag k="type" v="multipolygon"/>
  </relation>
</osm>
"""

NODES_SCHEMA = "id BIGINT, lon DOUBLE, lat DOUBLE, tags MAP<STRING,STRING>"
WAYS_SCHEMA = (
    "id BIGINT, visible BOOLEAN, node_refs ARRAY<BIGINT>, "
    "tags MAP<STRING,STRING>"
)
RELS_SCHEMA = (
    "id BIGINT, members ARRAY<STRUCT<ref: BIGINT, type: STRING, role: STRING>>, "
    "tags MAP<STRING,STRING>"
)

ELEMENTS_SCHEMA = (
    "kind STRING, id BIGINT, lon DOUBLE, lat DOUBLE, visible BOOLEAN, "
    "node_refs ARRAY<BIGINT>, "
    "members ARRAY<STRUCT<ref: BIGINT, type: STRING, role: STRING>>, "
    "tags MAP<STRING,STRING>"
)


def _parse_doc(xml_text: str) -> list[dict]:
    """One OSM XML document -> element dicts, document order.

    Attribute handling mirrors the reference: node id/lon/lat parsed as
    int64/float64 (src/elements.jl:75-82); way ``visible`` is the
    string-equality ``attr == "true"`` with a "false" default
    (src/elements.jl:179); <nd ref> order preserved
    (src/elements.jl:160-171); member type/role strings kept verbatim
    (src/elements.jl:263-269).
    """
    out: list[dict] = []
    cur: dict | None = None
    for event, el in ET.iterparse(io.BytesIO(xml_text.encode()), ("start", "end")):
        tag = el.tag
        if event == "start":
            if tag == "node":
                cur = {
                    "kind": "node",
                    "id": int(el.attrib["id"]),
                    "lon": float(el.attrib["lon"]),
                    "lat": float(el.attrib["lat"]),
                    "visible": None,
                    "node_refs": None,
                    "members": None,
                    "tags": {},
                }
                out.append(cur)
            elif tag == "way":
                cur = {
                    "kind": "way",
                    "id": int(el.attrib["id"]),
                    "lon": None,
                    "lat": None,
                    "visible": el.attrib.get("visible", "false") == "true",
                    "node_refs": [],
                    "members": None,
                    "tags": {},
                }
                out.append(cur)
            elif tag == "relation":
                cur = {
                    "kind": "relation",
                    "id": int(el.attrib["id"]),
                    "lon": None,
                    "lat": None,
                    "visible": None,
                    "node_refs": None,
                    "members": [],
                    "tags": {},
                }
                out.append(cur)
            elif tag == "nd" and cur is not None and cur["kind"] == "way":
                cur["node_refs"].append(int(el.attrib["ref"]))
            elif tag == "member" and cur is not None and cur["kind"] == "relation":
                cur["members"].append(
                    {
                        "ref": int(el.attrib["ref"]),
                        "type": el.attrib.get("type", ""),
                        "role": el.attrib.get("role", ""),
                    }
                )
            elif tag == "tag" and cur is not None:
                cur["tags"][el.attrib.get("k", "")] = el.attrib.get("v", "")
        else:
            el.clear()
    return out


def parse_elements(xml_docs: DataFrame, text_col: str = "xml") -> DataFrame:
    """DataFrame of XML document strings -> unified elements table
    (kind discriminates node/way/relation)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for doc in pdf[text_col]:
                if doc:
                    rows.extend(_parse_doc(doc))
            yield pd.DataFrame(
                rows,
                columns=[
                    "kind", "id", "lon", "lat", "visible",
                    "node_refs", "members", "tags",
                ],
            )

    return xml_docs.mapInPandas(run, ELEMENTS_SCHEMA)


def split_elements(
    elements: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Unified elements -> (nodes, ways, relations) DataFrames with the
    engine's table schemas (the Data triple, src/OSM.jl:17-22)."""
    nodes = elements.filter("kind = 'node'").select("id", "lon", "lat", "tags")
    ways = elements.filter("kind = 'way'").select(
        "id", "visible", "node_refs", "tags"
    )
    rels = elements.filter("kind = 'relation'").select("id", "members", "tags")
    return nodes, ways, rels


def parse_osm_xml(
    spark: SparkSession, xml_text: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Single-document convenience wrapper (the reference's
    ``Data(::AbstractString)``, src/OSM.jl:44)."""
    df = spark.createDataFrame([(xml_text,)], "xml STRING")
    return split_elements(parse_elements(df))
