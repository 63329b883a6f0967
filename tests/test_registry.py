"""Registry meta-pins: every registered query stays oracle-checked.

The driver's correctness gate only exercises (queries() ∩ oracle_sql())
— a query that silently loses its oracle entry degrades to a weak
rows-only check without any test failing. This pins the contract:
the ONLY rows-only queries are the two that are approximate BY DESIGN,
each with its invariant checked elsewhere (ivf_knn via
ivf_knn_exhaustive's no-loss oracle; approx_domains via the pinned
HLL error bound in tests/test_web.py)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402

ROWS_ONLY_BY_DESIGN = {"ivf_knn", "approx_domains"}


def test_every_query_has_an_oracle_or_is_declared_approximate():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    missing = qs - oracles
    assert missing == ROWS_ONLY_BY_DESIGN, (
        f"queries without oracle_sql: {sorted(missing)}"
    )


def test_no_orphan_oracles():
    qs = set(entry.queries())
    orphans = set(entry.oracle_sql()) - qs
    assert not orphans, f"oracle_sql keys with no query: {sorted(orphans)}"


def test_registry_is_large_and_ordered():
    """The driver checks a ~50-entry PREFIX in insertion order — the
    dict must stay ordered (guaranteed by Python, pinned here against
    a refactor to an unordered mapping) and the prefix must lead with
    the newest queries (round-5 head pinned: the two new queries,
    then the 43-query r3-evidence tail rotated to the front)."""
    keys = list(entry.queries())
    assert len(keys) >= 108
    assert keys[0] == "lm_perplexity_filter"
    assert keys[1] == "tile_serving"
    assert keys[2] == "radius_join"
    assert keys[3] == "semdedup_clusters"
    assert keys[4] == "geohash_tiles"
    assert keys[5] == "bloom_contamination"
    assert keys[6] == "bbox_overlap_join"
    # the rotated r3 tail fits entirely inside the 50-entry prefix
    assert "osm_xml_file_parse" in keys[:50]
    assert "pip_polygons" in keys[:50]
    # the prefix is exactly full: the round-5 additions past slot 49
    # wait at the boundary (PENDING their first driver check, local
    # gate evidence meanwhile — tools/check_correctness.py --stale
    # reports them distinctly from rotted evidence)
    assert keys[50] == "route_lengths"
    assert keys[51] == "osm_pbf_parse"
    assert keys[52] == "pq_topk"
    assert keys[53] == "fetch_schedule"
    assert keys[54] == "host_triangles"
    assert keys[55] == "link_hits"
    assert keys[56] == "temperature_sample"
    assert keys[57] == "geojson_roundtrip"


def test_bench_list_is_a_registry_subset():
    """Every BENCH_QUERIES entry must be a registered query — a
    renamed or dropped registration would otherwise KeyError halfway
    through the driver's bench run."""
    import bench

    missing = [q for q in bench.BENCH_QUERIES if q not in entry.queries()]
    assert not missing, missing
