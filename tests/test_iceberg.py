"""Iceberg evidence for the input_hint's named table format
(BASELINE.json: "Iceberg table of Common-Crawl-style web pages").

This sandbox ships no Iceberg runtime jar, so the genuine catalog
round-trip test SKIPS — but the skip reason is itself pinned: the test
asserts that the environment failure is specifically "the iceberg data
source is not on the classpath" (the exact condition
``sources.store.read_pages`` keys its parquet fallback on), not some
other breakage hiding behind a skip. On a cluster with
``iceberg-spark-runtime`` on the classpath the round-trip runs for
real and the fallback tests keep passing unchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_jl_spark.sources.store import read_pages

ICEBERG_MISSING_MARKERS = (
    "DATA_SOURCE_NOT_FOUND",
    "Failed to find the data source: iceberg",
    "ClassNotFoundException",
)

# errors a PRESENT iceberg runtime raises for our deliberately-bogus
# probe path: the source class loaded and got as far as resolving the
# location, which is all the probe needs to know
ICEBERG_PRESENT_MARKERS = (
    "PATH_NOT_FOUND",
    "Path does not exist",
    "NoSuchTableException",
    "Table does not exist",
    "Cannot find",
)


def _iceberg_unavailable_reason(spark) -> str | None:
    """Three-state probe (ADVICE r3): None when the Iceberg DSv2
    source is LOADABLE (the bogus probe path raises a path/table
    resolution error, proving the class was found); the error string
    when specifically the CLASSPATH is missing; and a RAISE for any
    other failure — the old two-state version returned None for
    unexpected breakage, which made the parquet-fallback test silently
    skip as 'runtime present' instead of failing."""
    try:
        spark.read.format("iceberg").load("/definitely/missing/table")
        raise AssertionError(
            "probe load of a nonexistent table cannot succeed"
        )
    except AssertionError:
        raise
    except Exception as e:  # noqa: BLE001 - classified below
        msg = str(e)
        hit = next((m for m in ICEBERG_MISSING_MARKERS if m in msg), None)
        if hit is not None:
            return f"{hit}: {msg.splitlines()[0][:160]}"
        if any(m in msg for m in ICEBERG_PRESENT_MARKERS):
            return None  # source loadable; only the probe path is bad
        raise RuntimeError(
            "iceberg probe failed for a reason that is neither "
            f"missing-classpath nor path-resolution: {msg[:300]}"
        ) from e


def _pages_df(spark, n=50):
    from osm_jl_spark import datagen as G

    return G.load_pages(spark, n)


def test_iceberg_catalog_roundtrip_or_pinned_skip(spark, tmp_path):
    """Real catalog round-trip when the runtime exists; otherwise skip
    with the classpath error PINNED (asserted, not assumed)."""
    reason = _iceberg_unavailable_reason(spark)
    if reason is not None:
        assert any(m in reason for m in ICEBERG_MISSING_MARKERS), reason
        pytest.skip(f"no iceberg runtime jar in this environment: {reason}")

    # runtime present: hadoop-catalog round-trip through read_pages
    wh = str(tmp_path / "warehouse")
    spark.conf.set("spark.sql.catalog.ice",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", wh)
    src = _pages_df(spark)
    src.writeTo("ice.db.pages").using("iceberg").createOrReplace()
    back = read_pages(spark, "ice.db.pages", fmt="table")
    assert back.count() == src.count()
    assert [f.name for f in back.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"
    ]


def test_read_pages_parquet_fallback_on_missing_iceberg(spark, tmp_path):
    """The autodetect path: when format("iceberg") fails BECAUSE the
    source class is absent, read_pages must serve the same location as
    parquet — the condition this sandbox exercises for real."""
    if _iceberg_unavailable_reason(spark) is None:
        pytest.skip("iceberg runtime present: fallback branch not "
                    "reachable in this environment")
    path = str(tmp_path / "pages.parquet")
    _pages_df(spark).write.parquet(path)
    got = read_pages(spark, path)
    assert got.count() == 50
    assert [f.name for f in got.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"
    ]


def test_read_pages_genuine_error_propagates(spark, tmp_path):
    """The fallback is ONLY for a missing runtime: a location that is
    neither an Iceberg table nor a parquet dataset must raise, never
    silently return something."""
    with pytest.raises(Exception):
        read_pages(spark, str(tmp_path / "nonexistent"))


def test_read_pages_rejects_wrong_schema(spark, tmp_path):
    path = str(tmp_path / "bad.parquet")
    spark.range(5).select(F.col("id").alias("url")).write.parquet(path)
    with pytest.raises(ValueError, match="lacks required columns"):
        read_pages(spark, path)
