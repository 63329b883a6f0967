"""osm_jl_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch distributed re-expression of the semantics of
ximonsson/OSM.jl (reference at /root/reference, cited per-module as
``src/<file>.jl:<line>``): element extraction (nodes/ways/relations),
tag predicates, grid-cell tiling, bbox queries, point-in-polygon joins,
kNN via ring expansion, GeoJSON emission — plus the web-scale
training-data operators (dedup, similarity search, text analysis) the
north rule requires, all over Parquet/Iceberg-style columnar tables
with vectorized pandas/Arrow UDFs only (no per-row Python).

Architecture is Spark-first: DataFrame/SQL plans optimized by Catalyst
(predicate pushdown, broadcast joins, AQE skew handling), with pandas
UDFs strictly for the two things Spark cannot express natively
(regex geoparse batch extraction and exact ray-cast PIP against a
broadcast polygon set).
"""

__version__ = "0.1.0"

from osm_jl_spark.session import get_spark  # noqa: F401
