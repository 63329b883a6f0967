"""Point-in-polygon parity: vectorized NumPy kernel and the Spark
spatial join vs the pure-Python port of src/coords.jl:69-78."""

import numpy as np

from osm_jl_spark.datagen import FROGNER, OSLO_PENT, POLYGONS, VITORIA_TRI
from osm_jl_spark.functions.geo import cell_cover, pip_mask
from osm_jl_spark.oracle import point_in_polygon


def _grid(ring, n=25):
    xs = [v[0] for v in ring]
    ys = [v[1] for v in ring]
    pad_x = (max(xs) - min(xs)) * 0.3
    pad_y = (max(ys) - min(ys)) * 0.3
    gx = np.linspace(min(xs) - pad_x, max(xs) + pad_x, n)
    gy = np.linspace(min(ys) - pad_y, max(ys) + pad_y, n)
    pts = np.array([(x, y) for x in gx for y in gy])
    return pts[:, 0], pts[:, 1]


def test_pip_mask_matches_oracle():
    for ring in (FROGNER, VITORIA_TRI, OSLO_PENT):
        lon, lat = _grid(ring)
        got = pip_mask(lon, lat, ring)
        want = np.array(
            [point_in_polygon(x, y, ring) for x, y in zip(lon, lat)]
        )
        assert (got == want).all()


def test_pip_boundary_vertices():
    # strict-inequality semantics on the fixture's exact vertices and
    # edge midpoints must agree between NumPy and the oracle port
    ring = FROGNER
    pts = list(ring)
    for i in range(len(ring)):
        a, b = ring[i - 1], ring[i]
        pts.append(((a[0] + b[0]) / 2, (a[1] + b[1]) / 2))
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    got = pip_mask(lon, lat, ring)
    want = np.array([point_in_polygon(x, y, ring) for x, y in pts])
    assert (got == want).all()


def test_cell_cover_classification():
    for pid, ring in POLYGONS.items():
        for precision in (2, 3):
            full, boundary = cell_cover(ring, precision)
            # FULL cells: every sampled interior point is inside
            step = 10.0**-precision
            for cx, cy in list(sorted(full))[:50]:
                for fx in (0.25, 0.75):
                    for fy in (0.25, 0.75):
                        x = (cx + fx) * step if cx >= 0 else (cx - fx) * step
                        y = (cy + fy) * step if cy >= 0 else (cy - fy) * step
                        assert point_in_polygon(x, y, ring), (
                            pid, precision, cx, cy, x, y,
                        )
            # completeness: every inside point's cell is in full|boundary
            lon, lat = _grid(ring, 21)
            from osm_jl_spark.oracle import cell_of

            cover = full | boundary
            for x, y in zip(lon, lat):
                if point_in_polygon(x, y, ring):
                    assert cell_of(x, y, precision) in cover


def test_spark_spatial_join_matches_oracle(spark):
    from osm_jl_spark.datagen import load_pages_points
    from osm_jl_spark.operators.joins import nodes_in_polygons

    pts = load_pages_points(spark, 400)
    got = {
        (r["url"], r["pt_idx"], r["polygon_id"])
        for r in nodes_in_polygons(pts, POLYGONS, 2).collect()
    }
    want = set()
    for r in pts.collect():
        for pid, ring in POLYGONS.items():
            if point_in_polygon(r["lon"], r["lat"], ring):
                want.add((r["url"], r["pt_idx"], pid))
    assert got == want
    assert want  # fixture must actually produce matches


def test_native_pip_expr_matches_udf_path(spark):
    """exact='native' (literal-edge aggregate fold in codegen) and
    exact='udf' (Arrow/NumPy kernel) must emit identical join rows —
    both are bit-level ports of src/coords.jl:69-78."""
    from osm_jl_spark.datagen import load_pages_points
    from osm_jl_spark.operators.joins import nodes_in_polygons

    pts = load_pages_points(spark, 400)
    key = lambda r: (r["url"], r["pt_idx"], r["polygon_id"])  # noqa: E731
    nat = {key(r) for r in nodes_in_polygons(pts, POLYGONS, 2).collect()}
    udf = {
        key(r)
        for r in nodes_in_polygons(pts, POLYGONS, 2, exact="udf").collect()
    }
    assert nat == udf and len(nat) > 0


def test_shoelace_area2_square_and_degenerate(spark):
    from pyspark.sql import functions as F

    from osm_jl_spark.functions.geo import shoelace_area2_col

    # CCW unit-cell square 2x1 (in 1e-5 deg units) -> 2A = +4;
    # CW orientation negates; 2-point ring cancels to 0
    rows = [
        (1, [(0.0, 0.0), (0.00002, 0.0), (0.00002, 0.00001),
             (0.0, 0.00001), (0.0, 0.0)]),
        (2, [(0.0, 0.0), (0.0, 0.00001), (0.00002, 0.00001),
             (0.00002, 0.0), (0.0, 0.0)]),
        (3, [(0.0, 0.0), (0.00002, 0.00001)]),
    ]
    df = spark.createDataFrame(
        rows, "way_id LONG, coords ARRAY<STRUCT<lon:DOUBLE,lat:DOUBLE>>"
    )
    got = {r["way_id"]: r["a2"] for r in df.select(
        "way_id", shoelace_area2_col(F.col("coords")).alias("a2")
    ).collect()}
    assert got == {1: 4, 2: -4, 3: 0}


def test_edges_fold_matches_unrolled_and_udf(spark):
    """All three exact-test modes (unrolled codegen CASE, edges-array
    fold, Arrow kernel) must emit identical join rows on the same
    polygon set — the fold is the many-polygon scale path and must be
    a bit-level equivalent, not an approximation."""
    from osm_jl_spark.datagen import load_pages_points, polygon_grid
    from osm_jl_spark.operators.joins import nodes_in_polygons

    pts = load_pages_points(spark, 400)
    polys = polygon_grid()
    key = lambda r: (r["url"], r["pt_idx"], r["polygon_id"])  # noqa: E731
    # force each mode explicitly (unroll_limit high enough to keep
    # 'native' unrolled even at 96 polygons)
    unrolled = {
        key(r) for r in nodes_in_polygons(
            pts, polys, 2, exact="native", unroll_limit=1000
        ).collect()
    }
    fold = {
        key(r)
        for r in nodes_in_polygons(pts, polys, 2, exact="edges").collect()
    }
    udf = {
        key(r)
        for r in nodes_in_polygons(pts, polys, 2, exact="udf").collect()
    }
    assert unrolled == fold == udf and len(fold) > 0


def test_continent_scale_polygon_range_join_path(spark):
    """A polygon whose bbox spans millions of cells must route through
    the broadcast cell-RANGE join (one dim row), not an enumerated
    cover — and still produce exact even-odd results (checked against
    the per-point Python oracle)."""
    from osm_jl_spark.datagen import load_pages_points
    from osm_jl_spark.operators.joins import nodes_in_polygons
    from osm_jl_spark.oracle import point_in_polygon

    # triangle over half the world: bbox ~ 260 x 130 degrees ->
    # 26000 x 13000 cells at precision 2, far past the cover budget
    big = [(-130.0, -60.0), (130.0, -60.0), (0.0, 70.0)]
    pts = load_pages_points(spark, 300)
    got = {
        (r["url"], r["pt_idx"])
        for r in nodes_in_polygons(pts, {7: big}, 2).collect()
    }
    rows = pts.collect()
    want = {
        (r["url"], r["pt_idx"])
        for r in rows
        if point_in_polygon(r["lon"], r["lat"], big)
    }
    assert got == want and len(want) > 0


def test_aggregate_cover_budget_spills_to_range_join(spark, monkeypatch):
    """ADVICE r3: N medium polygons can each clear the per-polygon
    budget yet sum to an OOM-sized broadcast. With the budget squeezed
    so the aggregate cap trips mid-set, later polygons must spill to
    the one-row range-join path — and the answer must not change."""
    from osm_jl_spark.datagen import load_pages_points
    from osm_jl_spark.functions import geo
    from osm_jl_spark.operators.joins import nodes_in_polygons

    # 24 squares of ~36 bbox cells each at precision 2 (864 total),
    # tiled over the Oslo area where load_pages_points has density
    def sq(x, y, s=0.05):
        return [(x, y), (x + s, y), (x + s, y + s), (x, y + s)]

    grid = {
        i + 1: sq(10.60 + 0.06 * (i % 6), 59.85 + 0.06 * (i // 6))
        for i in range(24)
    }
    pts = load_pages_points(spark, 400)
    key = lambda r: (r["url"], r["pt_idx"], r["polygon_id"])  # noqa: E731
    want = {key(r) for r in nodes_in_polygons(pts, grid, 2).collect()}

    # per-polygon budget 40 admits every square (36 cells), but the
    # aggregate cap 4*40=160 trips after ~4 squares — the remaining
    # ~20 must take the range-join spill, with identical results
    monkeypatch.setattr(geo, "COVER_BUDGET", 40)
    got = {key(r) for r in nodes_in_polygons(pts, grid, 2).collect()}
    assert got == want and len(want) > 0
