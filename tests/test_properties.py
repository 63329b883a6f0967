"""Property-based tests (hypothesis): the NumPy kernels must agree with
the pure-Python reference ports on arbitrary inputs — not just the
fixture polygons. No Spark session needed; these pin the numeric core
that every distributed operator builds on."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_jl_spark.functions.geo import pip_mask
from osm_jl_spark.oracle import coord2index, point_in_polygon

coord = st.floats(
    min_value=-180.0,
    max_value=180.0,
    allow_nan=False,
    allow_infinity=False,
)
lat_coord = st.floats(
    min_value=-90.0, max_value=90.0, allow_nan=False, allow_infinity=False
)


@given(coord, st.integers(min_value=0, max_value=5))
def test_coord2index_is_trunc_toward_zero(p, precision):
    got = coord2index(p, precision)
    scaled = p * 10**precision
    assert got == math.trunc(scaled)
    # trunc toward zero: |cell| never exceeds |scaled|
    assert abs(got) <= abs(scaled)


@st.composite
def ring_and_points(draw):
    n_vertices = draw(st.integers(min_value=3, max_value=8))
    ring = [
        (draw(coord), draw(lat_coord)) for _ in range(n_vertices)
    ]
    n_points = draw(st.integers(min_value=1, max_value=16))
    pts = [(draw(coord), draw(lat_coord)) for _ in range(n_points)]
    return ring, pts


@given(ring_and_points())
@settings(max_examples=200, deadline=None)
def test_pip_mask_matches_scalar_reference_port(data):
    """The vectorized NumPy even-odd mask must equal the scalar port of
    src/coords.jl:69-78 for every point against ANY ring — including
    degenerate (self-intersecting, zero-area) rings, where both must
    agree because the reference defines truth by this exact loop."""
    ring, pts = data
    lons = np.array([p[0] for p in pts])
    lats = np.array([p[1] for p in pts])
    got = pip_mask(lons, lats, ring)
    want = [point_in_polygon(lon, lat, ring) for lon, lat in pts]
    assert list(got) == want


@given(
    st.lists(
        st.tuples(coord, lat_coord), min_size=1, max_size=32
    ),
    st.integers(min_value=0, max_value=3),
)
@settings(max_examples=100, deadline=None)
def test_cell_encode_consistent_under_vectorization(pts, precision):
    """Batch cell encoding equals per-point encoding (the distributed
    engine encodes in columnar batches; identity must not depend on
    batch shape)."""
    arr = np.array([p[0] for p in pts]) * float(10**precision)
    batch = np.trunc(arr).astype(np.int64)
    scalar = [coord2index(p[0], precision) for p in pts]
    assert list(batch) == scalar
