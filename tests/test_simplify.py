"""Douglas-Peucker simplification (operators/simplify.py): parity with
an independent recursive reference, the within-epsilon guarantee, and
edge shapes (short ways, closed rings, collinear runs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_jl_spark.operators.simplify import _dp_keep_indices, simplify_ways


def ref_dp(xs, ys, eps2):
    """Independent RECURSIVE reference (the textbook formulation)."""
    def rec(i, j):
        if j - i < 2:
            return set()
        dx, dy = xs[j] - xs[i], ys[j] - ys[i]
        l2 = dx * dx + dy * dy
        ds = []
        for k in range(i + 1, j):
            if l2 == 0:
                d = (xs[k] - xs[i]) ** 2 + (ys[k] - ys[i]) ** 2
            else:
                cr = dx * (ys[k] - ys[i]) - dy * (xs[k] - xs[i])
                d = cr * cr
            ds.append(d)
        md = max(ds)
        if md <= (eps2 if l2 == 0 else eps2 * l2):
            return set()
        k = i + 1 + ds.index(md)
        return {k} | rec(i, k) | rec(k, j)

    n = len(xs)
    if n <= 2:
        return list(range(n))
    return sorted({0, n - 1} | rec(0, n - 1))


def polyline(seed, n):
    xs = [((seed + i) * 2654435761) % 2_000_001 - 1_000_000
          for i in range(n)]
    ys = [((seed + i) * 40503) % 1_400_001 - 700_000 for i in range(n)]
    return xs, ys


def test_dp_matches_recursive_reference():
    for seed in range(12):
        xs, ys = polyline(seed, 3 + (seed * 5) % 40)
        for eps in (1_000, 100_000, 1_000_000):
            got = _dp_keep_indices(xs, ys, eps * eps)
            want = ref_dp(xs, ys, eps * eps)
            assert got == want, (seed, eps)


def test_dp_epsilon_guarantee_and_edges():
    # guarantee: every dropped point within eps of its covering segment
    for seed in (3, 7):
        xs, ys = polyline(seed, 30)
        eps = 400_000
        kept = _dp_keep_indices(xs, ys, eps * eps)
        assert kept[0] == 0 and kept[-1] == len(xs) - 1
        for a, b in zip(kept, kept[1:]):
            dx, dy = xs[b] - xs[a], ys[b] - ys[a]
            l2 = dx * dx + dy * dy
            for k in range(a + 1, b):
                if l2 == 0:
                    d2 = (xs[k] - xs[a]) ** 2 + (ys[k] - ys[a]) ** 2
                    assert d2 <= eps * eps
                else:
                    cr = dx * (ys[k] - ys[a]) - dy * (xs[k] - xs[a])
                    assert cr * cr <= eps * eps * l2
    # short ways pass through; collinear runs collapse to endpoints
    assert _dp_keep_indices([1], [1], 4) == [0]
    assert _dp_keep_indices([1, 2], [1, 2], 4) == [0, 1]
    xs = [0, 10, 20, 30]
    ys = [0, 10, 20, 30]
    assert _dp_keep_indices(xs, ys, 1) == [0, 3]
    # closed ring (identical endpoints): point-distance fallback keeps
    # the far vertex
    xs, ys = [0, 500, 0], [0, 0, 0]
    assert _dp_keep_indices(xs, ys, 100 * 100) == [0, 1, 2]
    assert _dp_keep_indices(xs, ys, 600 * 600) == [0, 2]


def test_simplify_ways_dataframe(spark):
    rows = [
        (1, [(0.0, 0.0), (0.00001, 0.00001), (0.0002, 0.0),
             (5.0, 5.0)]),
        (2, [(1.0, 1.0)]),
    ]
    geoms = spark.createDataFrame(
        rows,
        "way_id BIGINT, coords ARRAY<STRUCT<lon: DOUBLE, lat: DOUBLE>>",
    )
    out = simplify_ways(geoms, epsilon_u=1000).collect()
    by_way = {}
    for r in out:
        by_way.setdefault(r["way_id"], []).append(
            (r["idx"], r["lon_u"], r["lat_u"])
        )
    # way 1: the two near-line interior points drop, endpoints survive
    assert [t[0] for t in sorted(by_way[1])] == [0, 3]
    assert sorted(by_way[1])[1] == (3, 500000, 500000)
    assert by_way[2] == [(0, 100000, 100000)]
