"""Cell-encoding semantics: trunc-toward-zero parity with the
reference (src/index.jl:17), pinned on the negative-coordinate Vitória
fixture (test.jl:3)."""

import math

from pyspark.sql import functions as F

from osm_jl_spark.datagen import VITORIA_LR, VITORIA_UL
from osm_jl_spark.functions.cells import (
    bbox_cell_range,
    disk_cells,
    ring_cells,
    with_cell,
)
from osm_jl_spark.oracle import coord2index


def test_trunc_not_floor():
    # trunc(-20.2273 * 100) = -2022; floor would be -2023
    assert coord2index(-20.2273, 2) == -2022
    assert math.floor(-20.2273 * 100) == -2023
    assert coord2index(10.71299, 2) == 1071


def test_spark_cast_matches_trunc(spark):
    vals = [
        (-20.2273, -40.3554), (59.92589, 10.71299), (0.004, -0.004),
        (-0.996, 0.996), (89.999, -179.999), (-20.3243, -40.2554),
    ]
    df = spark.createDataFrame(vals, "lat DOUBLE, lon DOUBLE")
    for p in (0, 1, 2, 3):
        rows = with_cell(df, p).select("lon", "lat", "cx", "cy").collect()
        for r in rows:
            assert r["cx"] == coord2index(r["lon"], p), (r, p)
            assert r["cy"] == coord2index(r["lat"], p), (r, p)


def test_bbox_cell_range_vitoria():
    xlo, xhi, ylo, yhi = bbox_cell_range(VITORIA_UL, VITORIA_LR, 2)
    assert (xlo, xhi) == (-4035, -4025)
    assert (ylo, yhi) == (-2032, -2022)


def test_cell_lookup_single_cell(spark):
    # point-getindex (src/index.jl:55-58): exactly the rows whose cell
    # equals the query point's cell — degenerate bbox, negative coords
    from osm_jl_spark.functions.cells import cell_lookup

    vals = [
        (-40.3254, -20.2743),  # same cell as the query point
        (-40.3299, -20.2701),  # same cell (trunc -4032, -2027)
        (-40.3354, -20.2743),  # neighbor cell in x
        (-40.3254, -20.2843),  # neighbor cell in y
        (40.3254, 20.2743),    # sign-flipped far cell
    ]
    df = with_cell(
        spark.createDataFrame(vals, "lon DOUBLE, lat DOUBLE"), 2
    )
    got = cell_lookup(df, -40.3254, -20.2743, 2).select("lon", "lat")
    assert sorted(map(tuple, got.collect())) == [
        (-40.3299, -20.2701), (-40.3254, -20.2743),
    ]


def test_ring_and_disk():
    assert ring_cells(5, 5, 0) == [(5, 5)]
    r1 = ring_cells(0, 0, 1)
    assert len(r1) == 8 and (0, 0) not in r1
    d2 = disk_cells(0, 0, 2)
    assert len(d2) == 25
    assert set(ring_cells(0, 0, 2)) == set(d2) - set(disk_cells(0, 0, 1))
