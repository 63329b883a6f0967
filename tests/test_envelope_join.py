"""envelope_join (operators/joins.py): grid-partitioned rectangle
overlap join — naive-equivalence over mixed compact/oversized inputs,
exact-once reporting-cell dedup, strict-mode contract, and the
zero-nested-loop plan pin for the compact path."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from osm_jl_spark.operators.joins import envelope_join
from tests.test_plans import count_nodes, explain


def _rects(spark, n, seed, span=10_000, max_ext=900, n_oversized=0):
    """Seeded random integer rectangles; the last n_oversized get an
    x-extent far beyond any reasonable cell width."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        x, y = rng.randrange(-span, span), rng.randrange(-span, span)
        ex, ey = rng.randrange(0, max_ext), rng.randrange(0, max_ext)
        if i >= n - n_oversized:
            ex = span * 3
        rows.append(Row(id=i, minx=x, miny=y, maxx=x + ex, maxy=y + ey))
    return spark.createDataFrame(rows)


def _naive(a_rows, b_rows):
    out = set()
    for ra in a_rows:
        for rb in b_rows:
            if (ra.minx <= rb.maxx and rb.minx <= ra.maxx
                    and ra.miny <= rb.maxy and rb.miny <= ra.maxy):
                area = ((min(ra.maxx, rb.maxx) - max(ra.minx, rb.minx))
                        * (min(ra.maxy, rb.maxy) - max(ra.miny, rb.miny)))
                out.add((ra.id, rb.id, area))
    return out


def test_matches_naive_with_oversized_sidecar(spark):
    """Mixed workload: compact rectangles on the grid path, oversized
    ones through the broadcast sidecar — together they must equal the
    naive cross-product filter exactly, each pair exactly once."""
    a = _rects(spark, 60, seed=7, n_oversized=3)
    b = _rects(spark, 45, seed=11, n_oversized=2)
    got = envelope_join(a, b, cell_w=1000).collect()
    assert len(got) == len({(r.a_id, r.b_id) for r in got})  # exact-once
    assert {(r.a_id, r.b_id, r.ix_area) for r in got} == _naive(
        a.collect(), b.collect()
    )


def test_strict_all_compact_matches_naive(spark):
    a = _rects(spark, 80, seed=3)
    b = _rects(spark, 80, seed=4)
    got = envelope_join(a, b, cell_w=1000, oversize="strict").collect()
    assert len(got) == len({(r.a_id, r.b_id) for r in got})
    assert {(r.a_id, r.b_id, r.ix_area) for r in got} == _naive(
        a.collect(), b.collect()
    )


def test_touching_edges_count_with_zero_area(spark):
    a = spark.createDataFrame([Row(id=1, minx=0, miny=0, maxx=10, maxy=10)])
    b = spark.createDataFrame(
        [Row(id=2, minx=10, miny=5, maxx=20, maxy=15),   # shared edge
         Row(id=3, minx=10, miny=10, maxx=20, maxy=20),  # shared corner
         Row(id=4, minx=11, miny=0, maxx=20, maxy=10)]   # disjoint
    )
    got = {(r.a_id, r.b_id): r.ix_area
           for r in envelope_join(a, b, cell_w=100).collect()}
    assert got == {(1, 2): 0, (1, 3): 0}


def test_strict_mode_raises_on_oversized(spark):
    a = _rects(spark, 10, seed=5, n_oversized=1)
    b = _rects(spark, 10, seed=6)
    with pytest.raises(Exception, match="envelope_join"):
        envelope_join(a, b, cell_w=1000, oversize="strict").count()


def test_strict_plan_has_no_nested_loop_and_no_distinct(spark):
    """Scale pin for the compact path: one equi-join on the cell key,
    reporting-cell dedup instead of a distinct (no extra exchange for
    dedup), no nested-loop branch anywhere in strict mode."""
    a = _rects(spark, 30, seed=8)
    b = _rects(spark, 30, seed=9)
    plan = explain(envelope_join(a, b, cell_w=1000, oversize="strict"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert count_nodes(plan, "HashAggregate") == 0, plan  # no distinct
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_empty_side_yields_no_pairs(spark):
    a = _rects(spark, 20, seed=12)
    b = a.filter("id < 0")  # empty
    assert envelope_join(a, b, cell_w=1000).count() == 0
    assert envelope_join(b, a, cell_w=1000).count() == 0
