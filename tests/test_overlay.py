"""Boolean overlay + buffer (kernels/overlay.py) — closed-form cases the
reference delegates to GEOS (`prclz/blocks/_methods.py:35-40`,
`prclz/_complexity.py:33`)."""

import math

import numpy as np
import pytest

from prclz_spark import geom as G
from prclz_spark.kernels import overlay as OV


A = G.box(0, 0, 2, 2)
B = G.box(1, 1, 3, 3)


@pytest.mark.parametrize(
    "op,want",
    [("intersection", 1.0), ("difference", 3.0), ("union", 7.0), ("symdifference", 6.0)],
)
def test_overlay_overlapping_squares(op, want):
    r = OV.overlay(A, B, op)
    assert abs(G.area(r) - want) < 1e-9


def test_overlay_disjoint():
    assert OV.overlay(G.box(0, 0, 1, 1), G.box(5, 5, 6, 6), "intersection") is None
    u = OV.overlay(G.box(0, 0, 1, 1), G.box(5, 5, 6, 6), "union")
    assert u.kind == G.MULTIPOLYGON and abs(G.area(u) - 2.0) < 1e-9


def test_overlay_nested_hole():
    dn = OV.overlay(G.box(0, 0, 4, 4), G.box(1, 1, 2, 2), "difference")
    assert abs(G.area(dn) - 15.0) < 1e-9
    assert not G.contains_point(dn, 1.5, 1.5)  # the hole
    assert G.contains_point(dn, 3.0, 3.0)
    # fully-contained difference is empty
    assert OV.overlay(G.box(1, 1, 2, 2), G.box(0, 0, 4, 4), "difference") is None


def test_overlay_multipart_intersection():
    # U-block ∩ full-width strip → two disconnected rectangles
    U = G.polygon([(0, 0), (3, 0), (3, 3), (2, 3), (2, 1), (1, 1), (1, 3), (0, 3), (0, 0)])
    it = OV.overlay(U, G.box(0, 2.2, 3, 3), "intersection")
    assert it.kind == G.MULTIPOLYGON
    assert abs(G.area(it) - 1.6) < 1e-9


def test_buffer_dilate_erode_roundtrip():
    sq = G.box(0, 0, 2, 2)
    bf = OV.buffer(sq, 0.5)
    exact = 4 + 4 * 2 * 0.5 + math.pi * 0.25
    # chordal arcs undershoot the circular corners slightly
    assert exact - 0.05 < G.area(bf) <= exact + 1e-9
    er = OV.buffer(sq, -0.5)
    assert abs(G.area(er) - 1.0) < 1e-9
    assert OV.buffer(sq, -0.6 * 2) is None  # erodes to nothing
    lb = OV.buffer(G.linestring([(0, 0), (2, 0)]), 0.25)
    exact_line = 2 * 0.5 + math.pi * 0.0625
    assert exact_line - 0.02 < G.area(lb) <= exact_line + 1e-9


def test_min_rotated_rect_and_representative_point():
    r = G.minimum_rotated_rectangle(np.array([[0, 0], [1, 1], [2, 0], [1, -1]]))
    assert abs(G.area(G.Geom(G.POLYGON, [r])) - 2.0) < 1e-9
    U = G.polygon([(0, 0), (3, 0), (3, 3), (2, 3), (2, 1), (1, 1), (1, 3), (0, 3), (0, 0)])
    p = G.representative_point(U)
    assert G.contains_point(U, p[0], p[1])


def test_st_overlay_udfs(spark):
    from pyspark.sql import functions as F

    from prclz_spark.functions.st import st_area, st_buffer, st_difference, st_intersection

    df = spark.createDataFrame(
        [(G.wkb_dumps(A), G.wkb_dumps(B))], "ga binary, gb binary"
    )
    row = df.select(
        st_area(st_intersection(F.col("ga"), F.col("gb"))).alias("inter"),
        st_area(st_difference(F.col("ga"), F.col("gb"))).alias("diff"),
        st_area(st_buffer(-0.5)(F.col("ga"))).alias("eroded"),
    ).collect()[0]
    assert abs(row.inter - 1.0) < 1e-9
    assert abs(row.diff - 3.0) < 1e-9
    assert abs(row.eroded - 1.0) < 1e-9
