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


def test_union_all_two_phase(spark):
    """A5: distributed two-phase unary_union — a 4×4 grid of unit cells
    (shuffled across partitions) unions to the exact 4×4 square."""
    from prclz_spark.operators.union_op import union_all

    rows = [
        (i * 4 + j, G.wkb_dumps(G.box(float(i), float(j), i + 1.0, j + 1.0)))
        for i in range(4)
        for j in range(4)
    ]
    df = spark.createDataFrame(rows, "id long, geometry binary").repartition(6)
    u = union_all(df)
    assert abs(G.area(u) - 16.0) < 1e-9
    assert G.contains_point(u, 2.0, 2.0) and not G.contains_point(u, 4.5, 2.0)
    # disjoint groups stay separate parts
    rows2 = rows + [(99, G.wkb_dumps(G.box(10, 10, 11, 11)))]
    u2 = union_all(spark.createDataFrame(rows2, "id long, geometry binary").repartition(5))
    assert abs(G.area(u2) - 17.0) < 1e-9


def test_st_linemerge(spark):
    from pyspark.sql import functions as F

    from prclz_spark.functions.st import st_geometrytype, st_length, st_linemerge

    mls = G.multilinestring(
        [
            [(0, 0), (1, 0)],
            [(1, 0), (2, 0)],
            [(2, 0), (2, 1)],
            [(5, 5), (6, 5)],  # disconnected piece
        ]
    )
    df = spark.createDataFrame([(G.wkb_dumps(mls),)], "g binary")
    row = df.select(
        st_geometrytype(st_linemerge(F.col("g"))).alias("t"),
        st_length(st_linemerge(F.col("g"))).alias("l"),
    ).collect()[0]
    assert row.t == "MULTILINESTRING" and abs(row.l - 4.0) < 1e-12
    out = G.wkb_loads(bytes(df.select(st_linemerge(F.col("g")).alias("m")).collect()[0].m))
    lens = sorted(len(l) for l in out.data)
    assert len(out.data) == 2 and lens == [2, 4]  # one 3-seg chain + the stub
