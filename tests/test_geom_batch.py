"""Batch measures (geom.batch_*) — exact equivalence with the per-geometry
functions plus the ≥3× micro-bench VERDICT r2 #7 prescribes for the
cold-path st_* coordinate math."""

import time

import numpy as np

from prclz_spark import geom as G


def _mixed_geoms(n: int, seed: int = 7) -> list:
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
        kind = i % 6
        if kind == 0:
            out.append(G.point(cx, cy))
        elif kind == 1:
            out.append(G.linestring(np.cumsum(rng.normal(size=(5, 2)), axis=0) + (cx, cy)))
        elif kind == 2:  # convex-ish polygon, 8-40 vertices
            k = int(rng.integers(8, 40))
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            r = rng.uniform(0.5, 2.0, k)
            ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
            ring = np.vstack([ring, ring[:1]])
            out.append(G.Geom(G.POLYGON, [ring]))
        elif kind == 3:  # polygon with hole
            shell = np.asarray(
                [(cx, cy), (cx + 2, cy), (cx + 2, cy + 2), (cx, cy + 2), (cx, cy)]
            )
            hole = np.asarray(
                [
                    (cx + 0.5, cy + 0.5), (cx + 0.5, cy + 1.0),
                    (cx + 1.0, cy + 1.0), (cx + 1.0, cy + 0.5),
                    (cx + 0.5, cy + 0.5),
                ]
            )
            out.append(G.Geom(G.POLYGON, [shell, hole]))
        elif kind == 4:
            out.append(
                G.multipolygon(
                    [
                        [np.asarray([(cx, cy), (cx + 1, cy), (cx + 1, cy + 1), (cx, cy)])],
                        [np.asarray([(cx + 3, cy), (cx + 4, cy), (cx + 4, cy + 1), (cx + 3, cy)])],
                    ]
                )
            )
        else:
            out.append(
                G.multilinestring(
                    [np.asarray([(cx, cy), (cx + 1, cy + 1)]), np.asarray([(cx + 2, cy), (cx + 3, cy)])]
                )
            )
    out[n // 2] = None  # null input passthrough
    # degenerate polygon (all rings zero-area) exercises the mean fallback
    deg = np.asarray([(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (0.0, 0.0)])
    out[n // 3] = G.Geom(G.POLYGON, [deg])
    return out


def test_batch_measures_equal_scalar():
    geoms = _mixed_geoms(600)
    ba = G.batch_area(geoms)
    bl = G.batch_length(geoms)
    bb = G.batch_bounds(geoms)
    bc = G.batch_centroid(geoms)
    for i, g in enumerate(geoms):
        if g is None:
            assert np.isnan(ba[i]) and np.isnan(bl[i]) and np.isnan(bb[i]).all()
            assert np.isnan(bc[i]).all()
            continue
        assert abs(ba[i] - G.area(g)) <= 1e-9 * max(1.0, abs(G.area(g))), i
        assert abs(bl[i] - G.length(g)) <= 1e-9 * max(1.0, G.length(g)), i
        assert np.allclose(bb[i], G.bounds(g), atol=1e-12), i
        assert np.allclose(bc[i], G.centroid(g), atol=1e-9), i


def test_batch_speedup_3x():
    """The prescribed gate: ≥3× on 10k mixed polygons vs the per-element
    loop (median-of-3 each way; this VM's wall-clock noise is one-sided)."""
    geoms = [g for g in _mixed_geoms(10_000) if g is not None and g.kind in (G.POLYGON, G.MULTIPOLYGON)]

    def loop():
        return [(G.area(g), G.centroid(g), G.bounds(g)) for g in geoms]

    def batch():
        return G.batch_area(geoms), G.batch_centroid(geoms), G.batch_bounds(geoms)

    loop()
    batch()  # warm
    t_loop = min(
        (time.perf_counter() - t0)
        for _ in range(3)
        if (t0 := time.perf_counter()) and (loop() or True)
    )
    t_batch = min(
        (time.perf_counter() - t0)
        for _ in range(3)
        if (t0 := time.perf_counter()) and (batch() or True)
    )
    assert t_loop / t_batch >= 3.0, (t_loop, t_batch)
