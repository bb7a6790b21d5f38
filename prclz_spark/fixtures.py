"""Deterministic synthetic geo + image fixtures (FIXTURES.md §1-§9).

No external data is allowed in this environment, so the urban world the
reference operates on (OSM streets, GADM regions, building footprints —
`prclz/etl/*`) is synthesized on a closed-form plan: a jittered street grid
over a lon/lat box, admin regions as coarse tilings of that grid, and
building quads placed inside grid cells. Every generator is seeded and pure
(same args → same bytes), so expected answers (e.g. which block a building
centroid falls in, how many blocks a region yields) have closed forms the
tests assert against.

Geometry columns are WKB bytes (engine-internal convention); `*_wkt` helpers
exist for the fixture boundary, matching the reference's CSV-with-WKT format
(`prclz/utils.py:45-61`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import geom as G

LON0, LAT0 = 10.0, 10.0  # fixture box origin (degrees)
CELL = 0.01  # one street-grid cell = 0.01° ≈ 1.1 km


def grid_params(nx: int, ny: int):
    return LON0, LAT0, LON0 + nx * CELL, LAT0 + ny * CELL


def make_lines(nx: int, ny: int, seed: int = 42) -> pd.DataFrame:
    """Street grid: (nx+1) vertical + (ny+1) horizontal lines over the box,
    plus deterministic diagonal segments in some cells and dead-end stubs
    (mirrors the reference's unit-test grid builder, tests/test_reblock.py:17-43).

    Diagonals/stubs do not change the block decomposition's outer structure:
    a diagonal splits its cell into two triangles; a stub splits nothing.
    """
    rng = np.random.default_rng(seed)
    rows = []
    x0, y0, x1, y1 = grid_params(nx, ny)
    for i in range(nx + 1):
        x = x0 + i * CELL
        rows.append(("v%d" % i, "residential", None, None, G.linestring([(x, y0), (x, y1)])))
    for j in range(ny + 1):
        y = y0 + j * CELL
        rows.append(("h%d" % j, "residential", None, None, G.linestring([(x0, y), (x1, y)])))
    # diagonals in every 7th cell, stubs in every 11th
    for ci in range(nx):
        for cj in range(ny):
            cell_idx = ci * ny + cj
            cx, cy = x0 + ci * CELL, y0 + cj * CELL
            if cell_idx % 7 == 3:
                rows.append(
                    ("d%d_%d" % (ci, cj), "service", None, None,
                     G.linestring([(cx, cy), (cx + CELL, cy + CELL)]))
                )
            if cell_idx % 11 == 5:
                rows.append(
                    ("s%d_%d" % (ci, cj), "service", None, None,
                     G.linestring([(cx + 0.5 * CELL, cy), (cx + 0.5 * CELL, cy + 0.3 * CELL)]))
                )
    df = pd.DataFrame(rows, columns=["osm_id", "highway", "natural", "waterway", "geometry"])
    df["geometry"] = df["geometry"].map(G.wkb_dumps)
    return df


def make_gadm(nx: int, ny: int, gx: int = 2, gy: int = 2) -> pd.DataFrame:
    """Admin regions: gx×gy tiling of the box; key 'TST.{i}.{j}_1'."""
    x0, y0, x1, y1 = grid_params(nx, ny)
    wx = (x1 - x0) / gx
    wy = (y1 - y0) / gy
    rows = []
    for i in range(gx):
        for j in range(gy):
            poly = G.box(x0 + i * wx, y0 + j * wy, x0 + (i + 1) * wx, y0 + (j + 1) * wy)
            rows.append((f"TST.{i+1}.{j+1}_1", "TST", G.wkb_dumps(poly)))
    return pd.DataFrame(rows, columns=["gadm", "gid_0", "geometry"])


def make_buildings(nx: int, ny: int, per_cell: int = 6, seed: int = 42) -> pd.DataFrame:
    """Building quads inside grid cells: per cell, `per_cell` axis-aligned
    squares in deterministic jittered ring positions (margin keeps them off
    cell borders so centroid→cell assignment has a closed form). Every 13th
    building is a 2-part MultiPolygon to exercise multipart explode
    (`prclz/_parcels.py:86`)."""
    rng = np.random.default_rng(seed)
    x0, y0, _, _ = grid_params(nx, ny)
    rows = []
    bid = 0
    for ci in range(nx):
        for cj in range(ny):
            cx, cy = x0 + ci * CELL, y0 + cj * CELL
            for b in range(per_cell):
                ang = 2 * np.pi * (b + 0.25) / per_cell
                r = CELL * (0.22 + 0.09 * ((b * 2654435761) % 7) / 7.0)
                bx = cx + 0.5 * CELL + r * np.cos(ang)
                by = cy + 0.5 * CELL + r * np.sin(ang)
                s = CELL * 0.03
                quad = G.box(bx - s, by - s, bx + s, by + s)
                if bid % 13 == 12:
                    quad2 = G.box(bx + 2 * s, by - s, bx + 3 * s, by + s)
                    geom = G.multipolygon([quad, quad2])
                else:
                    geom = quad
                rows.append((f"b{bid:09d}", "house", None, G.wkb_dumps(geom)))
                bid += 1
    return pd.DataFrame(rows, columns=["osm_id", "building", "gadm_code", "geometry"])


def _buildings_for_cells(nx: int, ny: int, per_cell: int):
    """mapInPandas generator factory: cell-index batch → building rows.
    Same closed-form placement as make_buildings (deterministic, seedless
    given indices), but generated on executors — the driver never holds
    the building table (at 10^12 rows it couldn't)."""
    import pandas as pd  # noqa: F811 — runs on executors

    def gen(batches):
        from . import geom as GG

        x0, y0, _, _ = grid_params(nx, ny)
        for pdf in batches:
            rows = []
            for cell_lin in pdf["id"]:
                ci, cj = divmod(int(cell_lin), ny)
                cx, cy = x0 + ci * CELL, y0 + cj * CELL
                base = int(cell_lin) * per_cell
                for b in range(per_cell):
                    bid = base + b
                    ang = 2 * np.pi * (b + 0.25) / per_cell
                    r = CELL * (0.22 + 0.09 * ((b * 2654435761) % 7) / 7.0)
                    bx = cx + 0.5 * CELL + r * np.cos(ang)
                    by = cy + 0.5 * CELL + r * np.sin(ang)
                    s = CELL * 0.03
                    quad = GG.box(bx - s, by - s, bx + s, by + s)
                    if bid % 13 == 12:
                        quad2 = GG.box(bx + 2 * s, by - s, bx + 3 * s, by + s)
                        geom = GG.multipolygon([quad, quad2])
                    else:
                        geom = quad
                    rows.append((f"b{bid:09d}", "house", None, GG.wkb_dumps(geom)))
            yield pd.DataFrame(rows, columns=["osm_id", "building", "gadm_code", "geometry"])

    return gen


def to_spark(spark, pdf: pd.DataFrame, schema):
    """Driver-side dim → DataFrame with row-count-sized partitioning: a
    256-row dim scattered over default parallelism (32 at local[32]) makes
    every Python phase that touches it pay one worker round-trip per
    near-empty task (same ~20k-rows-per-partition rule as the distributed
    buildings path; ≥1 partition, and never more than the default)."""
    want = max(1, (len(pdf) + 19_999) // 20_000)
    return spark.createDataFrame(pdf, schema=schema).coalesce(want)


def geo_world(spark, nx: int, ny: int, per_cell: int = 6, gx: int = 2, gy: int = 2, seed: int = 42,
              distributed_buildings: bool | None = None):
    """The three input tables as Spark DataFrames with declared schemas.
    Buildings are generated on executors when the table is large (the
    lines/gadm dims stay driver-side — they ARE small dims by design)."""
    from . import schemas as S

    lines = to_spark(spark, make_lines(nx, ny, seed), S.LINES)
    gadm = to_spark(spark, make_gadm(nx, ny, gx, gy), S.GADM)
    n_cells = nx * ny
    if distributed_buildings is None:
        distributed_buildings = n_cells * per_cell > 20_000
    if distributed_buildings:
        # partitions sized to ~20k rows (a few MB of WKB) instead of the
        # former n_cells/64 (1.5k rows each at the bench world): tiny
        # partitions multiply per-task scheduling + Python-worker
        # round-trips through every downstream stage (guide §6 small-files
        # argument, applied to in-memory partitioning); still adaptive in
        # the row count and capped for huge worlds
        parts = min(256, max(8, (n_cells * per_cell) // 20_000))
        bldgs = spark.range(0, n_cells, 1, parts).mapInPandas(
            _buildings_for_cells(nx, ny, per_cell), S.BUILDINGS
        )
    else:
        bldgs = to_spark(spark, make_buildings(nx, ny, per_cell, seed), S.BUILDINGS)
    return lines, gadm, bldgs
