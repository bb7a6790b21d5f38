"""Stage 2 — parcel tessellation (SURVEY.md K4/K5, `prclz/_parcels.py`).

The reference tessellates each block into cadastral parcels with momepy
(Voronoi of densified building-boundary points, merged per building uID —
`prclz/_parcels.py:52-63`), then reunites orphan cells with their nearest
adjacent building parcel (`:65-168`). Without GEOS/momepy we implement the
same documented algorithm directly:

  per block (applyInPandas group):
    1. sample points along each building's boundary (densify)
    2. exact Voronoi of all sampled points (half-plane cells)
    3. clip every cell to the block ring
    4. union-by-building: cells of the same building merge into one parcel
       (we keep them as a cell-complex and dissolve via the shared planar
       graph — parcel geometry = outer boundary of the building's cells)
    5. buildings with zero area inside the block → dropped (reference drops
       unmatched after the sjoin, `_parcels.py:91-93`)

Trivial case: a block with no buildings is its own single parcel
(`_parcels.py:30-31`).

Invariant validation (tests): every building's parcel contains the
building's centroid; parcels of one block are pairwise interior-disjoint;
parcel count ≤ building count (+1 for the no-building case) — matching the
reference's `check_within` QC (`_parcels.py:218-237`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import geom as G
from ..kernels import planar as P
from .sjoin import pip_join
from .complexity import building_centroids

_OUT_SCHEMA = "block_id string, parcel_id long, osm_id string, geometry binary"


def densify_ring(ring: np.ndarray, step: float) -> np.ndarray:
    out = []
    for i in range(len(ring) - 1):
        a, b = ring[i], ring[i + 1]
        seg = b - a
        n = max(1, int(np.ceil(np.hypot(*seg) / step)))
        for t in np.arange(n) / n:
            out.append(a + t * seg)
    return np.asarray(out)


def _merge_cells_of_building(rings: list) -> G.Geom | None:
    """Dissolve a building's Voronoi cells into one parcel polygon: the
    cells share edges exactly (same diagram), so the dissolved boundary is
    the set of edges appearing exactly once (A4 `dissolve`,
    `prclz/_parcels.py:165`)."""
    if not rings:
        return None
    if len(rings) == 1:
        return G.Geom(G.POLYGON, [rings[0]])
    g = P.graph_from_rings(rings)
    # boundary edges appear in exactly one ring traversal; interior edges in two
    from collections import Counter

    cnt: Counter = Counter()
    for ring in rings:
        for i in range(len(ring) - 1):
            a = (round(float(ring[i][0]), 9), round(float(ring[i][1]), 9))
            b = (round(float(ring[i + 1][0]), 9), round(float(ring[i + 1][1]), 9))
            if a != b:
                cnt[frozenset((a, b))] += 1
    boundary = [tuple(e) for e, c in cnt.items() if c == 1]
    if not boundary:
        return G.Geom(G.POLYGON, [rings[0]])
    # chain boundary edges into a ring
    adj: dict = {}
    for a, b in boundary:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    start = min(adj)
    chain = [start]
    prev = None
    cur = start
    for _ in range(len(boundary) + 1):
        nxts = [n for n in adj[cur] if n != prev]
        if not nxts:
            break
        prev, cur = cur, nxts[0]
        chain.append(cur)
        if cur == start:
            break
    merged = None
    if chain[-1] == start and len(chain) >= 4:
        merged = G.Geom(G.POLYGON, [np.asarray(chain, dtype=np.float64)])
    # validity check: the dissolved ring must cover (within tolerance) the
    # summed cell area; otherwise the boundary has multiple loops (holes /
    # disjoint parts, e.g. a MultiPolygon building) → keep the exact
    # cell-complex as a MultiPolygon instead
    cells_area = sum(P._abs_ring_area(r) for r in rings)
    if merged is None or abs(G.area(merged) - cells_area) > 1e-9 * max(cells_area, 1e-300) + 1e-18:
        return G.multipolygon([[r] for r in rings])
    return merged


def _parcels_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    block_id = pdf["block_id"].iloc[0]
    block = G.wkb_loads(bytes(pdf["block_geom"].iloc[0]))
    ring = block.data[0] if block.kind == G.POLYGON else block.data[0][0]
    rows = []
    bldg = pdf[pdf["osm_id"].notna()]
    if not len(bldg):
        rows.append((block_id, 0, None, G.wkb_dumps(G.Geom(G.POLYGON, [ring]))))
        return pd.DataFrame(rows, columns=["block_id", "parcel_id", "osm_id", "geometry"])
    xmin, ymin = ring.min(axis=0)
    xmax, ymax = ring.max(axis=0)
    step = max(xmax - xmin, ymax - ymin) / 60.0
    samples = []
    owners = []
    for _, r in bldg.iterrows():
        g = G.wkb_loads(bytes(r["bldg_geom"]))
        rings = [g.data[0]] if g.kind == G.POLYGON else [p[0] for p in g.data]
        for rr in rings:
            pts = densify_ring(rr, step)
            samples.append(pts)
            owners.extend([r["osm_id"]] * len(pts))
    pts = np.vstack(samples)
    cells = P.voronoi_cells(pts, (xmin, ymin, xmax, ymax))
    per_bldg: dict[str, list] = {}
    for owner, cell in zip(owners, cells):
        if len(cell) < 4:
            continue
        inter = P.clip_convex(ring, cell)
        if len(inter) >= 4 and P._abs_ring_area(inter) > 0:
            per_bldg.setdefault(owner, []).append(inter)
    pid = 0
    for owner in sorted(per_bldg):
        parcel = _merge_cells_of_building(per_bldg[owner])
        if parcel is not None:
            rows.append((block_id, pid, owner, G.wkb_dumps(parcel)))
            pid += 1
    return pd.DataFrame(rows, columns=["block_id", "parcel_id", "osm_id", "geometry"])


def tessellate(blocks: DataFrame, buildings: DataFrame, res: int) -> DataFrame:
    """blocks × buildings → parcels(block_id, parcel_id, osm_id, geometry)."""
    pts = building_centroids(buildings)
    assigned = pip_join(pts, blocks, "osm_id", "block_id", res=res, how="inner").select(
        "osm_id", "block_id"
    )
    bldg_geoms = buildings.select("osm_id", F.col("geometry").alias("bldg_geom"))
    blk_geoms = blocks.select("block_id", F.col("geometry").alias("block_geom"))
    grouped = (
        blk_geoms.join(assigned, "block_id", "left")
        .join(bldg_geoms, "osm_id", "left")
        .select("block_id", "block_geom", "osm_id", "bldg_geom")
    )
    return grouped.groupBy("block_id").applyInPandas(_parcels_kernel, _OUT_SCHEMA)
