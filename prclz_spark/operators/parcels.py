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


def _edge_key(a, b):
    ka = (round(float(a[0]), 9), round(float(a[1]), 9))
    kb = (round(float(b[0]), 9), round(float(b[1]), 9))
    return frozenset((ka, kb))


def _connected_parts(rings: list) -> list:
    """Group a building's Voronoi cells into edge-connected components —
    the exploded polygon parts of the parcel (the reference's
    `tess_multips.explode()`, `prclz/_parcels.py:86`)."""
    n = len(rings)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    edge_owner: dict = {}
    for idx, ring in enumerate(rings):
        for i in range(len(ring) - 1):
            k = _edge_key(ring[i], ring[i + 1])
            if len(k) < 2:
                continue
            j = edge_owner.get(k)
            if j is None:
                edge_owner[k] = idx
            else:
                ri, rj = find(idx), find(j)
                if ri != rj:
                    parent[ri] = rj
    groups: dict = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(rings[i])
    return list(groups.values())


def _part_geom(part: list) -> G.Geom:
    if len(part) == 1:
        return G.Geom(G.POLYGON, [part[0]])
    return G.multipolygon([[r] for r in part])


def _reunite_orphans(per_bldg: dict, bldg_geoms: dict) -> dict:
    """K5 orphan split + reunion (`prclz/_parcels.py:65-168`).

    A building's parcel can come out as a MultiPolygon (convex Voronoi ∩
    non-convex block); exploded parts that intersect no building are
    orphans (`get_orphaned_polys` `:65-103`). Each orphan is reassigned to
    the parcel of the nearest building whose parcel touches it — the J9
    nearest-with-predicate scan (`find_parent_parcel_id` `:105-149`);
    unmatched orphans are dropped, as the reference's dissolve-by-uID drops
    its uID=None rows (`reunion` `:151-168`). Matching runs against the
    pre-reunion parcels (the reference assigns all orphans before the
    concat+dissolve)."""
    final_cells: dict = {}
    orphan_parts: list = []
    # vectorized bbox prefilter: exact intersects runs only against
    # buildings whose bounding box overlaps the part's — turns the
    # O(parts×buildings) exact scan into a cheap mask + a few exact tests
    owners_list = list(bldg_geoms)
    bb = (
        np.array([G.bounds(bldg_geoms[o]) for o in owners_list])
        if owners_list
        else np.zeros((0, 4))
    )
    for owner in sorted(per_bldg):
        parts = _connected_parts(per_bldg[owner])
        if len(parts) == 1:  # connected parcel: never orphan-tested
            final_cells.setdefault(owner, []).extend(parts[0])
            continue
        for part in parts:
            pg = _part_geom(part)
            pts_all = np.vstack(part)
            pxmin, pymin = pts_all.min(axis=0)
            pxmax, pymax = pts_all.max(axis=0)
            cand = np.nonzero(
                (bb[:, 0] <= pxmax) & (bb[:, 2] >= pxmin)
                & (bb[:, 1] <= pymax) & (bb[:, 3] >= pymin)
            )[0]
            if any(G.intersects(pg, bldg_geoms[owners_list[i]]) for i in cand):
                final_cells.setdefault(owner, []).extend(part)
            else:
                orphan_parts.append(part)
    if not orphan_parts:
        return final_cells
    snapshot = {o: _part_geom(cells) for o, cells in final_cells.items()}
    assignments: list = []
    for part in orphan_parts:
        pg = _part_geom(part)
        # area-weighted centroid of the part = centroid of the union
        areas = np.array([P._abs_ring_area(r) for r in part])
        cents = np.array([G.centroid(G.Geom(G.POLYGON, [r])) for r in part])
        c = (cents * areas[:, None]).sum(0) / max(float(areas.sum()), 1e-300)
        cpt = G.point(float(c[0]), float(c[1]))
        order = sorted(snapshot, key=lambda o: G.distance(bldg_geoms[o], cpt) if o in bldg_geoms else float("inf"))
        for bid in order:
            if G.distance(snapshot[bid], pg) <= 1e-9:  # parcels border each other
                assignments.append((bid, part))
                break
    for bid, part in assignments:
        final_cells[bid].extend(part)
    return final_cells


def _parcels_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    # single-param wrapper: applyInPandas switches to (key, pdf) calling
    # convention for ANY 2+-param callable, defaults included
    return _parcels_kernel_impl(pdf, 0.0)


def _parcels_kernel_impl(pdf: pd.DataFrame, inward_offset: float) -> pd.DataFrame:
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
    bldg_geoms: dict = {}
    bldg_decoded = G.wkb_loads_batch(bldg["bldg_geom"])
    for (_, r), g in zip(bldg.iterrows(), bldg_decoded):
        bldg_geoms[r["osm_id"]] = g
        seed_geom = g
        if inward_offset > 0:
            # momepy's inward-offset seeding (`momepy.Tessellation` shrinks
            # the footprint before sampling so no cell cuts into a
            # building): erode via the boolean-overlay buffer; a footprint
            # thinner than 2·offset keeps its raw boundary (momepy's
            # shrink fallback)
            from ..kernels import overlay as OV

            er = OV.buffer(g, -inward_offset)
            if er is not None:
                seed_geom = er
        rings = (
            [seed_geom.data[0]]
            if seed_geom.kind == G.POLYGON
            else [p[0] for p in seed_geom.data]
        )
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
        if len(inter) < 4:
            continue
        # a concave block can cut one convex cell into several pieces: split
        # the S-H ring at its zero-width bridges so each piece is its own
        # cell (the MultiPolygon parts that momepy's tessellation yields)
        parts = P.split_clip_parts(inter) or (
            [inter] if P._abs_ring_area(inter) > 0 else []
        )
        for part in parts:
            per_bldg.setdefault(owner, []).append(part)
    final_cells = _reunite_orphans(per_bldg, bldg_geoms)
    pid = 0
    for owner in sorted(final_cells):
        parcel = _merge_cells_of_building(final_cells[owner])
        if parcel is not None:
            rows.append((block_id, pid, owner, G.wkb_dumps(parcel)))
            pid += 1
    return pd.DataFrame(rows, columns=["block_id", "parcel_id", "osm_id", "geometry"])


def tessellate(
    blocks: DataFrame, buildings: DataFrame, res: int, inward_offset: float = 0.0
) -> DataFrame:
    """blocks × buildings → parcels(block_id, parcel_id, osm_id, geometry).

    ``inward_offset > 0`` enables momepy's inward-offset seeding (shrink
    each footprint by the offset before boundary sampling, so no parcel
    boundary cuts into a building — `momepy.Tessellation`'s documented
    behavior); 0 (default) samples the raw boundary."""
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
    if inward_offset > 0:
        off = float(inward_offset)

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return _parcels_kernel_impl(pdf, off)

        return grouped.groupBy("block_id").applyInPandas(kernel, _OUT_SCHEMA)
    return grouped.groupBy("block_id").applyInPandas(_parcels_kernel, _OUT_SCHEMA)
