"""Stage 4 — reblocking (SURVEY.md §3.3, K19 orchestration).

Reference flow (`prclz/reblock/_reblock.py:272-375`): per block with >1
building: parcel boundaries → graph → building centroids become terminals
on their nearest edges → existing block-boundary roads reweighted to 0 →
largest component → Steiner approximation → emit linestrings split into
road_type ∈ {new, existing} + a summary metrics row.

Spark plan: three-way prep (parcels ⟕ blocks ⟕ building centroids, all
keyed by block_id) → groupBy(block_id).applyInPandas(kernel) → REBLOCK rows
(+ the summary columns of `example_data/reblock/.../reblock_summary_*.csv`).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import geom as G
from ..kernels.reblock import StreetGraph
from .complexity import building_centroids
from .sjoin import pip_join

_OUT_SCHEMA = (
    "block_id string, road_type string, geometry binary, "
    "num_graph_comps int, node_count_pre int, node_count_post int, "
    "edge_count_pre int, edge_count_post int, bldg_count int, "
    "num_block_coords int, num_block_coords_unmatched int"
)


def _reblock_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    return _reblock_kernel_impl(pdf, use_width=False)


def _reblock_kernel_width(pdf: pd.DataFrame) -> pd.DataFrame:
    return _reblock_kernel_impl(pdf, use_width=True)


def _reblock_kernel_impl(pdf: pd.DataFrame, use_width: bool) -> pd.DataFrame:
    block_id = pdf["block_id"].iloc[0]
    cols = [
        "block_id", "road_type", "geometry", "num_graph_comps",
        "node_count_pre", "node_count_post", "edge_count_pre",
        "edge_count_post", "bldg_count", "num_block_coords",
        "num_block_coords_unmatched",
    ]
    bldg = pdf[pdf["x"].notna()][["x", "y"]].drop_duplicates()
    if len(bldg) <= 1:  # reference skips blocks with ≤1 building (:347)
        return pd.DataFrame(columns=cols)
    parcel_rows = pdf[pdf["parcel_geom"].notna()].drop_duplicates(subset=["parcel_id"])
    if not len(parcel_rows):
        return pd.DataFrame(columns=cols)
    rings = []
    pids = []
    for r in parcel_rows.itertuples():
        g = G.wkb_loads(bytes(r.parcel_geom))
        rs = [g.data[0]] if g.kind == G.POLYGON else [p[0] for p in g.data]
        for ring in rs:
            rings.append(ring)
            pids.append(r.parcel_id)
    try:
        sg = StreetGraph.from_polygons(rings, pids)
        pre = sg.stats()
        for r in bldg.itertuples():
            sg.add_node_to_closest_edge((r.x, r.y), terminal=True)
        block = G.wkb_loads(bytes(pdf["block_geom"].iloc[0]))
        block_ring = block.data[0] if block.kind == G.POLYGON else block.data[0][0]
        missing, total = sg.update_edge_types(block_ring, check=True)
        if use_width and "bldg_geom" in pdf.columns:
            # K14: width = min edge→building distance, cost = eucl/width
            polys = [
                G.wkb_loads(bytes(b))
                for b in pdf.loc[pdf["bldg_geom"].notna(), "bldg_geom"].drop_duplicates()
            ]
            if polys:
                sg.set_edge_width(polys, simplify=True)
                sg.calc_edge_weight()
        ncomp, sg = sg.largest_component()
        if len(sg.terminals()) < 2:
            return pd.DataFrame(columns=cols)
        sg.steiner_tree_approx()
        new, existing = sg.steiner_segments()
        post = sg.stats()
    except Exception:
        return pd.DataFrame(columns=cols)
    rows = []
    for road_type, segs in (("new", new), ("existing", existing)):
        if not segs:
            continue
        mls = G.multilinestring([[a, b] for a, b in segs])
        rows.append(
            (
                block_id, road_type, G.wkb_dumps(mls), ncomp,
                pre["node_count"], post["node_count"],
                pre["edge_count"], post["edge_count"],
                int(len(bldg)), int(total or 0), int(missing or 0),
            )
        )
    return pd.DataFrame(rows, columns=cols)


def reblock(
    blocks: DataFrame,
    parcels: DataFrame,
    buildings: DataFrame,
    res: int,
    use_width: bool = False,
) -> DataFrame:
    """blocks × parcels × buildings → (block_id, road_type ∈ {new, existing},
    geometry MultiLineString, summary metrics).

    ``use_width=True`` enables the K14 width-aware cost (weight =
    eucl_dist / min-distance-to-buildings, chain-simplified) — the
    reference's `-w` reblocking flavor (`prclz/cli.py:104-110`)."""
    pts = building_centroids(buildings, res=res)
    assigned = pip_join(pts, blocks, "osm_id", "block_id", res=res, how="inner").select(
        "block_id", "x", "y", *( ["osm_id"] if use_width else [] )
    )
    blk = blocks.select("block_id", F.col("geometry").alias("block_geom"))
    pcl = parcels.select("block_id", "parcel_id", F.col("geometry").alias("parcel_geom"))
    grouped = (
        pcl.join(F.broadcast(blk), "block_id", "inner")
        .join(assigned, "block_id", "left")
    )
    if use_width:
        bg = buildings.select("osm_id", F.col("geometry").alias("bldg_geom"))
        grouped = grouped.join(bg, "osm_id", "left").select(
            "block_id", "block_geom", "parcel_id", "parcel_geom", "x", "y", "bldg_geom"
        )
        return grouped.groupBy("block_id").applyInPandas(_reblock_kernel_width, _OUT_SCHEMA)
    grouped = grouped.select("block_id", "block_geom", "parcel_id", "parcel_geom", "x", "y")
    return grouped.groupBy("block_id").applyInPandas(_reblock_kernel, _OUT_SCHEMA)
