"""kNN via cell-ring expansion (SURVEY.md J8-J10).

Replaces every nearest-neighbor mechanism in the reference:

* rtree `idx.nearest(bounds, MAX_CENTROID_DEGREE)` for weak-dual candidates
  (`prclz/topology.py:12,359-366`),
* the ε-buffer grown ×2 until a candidate edge appears
  (`prclz/reblock/_reblock_graph.py:16-17,473-502`),
* the sort-by-distance-then-scan parent-parcel search
  (`prclz/_parcels.py:105-149`).

Algorithm (distributed, driver-coordinated ring loop):

    r = 0: join probes to build points sharing the probe's cell.
    r += 1: for probes that do not yet have a PROVEN top-k, explode the
    Chebyshev ring-r cells and join again; accumulate candidates.
    A probe is proven once it has ≥ k candidates whose k-th distance is
    ≤ r·min(cell_w, cell_h) — no point outside ring r can beat that.
    Finish: Window.partitionBy(probe).orderBy(dist) → row_number ≤ k.

Round-8 plan shape (guide §§2.4, 4.1): the whole candidate path is pure
JVM codegen — the probe/build cell ids are Column expressions
(st.cell_ixy_cols / cell_from_ixy_cols, bit-equal to the former pandas
UDFs) and the ring-cell expansion explodes a LITERAL (dx, dy) offset
array (the offsets do not depend on the row), so no ArrowEvalPython node
exists anywhere. The per-iteration satisfaction check is folded into the
SAME window pass that produces the final top-k (count/max over the
already-partitioned top-k rows), so one action materializes a ≤k-rows-
per-probe checkpoint that doubles as the result — the former shape paid a
full-candidate-set checkpoint plus a second full window for the proof.

Candidate (probe, build) pairs are UNIQUE by construction — each build
point lives in exactly one cell, a probe's disk cells are distinct, and
successive batches explode disjoint ring ranges — so no dedup exchange is
needed (callers must pass unique build ids; duplicate build ids fed the
old dedup an arbitrary-winner nondeterminism anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import cells as C
from ..functions.st import cell_ixy_cols, with_cell_from_ixy, with_cell_point


def _offsets_lit(r_lo: int, r_hi: int):
    """Literal array of (dx, dy) Chebyshev offsets with r_lo ≤ max(|dx|,|dy|)
    ≤ r_hi — the ring/disk cell set as data, exploded in the JVM."""
    offs = [
        (dx, dy)
        for dx in range(-r_hi, r_hi + 1)
        for dy in range(-r_hi, r_hi + 1)
        if max(abs(dx), abs(dy)) >= r_lo
    ]
    return F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in offs
        ]
    )


def within_distance_join(
    probes: DataFrame,
    build: DataFrame,
    probe_id: str,
    build_id: str,
    radius: float,
    res: int,
    probe_x: str = "x",
    probe_y: str = "y",
    build_x: str = "x",
    build_y: str = "y",
    broadcast_build: bool = True,
) -> DataFrame:
    """All (probe, build) pairs within Euclidean `radius` (range join).

    The join runs at an *effective* resolution coarsened until the radius
    fits inside one cell, so the build side explodes over a fixed 3×3 disk
    (9 cells) — never a ⌈radius/cell⌉-ring disk whose (2n+1)² blowup
    multiplied the broadcast build side when the caller's `res` was fine
    relative to the radius (the r2 radius_join regression). Any in-radius
    pair differs by ≤1 cell in Chebyshev distance at the effective
    resolution, so the 3×3 disk is cover-exact; the exact distance filter
    refines. This is the distributed analogue of the expanding-buffer
    candidate search at `prclz/reblock/_reblock_graph.py:473-502` for a
    fixed radius."""
    import numpy as np

    # coarsest-dimension cell height is 180/2^r; want cell ≥ radius
    max_res_for_radius = int(np.floor(np.log2(max(1.0, 180.0 / max(radius, 1e-300)))))
    res_eff = int(np.clip(min(res, max_res_for_radius), 0, C.MAX_RES))
    n = 1 << res_eff

    p = with_cell_point(
        probes.select(
            F.col(probe_id).alias("_pid"),
            F.col(probe_x).alias("_px"),
            F.col(probe_y).alias("_py"),
        ),
        res_eff, "_px", "_py", "cell",
    )
    b = build.select(
        F.col(build_id).alias("_bid"), F.col(build_x).alias("_bx"), F.col(build_y).alias("_by")
    )
    bix, biy = cell_ixy_cols(res_eff, F.col("_bx"), F.col("_by"))
    b = (
        b.withColumn("_bix", bix)
        .withColumn("_biy", biy)
        .withColumn("_o", F.explode(_offsets_lit(0, 1)))
        .withColumn("_cix", F.col("_bix") + F.col("_o.dx"))
        .withColumn("_ciy", F.col("_biy") + F.col("_o.dy"))
        .filter(
            (F.col("_cix") >= 0) & (F.col("_cix") < n)
            & (F.col("_ciy") >= 0) & (F.col("_ciy") < n)
        )
    )
    b = with_cell_from_ixy(b, res_eff, "_cix", "_ciy", "cell").select(
        "_bid", "_bx", "_by", "cell"
    )
    if broadcast_build:
        b = F.broadcast(b)
    dist = F.sqrt((F.col("_px") - F.col("_bx")) ** 2 + (F.col("_py") - F.col("_by")) ** 2)
    # a (probe, build) pair meets exactly once (probe has ONE cell; the
    # build's 9 disk cells are distinct) — no dedup exchange needed
    return (
        p.join(b, "cell", "inner")
        .withColumn("dist", dist)
        .filter(F.col("dist") <= radius)
        .select(F.col("_pid").alias(probe_id), F.col("_bid").alias(build_id), "dist")
    )


def knn_join(
    probes: DataFrame,
    build: DataFrame,
    probe_id: str,
    build_id: str,
    k: int,
    res: int,
    probe_x: str = "x",
    probe_y: str = "y",
    build_x: str = "x",
    build_y: str = "y",
    max_ring: int = 12,
    broadcast_build: bool = True,
) -> DataFrame:
    """Top-k nearest build points per probe point.

    Returns (probe_id, build_id, dist, rank) with rank 1..k by Euclidean
    distance (ties broken by build_id for determinism, mirroring the
    reference's stable rtree ordering)."""
    w_cell = min(C._cell_w(res), C._cell_h(res))
    n = 1 << res

    p0 = probes.select(
        F.col(probe_id).alias("_pid"),
        F.col(probe_x).alias("_px"),
        F.col(probe_y).alias("_py"),
    )
    pix, piy = cell_ixy_cols(res, F.col("_px"), F.col("_py"))
    p0 = p0.withColumn("_pix", pix).withColumn("_piy", piy)
    b0 = with_cell_point(
        build.select(
            F.col(build_id).alias("_bid"),
            F.col(build_x).alias("_bx"),
            F.col(build_y).alias("_by"),
        ),
        res, "_bx", "_by", "cell",
    )
    if broadcast_build:
        b0 = F.broadcast(b0)

    dist = F.sqrt(
        (F.col("_px") - F.col("_bx")) ** 2 + (F.col("_py") - F.col("_by")) ** 2
    ).alias("dist")

    def probe_cells(src: DataFrame, r_lo: int, r_hi: int) -> DataFrame:
        e = (
            src.withColumn("_o", F.explode(_offsets_lit(r_lo, r_hi)))
            .withColumn("_cix", F.col("_pix") + F.col("_o.dx"))
            .withColumn("_ciy", F.col("_piy") + F.col("_o.dy"))
            .filter(
                (F.col("_cix") >= 0) & (F.col("_cix") < n)
                & (F.col("_ciy") >= 0) & (F.col("_ciy") < n)
            )
        )
        return with_cell_from_ixy(e, res, "_cix", "_ciy", "cell").select(
            "_pid", "_px", "_py", "_pix", "_piy", "cell"
        )

    # Batched expansion: the first pass probes the full disk(r_batch) in ONE
    # join (at a well-chosen resolution ~k candidates live within a ring or
    # two, so the common case is a single pass with no driver iteration);
    # only probes whose k-th candidate is not yet PROVEN nearest (bound:
    # kdist ≤ r·cell_size) go into further batches.
    r_batch = 2
    unsat = p0
    acc: DataFrame | None = None
    topk: DataFrame | None = None
    r_done = -1
    w = Window.partitionBy("_pid").orderBy(F.col("dist").asc(), F.col("_bid").asc())
    wp = Window.partitionBy("_pid")
    while r_done < max_ring:
        r_lo, r_hi = r_done + 1, min(r_done + 1 + r_batch, max_ring)
        cand = probe_cells(unsat, r_lo, r_hi).join(b0, "cell", "inner").select(
            "_pid", "_bid", dist
        )
        acc = cand if acc is None else acc.unionByName(cand)
        r_done = r_hi
        # ONE window pass yields the top-k AND the per-probe proof facts:
        # the k-th candidate distance is max(dist) over the kept rows and
        # "has k candidates" is their count — both computed over the same
        # partitioning (no extra exchange). The materialized checkpoint is
        # ≤ k rows per probe and IS the final answer when every probe is
        # proven — the former shape checkpointed the full candidate set and
        # ran the proof as a second full window.
        topk = (
            acc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .withColumn("_nc", F.count(F.lit(1)).over(wp))
            .withColumn("_kd", F.max("dist").over(wp))
            .localCheckpoint(eager=True)
        )
        proven = (
            topk.filter((F.col("_nc") >= k) & (F.col("_kd") <= F.lit(r_done * w_cell)))
            .select("_pid")
            .distinct()
        )
        unsat = unsat.join(F.broadcast(proven), "_pid", "left_anti")
        if unsat.isEmpty():
            break
        # looping again: truncate acc's growing lineage (lazy — only pays
        # if the next iteration actually computes it)
        acc = acc.localCheckpoint(eager=False)

    return topk.select(
        F.col("_pid").alias(probe_id),
        F.col("_bid").alias(build_id),
        F.col("dist"),
        F.col("rank"),
    )
