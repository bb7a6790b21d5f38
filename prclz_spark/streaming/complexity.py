"""Streaming INCREMENTAL k-complexity: a custom stateful operator.

The reference computes k-complexity in one batch pass (`prclz/_complexity.py`).
At 10¹²-image scale new building footprints land continuously; recomputing
every block per trigger is O(all blocks), but only blocks that RECEIVED a
building this trigger can change. This operator keeps the per-block centroid
set as **explicit stream state** (`applyInPandasWithState` — Spark's
arbitrary-stateful-processing surface, the one piece of §2.8 the built-in
windowed aggregations cannot express) and re-runs the weak-dual kernel only
for touched blocks:

    state per block_id : (block ring WKB, accumulated centroid doubles)
    on trigger         : append the batch's centroids (same in-kernel exact
                         PIP refine as the batch path), recompute k, emit
                         (block_id, n_bldgs, complexity), update state
    eviction           : optional processing-time timeout — a block idle
                         longer than `idle_timeout_ms` is dropped from the
                         store (its k is final unless new buildings arrive,
                         in which case it restarts from the new arrivals).

Equivalence contract (tests/test_streaming.py): after draining a finite
stream, the LAST emitted row per block equals the batch `k_complexity` on
the union of all events — the stream is a refinement of the batch result,
trigger by trigger.

State is bounded by building count per block (centroid pairs, 16 B each),
the same working set the batch kernel holds per group; the shuffle key is
block_id exactly as in the batch plan, so a megacity block is one state
row, not a hot partition.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .. import geom as G
from ..kernels import planar as P

_OUT_SCHEMA = "block_id string, n_bldgs int, complexity int"
_STATE_SCHEMA = "ring binary, pts binary"


def _k_state_func(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    block_id = key[0]
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        ring_wkb, pts_b = state.get
        pts = np.frombuffer(pts_b, dtype=np.float64).reshape(-1, 2) if pts_b else np.zeros((0, 2))
    else:
        ring_wkb, pts = None, np.zeros((0, 2))
    new = []
    for pdf in pdfs:
        if ring_wkb is None and len(pdf):
            ring_wkb = bytes(pdf["block_geom"].iloc[0])
        if len(pdf):
            new.append(pdf[["x", "y"]].to_numpy(dtype=np.float64))
    if new:
        pts = np.vstack([pts] + new)
    if ring_wkb is None or not len(pts):
        return
    block = G.wkb_loads(ring_wkb)
    ring = block.data[0] if block.kind == G.POLYGON else block.data[0][0]
    # same exact in-kernel PIP refine as the batch _k_kernel
    mask = G.points_in_polygon_bulk(pts[:, 0], pts[:, 1], block)
    kept = pts[mask]
    if not len(kept):
        return
    k = P.block_complexity(np.asarray(ring, dtype=np.float64), kept)
    state.update((ring_wkb, kept.tobytes()))
    yield pd.DataFrame(
        [(block_id, int(len(kept)), int(k))],
        columns=["block_id", "n_bldgs", "complexity"],
    )


def stream_k_complexity(
    assigned: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """assigned: streaming (block_id, block_geom, x, y) — e.g. the output of
    `stream_pip_assign(..., keep_poly_geom='block_geom')`. Emits an updated
    (block_id, n_bldgs, complexity) row whenever a block receives buildings."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs, state):
        for out in _k_state_func(key, pdfs, state):
            # set AFTER state.update (a timeout needs live state to attach to)
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)
            yield out

    return (
        assigned.groupBy("block_id")
        .applyInPandasWithState(fn, _OUT_SCHEMA, _STATE_SCHEMA, "update", timeout)
    )
