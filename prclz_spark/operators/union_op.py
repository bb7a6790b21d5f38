"""A5 — two-phase global geometry union as an engine operator.

Reference: `prclz/blocks/_extract_blocks.py:34` performs
`unary_union(lines)` / region-level unions on the driver; at 10^12-row
scale a global union must be a distributed two-phase aggregation
(map-side partial combine, then a single reduce), exactly like a SUM:

    phase 1: mapInPandas — union each partition's geometries locally
             (overlay.union fold) → one partial polygon per partition
    phase 2: union the ≤`spark.sql.shuffle.partitions` partials on a
             single task (they are few and small by then)

The per-pair union is kernels/overlay.union (arrangement-based, handles
disjoint/nested inputs). Cost per fold step is O(m²) noding in the
CURRENT accumulated boundary size — appropriate for dimension-sized
inputs (admin regions, block sets), not for 10⁹ probe rows (those never
need a global union).
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import geom as G
from ..kernels import overlay as OV


def _union_fold(geoms):
    gs = [g for g in geoms if g is not None]
    if not gs:
        return None
    return reduce(lambda a, b: OV.overlay(a, b, "union") or a, gs)


def _partial_union_iter(batches):
    acc = None
    for pdf in batches:
        for b in pdf["geometry"]:
            if b is None:
                continue
            g = G.wkb_loads(bytes(b))
            acc = g if acc is None else (OV.overlay(acc, g, "union") or acc)
    if acc is not None:
        yield pd.DataFrame({"geometry": [G.wkb_dumps(acc)]})


def union_all(df: DataFrame, geom_col: str = "geometry") -> G.Geom | None:
    """Distributed `unary_union` of a geometry column; returns the unioned
    Geom (a dimension-sized result that fits the driver by definition)."""
    partials = (
        df.select(F.col(geom_col).alias("geometry"))
        .mapInPandas(_partial_union_iter, "geometry binary")
        .collect()
    )
    return _union_fold([G.wkb_loads(bytes(r["geometry"])) for r in partials])
