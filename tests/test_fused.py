"""Fused region pipeline ≡ staged pipeline (same rows, same k, same ids)."""

import numpy as np

from prclz_spark import cells as C
from prclz_spark import fixtures as FX
from prclz_spark import geom as G
from prclz_spark.operators.blocks import extract_blocks
from prclz_spark.operators.complexity import k_complexity
from prclz_spark.operators.fused import fused_blocks_k


def test_fused_equals_staged(spark):
    nx = 6
    lines, gadm, bldgs = FX.geo_world(spark, nx, nx)
    res = C.choose_resolution(*FX.grid_params(nx, nx), n_features=nx * nx * 4)

    blocks = extract_blocks(lines, gadm, res).cache()
    staged = k_complexity(blocks, bldgs, res).toPandas().set_index("block_id")
    fused = fused_blocks_k(lines, gadm, bldgs, res).toPandas().set_index("block_id")

    assert set(staged.index) == set(fused.index)
    for bid in staged.index:
        assert staged.loc[bid, "complexity"] == fused.loc[bid, "complexity"], bid
        a = np.asarray(G.wkb_loads(bytes(staged.loc[bid, "centroids_multipoint"])).data)
        b = np.asarray(G.wkb_loads(bytes(fused.loc[bid, "centroids_multipoint"])).data)
        sa = {(round(x, 9), round(y, 9)) for x, y in a.reshape(-1, 2)}
        sb = {(round(x, 9), round(y, 9)) for x, y in b.reshape(-1, 2)}
        assert sa == sb, bid
