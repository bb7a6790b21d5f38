"""Raster↔vector tiling over the images table (SURVEY.md §4 item 5).

Georeferenced image tiles stand in for building/block rasters (BASELINE.json
north_star): each image tile gets a deterministic footprint from its
image_id — row-major placement into the geo fixture box, T tiles per side —
so tile↔block/region assignment has a closed-form expected answer
(FIXTURES.md §9) and every prclz spatial operator has an image-table
analogue:

* tile → footprint polygon      (vector side of the tile)
* tile ⋈ polygon assignment     (the same cover-cell join as buildings)
* rasterize(polygon, tile)      (vector → raster: per-pixel PIP mask,
                                 vectorized ray cast)
* mask statistics               (coverage fraction per tile per polygon)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import fixtures as FX
from . import geom as G
from .operators.sjoin import pip_join


def tile_grid_params(n_tiles_side: int, nx: int, ny: int):
    """Tiles tile the same box as the street grid (FIXTURES.md §9)."""
    x0, y0, x1, y1 = FX.grid_params(nx, ny)
    tw = (x1 - x0) / n_tiles_side
    th = (y1 - y0) / n_tiles_side
    return x0, y0, tw, th


def tile_footprint(image_idx: int, n_tiles_side: int, nx: int, ny: int) -> G.Geom:
    x0, y0, tw, th = tile_grid_params(n_tiles_side, nx, ny)
    ci, cj = divmod(image_idx % (n_tiles_side * n_tiles_side), n_tiles_side)
    return G.box(x0 + ci * tw, y0 + cj * th, x0 + (ci + 1) * tw, y0 + (cj + 1) * th)


def with_footprints(images: DataFrame, n_tiles_side: int, nx: int, ny: int) -> DataFrame:
    """images + (geometry WKB footprint, x/y tile center) columns — one
    Arrow phase."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType, DoubleType, StructField, StructType

    schema = StructType(
        [
            StructField("geometry", BinaryType()),
            StructField("x", DoubleType()),
            StructField("y", DoubleType()),
        ]
    )

    @pandas_udf(schema)
    def _fp(image_id: pd.Series) -> pd.DataFrame:
        geoms, xs, ys = [], [], []
        for iid in image_id:
            idx = int(str(iid).split("_")[-1])
            g = tile_footprint(idx, n_tiles_side, nx, ny)
            geoms.append(G.wkb_dumps(g))
            c = G.centroid(g)
            xs.append(c[0])
            ys.append(c[1])
        return pd.DataFrame({"geometry": geoms, "x": xs, "y": ys})

    return images.withColumn("_fp", _fp(F.col("image_id"))).select(
        "*", F.col("_fp.geometry").alias("geometry"), F.col("_fp.x").alias("x"), F.col("_fp.y").alias("y")
    ).drop("_fp")


def assign_tiles_to_polys(
    tiles: DataFrame, polys: DataFrame, poly_id: str, res: int, how: str = "inner"
) -> DataFrame:
    """Tile-center point-in-polygon assignment (J4 analogue for rasters).
    Each tile is assigned to the polygon containing its center — the same
    convention as building-centroid→block assignment."""
    return pip_join(
        tiles, polys, "image_id", poly_id, res=res, how=how
    )


def rasterize_mask(poly: G.Geom, tile_geom: G.Geom, w: int, h: int) -> np.ndarray:
    """Vector → raster: boolean HxW mask of pixel centers inside `poly`,
    in the tile's footprint frame (row 0 = north/top)."""
    xmin, ymin, xmax, ymax = G.bounds(tile_geom)
    xs = xmin + (np.arange(w) + 0.5) / w * (xmax - xmin)
    ys = ymax - (np.arange(h) + 0.5) / h * (ymax - ymin)
    gx, gy = np.meshgrid(xs, ys)
    return G.points_in_polygon_bulk(gx.ravel(), gy.ravel(), poly).reshape(h, w)


def block_coverage(tiles_with_blocks: DataFrame, blocks: DataFrame) -> DataFrame:
    """Per (tile, block): fraction of tile pixels inside the block —
    the rasterize step as a grouped Arrow kernel."""
    from pyspark.sql.functions import pandas_udf

    blk = blocks.select("block_id", F.col("geometry").alias("block_geom"))
    joined = tiles_with_blocks.join(F.broadcast(blk), "block_id", "inner")

    @pandas_udf("double")
    def _cov(tile_geom: pd.Series, block_geom: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
        out = []
        tgs = G.wkb_loads_batch(tile_geom)
        bgs = G.wkb_loads_batch(block_geom)
        for tg, bg, ww, hh in zip(tgs, bgs, w, h):
            mask = rasterize_mask(bg, tg, int(ww), int(hh))
            out.append(float(mask.mean()))
        return pd.Series(out)

    return joined.withColumn(
        "coverage", _cov(F.col("geometry"), F.col("block_geom"), F.col("w"), F.col("h"))
    ).select("image_id", "block_id", "coverage")
