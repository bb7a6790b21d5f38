"""Explicit StructTypes for every logical table (SURVEY.md §1.3: the
reference's schemas are implicit pandas columns; here they are declared once
and inference is never used)."""

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _f(name, t, nullable=True):
    return StructField(name, t, nullable)


# --- geo tables (fixtures 1-5 in FIXTURES.md) ------------------------------

LINES = StructType([
    _f("osm_id", StringType(), False),
    _f("highway", StringType()),
    _f("natural", StringType()),
    _f("waterway", StringType()),
    _f("geometry", BinaryType(), False),  # WKB LineString
])

GADM = StructType([
    _f("gadm", StringType(), False),      # e.g. 'DJI.1.1_1'
    _f("gid_0", StringType()),
    _f("geometry", BinaryType(), False),  # WKB Polygon/MultiPolygon
])

BUILDINGS = StructType([
    _f("osm_id", StringType(), False),
    _f("building", StringType()),
    _f("gadm_code", StringType()),
    _f("geometry", BinaryType(), False),
])

BLOCKS = StructType([
    _f("block_id", StringType(), False),  # f"{gadm}_{i}" (prclz/blocks/_extract_blocks.py:36-37)
    _f("gadm", StringType(), False),
    _f("geometry", BinaryType(), False),
])

PARCELS = StructType([
    _f("block_id", StringType(), False),
    _f("parcel_id", LongType(), False),
    _f("geometry", BinaryType(), False),
])

COMPLEXITY = StructType([
    _f("block_id", StringType(), False),
    _f("geometry", BinaryType(), False),
    _f("complexity", IntegerType(), False),
    _f("centroids_multipoint", BinaryType(), False),
])

REBLOCK = StructType([
    _f("block_id", StringType(), False),
    _f("road_type", StringType(), False),  # 'new' | 'existing' (prclz/reblock/_reblock.py:356-373)
    _f("geometry", BinaryType(), False),
])

REBLOCK_SUMMARY = StructType([
    _f("block_id", StringType(), False),
    _f("num_graph_comps", IntegerType()),
    _f("node_count_pre", IntegerType()),
    _f("node_count_post", IntegerType()),
    _f("edge_count_pre", IntegerType()),
    _f("edge_count_post", IntegerType()),
    _f("bldg_count", IntegerType()),
    _f("num_block_coords", IntegerType()),
    _f("num_block_coords_unmatched", IntegerType()),
])

# --- image table (BASELINE.json input_hint, Iceberg-shaped) ----------------

IMAGES = StructType([
    _f("image_id", StringType(), False),
    _f("bytes", BinaryType(), False),
    _f("w", IntegerType(), False),
    _f("h", IntegerType(), False),
    _f("fmt", StringType(), False),      # 'png' | 'jpeg'
    _f("caption", StringType(), False),
    _f("phash", LongType(), False),
])

# --- lineage ledger (SURVEY.md §4 item 4) ----------------------------------

LEDGER = StructType([
    _f("stage", StringType(), False),
    _f("partition_key", StringType(), False),
    _f("status", StringType(), False),   # 'ok' | 'error'
    _f("n_rows", LongType()),
    _f("wall_ms", DoubleType()),
    _f("attempt", IntegerType()),
    _f("error", StringType()),
])
