"""Streaming spatial assignment: continuous PIP of a point/tile feed
against a broadcast polygon dimension.

The reference is batch-only; at 10^12-image scale the tile feed is a
stream (new imagery lands continuously) while the polygon side (GADM
regions / street blocks) is a slowly-changing dimension. The batch PIP
join (operators/sjoin.pip_join) is stateless per row — probe-side single
cell + broadcast cover-exploded build side — so the SAME plan runs
unchanged under Structured Streaming: scan → narrow UDF → broadcast hash
join → filter, no stateful operator, no watermark needed for the join
itself. Windowed per-region rates stack a watermarked aggregation on top.

Correctness strategy (tests/test_streaming.py): drain with
trigger(availableNow=True) and assert equality with the batch pip_join on
the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sjoin import pip_join

POINTS_SCHEMA = "event_id long, ts timestamp, x double, y double"


def read_points_stream(spark: SparkSession, path: str, schema: str = POINTS_SCHEMA) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def stream_pip_assign(
    points: DataFrame,
    polys: DataFrame,
    point_id: str,
    poly_id: str,
    res: int,
) -> DataFrame:
    """Continuous point→polygon assignment. `points` may be a streaming
    DataFrame; `polys` must be a (small) batch dimension — it is
    cover-exploded and broadcast, exactly as in the batch plan."""
    return pip_join(points, polys, point_id, poly_id, res=res, how="inner")


def region_rates(
    assigned: DataFrame,
    poly_id: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed arrivals per region on top of the streaming assignment."""
    return (
        assigned.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), poly_id)
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH").alias("hour"),
            poly_id,
            "n",
        )
    )
