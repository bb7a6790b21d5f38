"""Streaming/batch equivalence on the events table."""

from pyspark.sql import functions as F

from prclz_spark.streaming.events import (
    hourly_rollup,
    read_events_stream,
    run_available_now,
    user_sessions,
)

SF_DIR = "/root/testdata/sf0.001"


def _events_dir(tmp_path):
    """The file source needs a DIRECTORY; stage the single parquet file."""
    import os

    d = tmp_path / "events_stream"
    d.mkdir()
    os.symlink(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_hourly_rollup_matches_batch(spark, tmp_path):
    stream = read_events_stream(spark, _events_dir(tmp_path))
    got = run_available_now(hourly_rollup(stream), "hourly_test").toPandas()
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
        .toPandas()
    )
    key = ["hour", "event_type"]
    g = got.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(g) == len(b) > 0
    assert (g[key].values == b[key].values).all()
    assert (g.n.values == b.n.values).all()
    assert abs(g.value_sum - b.value_sum).max() < 1e-9


def test_user_sessions_stream_runs(spark, tmp_path):
    stream = read_events_stream(spark, _events_dir(tmp_path))
    out = run_available_now(user_sessions(stream), "sessions_test").toPandas()
    assert len(out) > 0
    assert (out.n_events >= 1).all()
    assert (out.session_end > out.session_start).all()
