"""Multimodal plumbing tests: real resize; stubbed decoders with real
Spark-side schemas/batching (per the build spec's stub contract)."""

import numpy as np
from pyspark.sql import functions as F

from prclz_spark import images as IM
from prclz_spark.media import (
    audio_features,
    make_frame_sampler_udf,
    make_resize_udf,
    resize_pixels,
)


def test_resize_math():
    px = IM.make_pixels(3, 64, 64)
    small = resize_pixels(px, 16, 16)
    assert small.shape == (16, 16, 3)
    # area mean preserves global mean closely
    assert abs(small.mean() - px.mean()) < 1.5
    up = resize_pixels(small, 33, 31)
    assert up.shape == (31, 33, 3)


def test_resize_udf_spark(spark):
    imgs = IM.images_table(spark, 24)
    out = imgs.withColumn("thumb", make_resize_udf(16, 16)(F.col("bytes"), F.col("fmt"))).select(
        "image_id", "thumb"
    )
    pdf = out.toPandas()
    assert len(pdf) == 24
    t = IM.png_decode(bytes(pdf.thumb.iloc[0]))
    assert t.shape == (16, 16, 3)


def test_video_frame_sampler(spark):
    vids = spark.createDataFrame(
        [(f"vid_{i}", 50) for i in range(8)], "video_id string, n_frames int"
    )
    out = vids.withColumn(
        "frames", make_frame_sampler_udf(every_n=10, max_frames=3)(F.col("video_id"), F.col("n_frames"))
    ).select("video_id", F.explode("frames").alias("f")).select("video_id", "f.idx", "f.png")
    pdf = out.toPandas()
    assert len(pdf) == 8 * 3
    assert sorted(pdf[pdf.video_id == "vid_0"].idx) == [0, 10, 20]
    frame = IM.png_decode(bytes(pdf.png.iloc[0]))
    assert frame.shape == (64, 64, 3)
    # determinism: same video id → same frame bytes across runs
    pdf2 = out.toPandas()
    assert bytes(pdf2.png.iloc[0]) == bytes(pdf.png.iloc[0])


def test_audio_features(spark):
    aud = spark.createDataFrame([(f"aud_{i}",) for i in range(16)], "audio_id string")
    pdf = aud.withColumn("feat", audio_features(F.col("audio_id"))).select(
        "audio_id", "feat.*"
    ).toPandas()
    assert len(pdf) == 16
    assert (pdf.rms > 0).all() and (pdf.rms < 1).all()
    assert (pdf.spectral_centroid_hz > 50).all()
