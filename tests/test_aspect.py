"""Aspect bucketing + batch formation (operators/aspect.py)."""

import math

import numpy as np
from pyspark.sql import functions as F

from prclz_spark.operators.aspect import (
    assign_aspect_buckets,
    form_batches,
    make_aspect_buckets,
)


def test_make_aspect_buckets_ladder():
    bs = make_aspect_buckets(max_pixels=512 * 512, min_dim=256, max_dim=1024, step=64)
    assert bs
    for w, h in bs:
        assert w * h <= 512 * 512
        assert w % 64 == 0 and h % 64 == 0
        assert 256 <= w <= 1024 and 256 <= h <= 1024
        assert (h, w) in bs  # transpose closure
    assert (512, 512) in bs
    assert len(bs) == len(set(bs))


def test_assignment_matches_numpy_argmin(spark):
    buckets = make_aspect_buckets(max_pixels=512 * 512, min_dim=256, max_dim=1024)
    rng = np.random.default_rng(3)
    rows = [
        (i, int(rng.integers(100, 3000)), int(rng.integers(100, 3000)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "image_id long, w int, h int")
    got = {
        r["image_id"]: r["aspect_idx"]
        for r in assign_aspect_buckets(df, buckets).collect()
    }
    lars = np.array([math.log(bw / bh) for bw, bh in buckets])
    for i, w, h in rows:
        d = np.abs(lars - math.log(w / h))
        want = int(np.flatnonzero(d == d.min()).min())  # tie -> lower index
        assert got[i] == want, (i, w, h)


def _imgs(spark, n=500, parts=4):
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("image_id"),
        (F.lit(200) + (F.col("id") % 7) * 100).cast("int").alias("w"),
        (F.lit(200) + (F.col("id") % 3) * 150).cast("int").alias("h"),
    )


def test_form_batches_exact_and_deterministic(spark):
    buckets = make_aspect_buckets(max_pixels=512 * 512, min_dim=256, max_dim=1024)
    imgs = _imgs(spark)
    out = form_batches(imgs, buckets, batch_size=8, n_chunks=4).cache()
    pdf = out.toPandas()
    assert len(pdf) == 500 and pdf.image_id.nunique() == 500
    g = pdf.groupby("batch_id")
    sizes = g.size()
    full = pdf[~pdf.partial].groupby("batch_id").size()
    assert (full == 8).all()
    # each batch is homogeneous in aspect bucket; slots are 0..size-1
    assert (g["aspect_idx"].nunique() == 1).all()
    for _, grp in g:
        assert sorted(grp.slot.tolist()) == list(range(len(grp)))
    # <= 1 partial batch per (aspect, chunk): chunk = bits 20..43 of batch_id
    part = pdf[pdf.partial].copy()
    part["chunk"] = (part.batch_id // (1 << 20)) % (1 << 24)
    assert part.groupby(["aspect_idx", "chunk"])["batch_id"].nunique().le(1).all()

    # determinism across partitioning: same output on a 13-way repartition
    out2 = form_batches(imgs.repartition(13), buckets, batch_size=8, n_chunks=4)
    pdf2 = out2.toPandas().sort_values("image_id").reset_index(drop=True)
    pdf1 = pdf.sort_values("image_id").reset_index(drop=True)
    assert pdf1.equals(pdf2)


def test_form_batches_on_images_table(spark):
    from prclz_spark.images import images_table

    imgs = images_table(spark, 96, w=64, h=64)
    buckets = [(64, 64), (96, 48), (48, 96)]
    out = form_batches(imgs, buckets, batch_size=16, n_chunks=2)
    pdf = out.toPandas()
    assert len(pdf) == 96
    assert (pdf.aspect_idx == 0).all()  # 64x64 -> exact-match bucket (64,64)
    assert pdf[~pdf.partial].groupby("batch_id").size().eq(16).all()


def test_cli_aspect_batches(spark, tmp_path):
    from prclz_spark import cli
    from prclz_spark.images import images_table

    images_table(spark, 64, w=64, h=64).write.parquet(str(tmp_path / "imgs.pq"))
    cli.main([
        "aspect-batches", "--images", str(tmp_path / "imgs.pq"),
        "--batch-size", "8", "--buckets", "64x64,96x48,48x96",
        "--out", str(tmp_path / "batches.pq"),
    ])
    out = spark.read.parquet(str(tmp_path / "batches.pq"))
    pdf = out.toPandas()
    assert len(pdf) == 64
    assert (pdf.aspect_idx == 0).all()
    assert pdf[~pdf.partial].groupby("batch_id").size().eq(8).all()


def test_corrupt_dimensions_null_and_excluded(spark):
    """NULL-on-bad-row: h=0 / w=0 / NULL dims must neither kill the job
    (ANSI DIVIDE_BY_ZERO) nor silently land in ladder bucket 0 — they get
    NULL assignment and are excluded from batches."""
    buckets = make_aspect_buckets(max_pixels=512 * 512, min_dim=256, max_dim=1024)
    rows = [(1, 640, 480), (2, 0, 480), (3, 480, 0), (4, None, 480), (5, 640, None)]
    df = spark.createDataFrame(rows, "image_id long, w int, h int")
    got = {r["image_id"]: r["aspect_idx"] for r in assign_aspect_buckets(df, buckets).collect()}
    assert got[1] is not None
    assert got[2] is None and got[3] is None and got[4] is None and got[5] is None
    out = form_batches(df, buckets, batch_size=2, n_chunks=1).toPandas()
    assert set(out.image_id) == {1}
