"""End-to-end image-corpus curation: the north-star composition.

ingest (exactly-once foreachBatch into iceberg-lite) → phash near-dup
clustering → keep-BEST verdict (highest resolution survives, not
earliest id) → iceberg row-level delete of the losers → aspect-bucketed
training batches over the surviving table. Every stage is an existing
operator; this test pins that they compose over the input-hint image
schema (string ids, bytes+phash columns) without glue code."""

import pyspark.sql.functions as F

from prclz_spark.images import images_table
from prclz_spark.operators.aspect import form_batches
from prclz_spark.operators.components import dedup_cluster_verdict_by
from prclz_spark.operators.dedup import (
    _sign_phash_frame,
    phash_near_pairs_from_sigs,
)
from prclz_spark.sources import iceberg_lite as IL
from prclz_spark.streaming.ingest import iceberg_batch_sink


def test_image_curation_pipeline(spark, tmp_path):
    t = str(tmp_path / "images_tbl")

    # --- day 0 + day 1 ingest: 60 originals, plus low-res re-crawls of
    # the first 10 (SAME bytes+phash, smaller advertised w/h, new ids —
    # a thumbnail mirror) arriving in the second micro-batch
    base = images_table(spark, 60, w=64, h=64)
    dupes = base.filter(F.col("image_id") < "img_00000010").select(
        F.concat(F.lit("thumb_"), "image_id").alias("image_id"),
        "bytes",
        (F.col("w") / 2).cast("int").alias("w"),
        (F.col("h") / 2).cast("int").alias("h"),
        "fmt", "caption", "phash",
    )
    sink = iceberg_batch_sink(t, "crawl", stats_cols=None)
    sink(base, 0)
    sink(dupes, 1)
    sink(dupes, 1)  # crash-replay of batch 1 must be a no-op
    tbl = IL.read(spark, t)
    assert tbl.count() == 70

    # --- phash clustering + keep-best (highest w*h wins, NOT min id:
    # "thumb_*" sorts after "img_*", min-id would keep the original
    # anyway — so flip it: make the thumbnail the min id to prove the
    # score decides, not the id)
    sigs = _sign_phash_frame(tbl, "image_id")
    pairs = phash_near_pairs_from_sigs(sigs, "image_id", max_hamming=0)
    assert pairs.count() == 10  # each thumb pairs its original
    scores = tbl.select("image_id", (F.col("w") * F.col("h")).alias("pixels"))
    verdict = dedup_cluster_verdict_by(
        pairs, scores, "image_id", "pixels", a="id_a", b="id_b"
    )
    losers = verdict.filter(~F.col("keep")).select(F.col("id").alias("image_id"))
    lose_ids = {r["image_id"] for r in losers.collect()}
    assert lose_ids == {f"thumb_img_{i:08d}" for i in range(10)}

    # --- iceberg row-level delete of the losers, then maintenance
    IL.delete_rows(losers, t, "image_id")
    survivors = IL.read(spark, t)
    assert survivors.count() == 60
    assert survivors.filter(F.col("image_id").startswith("thumb_")).count() == 0
    IL.rewrite_data_files(spark, t)
    assert IL.read(spark, t).count() == 60

    # --- aspect-bucketed training batches over the curated table
    batches = form_batches(
        IL.read(spark, t), [(64, 64), (96, 48), (48, 96)],
        batch_size=16, n_chunks=2,
    )
    pdf = batches.toPandas()
    assert len(pdf) == 60 and pdf.image_id.nunique() == 60
    assert (pdf.aspect_idx == 0).all()
    assert pdf[~pdf.partial].groupby("batch_id").size().eq(16).all()


def test_cli_curate_images(spark, tmp_path):
    from prclz_spark import cli

    t = str(tmp_path / "tbl")
    base = images_table(spark, 48, w=64, h=64)
    dupes = base.filter(F.col("image_id") < "img_00000008").select(
        F.concat(F.lit("thumb_"), "image_id").alias("image_id"),
        "bytes", (F.col("w") / 2).cast("int").alias("w"),
        (F.col("h") / 2).cast("int").alias("h"), "fmt", "caption", "phash",
    )
    sink = iceberg_batch_sink(t, "crawl")
    sink(base.unionByName(dupes), 0)

    # eval set: the phashes of 4 other originals -> decontamination
    base.filter(
        (F.col("image_id") >= "img_00000020") & (F.col("image_id") < "img_00000024")
    ).select("image_id", "phash").write.parquet(str(tmp_path / "eval.pq"))

    cli.main([
        "curate-images", "--table", t, "--eval", str(tmp_path / "eval.pq"),
        "--max-hamming", "0", "--batch-size", "8",
        "--batches-out", str(tmp_path / "batches.pq"),
    ])
    live = IL.read(spark, t)
    ids = {r["image_id"] for r in live.select("image_id").collect()}
    assert not any(i.startswith("thumb_") for i in ids)       # dups gone
    assert not any("img_0000002" + c in ids for c in "0123")  # contam gone
    assert len(ids) == 48 + 8 - 8 - 4  # originals + thumbs - dups - contam
    b = spark.read.parquet(str(tmp_path / "batches.pq"))
    assert b.count() == 44


def test_cli_curate_images_caption_dedup(spark, tmp_path):
    """--caption-dedup: cross-modal clustering. A re-captioned identical
    photo (image edge) AND a re-hosted different photo carrying a cloned
    caption (caption edge) both lose to the best-resolution original;
    phash-only curation would miss the second family."""
    from prclz_spark import cli

    t = str(tmp_path / "tbl")
    pool = images_table(spark, 60, w=64, h=64).cache()

    def recap(df, salt):
        # unique pseudo-random captions — the fixture's templated captions
        # are organically near-identical and would cluster EVERYTHING
        return df.withColumn(
            "caption",
            F.concat_ws(" ", *[
                F.sha2(F.concat(F.lit(f"{salt}{i}-"), "image_id"), 256)
                for i in range(3)
            ]),
        )

    base = recap(pool.filter(F.col("image_id") < "img_00000040"), "c")
    # image-dup mirrors of the first 4, RE-CAPTIONED (caption edge absent)
    thumbs = recap(
        base.filter(F.col("image_id") < "img_00000004").select(
            F.concat(F.lit("thumb_"), "image_id").alias("image_id"),
            "bytes", (F.col("w") / 2).cast("int").alias("w"),
            (F.col("h") / 2).cast("int").alias("h"), "fmt", "caption", "phash",
        ),
        "t",
    )
    # caption-dup re-hosts: DIFFERENT photos (donor rows 48-51, not in the
    # table) carrying the captions of rows 20-23, at lower resolution
    donor_rows = pool.filter(
        (F.col("image_id") >= "img_00000048") & (F.col("image_id") < "img_00000052")
    ).select("image_id", "bytes", "fmt", "phash").collect()
    cap_rows = base.filter(
        (F.col("image_id") >= "img_00000020") & (F.col("image_id") < "img_00000024")
    ).select("image_id", "caption").collect()
    capdups = spark.createDataFrame(
        [
            (f"zcapdup_{k}", d["bytes"], 32, 32, d["fmt"], c["caption"], d["phash"])
            for k, (d, c) in enumerate(zip(donor_rows, cap_rows))
        ],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )

    sink = iceberg_batch_sink(t, "crawl")
    sink(base.unionByName(thumbs).unionByName(capdups), 0)
    assert IL.read(spark, t).count() == 48

    cli.main([
        "curate-images", "--table", t, "--max-hamming", "0",
        "--caption-dedup",
    ])
    ids = {r["image_id"] for r in IL.read(spark, t).select("image_id").collect()}
    assert not any(i.startswith("thumb_") for i in ids)
    assert not any(i.startswith("zcapdup_") for i in ids)
    # every original survived — incl. the caption donors 20-23
    assert len(ids) == 40
    assert {f"img_{i:08d}" for i in range(20, 24)} <= ids


def test_cli_curate_images_batch_incremental(spark, tmp_path):
    """Incremental image curation (r7): per-batch dedup against the
    accumulated phash + caption fingerprint corpora (never a whole-table
    re-cluster), eval decontamination, exactly-once appends. Re-crawls of
    previously-seen images — including a contaminated one — die against
    the corpus; replay moves no snapshot."""
    from prclz_spark import cli

    t = str(tmp_path / "tbl")
    pool = images_table(spark, 60, w=64, h=64).cache()

    def recap(df, salt):
        return df.withColumn(
            "caption",
            F.concat_ws(" ", *[
                F.sha2(F.concat(F.lit(f"{salt}{i}-"), "image_id"), 256)
                for i in range(3)
            ]),
        )

    base = recap(pool.filter(F.col("image_id") < "img_00000030"), "c")
    # eval set: pool rows 50-53 (never in any batch)
    pool.filter(
        (F.col("image_id") >= "img_00000050") & (F.col("image_id") < "img_00000054")
    ).select("image_id", "phash").write.parquet(str(tmp_path / "eval.pq"))

    # batch 0: 30 originals + a thumb dup of row 0 + a contaminated row
    # (the bytes/phash of eval image 50 under a train id)
    thumb = recap(base.limit(1).select(
        F.concat(F.lit("thumb_"), "image_id").alias("image_id"), "bytes",
        (F.col("w") / 2).cast("int").alias("w"),
        (F.col("h") / 2).cast("int").alias("h"), "fmt", "caption", "phash",
    ), "t")
    contam = recap(pool.filter(F.col("image_id") == "img_00000050").select(
        F.lit("contam_a").alias("image_id"), "bytes", "w", "h", "fmt",
        "caption", "phash",
    ), "x")
    b0 = str(tmp_path / "b0.pq")
    base.unionByName(thumb).unionByName(contam).write.parquet(b0)

    args0 = ["curate-images-batch", "--table", t, "--batch", b0,
             "--batch-id", "0", "--caption-dedup", "--max-hamming", "0",
             "--eval", str(tmp_path / "eval.pq")]
    cli.main(args0)
    ids = {r["image_id"] for r in IL.read(spark, t).select("image_id").collect()}
    assert len(ids) == 30 and "contam_a" not in ids
    assert not any(i.startswith("thumb_") for i in ids)

    # batch 1: 3 fresh (30-32), a re-crawl of row 5 (new id, same image),
    # a re-crawl of the CONTAMINATED image (must die at the phash tier —
    # its fingerprint entered the corpus even though the table never
    # carried it), and a caption clone of row 10 on a fresh image (donor
    # 55) that only the caption tier can catch
    fresh = recap(pool.filter(
        (F.col("image_id") >= "img_00000030") & (F.col("image_id") < "img_00000033")
    ), "c")
    recrawl = recap(pool.filter(F.col("image_id") == "img_00000005").select(
        F.lit("re_5").alias("image_id"), "bytes", "w", "h", "fmt",
        "caption", "phash"), "r")
    recontam = recap(pool.filter(F.col("image_id") == "img_00000050").select(
        F.lit("contam_b").alias("image_id"), "bytes", "w", "h", "fmt",
        "caption", "phash"), "y")
    cap10 = base.filter(F.col("image_id") == "img_00000010").select(
        F.col("caption").alias("_cap"))
    capclone = pool.filter(F.col("image_id") == "img_00000055").crossJoin(
        cap10
    ).select(
        F.lit("capclone").alias("image_id"), "bytes", "w", "h", "fmt",
        F.col("_cap").alias("caption"), "phash",
    )
    b1 = str(tmp_path / "b1.pq")
    fresh.unionByName(recrawl).unionByName(recontam).unionByName(
        capclone).write.parquet(b1)

    args1 = ["curate-images-batch", "--table", t, "--batch", b1,
             "--batch-id", "1", "--caption-dedup", "--max-hamming", "0",
             "--eval", str(tmp_path / "eval.pq")]
    cli.main(args1)
    ids1 = {r["image_id"] for r in IL.read(spark, t).select("image_id").collect()}
    assert ids1 - ids == {"img_00000030", "img_00000031", "img_00000032"}

    # full replay of batch 1: no snapshot moves on any table
    snaps = {
        pth: IL.current_snapshot(pth)
        for pth in (t, t + "_fp/phash", t + "_fp/minhash")
    }
    cli.main(args1)
    for pth, s in snaps.items():
        assert IL.current_snapshot(pth) == s, pth
