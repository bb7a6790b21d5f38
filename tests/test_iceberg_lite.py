"""Iceberg-lite table layer: snapshots, time travel, pruning, atomicity."""

import os

import pytest
from pyspark.sql import functions as F

from prclz_spark.sources import iceberg_lite as IL

DDL = "image_id string, phash bigint"


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.format_string("img_%08d", F.col("id")).alias("image_id"),
        (F.col("id") * 7919).alias("phash"),
    )


def test_snapshots_time_travel_and_union(spark, tmp_path):
    t = str(tmp_path / "tbl")
    IL.create_table(t, DDL)
    assert IL.current_snapshot(t) == -1
    assert IL.read(spark, t).count() == 0

    s0 = IL.append(_frame(spark, 0, 100), t, stats_cols=["phash"])
    s1 = IL.append(_frame(spark, 100, 250), t, stats_cols=["phash"])
    assert (s0, s1) == (0, 1)
    assert IL.read(spark, t).count() == 250
    assert IL.read(spark, t, snapshot=0).count() == 100  # time travel
    # snapshot content is the union of manifests, not a overwrite
    ids = {r.image_id for r in IL.read(spark, t).select("image_id").collect()}
    assert "img_00000000" in ids and "img_00000249" in ids


def test_manifest_pruning_skips_files_but_keeps_answers(spark, tmp_path):
    t = str(tmp_path / "tbl")
    IL.create_table(t, DDL)
    # several appends → disjoint phash ranges across snapshots
    for k in range(4):
        IL.append(
            _frame(spark, k * 50, (k + 1) * 50).repartition(2), t, stats_cols=["phash"]
        )
    all_files = IL.files_at(t)
    lo, hi = 60 * 7919, 90 * 7919
    pruned = IL.files_at(t, prune=("phash", lo, hi))
    assert len(pruned) < len(all_files)  # metadata-side skip happened
    want = (
        IL.read(spark, t).filter((F.col("phash") >= lo) & (F.col("phash") <= hi)).count()
    )
    got = (
        IL.read(spark, t, prune=("phash", lo, hi))
        .filter((F.col("phash") >= lo) & (F.col("phash") <= hi))
        .count()
    )
    assert got == want == 31


def test_schema_enforced_and_orphans_invisible(spark, tmp_path):
    t = str(tmp_path / "tbl")
    IL.create_table(t, DDL)
    IL.append(_frame(spark, 0, 10), t)
    with pytest.raises(ValueError, match="schema mismatch"):
        IL.append(_frame(spark, 0, 10).withColumnRenamed("phash", "ph"), t)
    # a crashed writer's data files (no manifest, no hint flip) stay invisible
    orphan = os.path.join(t, "data", "snap-99999-deadbeef")
    _frame(spark, 500, 600).write.parquet(orphan)
    assert IL.read(spark, t).count() == 10


def test_images_table_roundtrip(spark, tmp_path):
    """The input_hint images table lives natively in the table format."""
    from prclz_spark import images as IM
    from prclz_spark import schemas as S

    t = str(tmp_path / "img")
    IL.create_table(t, S.IMAGES.simpleString().replace("struct<", "").rstrip(">"))
    imgs = IM.images_table(spark, 32)
    IL.append(imgs, t, stats_cols=["image_id"])
    back = IL.read(spark, t)
    assert back.count() == 32
    assert [f.name for f in back.schema.fields] == [f.name for f in imgs.schema.fields]
    # payload integrity through the format: phash recomputes identically
    row = back.filter(F.col("image_id") == "img_00000007").first()
    from prclz_spark.images import decode, phash64

    assert phash64(decode(bytes(row.bytes), row.fmt)) == row.phash


def test_manifest_compaction(spark, tmp_path):
    """VERDICT r3 #10: after compaction a read touches O(files) manifests,
    not O(appends); contents, pruning and time travel are unchanged."""
    t = str(tmp_path / "ct")
    IL.create_table(t, "doc_id bigint, v bigint")
    for k in range(5):
        IL.append(
            spark.range(k * 10, (k + 1) * 10).selectExpr("id as doc_id", "id*2 as v"),
            t, stats_cols=["v"],
        )
    pre_files = sorted(e["path"] for e in IL.files_at(t))
    assert len(IL._manifests(t, IL.current_snapshot(t))) == 5
    snap = IL.compact_manifests(t)
    # one manifest read suffices now
    assert len(IL._manifests(t, snap)) == 1
    assert sorted(e["path"] for e in IL.files_at(t)) == pre_files
    assert IL.read(spark, t).count() == 50
    # stats survive compaction → pruning still skips files
    assert len(IL.files_at(t, prune=("v", 0, 10))) < len(IL.files_at(t))
    # time travel to a pre-compaction snapshot reconstructs its exact set
    assert IL.read(spark, t, snapshot=1).count() == 20
    # appends after compaction chain off the compacted manifest
    IL.append(spark.range(50, 60).selectExpr("id as doc_id", "id*2 as v"), t, stats_cols=["v"])
    assert IL.read(spark, t).count() == 60
    assert len(IL._manifests(t, IL.current_snapshot(t))) == 2


def test_concurrent_append_conflict_detected(spark, tmp_path):
    """Single-writer contract: a racing writer that already claimed the
    next snapshot id makes this append raise CommitConflict cleanly (the
    O_EXCL manifest create is the atomic arbiter) — never a silent
    manifest clobber."""
    import json, os

    import pytest

    t = str(tmp_path / "race")
    IL.create_table(t, "doc_id bigint, v bigint")
    IL.append(spark.range(10).selectExpr("id as doc_id", "id as v"), t)
    nxt = IL.current_snapshot(t) + 1
    # another writer claims snapshot `nxt` (its hint flip hasn't landed yet)
    with open(IL._manifest_file(t, nxt), "x") as f:
        json.dump({"snapshot": nxt, "parent": nxt - 1, "files": [], "stats_cols": []}, f)
    with pytest.raises(IL.CommitConflict):
        IL.append(spark.range(5).selectExpr("id as doc_id", "id as v"), t)
    # table state is unharmed: old snapshot still current and readable
    assert IL.current_snapshot(t) == nxt - 1
    assert IL.read(spark, t).count() == 10
