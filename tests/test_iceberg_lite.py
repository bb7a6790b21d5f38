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


def test_concurrent_append_rebases_not_wedges(spark, tmp_path):
    """VERDICT r4 #9 + ADVICE (medium): a snapshot id taken by another
    writer makes this append REBASE onto the new state (parent = the
    winner), not fail — and a winner whose version-hint refresh never
    landed (crash right after the manifest link) cannot wedge the table,
    because the hint is a cache and the directory scan is authoritative."""
    import json

    t = str(tmp_path / "race")
    IL.create_table(t, "doc_id bigint, v bigint")
    IL.append(spark.range(10).selectExpr("id as doc_id", "id as v"), t)
    nxt = IL.current_snapshot(t) + 1
    # another writer commits snapshot `nxt`… and crashes before refreshing
    # the hint (simulated: manifest present, hint stale)
    with open(IL._manifest_file(t, nxt), "x") as f:
        json.dump(
            {"snapshot": nxt, "parent": nxt - 1, "files": [], "stats_cols": []}, f
        )
    assert IL.current_snapshot(t) == nxt  # scan sees it despite stale hint
    s = IL.append(spark.range(5).selectExpr("id as doc_id", "id as v"), t)
    assert s == nxt + 1  # rebased past the concurrent commit
    assert IL.read(spark, t).count() == 15
    # linear history: every manifest's parent is its predecessor
    chain = IL._manifests(t, s)
    assert [m["snapshot"] for m in chain] == [0, 1, 2]
    assert [m["parent"] for m in chain] == [None, 0, 1]


def test_zero_retries_surfaces_conflict(spark, tmp_path):
    """With max_retries=0 a genuine race raises CommitConflict (the atomic
    link arbiter) instead of silently clobbering — the loser's data files
    stay orphans and the table state is unharmed."""
    import pytest

    t = str(tmp_path / "race0")
    IL.create_table(t, "doc_id bigint")
    IL.append(spark.range(3).selectExpr("id as doc_id"), t)

    real_commit = IL._commit
    calls = {"n": 0}

    def racing_commit(path, snap, manifest):
        if calls["n"] == 0:
            calls["n"] += 1
            real_commit(path, snap, {"snapshot": snap, "parent": snap - 1,
                                     "files": [], "stats_cols": []})
        real_commit(path, snap, manifest)

    IL._commit, saved = racing_commit, IL._commit
    try:
        with pytest.raises(IL.CommitConflict):
            IL.append(spark.range(3).selectExpr("id as doc_id"), t, max_retries=0)
    finally:
        IL._commit = saved
    assert IL.read(spark, t).count() == 3 + 0  # racer appended no files


def test_threaded_concurrent_appends_both_land(spark, tmp_path):
    """Two real writers racing the same table: with the rebase loop both
    appends commit, history is linear (dense ids), all rows present."""
    import threading

    t = str(tmp_path / "mw")
    IL.create_table(t, "doc_id bigint")
    errs = []

    def writer(lo, hi):
        try:
            IL.append(spark.range(lo, hi).selectExpr("id as doc_id"), t)
        except Exception as e:  # pragma: no cover - failure path
            errs.append(e)

    ths = [threading.Thread(target=writer, args=(k * 100, k * 100 + 50)) for k in range(4)]
    for th in ths:
        th.start()
    for th in ths:
        th.join()
    assert not errs
    assert IL.current_snapshot(t) == 3
    assert IL.read(spark, t).count() == 200
    chain = IL._manifests(t, 3)
    assert [m["snapshot"] for m in chain] == [0, 1, 2, 3]
    assert [m["parent"] for m in chain] == [None, 0, 1, 2]


def test_delete_rows_time_travel_and_reappend(spark, tmp_path):
    """VERDICT r4 #4: equality deletes as a snapshot. Post-delete reads
    drop the tombstoned ids; time travel to the pre-delete snapshot still
    sees them; a LATER re-append of a deleted id is visible again
    (sequence-aware, like Iceberg — the delete applies only to files added
    at or before its snapshot)."""
    t = str(tmp_path / "del")
    IL.create_table(t, "doc_id bigint, v bigint")
    s0 = IL.append(spark.range(10).selectExpr("id as doc_id", "id*2 as v"), t)
    sd = IL.delete_rows(
        spark.range(3, 6).selectExpr("id as doc_id"), t, "doc_id"
    )
    assert sd == s0 + 1
    got = sorted(r.doc_id for r in IL.read(spark, t).collect())
    assert got == [0, 1, 2, 6, 7, 8, 9]
    # time travel: the pre-delete snapshot is intact
    assert IL.read(spark, t, snapshot=s0).count() == 10
    # sequence-aware: re-appending doc_id=4 after the delete is visible
    IL.append(spark.range(4, 5).selectExpr("id as doc_id", "id*100 as v"), t)
    back = {r.doc_id: r.v for r in IL.read(spark, t).collect()}
    assert back[4] == 400 and 3 not in back and 5 not in back
    assert IL.read(spark, t).count() == 8


def test_delete_survives_compaction_and_pruning(spark, tmp_path):
    t = str(tmp_path / "delc")
    IL.create_table(t, "doc_id bigint, v bigint")
    for k in range(3):
        IL.append(
            spark.range(k * 10, (k + 1) * 10).selectExpr("id as doc_id", "id as v"),
            t, stats_cols=["v"],
        )
    IL.delete_rows(spark.range(5, 25).selectExpr("id as doc_id"), t, "doc_id")
    pre = sorted(r.doc_id for r in IL.read(spark, t).collect())
    snap = IL.compact_manifests(t)
    assert len(IL._manifests(t, snap)) == 1  # chain collapsed
    assert sorted(r.doc_id for r in IL.read(spark, t).collect()) == pre
    # pruning composes with deletes: the [0,9] file group still prunes
    assert len(IL.files_at(t, prune=("v", 0, 4))) < len(IL.files_at(t))
    got = sorted(
        r.doc_id for r in IL.read(spark, t, prune=("v", 0, 9)).collect()
    )
    assert got == [0, 1, 2, 3, 4]


def test_rewrite_data_files_materializes_deletes(spark, tmp_path):
    """rewrite_data_files = Iceberg's rewrite: tombstones become physical,
    reads stop anti-joining, one manifest suffices, stats/pruning survive,
    time travel to pre-rewrite snapshots is untouched."""
    t = str(tmp_path / "rw")
    IL.create_table(t, "doc_id bigint, v bigint")
    for k in range(3):
        IL.append(
            spark.range(k * 10, (k + 1) * 10).selectExpr("id as doc_id", "id as v"),
            t, stats_cols=["v"],
        )
    IL.delete_rows(spark.range(5, 25).selectExpr("id as doc_id"), t, "doc_id")
    pre = sorted(r.doc_id for r in IL.read(spark, t).collect())
    assert len(pre) == 10

    snap = IL.rewrite_data_files(spark, t)
    assert sorted(r.doc_id for r in IL.read(spark, t).collect()) == pre
    assert IL.deletes_at(t) == []  # tombstones are gone from metadata
    assert len(IL._manifests(t, snap)) == 1
    # reads no longer join at all: plain parquet scan
    plan = IL.read(spark, t)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # stats recomputed on the rewritten files → pruning still works
    assert len(IL.files_at(t, prune=("v", 0, 4))) < len(IL.files_at(t))
    # time travel: pre-rewrite snapshots still show the deleted rows
    assert IL.read(spark, t, snapshot=2).count() == 30
    # the table keeps working: append + a fresh delete after the rewrite
    IL.append(spark.range(100, 105).selectExpr("id as doc_id", "id as v"), t,
              stats_cols=["v"])
    IL.delete_rows(spark.range(0, 2).selectExpr("id as doc_id"), t, "doc_id")
    got = sorted(r.doc_id for r in IL.read(spark, t).collect())
    assert got == [2, 3, 4, 25, 26, 27, 28, 29, 100, 101, 102, 103, 104]


def test_rewrite_retries_full_rewrite_on_conflict(spark, tmp_path):
    """A commit racing the rewrite must NOT be dropped: the whole rewrite
    re-runs against the new state (a blind manifest rebase would silently
    erase the racer's rows)."""
    t = str(tmp_path / "rwc")
    IL.create_table(t, "doc_id bigint")
    IL.append(spark.range(10).selectExpr("id as doc_id"), t)

    real_commit = IL._commit
    raced = {"done": False}

    def racing_commit(path, snap, manifest):
        if not raced["done"]:
            raced["done"] = True
            # a concurrent append lands between the rewrite's read and commit
            IL._commit = real_commit
            IL.append(spark.range(50, 55).selectExpr("id as doc_id"), t)
            IL._commit = racing_commit
        real_commit(path, snap, manifest)

    IL._commit = racing_commit
    try:
        IL.rewrite_data_files(spark, t)
    finally:
        IL._commit = real_commit
    got = sorted(r.doc_id for r in IL.read(spark, t).collect())
    assert got == list(range(10)) + list(range(50, 55))  # racer's rows kept


def test_empty_delete_set_is_harmless(spark, tmp_path):
    """A dedup verdict with zero losers still commits cleanly and reads
    must not trip over the fileless tombstone spec."""
    t = str(tmp_path / "del0")
    IL.create_table(t, "doc_id bigint")
    IL.append(spark.range(5).selectExpr("id as doc_id"), t)
    sd = IL.delete_rows(spark.range(0).selectExpr("id as doc_id"), t, "doc_id")
    assert sd == 1
    assert IL.read(spark, t).count() == 5
    assert IL.read(spark, t, snapshot=0).count() == 5


def test_table_model_random_op_sequences(spark, tmp_path):
    """Model-based property test of the whole table layer: random
    append / delete / compact / rewrite / streaming-ingest / crash-replay
    / expire sequences, replayed against a plain in-memory model (list of
    (id, added_seq) + delete log + per-query ingest watermark). After
    EVERY op, the live read matches the model and the ingest watermark
    survives compaction/rewrite/expiry; a replayed micro-batch never
    changes the table; expiry never changes the current read and drops
    expired ids from the time-travel set; at the end, time travel to
    every still-retained snapshot matches the model's historical state."""
    import random as rnd

    from prclz_spark.streaming.ingest import iceberg_batch_sink

    rng = rnd.Random(17)
    t = str(tmp_path / "model")
    IL.create_table(t, "doc_id bigint")

    model_rows: list[tuple[int, int]] = []  # (doc_id, added_at_snapshot)
    deletes: list[tuple[set, int]] = []     # (ids, as_of_snapshot)
    history: dict[int, list[int]] = {}      # snapshot -> visible ids
    next_id = 0
    sink = iceberg_batch_sink(t, "qM")
    wm = -1                                  # model ingest watermark

    def visible(rows, dels):
        out = []
        for i, seq in rows:
            if any(i in ids and seq <= as_of for ids, as_of in dels):
                continue
            out.append(i)
        return sorted(out)

    for _ in range(18):
        op = rng.choice(["append", "append", "delete", "compact", "rewrite",
                         "ingest", "replay"])
        if op == "replay":
            if wm < 0:
                continue
            before = IL.current_snapshot(t)
            bid = rng.randint(0, wm)
            sink(spark.createDataFrame([(999_000 + bid,)], "doc_id bigint"), bid)
            assert IL.current_snapshot(t) == before, "replay committed!"
            continue
        if op == "ingest":
            n = rng.randint(1, 4)
            ids = list(range(next_id, next_id + n))
            next_id += n
            wm += 1
            sink(spark.createDataFrame([(i,) for i in ids], "doc_id bigint"), wm)
            s = IL.current_snapshot(t)
            model_rows.extend((i, s) for i in ids)
        elif op == "append":
            n = rng.randint(1, 6)
            ids = list(range(next_id, next_id + n))
            next_id += n
            s = IL.append(
                spark.createDataFrame([(i,) for i in ids], "doc_id bigint"), t
            )
            model_rows.extend((i, s) for i in ids)
        elif op == "delete":
            vis = visible(model_rows, deletes)
            if not vis:
                continue
            victims = set(rng.sample(vis, k=min(len(vis), rng.randint(1, 4))))
            s = IL.delete_rows(
                spark.createDataFrame([(i,) for i in victims], "doc_id bigint"),
                t, "doc_id",
            )
            deletes.append((victims, s))
        elif op == "compact":
            if IL.current_snapshot(t) < 0:
                continue
            s = IL.compact_manifests(t)
        else:  # rewrite: deletes materialize, model flattens
            if IL.current_snapshot(t) < 0:
                continue
            s = IL.rewrite_data_files(spark, t)
            model_rows = [(i, s) for i in visible(model_rows, deletes)]
            deletes = []
        history[s] = visible(model_rows, deletes)
        got = sorted(r.doc_id for r in IL.read(spark, t).collect())
        assert got == history[s], (op, s)
        want_wm = None if wm < 0 else wm
        assert IL.last_committed_batch(t, "qM") == want_wm, (op, s)

    for s, want in history.items():
        got = sorted(r.doc_id for r in IL.read(spark, t, snapshot=s).collect())
        assert got == want, f"time travel to {s}"


def test_second_compaction_keeps_deletes(spark, tmp_path):
    """Review regression: a prior compaction stores deletes in
    deletes_carried; a SECOND compaction must carry them again, never
    resurrect deleted rows."""
    t = str(tmp_path / "cc2")
    IL.create_table(t, "doc_id bigint")
    IL.append(spark.range(10).selectExpr("id as doc_id"), t)
    IL.delete_rows(spark.range(3, 6).selectExpr("id as doc_id"), t, "doc_id")
    IL.compact_manifests(t)
    IL.compact_manifests(t)
    assert len(IL.deletes_at(t)) == 1
    got = sorted(r.doc_id for r in IL.read(spark, t).collect())
    assert got == [0, 1, 2, 6, 7, 8, 9]


def test_expire_snapshots_and_vacuum(spark, tmp_path):
    """expire-snapshots maintenance: nothing is expirable while the
    retained chain still walks to snapshot 0; after a compaction the
    absorbed manifests expire, time travel to them raises a clear error,
    data files stay while referenced, and a rewrite makes the originals
    unreferenced so a second expiry vacuums them. Orphan dirs from
    crashed appends are removed only past the grace period."""
    t = str(tmp_path / "tbl")
    IL.create_table(t, DDL)
    for lo, hi in [(0, 40), (40, 70), (70, 100)]:
        IL.append(_frame(spark, lo, hi), t)          # snaps 0,1,2

    # pre-compaction: every retained chain reaches snapshot 0 — no-op
    r = IL.expire_snapshots(t, retain_last=1, orphan_grace_seconds=0)
    assert r["expired"] == [] and r["data_files_removed"] == 0
    assert IL.read(spark, t, snapshot=0).count() == 40

    comp = IL.compact_manifests(t)                    # snap 3, absorbs 0-2
    IL.append(_frame(spark, 100, 120), t)             # snap 4
    r = IL.expire_snapshots(t, retain_last=2, orphan_grace_seconds=0)
    assert r["expired"] == [0, 1, 2]
    # compaction reuses the original data files — nothing vacuumable yet
    assert r["data_files_removed"] == 0
    assert IL.read(spark, t).count() == 120
    assert IL.read(spark, t, snapshot=comp).count() == 100
    with pytest.raises(ValueError, match="expired"):
        IL.read(spark, t, snapshot=1)

    # a rewrite copies rows into fresh files; the originals then expire
    n_parquet = lambda: sum(
        1 for d in os.listdir(f"{t}/data")
        for f in os.listdir(f"{t}/data/{d}") if f.endswith(".parquet")
    )
    before = n_parquet()
    IL.rewrite_data_files(spark, t)                   # snap 5
    r = IL.expire_snapshots(t, retain_last=1, orphan_grace_seconds=0)
    assert set(r["expired"]) == {comp, 4}
    assert r["data_files_removed"] >= before
    assert IL.read(spark, t).count() == 120
    assert sorted(x.image_id for x in IL.read(spark, t).collect()) == sorted(
        f"img_{i:08d}" for i in range(120)
    )

    # orphan from a crashed append: fresh files survive the grace window,
    # aged ones are vacuumed
    orphan = f"{t}/data/add-orphan"
    os.makedirs(orphan)
    with open(f"{orphan}/part-0.parquet", "wb") as f:
        f.write(b"torn")
    r = IL.expire_snapshots(t, retain_last=1)         # default 1 h grace
    assert r["data_files_removed"] == 0 and os.path.exists(orphan)
    old = 1_000_000_000
    os.utime(f"{orphan}/part-0.parquet", (old, old))
    os.utime(orphan, (old, old))
    r = IL.expire_snapshots(t, retain_last=1, orphan_grace_seconds=3600)
    assert r["data_files_removed"] == 1 and not os.path.exists(orphan)


def test_expire_keeps_delete_tombstones_and_watermarks(spark, tmp_path):
    """Tombstone parquet referenced by carried delete specs must survive
    expiry (or reads would resurrect deleted rows), and the streaming
    ingest watermark — carried by the compaction manifest — survives the
    absorbed manifests' expiry."""
    from prclz_spark.streaming.ingest import iceberg_batch_sink

    t = str(tmp_path / "tbl")
    IL.create_table(t, DDL)
    sink = iceberg_batch_sink(t, "qE")
    sink(_frame(spark, 0, 60), 0)                     # snap 0 (ingest)
    IL.delete_rows(
        _frame(spark, 10, 20).select("image_id"), t, "image_id"
    )                                                 # snap 1
    IL.compact_manifests(t)                           # snap 2
    r = IL.expire_snapshots(t, retain_last=1, orphan_grace_seconds=0)
    assert r["expired"] == [0, 1]
    got = {x.image_id for x in IL.read(spark, t).collect()}
    assert got == {f"img_{i:08d}" for i in range(60) if not 10 <= i < 20}
    # watermark carried through compaction outlives the expired commit
    assert IL.last_committed_batch(t, "qE") == 0
    sink(_frame(spark, 0, 60), 0)                     # replay — still skipped
    assert IL.read(spark, t).count() == 50


def test_snapshot_before_batch(spark, tmp_path):
    """The crash-replay time-travel anchor: highest snapshot whose
    query_id watermark is still < batch_id — walking the parent chain,
    ignoring other writers' unstamped appends, -1 on empty/unknown
    tables, loud ValueError once the needed history is expired."""
    import pytest

    from prclz_spark.sources import iceberg_lite as IL

    t = str(tmp_path / "t")
    assert IL.snapshot_before_batch(t, "q", 0) == -1  # no table at all

    IL.create_table(t, "id long")

    def app(lo, hi, batch=None):
        df = spark.range(lo, hi).select(F.col("id"))
        props = {"query_id": "q", "batch_id": batch} if batch is not None else None
        return IL.append(df, t, properties=props)

    s0 = app(0, 3, batch=0)
    s1 = app(3, 5)            # another writer, unstamped
    s2 = app(5, 8, batch=1)
    s3 = app(8, 9, batch=2)
    # batch 2 replay must read as of s2 (watermark there is 1 < 2);
    # the unstamped append never blocks the walk
    assert IL.snapshot_before_batch(t, "q", 2) == s2
    assert IL.snapshot_before_batch(t, "q", 1) == s1
    assert IL.snapshot_before_batch(t, "q", 0) == -1   # 0 committed at s0
    assert IL.snapshot_before_batch(t, "q", 99) == s3  # future batch: head
    # unknown query_id: nothing of it is in the table, the head is a
    # correct (and maximal) pre-batch anchor
    assert IL.snapshot_before_batch(t, "other", 0) == s3

    # anchored read sees exactly the pre-batch rows
    ids = {r["id"] for r in IL.read(
        spark, t, snapshot=IL.snapshot_before_batch(t, "q", 2)
    ).collect()}
    assert ids == set(range(8))

    # compaction carries watermarks; the anchor still resolves through it
    IL.compact_manifests(t)
    s4 = app(9, 10, batch=3)
    assert IL.snapshot_before_batch(t, "q", 3) < s4
    assert IL.last_committed_batch(
        t, "q", IL.snapshot_before_batch(t, "q", 3)
    ) == 2

    # expiry that removes the needed history raises, never silently wrong
    IL.rewrite_data_files(spark, t)
    IL.expire_snapshots(t, retain_last=1, orphan_grace_seconds=0)
    with pytest.raises(ValueError, match="expired"):
        IL.snapshot_before_batch(t, "q", 0)
