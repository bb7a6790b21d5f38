"""End-to-end text-corpus curation: the curate-text CLI composition.

One command per daily batch: tiered dedup (against-corpus, exactly-once
fingerprint snapshots) → boilerplate line strip against the summed
incremental line-df history → Gopher quality filter → optional mixture
quotas → curated snapshot + packed contexts. Every stage is an existing
operator; this pins the composition AND its crash-replay protocol (the
fingerprint tables commit LAST, so a replay at any crash point recomputes
byte-identical verdicts)."""

import hashlib

import pyspark.sql.functions as F
import pytest

from prclz_spark import cli
from prclz_spark.sources import iceberg_lite as IL

BANNER = "SUBSCRIBE NOW for daily updates"
FOOTER = "(c) example corp all rights reserved"


def _word(i, j):
    # deterministic pseudo-random letter word per (doc, position): minhash
    # shingles are CHAR 5-grams, so cross-doc Jaccard must come only from
    # the shared banner/footer lines (~0.15), not from a tiny shared vocab
    h = hashlib.md5(f"{i}:{j}".encode()).digest()
    return "".join(chr(97 + b % 26) for b in h[: 5 + h[0] % 5])


def _body(i, n=70):
    return " ".join(_word(i, j) for j in range(n))


def _docs(spark, ids, junk_ids=(), lang="en"):
    rows = []
    for i in ids:
        if i in junk_ids:
            text = "\n".join([BANNER, "spam ham " * 40, FOOTER])
        else:
            b = _body(i)
            text = "\n".join([BANNER, b[: len(b) // 2], b[len(b) // 2:], FOOTER])
        rows.append((i, text, lang))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _run(tmp_path, batch_path, batch_id, extra=()):
    cli.main([
        "curate-text",
        "--table", str(tmp_path / "docs_tbl"),
        "--batch", batch_path,
        "--batch-id", str(batch_id),
        "--tiers", "exact,minhash",
        "--min-df", "10",
        "--min-words", "20",
        "--out", str(tmp_path / "out"),
        *extra,
    ])


def test_curate_text_pipeline_and_replay(spark, tmp_path):
    t = str(tmp_path / "docs_tbl")

    # --- day 0: 24 docs, 2 exact clones (ids 100/101 of 0/1), 2 junk
    day0 = _docs(spark, list(range(24)), junk_ids={22, 23}).unionByName(
        _docs(spark, [0, 1]).select(
            (F.col("doc_id") + 100).alias("doc_id"), "text", "lang"
        )
    )
    p0 = str(tmp_path / "day0.pq")
    day0.write.parquet(p0)
    _run(tmp_path, p0, 0, extra=["--pack-budget", "64"])

    cur0 = spark.read.parquet(str(tmp_path / "out" / "curated_batch_0"))
    ids0 = {r["doc_id"] for r in cur0.select("doc_id").collect()}
    # exact clones lose to their min-id originals; junk fails the quality
    # rules (dup_5gram ~1); everything else survives
    assert {100, 101}.isdisjoint(ids0)
    assert {22, 23}.isdisjoint(ids0)
    assert set(range(22)) <= ids0
    # the viral banner/footer lines (df=26 ≥ min_df) are stripped
    texts0 = {r["doc_id"]: r["text"] for r in cur0.collect()}
    assert all(BANNER not in v and FOOTER not in v for v in texts0.values())
    assert all(v.strip() for v in texts0.values())
    # packed contexts cover every curated doc exactly once
    ctx = spark.read.parquet(str(tmp_path / "out" / "contexts_batch_0"))
    packed_ids = {
        i for r in ctx.select("doc_ids").collect() for i in r["doc_ids"]
    }
    assert packed_ids == ids0

    # --- day 1: 6 new docs + 3 re-crawls of day-0 survivors (cross-batch
    # exact clones — must die against the fingerprint CORPUS, not the batch)
    day1 = _docs(spark, list(range(30, 36))).unionByName(
        _docs(spark, [2, 3, 4]).select(
            (F.col("doc_id") + 200).alias("doc_id"), "text", "lang"
        )
    )
    p1 = str(tmp_path / "day1.pq")
    day1.write.parquet(p1)
    _run(tmp_path, p1, 1)
    cur1 = spark.read.parquet(str(tmp_path / "out" / "curated_batch_1"))
    ids1 = {r["doc_id"] for r in cur1.select("doc_id").collect()}
    assert ids1 == set(range(30, 36))

    # --- full replay of batch 1 is a no-op: no snapshot on any table,
    # identical curated output
    snaps_before = {
        p: IL.current_snapshot(p)
        for p in (t, t + "_lines", t + "_fp/exact", t + "_fp/minhash")
    }
    _run(tmp_path, p1, 1)
    for p, s in snaps_before.items():
        assert IL.current_snapshot(p) == s, p
    assert {
        r["doc_id"]
        for r in spark.read.parquet(
            str(tmp_path / "out" / "curated_batch_1")
        ).collect()
    } == ids1

    # --- the curated table accumulated both batches exactly once
    tbl_ids = {r["doc_id"] for r in IL.read(spark, t).select("doc_id").collect()}
    assert tbl_ids == ids0 | ids1


def test_curate_text_crash_replay(spark, tmp_path, monkeypatch):
    """Crash between the docs snapshot and the fingerprint snapshots: the
    replay must land the missing fingerprint commits with byte-identical
    verdicts and NOT re-append the docs (the failure mode the commit-order
    protocol exists for)."""
    import prclz_spark.sources.iceberg_lite as IL_mod

    t = str(tmp_path / "docs_tbl")
    p0 = str(tmp_path / "day0.pq")
    _docs(spark, list(range(12))).write.parquet(p0)
    _run(tmp_path, p0, 0)

    day1 = _docs(spark, [50, 51]).unionByName(
        _docs(spark, [5]).select(
            (F.col("doc_id") + 300).alias("doc_id"), "text", "lang"
        )
    )
    p1 = str(tmp_path / "day1.pq")
    day1.write.parquet(p1)

    real_append = IL_mod.append

    def dying_append(df, path, *a, **kw):
        if path.endswith("_fp/minhash"):
            raise RuntimeError("simulated crash before the last fp commit")
        return real_append(df, path, *a, **kw)

    monkeypatch.setattr(IL_mod, "append", dying_append)
    with pytest.raises(RuntimeError, match="simulated crash"):
        _run(tmp_path, p1, 1)
    monkeypatch.setattr(IL_mod, "append", real_append)

    # docs + exact-fp committed, minhash-fp missing — replay completes it
    assert IL.last_committed_batch(t, "curate-text") == 1
    assert IL.last_committed_batch(t + "_fp/exact", "curate-text") == 1
    assert IL.last_committed_batch(t + "_fp/minhash", "curate-text") == 0
    _run(tmp_path, p1, 1)
    assert IL.last_committed_batch(t + "_fp/minhash", "curate-text") == 1

    # docs landed exactly once; the cross-batch clone (305) never entered
    tbl = IL.read(spark, t)
    assert tbl.filter(F.col("doc_id") >= 50).count() == 2
    assert tbl.count() == tbl.dropDuplicates(["doc_id"]).count()
    # minhash fp table holds day-0 plus exactly the day-1 survivors once
    fp = IL.read(spark, t + "_fp/minhash")
    assert fp.count() == fp.dropDuplicates(["doc_id"]).count()
    assert {
        r["doc_id"] for r in fp.filter(F.col("doc_id") >= 50).collect()
    } == {50, 51}


def test_curate_text_mix_quotas(spark, tmp_path):
    en = _docs(spark, list(range(40)), lang="en")
    fr = _docs(spark, list(range(100, 120)), lang="fr")
    p = str(tmp_path / "b.pq")
    en.unionByName(fr).write.parquet(p)
    _run(tmp_path, p, 0, extra=["--mix", "en=7,fr=5", "--mix-col", "lang"])
    cur = spark.read.parquet(str(tmp_path / "out" / "curated_batch_0"))
    counts = {r["lang"]: r["n"] for r in cur.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert counts == {"en": 7, "fr": 5}


def test_curate_text_mix_token_budgets(spark, tmp_path):
    en = _docs(spark, list(range(40)), lang="en")
    fr = _docs(spark, list(range(100, 120)), lang="fr")
    p = str(tmp_path / "b.pq")
    en.unionByName(fr).write.parquet(p)
    # bodies are ~70 words + banner/footer; budgets of ~5 docs worth
    _run(tmp_path, p, 0, extra=["--mix-tokens", "en=300,fr=150",
                                "--mix-col", "lang"])
    cur = spark.read.parquet(str(tmp_path / "out" / "curated_batch_0"))
    toks = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
    sums = {
        r["lang"]: (r["s"], r["n"])
        for r in cur.groupBy("lang").agg(
            F.sum(toks).alias("s"), F.count("*").alias("n")
        ).collect()
    }
    # quota reached, overshoot bounded by one document's tokens (~70)
    assert 300 <= sums["en"][0] <= 300 + 80
    assert 150 <= sums["fr"][0] <= 150 + 80
    assert sums["en"][1] < 40 and sums["fr"][1] < 20
