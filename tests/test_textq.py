"""Repetition metrics + boilerplate line removal (operators/textq.py).

Ground truth is computed in plain Python (collections.Counter) for every
metric, on both hand-built adversarial documents and the sf0.001 corpus —
the operator is pure row-local column algebra, so the Python model IS the
spec."""

from collections import Counter

import pytest

from prclz_spark.operators.textq import (
    boilerplate_lines,
    repetition_metrics,
    strip_boilerplate_lines,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- model

def py_word_ngrams(text, n):
    ws = text.split()  # any whitespace, matching the engine's \s+ split
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def py_metrics(text, n_top, n_dup):
    ws = text.split()
    lines = [l for l in text.split("\n") if l.strip()]
    out = {"n_words": len(ws), "n_lines": len(lines)}

    lc = Counter(lines)
    dup_lines = [l for l in lines if lc[l] > 1]
    out["dup_line_frac"] = len(dup_lines) / len(lines) if lines else None
    tot = sum(len(l) for l in lines)
    out["dup_line_char_frac"] = (
        sum(len(l) for l in dup_lines) / tot if tot else None
    )

    for n in n_top:
        grams = py_word_ngrams(text, n)
        if grams and len(text):
            # engine accounting: max over gram classes of count × gram length
            best = max(c2 * len(g2) for g2, c2 in Counter(grams).items())
            out[f"top_{n}gram_char_frac"] = best / len(text)
        else:
            out[f"top_{n}gram_char_frac"] = 0.0 if len(text) else None
    for n in n_dup:
        grams = py_word_ngrams(text, n)
        out[f"dup_{n}gram_frac"] = (
            (len(grams) - len(set(grams))) / len(grams) if grams else None
        )
    return out


def _check(spark, texts, n_top=(2, 3), n_dup=(5,)):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_metrics(
            df, "doc_id", "text", top_ngram_sizes=n_top, dup_ngram_sizes=n_dup
        ).collect()
    }
    for i, t in enumerate(texts):
        want = py_metrics(t, n_top, n_dup)
        for k, v in want.items():
            g = got[i][k]
            if v is None:
                assert g is None, (i, k, g, repr(t))
            else:
                assert g == pytest.approx(v, abs=2e-6), (i, k, g, v, repr(t))


# ---------------------------------------------------------------- tests

def test_repetition_adversarial(spark):
    texts = [
        "the cat sat on the mat\nthe cat sat on the mat\nunique line here",
        "spam spam spam spam spam spam spam spam",          # one repeated word
        "a b c d e f g h i j k l m n o p",                  # all unique
        "x\n\n\nx\n  \ny z",                                 # blank lines ignored
        "one two three one two three one two three",        # repeated trigram
        "",                                                  # empty doc
        "word",                                              # single word
        "a  b   c a  b",                                     # multi-space runs
        "LINE\nline\nLINE",                                  # case-sensitive
        "spam\nspam\nspam\nspam\nspam\nspam\nspam\nspam",    # word-per-line rep
        "tab\tsep\ttab\tsep\ttab\tsep",                      # tab-separated
    ]
    _check(spark, texts)


def test_repetition_corpus(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    rows = df.select("doc_id", "text").collect()
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_metrics(df, "doc_id", "text").collect()
    }
    for r in rows:
        want = py_metrics(r["text"], (2, 3, 4), (5, 6, 7))
        for k, v in want.items():
            g = got[r["doc_id"]][k]
            if v is None:
                assert g is None
            else:
                assert g == pytest.approx(v, abs=2e-6), (r["doc_id"], k)


def test_repetition_no_shuffle(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    plan = repetition_metrics(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "python" not in plan.lower()  # no UDF — pure codegen expressions


def _bp_frame(spark):
    # 6 docs; banner in 5 docs (>= min_df 3), footer in 2 (< 3), and one
    # doc repeats the banner twice internally (df counts DOCS, not lines)
    banner, footer = "COOKIE BANNER", "contact us"
    docs = [
        (0, f"{banner}\nalpha one\n{footer}"),
        (1, f"{banner}\nbeta two"),
        (2, f"{banner}\ngamma three\n{banner}"),
        (3, f"{banner}\ndelta four\n{footer}"),
        (4, f"{banner}\nepsilon five"),
        (5, "zeta six\n\n  \nzeta seven"),
    ]
    return spark.createDataFrame(docs, "doc_id long, text string"), banner, footer


def test_boilerplate_lines_df_counts(spark):
    df, banner, footer = _bp_frame(spark)
    hh = boilerplate_lines(df, "doc_id", "text", min_df=3)
    assert hh.count() == 1  # banner only: footer df=2, blanks excluded
    [r] = hh.collect()
    assert r["df"] == 5  # distinct docs — doc 2's double counts once


def test_strip_boilerplate(spark):
    df, banner, footer = _bp_frame(spark)
    out = {
        r["doc_id"]: r.asDict()
        for r in strip_boilerplate_lines(df, "doc_id", "text", min_df=3).collect()
    }
    assert out[0]["text_clean"] == f"alpha one\n{footer}"
    assert out[0]["n_lines_removed"] == 1
    assert out[2]["text_clean"] == "gamma three"
    assert out[2]["n_lines_removed"] == 2
    # untouched doc keeps blank-line structure verbatim
    assert out[5]["text_clean"] == "zeta six\n\n  \nzeta seven"
    assert out[5]["n_lines_removed"] == 0
    assert out[5]["removed_char_frac"] == 0.0
    # char fraction consistent
    t0 = f"{banner}\nalpha one\n{footer}"
    want = (len(t0) - len(out[0]["text_clean"])) / len(t0)
    assert out[0]["removed_char_frac"] == pytest.approx(want, abs=2e-6)


def test_strip_fully_boilerplate_doc(spark):
    docs = [(i, "SAME LINE") for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = strip_boilerplate_lines(df, "doc_id", "text", min_df=3).collect()
    assert len(out) == 4
    for r in out:
        assert r["text_clean"] == ""
        assert r["n_lines_removed"] == 1
        assert r["removed_char_frac"] == 1.0


def test_strip_against_precomputed_corpus(spark):
    df, banner, footer = _bp_frame(spark)
    hh = boilerplate_lines(df, "doc_id", "text", min_df=3)
    batch = spark.createDataFrame(
        [(100, f"{banner}\nfresh content")], "doc_id long, text string"
    )
    out = strip_boilerplate_lines(
        batch, "doc_id", "text", boilerplate=hh
    ).collect()
    assert out[0]["text_clean"] == "fresh content"
    # whitespace-variant of the banner matches via trim on both sides
    batch2 = spark.createDataFrame(
        [(101, f"  {banner}  \nother")], "doc_id long, text string"
    )
    out2 = strip_boilerplate_lines(batch2, "doc_id", "text", boilerplate=hh).collect()
    assert out2[0]["text_clean"] == "other"


def test_strip_plan_broadcast_anti(spark):
    df, *_ = _bp_frame(spark)
    plan = (
        strip_boilerplate_lines(df, "doc_id", "text", min_df=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_strip_two_level_plan(spark):
    """Above ``max_broadcast_rows`` the strip splits: the viral head still
    goes through a broadcast anti-join (those keys must never shuffle);
    the non-viral tail through a shuffled anti-join. Both flavors must be
    present in the plan — an all-broadcast plan means the guard didn't
    fire, an all-shuffle plan re-creates the skew the head exists for."""
    df, *_ = _bp_frame(spark)
    plan = (
        strip_boilerplate_lines(
            df, "doc_id", "text", min_df=2, max_broadcast_rows=1
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_strip_two_level_output_identical(spark):
    """min_df=10 with a forced multi-row hitter set: the two-level regime
    (head capped at 2 broadcast rows, the rest anti-joined through the
    shuffle) returns byte-identical results to the single-broadcast form."""
    footer = "(c) corp"
    docs = [
        (i, f"banner {i % 3}\nbody text {i}\nshared middle\n{footer}")
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = {
        r["doc_id"]: r.asDict()
        for r in strip_boilerplate_lines(df, "doc_id", "text", min_df=10).collect()
    }
    # 5 hitters (3 banners df≥13, shared middle df=40, footer df=40) > 2
    two = {
        r["doc_id"]: r.asDict()
        for r in strip_boilerplate_lines(
            df, "doc_id", "text", min_df=10, max_broadcast_rows=2
        ).collect()
    }
    assert base == two
    assert two[0]["text_clean"] == "body text 0"
    assert two[0]["n_lines_removed"] == 3


def test_incremental_boilerplate_corpus(spark, tmp_path):
    """Daily-crawl loop for the heavy-hitter line table: per-batch df
    counts append as snapshots; the corpus-wide set is the sum-merge.
    A line crossing min_df only ACROSS batches must become a heavy
    hitter, and fresh batches strip against the whole history."""
    from prclz_spark.operators.textq import (
        read_boilerplate_corpus,
        strip_boilerplate_lines,
        update_boilerplate_corpus,
    )

    t = str(tmp_path / "bp_corpus")
    banner = "SHARED BANNER"
    day0 = spark.createDataFrame(
        [(i, f"{banner}\nday0 doc {i}") for i in range(3)],
        "doc_id long, text string",
    )
    day1 = spark.createDataFrame(
        [(10 + i, f"{banner}\nday1 doc {i}") for i in range(3)],
        "doc_id long, text string",
    )
    update_boilerplate_corpus(day0, t, "doc_id", "text")
    # after day 0 alone the banner has df=3 — not hot at min_df=5
    assert read_boilerplate_corpus(spark, t, min_df=5).count() == 0
    update_boilerplate_corpus(day1, t, "doc_id", "text")
    hh = read_boilerplate_corpus(spark, t, min_df=5)
    assert hh.count() == 1  # banner df=6 summed ACROSS batches
    assert hh.first()["df"] == 6

    batch = spark.createDataFrame(
        [(99, f"{banner}\nfresh")], "doc_id long, text string"
    )
    out = strip_boilerplate_lines(batch, "doc_id", "text", boilerplate=hh)
    assert out.first()["text_clean"] == "fresh"


def test_incremental_boilerplate_compaction(spark, tmp_path):
    from prclz_spark.operators.textq import (
        read_boilerplate_corpus,
        update_boilerplate_corpus,
    )
    from prclz_spark.sources import iceberg_lite as IL

    t = str(tmp_path / "bp_compact")
    for day in range(5):
        df = spark.createDataFrame(
            [(day * 10 + i, f"LINE A\nuniq {day} {i}") for i in range(2)],
            "doc_id long, text string",
        )
        update_boilerplate_corpus(df, t, "doc_id", "text", compact_every=3)
    # chain stays compacted and counts survive compaction
    assert len(IL._manifests(t, IL.current_snapshot(t))) <= 4
    hh = read_boilerplate_corpus(spark, t, min_df=10)
    assert hh.first()["df"] == 10  # 5 days x 2 docs


def test_quality_filter_verdicts(spark):
    from prclz_spark.operators.textq import quality_filter

    good = " ".join(f"w{i}" for i in range(80))                 # 80 unique words
    spammy = "the same five gram block " * 40                   # dup 5-grams
    topheavy = " ".join(["buy now"] * 60)                       # top-2gram heavy
    short = "too short"
    dup_lines = "\n".join(["line one is here"] * 20) + "\n" + good
    docs = [(0, good), (1, spammy), (2, topheavy), (3, short), (4, dup_lines), (5, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in
           quality_filter(df, "doc_id", "text").collect()}
    assert out[0]["keep"] and out[0]["reasons"] == []
    assert not out[1]["keep"] and "dup_5gram_frac" in out[1]["reasons"]
    assert not out[2]["keep"] and "top_2gram_char_frac" in out[2]["reasons"]
    # a 2-word doc also trips the top-2gram concentration (its only
    # bigram covers every character) — min_words must be among reasons
    assert not out[3]["keep"] and "min_words" in out[3]["reasons"]
    assert not out[4]["keep"] and "dup_line_frac" in out[4]["reasons"]
    assert not out[5]["keep"] and out[5]["reasons"] == ["min_words"]  # empty doc

    # custom rules: only a max_words bound
    out2 = {r["doc_id"]: r["keep"] for r in
            quality_filter(df, "doc_id", "text", rules={"max_words": 100}).collect()}
    assert out2[3] and out2[0] and not out2[2]  # 120-word topheavy fails


def test_quality_filter_no_shuffle(spark):
    from prclz_spark.operators.textq import quality_filter

    df = spark.read.parquet(f"{SF}/documents.parquet")
    plan = quality_filter(df, "doc_id", "text")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan and "python" not in plan.lower()


def test_quality_filter_streams(spark, tmp_path):
    """Row-local operators compose with Structured Streaming unchanged:
    quality_filter over a file-source stream emits the same verdicts as
    the batch path (no state, no watermark needed)."""
    from prclz_spark.operators.textq import quality_filter

    good = " ".join(f"w{i}" for i in range(80))
    docs = [(0, good), (1, "spam " * 200), (2, "tiny")]
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = quality_filter(stream, "doc_id", "text")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("qf_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    q.stop()
    got = {r["doc_id"]: r["keep"] for r in spark.sql("select * from qf_stream").collect()}
    want = {r["doc_id"]: r["keep"] for r in
            quality_filter(spark.read.parquet(src), "doc_id", "text").collect()}
    assert got == want and got[0] and not got[1] and not got[2]
