"""Exact deterministic data mixing (operators/mix.py)."""

from pyspark.sql import functions as F

from prclz_spark.operators.mix import mix_strata, mix_strata_windowed

SF = "/root/testdata/sf0.001"


def test_mix_exact_quotas_and_whitelist(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    out = mix_strata(d, "lang", {"en": 25, "fr": 10, "zh": 10_000}, "doc_id")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    avail = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] == 25 and counts["fr"] == 10
    assert counts["zh"] == avail["zh"]  # oversized quota: whole stratum
    assert set(counts) == {"en", "fr", "zh"}  # unlisted strata dropped


def test_mix_deterministic_across_partitionings_and_seeds(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    q = {"en": 30, "de": 12}
    a = sorted(r.doc_id for r in mix_strata(d.repartition(1), "lang", q, "doc_id").collect())
    b = sorted(r.doc_id for r in mix_strata(d.repartition(13), "lang", q, "doc_id").collect())
    assert a == b  # byte-identical sample on any partitioning
    c = sorted(r.doc_id for r in mix_strata(d, "lang", q, "doc_id", seed=99).collect())
    assert c != a  # a different seed is a different (but fixed) mixture
    c2 = sorted(r.doc_id for r in mix_strata(d, "lang", q, "doc_id", seed=99).collect())
    assert c2 == c


def test_mix_threshold_equals_windowed_reference(spark):
    """The round-6 threshold-selection path must pick the byte-identical
    set the single-window formulation defines, across seeds, quota shapes
    (tiny, boundary-exact, oversized), and bucket granularities — including
    hist_buckets=1 (everything is the boundary bucket, pure window) and a
    coarse 7 (multi-bucket cumsum with uneven boundary slices)."""
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    for seed in (1, 99):
        for q in ({"en": 25, "fr": 10, "zh": 10_000}, {"en": 1}, {"de": 13, "en": 40}):
            ref = sorted(
                (r.lang, r.doc_id)
                for r in mix_strata_windowed(d, "lang", q, "doc_id", seed=seed).collect()
            )
            for hb in (1, 7, 8192):
                got = sorted(
                    (r.lang, r.doc_id)
                    for r in mix_strata(
                        d, "lang", q, "doc_id", seed=seed, hist_buckets=hb
                    ).collect()
                )
                assert got == ref, (seed, q, hb)


def test_mix_no_listed_stratum_present(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    out = mix_strata(d, "lang", {"xx_not_a_lang": 10}, "doc_id")
    assert out.count() == 0
    assert out.columns == ["doc_id", "lang"]


def test_mix_boundary_refinement_byte_identical(spark):
    """Adaptive resolution (VERDICT r6 #5): with hist_buckets=2 and a tiny
    boundary_cap every boundary bucket exceeds the cap and triggers the
    sub-histogram pass; the selection must stay byte-identical to the
    windowed reference (refinement changes WHERE the rank runs, never
    what is selected)."""
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    q = {"en": 37, "fr": 11}
    want = sorted(
        r.doc_id
        for r in mix_strata_windowed(d, "lang", q, "doc_id", seed=5).collect()
    )
    got = sorted(
        r.doc_id
        for r in mix_strata(
            d, "lang", q, "doc_id", seed=5, hist_buckets=2, boundary_cap=3
        ).collect()
    )
    assert got == want


def test_mix_refinement_bounds_boundary_rank(spark):
    """The refined boundary — the only rows that ever reach the per-stratum
    rank — holds ≤ ~|stratum|/hist_buckets² rows: replicate the operator's
    arithmetic and check the sub-boundary bucket is genuinely smaller than
    the pass-1 boundary it replaced."""
    from prclz_spark.operators.mix import _P, scramble

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    hb, cap = 4, 10
    bw = _P // hb + 1
    bw2 = bw // hb + 1
    keyed = (
        d.filter(F.col("lang") == "en")
        .select("doc_id", scramble("doc_id", 5).alias("_h"))
        .withColumn("_b", F.expr(f"_h div {bw}"))
        .withColumn("_b2", F.expr(f"(_h % {bw}) div {bw2}"))
    )
    counts = keyed.groupBy("_b", "_b2").count().collect()
    per_b = {}
    for r in counts:
        per_b[r["_b"]] = per_b.get(r["_b"], 0) + r["count"]
    # the operator's pass-1 boundary for quota 37
    quota, below, bstar = 37, 0, None
    for b in sorted(per_b):
        if below + per_b[b] >= quota:
            bstar = b
            break
        below += per_b[b]
    assert per_b[bstar] > cap  # refinement would fire at this cap
    sub = {r["_b2"]: r["count"] for r in counts if r["_b"] == bstar}
    need, sb, b2star = quota - below, 0, None
    for b2 in sorted(sub):
        if sb + sub[b2] >= need:
            b2star = b2
            break
        sb += sub[b2]
    # rows actually ranked after refinement = one sub-bucket ≪ the bucket
    assert sub[b2star] < per_b[bstar]
    # and the operator with this cap still returns the exact quota
    out = mix_strata(
        d, "lang", {"en": quota}, "doc_id", seed=5, hist_buckets=hb,
        boundary_cap=cap,
    )
    assert out.count() == quota


def test_mix_tokens_threshold_equals_windowed(spark):
    """Token-budget form ≡ its single-window reference across seeds,
    quotas, histogram resolutions (incl. tiny buckets that force the
    adaptive refinement) — same guarantee the count form carries."""
    from prclz_spark.operators.mix import (
        mix_strata_tokens,
        mix_strata_tokens_windowed,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang",
        F.size(F.split("text", r"\s+")).alias("n_tok"),
    ).cache()
    for seed in (1, 7):
        for q in ({"en": 2_000, "fr": 800}, {"en": 10**9, "zh": 1},
                  {"en": 0, "fr": 350}):
            want = sorted(
                r.doc_id for r in mix_strata_tokens_windowed(
                    d, "lang", q, "doc_id", "n_tok", seed=seed
                ).collect()
            )
            for hb, cap in ((8192, 262_144), (4, 262_144), (4, 8)):
                got = sorted(
                    r.doc_id for r in mix_strata_tokens(
                        d, "lang", q, "doc_id", "n_tok", seed=seed,
                        hist_buckets=hb, boundary_cap=cap,
                    ).collect()
                )
                assert got == want, (seed, q, hb, cap)


def test_mix_tokens_minimal_prefix_semantics(spark):
    """Per stratum: token sum of the selection reaches the quota, and
    dropping the LAST selected doc (scramble order) falls below it — the
    minimal quota-reaching prefix, overshoot ≤ one document. Oversized
    quotas take the whole stratum; NULL token counts weigh 0; selection
    is partitioning-invariant."""
    from prclz_spark.operators.mix import mix_strata_tokens
    from prclz_spark.operators.mix import scramble as _scr

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang",
        F.when(F.col("doc_id") % 17 == 0, F.lit(None)).otherwise(
            F.size(F.split("text", r"\s+"))
        ).alias("n_tok"),
    ).cache()
    q = {"en": 1_500, "fr": 10**12}
    out = mix_strata_tokens(d, "lang", q, "doc_id", "n_tok").cache()

    tot = {r.lang: (r.s, r.n) for r in d.groupBy("lang").agg(
        F.sum(F.coalesce("n_tok", F.lit(0))).alias("s"),
        F.count("*").alias("n")).collect()}
    got = {r.lang: r.s for r in out.groupBy("lang").agg(
        F.sum(F.coalesce("n_tok", F.lit(0))).alias("s")).collect()}
    assert got["en"] >= 1_500
    assert out.filter(F.col("lang") == "fr").count() == tot["fr"][1]

    # drop the last-selected en doc -> below quota (minimal prefix)
    en = out.filter(F.col("lang") == "en").withColumn(
        "_h", _scr("doc_id")
    ).orderBy(F.desc("_h"), F.desc("doc_id"))
    last = en.first()
    assert got["en"] - (last.n_tok or 0) < 1_500

    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id for r in mix_strata_tokens(
            d.repartition(13), "lang", q, "doc_id", "n_tok"
        ).collect()
    )
    assert a == b
