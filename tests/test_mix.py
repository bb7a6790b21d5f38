"""Exact deterministic data mixing (operators/mix.py)."""

from pyspark.sql import functions as F

from prclz_spark.operators.mix import mix_strata

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
