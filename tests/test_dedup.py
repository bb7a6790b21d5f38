"""Dedup operators: planted-duplicate recall + estimator accuracy."""

import numpy as np
from pyspark.sql import functions as F

from prclz_spark.operators.dedup import (
    _shingle_hashes,
    minhash_lsh_pairs,
    simhash_near_pairs,
)

SF = "/root/testdata/sf0.001"


def _exact_jaccard(a: str, b: str, k: int = 5) -> float:
    sa = set(_shingle_hashes(a, k).tolist())
    sb = set(_shingle_hashes(b, k).tolist())
    return len(sa & sb) / max(len(sa | sb), 1)


def test_minhash_recall_and_estimate(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("doc_id") < 150)
    dups = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.expr("substring(text, 1, cast(length(text) * 0.95 as int))").alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(dups)
    pairs = minhash_lsh_pairs(corpus, "doc_id", "text", jaccard_threshold=0.5).toPandas()

    planted = {(int(d), int(d) + 100_000) for d in range(0, 150, 3)}
    found = set(zip(pairs.id_a.astype(int), pairs.id_b.astype(int)))
    recall = len(planted & found) / len(planted)
    assert recall >= 0.9, recall

    # estimator accuracy vs exact shingle Jaccard on the found pairs
    texts = {int(r.doc_id): r.text for r in corpus.collect()}
    errs = [
        abs(r.jaccard_est - _exact_jaccard(texts[int(r.id_a)], texts[int(r.id_b)]))
        for r in pairs.itertuples()
    ]
    assert np.mean(errs) < 0.12, np.mean(errs)  # 64 perms → σ ≈ 0.06


def test_simhash_recall(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("doc_id") < 150)
    dups = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(dups)
    pairs = simhash_near_pairs(corpus, "doc_id", "text", max_hamming=3).toPandas()
    planted = {(int(d), int(d) + 100_000) for d in range(0, 150, 3)}
    found = set(zip(pairs.id_a.astype(int), pairs.id_b.astype(int)))
    recall = len(planted & found) / len(planted)
    assert recall >= 0.8, recall
