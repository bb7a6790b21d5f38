"""Approximate nearest neighbors over embedding columns.

Three tiers (SURVEY "similarity search" requirement):

* brute-force cosine top-k — the exact baseline, SQL-expressible and
  DuckDB-oracled (`__spark_entry__.ann_cosine_topk`);
* **LSH-bucketed top-k** — the 10⁹-vector scale path: corpus bucketed
  once by random-hyperplane signature, queries probe their own bucket
  plus all Hamming-1 neighbors (multi-probe), exact cosine only within
  the probed buckets, Window top-k per query. Candidate count ≈
  (probes × corpus/2^planes) instead of |corpus|;
* **IVF (inverted-file) top-k** — k-means coarse quantizer: the corpus is
  assigned once to its nearest of `n_lists` centroids (trained on a
  driver-side sample — the centroid table is a tiny broadcast dim);
  queries probe their `n_probe` nearest lists. Recall degrades gracefully
  with n_probe, candidates ≈ n_probe · |corpus| / n_lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType


def _planes(n_planes: int, dim: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_planes, dim))


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 7,
) -> DataFrame:
    """(query_id, corpus_id, cos_sim, rank) — approximate top-k."""
    planes = _planes(n_planes, dim, seed)

    pows = np.int64(1) << np.arange(n_planes, dtype=np.int64)

    def _base_sigs(vecs: pd.Series) -> np.ndarray:
        arr = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (arr @ planes.T) > 0  # one (batch × dim)·(dim × planes) matmul
        return bits.astype(np.int64) @ pows

    @pandas_udf(LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="int64")
        return pd.Series(_base_sigs(vecs), dtype="int64")

    @pandas_udf(ArrayType(LongType()))
    def _probe_sigs(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        base = _base_sigs(vecs)
        # multi-probe: own bucket + every Hamming-1 signature, all batched
        probes = np.concatenate([base[:, None], base[:, None] ^ pows[None, :]], axis=1)
        return pd.Series(list(probes))

    c = corpus.select(
        F.col(corpus_id).alias("_cid"), F.col(vec_col).alias("_cv")
    ).withColumn("bucket", _sig(F.col("_cv")))
    q = queries.select(
        F.col(query_id).alias("_qid"), F.col(vec_col).alias("_qv")
    ).withColumn("bucket", F.explode(_probe_sigs(F.col("_qv"))))

    cand = q.join(c, "bucket", "inner").filter(F.col("_qid") != F.col("_cid"))
    dot = F.expr(
        "aggregate(zip_with(_qv, _cv, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0.0 as double), (a, x) -> a + x)"
    )
    nrm = lambda col: F.sqrt(
        F.expr(f"aggregate({col}, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double))")
    )
    scored = cand.dropDuplicates(["_qid", "_cid"]).withColumn(
        # zero-norm vectors have no cosine: try_divide -> NULL, dropped
        # below (a zero embedding matches nothing; ANSI mode would raise)
        "cos_sim", F.round(F.try_divide(dot, nrm("_qv") * nrm("_cv")), 6)
    )
    w = Window.partitionBy("_qid").orderBy(F.col("cos_sim").desc(), F.col("_cid").asc())
    return (
        scored.filter(F.col("cos_sim").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            "cos_sim",
            "rank",
        )
    )


# --- IVF tier ---------------------------------------------------------------


def train_centroids(
    corpus: DataFrame, vec_col: str, dim: int, n_lists: int = 16,
    sample_frac: float = 1.0, iters: int = 10, seed: int = 11,
) -> np.ndarray:
    """K-means coarse quantizer trained on a driver-side SAMPLE (Lloyd's
    iterations in numpy). The training set is a bounded sample — at 10⁹+
    vectors the centroid table is still O(n_lists·dim), a broadcastable
    dim; assignment of the full corpus stays distributed (ivf_assign).

    The bound is enforced with orderBy(rand)+limit, which Spark compiles
    to TakeOrderedAndProject (per-partition 100k-heap, merged at the
    driver) — every partition contributes, unlike a bare ``limit`` that
    would take the first partitions only (first-partitions bias)."""
    s = corpus.select(vec_col)
    if sample_frac < 1.0:
        s = s.sample(fraction=sample_frac, seed=seed)
    rows = s.orderBy(F.rand(seed)).limit(100_000).collect()
    X = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(axis=1)
        for c in range(len(cents)):
            m = a == c
            if m.any():
                cents[c] = X[m].mean(axis=0)
    return cents


def _nearest_lists_udf(cents: np.ndarray, n: int):
    """vec → array of the n nearest centroid ids (batched matmul: argpartition
    over the full distance matrix, no per-vector Python)."""
    c2 = (cents ** 2).sum(axis=1)

    @pandas_udf(ArrayType(LongType()))
    def _f(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = c2[None, :] - 2.0 * (X @ cents.T)  # + |x|² (constant per row)
        if n == 1:
            idx = d2.argmin(axis=1)[:, None]
        else:
            part = np.argpartition(d2, min(n, d2.shape[1] - 1), axis=1)[:, :n]
            order = np.take_along_axis(d2, part, axis=1).argsort(axis=1)
            idx = np.take_along_axis(part, order, axis=1)
        return pd.Series(list(idx.astype(np.int64)))

    return _f


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 11,
) -> DataFrame:
    """(query_id, corpus_id, cos_sim, rank) — IVF approximate top-k."""
    cents = train_centroids(corpus, vec_col, dim, n_lists=n_lists, seed=seed)
    assign1 = _nearest_lists_udf(cents, 1)
    probe_n = _nearest_lists_udf(cents, min(n_probe, len(cents)))
    c = corpus.select(F.col(corpus_id).alias("_cid"), F.col(vec_col).alias("_cv")).withColumn(
        "list_id", F.element_at(assign1(F.col("_cv")), 1)
    )
    q = queries.select(F.col(query_id).alias("_qid"), F.col(vec_col).alias("_qv")).withColumn(
        "list_id", F.explode(probe_n(F.col("_qv")))
    )
    cand = q.join(c, "list_id", "inner").filter(F.col("_qid") != F.col("_cid"))
    dot = F.expr(
        "aggregate(zip_with(_qv, _cv, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0.0 as double), (a, x) -> a + x)"
    )
    nrm = lambda col: F.sqrt(
        F.expr(f"aggregate({col}, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double))")
    )
    scored = cand.dropDuplicates(["_qid", "_cid"]).withColumn(
        # zero-norm vectors have no cosine: try_divide -> NULL, dropped
        # below (a zero embedding matches nothing; ANSI mode would raise)
        "cos_sim", F.round(F.try_divide(dot, nrm("_qv") * nrm("_cv")), 6)
    )
    w = Window.partitionBy("_qid").orderBy(F.col("cos_sim").desc(), F.col("_cid").asc())
    return (
        scored.filter(F.col("cos_sim").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            "cos_sim",
            "rank",
        )
    )
