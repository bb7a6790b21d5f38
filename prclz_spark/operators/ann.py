"""Approximate nearest neighbors over embedding columns.

Two tiers (SURVEY "similarity search" requirement):

* brute-force cosine top-k — the exact baseline, SQL-expressible and
  DuckDB-oracled (`__spark_entry__.ann_cosine_topk`);
* **LSH-bucketed top-k** (this module) — the 10⁹-vector scale path:
  corpus bucketed once by random-hyperplane signature, queries probe
  their own bucket plus all Hamming-1 neighbors (multi-probe), exact
  cosine only within the probed buckets, Window top-k per query.
  Candidate count ≈ (probes × corpus/2^planes) instead of |corpus|.
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
        "cos_sim", F.round(dot / (nrm("_qv") * nrm("_cv")), 6)
    )
    w = Window.partitionBy("_qid").orderBy(F.col("cos_sim").desc(), F.col("_cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            "cos_sim",
            "rank",
        )
    )
