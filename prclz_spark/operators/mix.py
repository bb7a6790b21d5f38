"""Data mixing: exact per-stratum sampling for training-set composition.

A training run specifies its mixture as exact document COUNTS per stratum
(language, source, quality bucket): "40k en, 25k code, 10k fr…".
Spark's built-in ``sampleBy`` is Bernoulli — per-stratum counts only hit
the target in expectation, and a re-run resamples differently unless the
seed and partitioning both match. This operator gives:

* **exact quotas** — each stratum contributes min(quota, |stratum|) rows;
* **determinism** — selection order is a fixed multiplicative scramble of
  the id (Lehmer/MINSTD: h = (id mod P + seed)·48271 mod P, P = 2³¹−1),
  so the same table and seed produce byte-identical samples on any
  cluster, any partitioning — reproducibility a training pipeline can cite;
* **uniformity** — the scramble is a bijection on [1, P): ordering by it
  is equivalent to ordering by a fixed pseudo-random permutation of ids.

Scale shape: one hash projection + one window rank per stratum partition
(a single shuffle on the strata column); quotas ride in as a broadcast
map literal. Oversized strata never materialize: rank > quota rows are
filtered before anything downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_P = 2_147_483_647  # 2^31 - 1 (prime)
_K = 48_271         # MINSTD multiplier, primitive root mod P


def scramble(id_col: str, seed: int = 1):
    """Deterministic pseudo-random sort key: (id mod P)·a(seed) mod P with
    a(seed) = (K + seed·2654435761) mod P (never 0 for seed ≥ 0 small).
    The seed must change the MULTIPLIER, not add a constant — an additive
    seed is an affine shift, which only ROTATES the circular order and
    barely changes a top-k selection. Distinct multipliers are genuinely
    distinct permutations of [1, P). All arithmetic stays far inside int64
    (no ANSI overflow) and the expression is replicable verbatim in ANSI
    SQL — the DuckDB oracle runs it character-for-character."""
    a = (_K + seed * 2654435761) % _P or 1
    return F.pmod(F.pmod(F.col(id_col), F.lit(_P)) * F.lit(a), F.lit(_P))


def mix_strata(
    df: DataFrame,
    strata_col: str,
    quotas: dict,
    id_col: str,
    seed: int = 1,
) -> DataFrame:
    """Exact deterministic per-stratum sample: up to ``quotas[stratum]``
    rows for each listed stratum (unlisted strata are dropped — a mixture
    is a whitelist), chosen by the scrambled-id order with ``id_col`` as
    the total tie-break."""
    quota_col = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in kv]
    )[F.col(strata_col)]
    w = Window.partitionBy(strata_col).orderBy(
        scramble(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_quota", quota_col)
        .filter(F.col("_quota").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_quota", "_rn")
    )
