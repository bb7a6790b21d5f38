"""Data mixing: exact per-stratum sampling for training-set composition.

A training run specifies its mixture as exact document COUNTS per stratum
(language, source, quality bucket): "40k en, 25k code, 10k fr…".
Spark's built-in ``sampleBy`` is Bernoulli — per-stratum counts only hit
the target in expectation, and a re-run resamples differently unless the
seed and partitioning both match. This operator gives:

* **exact quotas** — each stratum contributes min(quota, |stratum|) rows;
* **determinism** — selection order is a fixed multiplicative scramble of
  the id (Lehmer/MINSTD: h = (id mod P)·a(seed) mod P, P = 2³¹−1),
  so the same table and seed produce byte-identical samples on any
  cluster, any partitioning — reproducibility a training pipeline can cite;
* **uniformity** — the scramble is a bijection on [1, P): ordering by it
  is equivalent to ordering by a fixed pseudo-random permutation of ids.

Scale shape (round 6 — the r5 design ranked each stratum with ONE
``row_number`` window task, serializing a dominant stratum; a "90% en"
100 TB corpus would sort 90 TB in one task): selection of the quota
smallest scramble keys is a THRESHOLD problem, because the scramble is a
fixed bijection. Two bounded passes:

1. **Histogram pre-pass** — per (stratum, scramble-bucket) counts
   (map-side combinable, one small shuffle of ≤ strata×buckets rows),
   collected to the driver (≤ ``hist_buckets``·|quotas| tuples). The
   cumulative histogram locates, per stratum, the bucket b* containing
   the quota-th smallest scramble value.
2. **Map-side select** — rows in buckets < b* are selected with NO
   shuffle at all (pure filter against two broadcast literal maps); only
   the boundary bucket — |stratum|/hist_buckets rows, ~120k rows per
   10⁹-row stratum at the default 8192 — is exactly ranked by
   (scramble, id) to take the remaining quota slice.

The selected set is byte-identical to the full-sort definition (the
quota lexicographically-smallest (scramble, id) pairs per stratum) on
any partitioning; ties on the scramble value land in the same bucket by
construction, so the boundary rank resolves them with the id tie-break.
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


def _quota_map(quotas: dict, strata_col: str):
    return F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in kv]
    )[F.col(strata_col)]


def mix_strata(
    df: DataFrame,
    strata_col: str,
    quotas: dict,
    id_col: str,
    seed: int = 1,
    hist_buckets: int = 8192,
    boundary_cap: int = 262_144,
) -> DataFrame:
    """Exact deterministic per-stratum sample: up to ``quotas[stratum]``
    rows for each listed stratum (unlisted strata are dropped — a mixture
    is a whitelist), chosen by the scrambled-id order with ``id_col`` as
    the total tie-break. Equivalent to ranking each whole stratum by
    (scramble, id) and keeping rank ≤ quota, but only the boundary
    scramble-bucket (~|stratum|/``hist_buckets`` rows) is ever sorted —
    see the module docstring for the two-pass shape.

    ``boundary_cap`` adapts the resolution to the pass-1 counts: a
    stratum whose boundary bucket still holds more rows than the cap
    (~|stratum|/hist_buckets — 10⁸ rows for a 10¹²-row stratum at the
    default 8192) gets ONE extra histogram pass over that single bucket,
    subdividing it ``hist_buckets``-fold (effective resolution
    hist_buckets², ~15k boundary rows at 10¹² — per-task sort stays
    bounded at any stratum size for the cost of one more small scan)."""
    return _mix_weighted(
        df, strata_col, quotas, id_col, None, seed, hist_buckets,
        boundary_cap,
    )


def mix_strata_tokens(
    df: DataFrame,
    strata_col: str,
    token_quotas: dict,
    id_col: str,
    tokens_col: str,
    seed: int = 1,
    hist_buckets: int = 8192,
    boundary_cap: int = 262_144,
) -> DataFrame:
    """Token-BUDGET mixture: training mixes are usually specified as token
    shares ("700 B tokens web, 300 B code"), not document counts — a
    document-count quota over strata with different length distributions
    silently skews the token mix. Selects, per stratum, the minimal prefix
    of the (scramble, id) order whose token sum reaches
    ``token_quotas[stratum]``: every document whose EXCLUSIVE running sum
    is still below the quota is kept, so the selection overshoots by at
    most one document and a re-run is byte-identical on any partitioning
    (same determinism contract as :func:`mix_strata`). Strata with fewer
    total tokens than their quota contribute everything; NULL token
    counts weigh 0 (kept for free when they land before the boundary).
    Token counts must be ≥ 0 — a negative weight makes the running sum
    non-monotone and the bucket-threshold decomposition (and "minimal
    prefix" itself) meaningless.

    Scale shape: identical two-pass threshold as :func:`mix_strata` with
    the histogram aggregating SUM(tokens) per scramble-bucket instead of
    counts — the boundary bucket (the only exactly-scanned slice, ≤
    ``boundary_cap`` rows after the adaptive refinement) takes its slice
    by exclusive running token sum instead of row rank. Token sums stay
    inside int64 (10¹² docs × 10⁵ tokens < 2⁶³)."""
    return _mix_weighted(
        df, strata_col, token_quotas, id_col, tokens_col, seed,
        hist_buckets, boundary_cap,
    )


def _mix_weighted(
    df: DataFrame,
    strata_col: str,
    quotas: dict,
    id_col: str,
    tokens_col: str | None,
    seed: int,
    hist_buckets: int,
    boundary_cap: int,
) -> DataFrame:
    """Shared two-pass threshold selection. ``tokens_col=None`` is the
    document-count form (quota-th smallest rank, via ``row_number`` so the
    boundary window keeps Spark's rank-limit pushdown); a column name is
    the token-budget form (minimal quota-reaching prefix, via exclusive
    running sum). Weight-1 running sums and ranks select identical sets —
    cum_excl < rem ⟺ row_number ≤ rem — so both forms share every other
    line: histogram, boundary location, adaptive refinement, map-side
    below-filter."""
    weighted = tokens_col is not None
    bw = _P // hist_buckets + 1  # bucket width; _b = scramble // bw < hist_buckets
    keyed = (
        df.withColumn("_quota", _quota_map(quotas, strata_col))
        .filter(F.col("_quota").isNotNull())
        .withColumn("_h", scramble(id_col, seed))
        .withColumn("_b", F.expr(f"_h div {bw}"))  # exact integer division
    )
    if weighted:
        keyed = keyed.withColumn(
            "_w", F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
        )
    # the selector metric (_n: rows, or token sums) locates the boundary;
    # _c (rows) is what the refinement cap compares — a bucket's TOKEN sum
    # exceeding the cap says nothing about its per-task sort size
    aggs = (
        [F.sum("_w").alias("_n"), F.count(F.lit(1)).alias("_c")]
        if weighted else [F.count(F.lit(1)).alias("_n")]
    )

    # Pass 1: bounded histogram (map-side combine; ≤ |quotas|·hist_buckets
    # rows reach the driver). This is an eager action by design — the two
    # maps it produces are pure literals, so the main plan stays lazy.
    hist, hrows = {}, {}
    for r in keyed.groupBy(strata_col, "_b").agg(*aggs).collect():
        hist.setdefault(r[strata_col], {})[r["_b"]] = r["_n"]
        hrows.setdefault(r[strata_col], {})[r["_b"]] = (
            r["_c"] if weighted else r["_n"]
        )

    bstar, remaining = {}, {}
    for stratum, buckets in hist.items():
        quota = quotas[stratum]
        total = sum(buckets.values())
        if total <= quota:
            bstar[stratum] = hist_buckets  # every bucket < hist_buckets: take all
            remaining[stratum] = 0
            continue
        below = 0
        for b in sorted(buckets):
            if below + buckets[b] >= quota:
                bstar[stratum] = b
                remaining[stratum] = quota - below
                break
            below += buckets[b]

    drop_cols = ["_quota", "_h", "_b"] + (["_w"] if weighted else [])
    if not bstar:  # no listed stratum present
        return keyed.filter(F.lit(False)).drop(*drop_cols)

    # Pass 1b (optional): refine any stratum whose boundary bucket is
    # still bigger than boundary_cap — one more bounded histogram, over
    # that one bucket only, subdivided hist_buckets-fold.
    bw2 = bw // hist_buckets + 1  # sub-bucket width within a bucket
    over = sorted(
        s for s, b in bstar.items()
        if b < hist_buckets and hrows[s].get(b, 0) > boundary_cap
    )
    b2star, rem2 = {}, {}
    if over:
        bstar_lit = F.create_map(
            *[F.lit(x) for s in over for x in (s, bstar[s])]
        )[F.col(strata_col)]
        sub_src = keyed.filter(
            F.col(strata_col).isin(over) & (F.col("_b") == bstar_lit)
        ).withColumn("_b2", F.expr(f"(_h % {bw}) div {bw2}"))
        hist2 = {}
        for r in sub_src.groupBy(strata_col, "_b2").agg(*aggs).collect():
            hist2.setdefault(r[strata_col], {})[r["_b2"]] = r["_n"]
        for s in over:
            need, below = remaining[s], 0
            for b2 in sorted(hist2.get(s, {})):
                if below + hist2[s][b2] >= need:
                    b2star[s] = b2
                    rem2[s] = need - below
                    break
                below += hist2[s][b2]

    bstar_col = F.create_map(
        *[F.lit(x) for kv in bstar.items() for x in kv]
    )[F.col(strata_col)]
    rem_col = F.create_map(
        *[F.lit(x) for kv in remaining.items() for x in kv]
    )[F.col(strata_col)]

    # Pass 2a: everything strictly below the boundary — a pure map-side
    # filter, no shuffle, no sort (refined strata also keep the boundary
    # bucket's sub-buckets below their sub-boundary filter-only).
    b2_expr = F.expr(f"(_h % {bw}) div {bw2}")
    below_cond = F.col("_b") < bstar_col
    edge_cond = F.col("_b") == bstar_col
    rank_cap = rem_col
    if b2star:
        b2star_col = F.create_map(
            *[F.lit(x) for kv in b2star.items() for x in kv]
        )[F.col(strata_col)]
        rem2_col = F.create_map(
            *[F.lit(x) for kv in rem2.items() for x in kv]
        )[F.col(strata_col)]
        below_cond = below_cond | (
            edge_cond & b2star_col.isNotNull() & (b2_expr < b2star_col)
        )
        edge_cond = edge_cond & (
            b2star_col.isNull() | (b2_expr == b2star_col)
        )
        rank_cap = F.coalesce(rem2_col, rem_col)
    below_df = keyed.filter(below_cond)
    # Pass 2b: the (possibly refined) boundary bucket only takes the
    # remaining slice by exact (scramble, id) rank — row rank for the
    # count form (keeps Spark's rank-limit pushdown), exclusive running
    # token sum for the budget form (cum_excl < rem ⟺ rank ≤ rem at
    # weight 1, so the two are the same selection rule).
    wb = Window.partitionBy(strata_col).orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    if weighted:
        cum_excl = F.coalesce(
            F.sum("_w").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        edge_df = (
            keyed.filter(edge_cond)
            .withColumn("_ce", cum_excl)
            .filter(F.col("_ce") < rank_cap)
            .drop("_ce")
        )
    else:
        edge_df = (
            keyed.filter(edge_cond)
            .withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_rn") <= rank_cap)
            .drop("_rn")
        )
    return below_df.unionByName(edge_df).drop(*drop_cols)


def mix_strata_windowed(
    df: DataFrame,
    strata_col: str,
    quotas: dict,
    id_col: str,
    seed: int = 1,
) -> DataFrame:
    """The r5 single-window formulation (each stratum ranked in one task).
    Kept as the semantic reference for equivalence tests and as the
    skew-evidence baseline in bench.py — do NOT use on large strata: a
    dominant stratum sorts in a single task."""
    w = Window.partitionBy(strata_col).orderBy(
        scramble(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_quota", _quota_map(quotas, strata_col))
        .filter(F.col("_quota").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_quota", "_rn")
    )


def mix_strata_tokens_windowed(
    df: DataFrame,
    strata_col: str,
    token_quotas: dict,
    id_col: str,
    tokens_col: str,
    seed: int = 1,
) -> DataFrame:
    """Single-window semantic reference for :func:`mix_strata_tokens`
    (each stratum's running sum in one task — equivalence tests only,
    same caveat as mix_strata_windowed)."""
    w = Window.partitionBy(strata_col).orderBy(
        scramble(id_col, seed).asc(), F.col(id_col).asc()
    )
    cum_excl = F.coalesce(
        F.sum(F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        df.withColumn("_quota", _quota_map(token_quotas, strata_col))
        .filter(F.col("_quota").isNotNull())
        .withColumn("_ce", cum_excl)
        .filter(F.col("_ce") < F.col("_quota"))
        .drop("_quota", "_ce")
    )
