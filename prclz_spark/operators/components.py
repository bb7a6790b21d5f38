"""Distributed connected components — the dedup-cluster closure operator.

Near-dup PAIRS are not a dedup verdict: with A~B and B~C (but no A~C
pair), per-pair keep-the-smaller loses B and C while keeping A — the B↔C
link is honored, but a chain D~E~F~G collapses only if the closure is
taken. Real training-data pipelines cluster the pair graph first and keep
one document per component. This module computes components with the
**alternating large-star / small-star algorithm** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) in pure
DataFrame ops:

    large-star: every node points its LARGER neighbors at the minimum of
                its closed neighborhood;
    small-star: every node folds its smaller-or-equal neighbors onto that
                minimum.

Each round is two groupBy/join passes; the edge set converges to a star
forest (every node → its component minimum) in O(log n) rounds — not
O(diameter) like naive label propagation, which is the difference between
5 and 10⁶ rounds on a 10⁶-long chain. No driver-side graph state: the
driver only checks the convergence fingerprint (a count + hash agg, two
scalars per round); `localCheckpoint` truncates the growing lineage the
same way the kNN ring loop does.

Scale shape: each pass shuffles the CURRENT edge set on its source key
only. Skewed stars (a viral near-dup cluster) are exactly what the
algorithm produces on purpose — the star center's groupBy row is one
(key, min) aggregation, not a materialized neighbor list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame, a: str, b: str) -> DataFrame:
    """Distinct undirected edges as (u, v) with u < v; self-loops dropped."""
    return (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _large_star(e: DataFrame) -> DataFrame:
    """(u,v) undirected → for each node x: m = min(Γ(x) ∪ {x}); emit
    (y, m) for every neighbor y > x, plus (x, m)."""
    bid = e.select("u", "v").unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = bid.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    out = (
        bid.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .unionAll(m.select(F.col("u").alias("a"), F.col("m").alias("b")))
    )
    return _canon(out, "a", "b")


def _small_star(e: DataFrame) -> DataFrame:
    """Orient every edge high→low; for each high node x: m = min of its
    low neighbors (∪ {x}); emit (y, m) for every low neighbor y, plus
    (x, m)."""
    ori = e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    m = ori.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    out = (
        ori.join(m, "u")
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .unionAll(m.select(F.col("u").alias("a"), F.col("m").alias("b")))
    )
    return _canon(out, "a", "b")


def _fingerprint(e: DataFrame):
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # 31-bit-masked hashes: the sum stays far inside int64 (ANSI mode
        # makes a raw sum of xxhash64 longs an ARITHMETIC_OVERFLOW job-kill)
        F.coalesce(
            F.sum(F.xxhash64("u", "v").bitwiseAND(F.lit(0x7FFFFFFF))), F.lit(0)
        ).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    edges: DataFrame, a: str = "id_a", b: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """(id, rep) for every node appearing in ``edges`` — ``rep`` is the
    component's minimum id (isolated nodes never appear in a pair table;
    they are their own rep by definition and need no row)."""
    e = _canon(edges, a, b).localCheckpoint()
    fp = _fingerprint(e)
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        fp2 = _fingerprint(e2)
        e = e2
        if fp2 == fp:
            break
        fp = fp2
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # converged star forest: every edge is (member, component-min); the
    # minima themselves are their own rep
    members = e.select(F.col("v").alias("id"), F.col("u").alias("rep"))
    reps = e.select(F.col("u").alias("id"), F.col("u").alias("rep")).dropDuplicates(["id"])
    return members.unionByName(reps).dropDuplicates(["id"])


def dedup_cluster_verdict(
    pairs: DataFrame, a: str = "id_a", b: str = "id_b"
) -> DataFrame:
    """The transitive keep-one verdict over a near-dup pair table:
    (id, rep, keep) — ``keep`` is true only for each component's minimum
    id. Feed the ``keep = false`` ids to iceberg_lite.delete_rows to close
    the ingest → dedup → delete loop with a closure-correct verdict."""
    comp = connected_components(pairs, a, b)
    return comp.withColumn("keep", F.col("id") == F.col("rep"))


def dedup_cluster_verdict_by(
    pairs: DataFrame,
    scores: DataFrame,
    id_col: str,
    score_col: str,
    a: str = "id_a",
    b: str = "id_b",
    ascending: bool = False,
) -> DataFrame:
    """Keep-BEST verdict over a near-dup pair table: like
    dedup_cluster_verdict, but each component keeps the member with the
    best ``score_col`` from ``scores`` (highest by default — e.g. keep
    the highest-resolution copy of an image cluster via w*h, or the
    longest caption; ``ascending=True`` keeps the lowest, e.g. earliest
    timestamp). Ties break to the smaller id, so the verdict stays
    deterministic. Output: (id, rep, keep_id, keep) — ``rep`` is still
    the component-min id (the stable cluster KEY across runs; the winner
    can change as better copies arrive, the key cannot).

    Scale shape: one closure (O(log n) rounds), one join of the
    member table to the scores on id (shuffle on id — uniform), one
    per-component min_by/max_by aggregation. The scores frame only
    needs rows for ids appearing in ``pairs``."""
    comp = connected_components(pairs, a, b)
    sc = scores.select(
        F.col(id_col).alias("id"), F.col(score_col).alias("_score")
    )
    joined = comp.join(sc, "id", "left")
    # NULL scores lose to any scored member: min_by/max_by skip NULL
    # ordering keys only if the struct itself is NULL, so coalesce the
    # score into the worst rank instead
    worst = F.lit(float("inf"))
    order = F.struct(
        F.coalesce(
            (F.col("_score") if ascending else -F.col("_score")).cast("double"),
            worst,
        ).alias("s"),
        F.col("id").alias("id"),
    )
    winners = joined.groupBy("rep").agg(
        F.min_by(F.col("id"), order).alias("keep_id")
    )
    return (
        joined.join(winners, "rep")
        .withColumn("keep", F.col("id") == F.col("keep_id"))
        .select("id", "rep", "keep_id", "keep")
    )
