"""Connected components (large-star/small-star): closure-correct dedup
clustering — verified against networkx ground truth, incl. hypothesis
random graphs, chains (the case per-pair keep-the-smaller gets wrong),
and the keep-one verdict."""

import networkx as nx
import numpy as np
from pyspark.sql import functions as F

from prclz_spark.operators.components import (
    connected_components,
    dedup_cluster_verdict,
)


def _nx_reps(edges):
    g = nx.Graph()
    g.add_edges_from(edges)
    want = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for n in comp:
            want[n] = m
    return want


def _run(spark, edges):
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in edges], "id_a long, id_b long"
    )
    got = {
        int(r.id): int(r.rep)
        for r in connected_components(df).collect()
    }
    return got


def test_components_chain_cycle_star_and_selfloop(spark):
    edges = (
        [(i, i + 1) for i in range(10, 17)]          # chain of 8
        + [(100, 101), (101, 102), (102, 100)]       # cycle
        + [(200, 201), (200, 202), (200, 203)]       # star
        + [(300, 300)]                               # self loop (dropped)
        + [(400, 401)] * 3                           # duplicate edges
    )
    got = _run(spark, edges)
    want = _nx_reps([(a, b) for a, b in edges if a != b])
    assert got == want
    # the chain proves transitive closure: every link resolves to 10
    assert all(got[i] == 10 for i in range(10, 18))


def test_components_random_graphs_match_networkx(spark):
    rng = np.random.default_rng(11)
    for trial in range(3):
        n = 120
        m = int(rng.integers(40, 160))
        edges = [
            (int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        assert _run(spark, edges) == _nx_reps(edges), trial


def test_dedup_cluster_verdict_keeps_one_per_component(spark):
    """A~B, B~C with no A~C pair: per-pair keep-the-smaller would keep A
    and kill both B and C — correct here — but D~E, E~F, F~D plus a chain
    G~H~I must each keep exactly ONE doc. The verdict is the closure."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (8, 9), (9, 7), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    v = dedup_cluster_verdict(pairs).toPandas()
    kept = sorted(v[v.keep].id)
    assert kept == [1, 7, 20]
    dropped = sorted(v[~v.keep].id)
    assert dropped == [2, 3, 8, 9, 21, 22, 23]
    assert dict(zip(v.id, v.rep)) == _nx_reps(
        [(1, 2), (2, 3), (7, 8), (8, 9), (9, 7), (20, 21), (21, 22), (22, 23)]
    )


def test_components_long_chain_logarithmic_rounds(spark):
    """A 200-node chain: naive min-label propagation needs ~200 rounds;
    large-star/small-star must converge inside the 25-round cap (O(log n))
    — this is the 100 TB property, a 10⁶-chain would need ~20 rounds."""
    edges = [(i, i + 1) for i in range(200)]
    got = _run(spark, edges)
    assert set(got.values()) == {0} and len(got) == 201


def test_dedup_cluster_verdict_by(spark):
    """Keep-best verdict: highest-resolution image survives each phash
    cluster, ties to the smaller id, unscored members never win, and the
    cluster KEY (rep) stays the component minimum."""
    from prclz_spark.operators.components import dedup_cluster_verdict_by

    # components: {1,2,3} (chain), {10,11}, {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    scores = spark.createDataFrame(
        [(1, 100), (2, 900), (3, 900), (10, 50), (21, 7)],
        "img_id long, pixels long",
    )  # 11 and 20 unscored
    out = {
        r["id"]: r.asDict()
        for r in dedup_cluster_verdict_by(
            pairs, scores, "img_id", "pixels"
        ).collect()
    }
    assert out[2]["keep"] and out[2]["keep_id"] == 2    # 900 tie -> smaller id
    assert not out[3]["keep"] and out[3]["keep_id"] == 2
    assert out[1]["rep"] == 1 and not out[1]["keep"]    # rep stays min id
    assert out[10]["keep"] and not out[11]["keep"]      # unscored loses
    assert out[21]["keep"] and not out[20]["keep"]      # only-scored wins
    # ascending: keep the LOWEST score (earliest-timestamp semantics)
    out2 = {
        r["id"]: r["keep"]
        for r in dedup_cluster_verdict_by(
            pairs, scores, "img_id", "pixels", ascending=True
        ).collect()
    }
    assert out2[1] and not out2[2] and not out2[3]
