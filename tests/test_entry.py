"""Driver-contract tests: entry smoke + queries/oracle registry coherence.
(The full oracle comparison runs via tools/check_oracle.py and the driver.)"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E


def test_registry_coherent():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 25
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle for unregistered query: {unknown}"
    # every oracle is non-empty SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"block_id", "geometry", "complexity", "centroids_multipoint"} <= cols


def test_oracle_queries_run_at_sf0001(spark):
    """Every oracle-checked query at least EXECUTES against sf0.001 (value
    comparison happens in tools/check_oracle.py / the driver at sf0.01)."""
    sf_dir = "/root/testdata/sf0.001"
    qs = E.queries()
    for name in ["q1_pricing_summary", "pip_join_pairs", "dedup_exact_hash", "ann_cosine_topk"]:
        assert qs[name](spark, sf_dir).count() >= 0
