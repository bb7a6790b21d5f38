"""Explicit hot-cell salting for the cover-cell equi-join (SURVEY.md §4.2).

A megacity H3 cell can hold 10⁶ buildings while the median cell holds a
handful — one straggler task dominates the stage. AQE's skew-join splitting
handles sort-merge skew generically, but the exploded-cover broadcast pattern
and grouped-kernel stages need it done explicitly (BASELINE.json north_rule:
"partitioning / shuffle / skew handled explicitly").

Strategy (classic two-sided salting):

1. cheap pre-pass: `groupBy(cell).count()` on the probe side, collect the
   cells above `hot_threshold` (tiny driver list — cells, not rows);
2. probe rows in a hot cell get `salt = pmod(hash(id), s)`, others salt 0;
3. build rows in a hot cell are replicated for every salt in [0, s);
4. join key becomes (cell, salt) — the hot cell's work now spreads over s
   tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_histogram(df: DataFrame, key: str = "cell") -> DataFrame:
    return df.groupBy(key).count()


def hot_cells(df: DataFrame, key: str = "cell", hot_threshold: int = 100_000) -> list:
    return [
        r[key]
        for r in cell_histogram(df, key).filter(F.col("count") >= hot_threshold).collect()
    ]


def salt_exploded_join(
    probe: DataFrame,
    build: DataFrame,
    key: str = "cell",
    salts: int = 8,
    probe_id: str = "id",
    hot_threshold: int = 100_000,
) -> DataFrame:
    """Inner-join probe⋈build on `key` with hot keys spread over `salts` tasks."""
    hot = hot_cells(probe, key, hot_threshold)
    if not hot:
        return probe.join(build, key, "inner")
    hot_col = F.col(key).isin(hot)
    p = probe.withColumn(
        "_salt",
        F.when(hot_col, F.pmod(F.xxhash64(F.col(probe_id)), F.lit(salts))).otherwise(F.lit(0)).cast("int"),
    )
    b = build.withColumn(
        "_salt",
        F.explode(F.when(hot_col, F.sequence(F.lit(0), F.lit(salts - 1))).otherwise(F.array(F.lit(0)))),
    )
    return p.join(b, [key, "_salt"], "inner").drop("_salt")
