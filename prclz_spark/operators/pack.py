"""Sequence packing: fill fixed token-budget contexts from a document pool.

Pretraining consumes documents as fixed-length contexts (e.g. 8192
tokens); feeding one short doc per context wastes the budget, so
pipelines PACK several docs per context. Exact global bin packing is
NP-hard and inherently sequential — the scalable form is:

1. **bucket** — each doc is assigned to one of ``n_buckets`` by the same
   deterministic MINSTD scramble as operators/mix.py (a pure function of
   the id: identical packing on any partitioning or cluster);
2. **pack within bucket** — one Arrow kernel per bucket runs first-fit-
   decreasing (FFD, guaranteed ≤ 11/9·OPT + 6/9 bins): docs sorted by
   (tokens desc, id), each placed into the first open context with room.

A bucket is the packing unit, so contexts never span buckets — the
utilization loss vs a global pack is O(1) contexts per bucket, negligible
when buckets hold thousands of docs; buckets bound both the kernel's
memory (its doc list) and the shuffle key cardinality. Docs longer than
the budget get a singleton context (truncation is the tokenizer's job,
not the packer's — flagged via ``overflow``).

Output: one row per context — (pack_id, doc_ids array, n_docs,
total_tokens, overflow). pack_id = bucket · 2³² + local index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .mix import scramble

_OUT_SCHEMA = (
    "pack_id long, doc_ids array<long>, n_docs int, total_tokens long, overflow boolean"
)


def _ffd_kernel(budget: int):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["_bucket"].iloc[0])
        order = np.lexsort((pdf["_id"].to_numpy(), -pdf["_tokens"].to_numpy()))
        ids = pdf["_id"].to_numpy()[order]
        toks = pdf["_tokens"].to_numpy()[order]
        packs: list[list[int]] = []
        totals: list[int] = []
        for i, t in zip(ids.tolist(), toks.tolist()):
            placed = False
            if t <= budget:
                # first-fit over open contexts (FFD because input is sorted
                # descending; the scan is short — fills close quickly)
                for p in range(len(packs)):
                    if totals[p] + t <= budget:
                        packs[p].append(i)
                        totals[p] += t
                        placed = True
                        break
            if not placed:
                packs.append([i])
                totals.append(t)
        base = bucket << 32
        return pd.DataFrame(
            {
                "pack_id": [base + p for p in range(len(packs))],
                "doc_ids": packs,
                "n_docs": [len(p) for p in packs],
                "total_tokens": totals,
                "overflow": [t > budget for t in totals],
            }
        )

    return kernel


_MAX_BUCKETS = (1 << 31) - 1  # pack_id = bucket·2³² + local needs bucket < 2³¹


def _auto_buckets(n: int, target_docs: int, max_buckets: int | None) -> int:
    """Bucket count for an ``n``-doc corpus at ~``target_docs`` docs per
    bucket, clamped to [1, min(max_buckets, 2³¹−1)]. Pure so the 10¹²-doc
    regime is unit-testable without 10¹² rows."""
    hard = _MAX_BUCKETS if max_buckets is None else min(max_buckets, _MAX_BUCKETS)
    return int(min(hard, max(1, n // target_docs)))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_buckets: int | None = None,
    seed: int = 1,
    target_docs: int = 4096,
    max_buckets: int | None = None,
) -> DataFrame:
    """Pack (id, token-count) rows into contexts of ≤ ``budget`` tokens.
    Deterministic: bucket assignment and in-bucket order are pure
    functions of the id, so the packing is byte-identical on any
    partitioning.

    ``n_buckets=None`` (default) auto-sizes to ~``target_docs`` docs per
    bucket from a count of the input (one narrow scan): a bucket is the
    packing unit, so too many buckets for the corpus strands docs in
    near-empty contexts (measured: 500 docs over 1024 buckets → 295
    contexts at 6% fill, vs 20 contexts at 92% with one bucket). Pass it
    explicitly to pin the task granularity at known corpus sizes.

    Auto-sizing is unbounded by default up to the 2³¹−1 pack_id-layout
    ceiling (the r5 cap of 65,536 broke the ~4096-doc bucket target past
    ~2.7·10⁸ docs — the kernel's in-memory doc list grew with the
    corpus). ``max_buckets`` re-caps it for callers who want coarser
    tasks. No bucket-of-buckets scheme is needed below the ceiling: a
    bucket is just a deterministic bounded group, and one scramble mod
    ``n_buckets`` provides exactly that — at 10¹² docs, 2.4·10⁸ buckets
    of ~4096 docs. The MINSTD value space (2³¹−1) quantizes bucket fill
    to multiples of ⌈id_range/2³¹⌉ docs (ids sharing ``id mod 2³¹−1``
    always co-bucket), a ±12% size spread at that scale; past the hard
    ceiling bucket size grows as n/2³¹ — still only ~4·10⁶ docs (64 MB
    kernel state) at an 8.8·10¹⁵-doc corpus."""
    if n_buckets is None:
        n_buckets = _auto_buckets(df.count(), target_docs, max_buckets)
    src = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(tokens_col).cast("long").alias("_tokens"),
        F.pmod(scramble(id_col, seed), F.lit(n_buckets)).alias("_bucket"),
    )
    return src.groupBy("_bucket").applyInPandas(_ffd_kernel(budget), _OUT_SCHEMA)
