"""Aspect-ratio bucketing + deterministic batch formation for image training.

Multi-resolution image training (the NovelAI bucketing scheme, adopted by
SDXL-class pipelines) can't batch a portrait with a landscape: every
training batch must share one (w, h) resolution. Over the input table of
``(image_id, bytes, w, h, fmt, caption, phash)`` rows this needs:

1. **bucket generation** — a ladder of (bw, bh) resolutions under a pixel
   budget (:func:`make_aspect_buckets`, the NovelAI walk: enumerate
   heights, take the widest width that fits the budget, dedup);
2. **assignment** — each image goes to the bucket with the nearest
   log-aspect-ratio (:func:`assign_aspect_buckets`) — row-local against a
   broadcast literal ladder: the argmin is an ``array_min`` over a
   (distance, index) struct array, so ties break to the lower index and
   the whole step is one narrow codegen projection, no UDF, no shuffle;
3. **batch formation** — fixed ``batch_size`` groups within each bucket,
   deterministic on any partitioning (:func:`form_batches`). Same scale
   shape as operators/pack.py: a whole-bucket rank would sort the
   dominant bucket (most web images are near 4:3/16:9 — aspect buckets
   are SKEWED by nature) in one task, so images are first split into
   ~``target_docs``-image chunks by the MINSTD scramble and each
   (bucket, chunk) forms batches locally in one Arrow kernel. At most
   one partial batch per chunk (vs per bucket for a global rank) — a
   bounded, disclosed utilization loss of ≤ batch_size/target_docs.

``batch_id`` layout: aspect_idx·2⁴⁴ + chunk·2²⁰ + local (≤ 2²⁰ batches
per chunk — chunks hold ~target_docs ≪ 2²⁰·batch_size images).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .mix import scramble
from .pack import _auto_buckets


def make_aspect_buckets(
    max_pixels: int = 1024 * 1024,
    min_dim: int = 256,
    max_dim: int = 2048,
    step: int = 64,
) -> list[tuple[int, int]]:
    """The NovelAI bucket ladder: for each height multiple of ``step`` in
    [min_dim, max_dim], the widest step-multiple width with
    w·h ≤ max_pixels (and w ≤ max_dim), plus the transposes; deduped and
    sorted by aspect ratio. Pure function — unit-tested directly."""
    buckets = set()
    for h in range(min_dim, max_dim + 1, step):
        w = min((max_pixels // h) // step * step, max_dim)
        if w >= min_dim:
            buckets.add((w, h))
            buckets.add((h, w))
    return sorted(buckets, key=lambda b: (b[0] / b[1], b[0]))


def assign_aspect_buckets(
    images: DataFrame,
    buckets: list[tuple[int, int]],
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Adds (aspect_idx, bucket_w, bucket_h): the ladder bucket with the
    nearest |log(w/h) − log(bw/bh)|, ties to the lower index. Row-local
    codegen — the ladder rides along as an array-of-structs literal and
    ``array_min`` over (distance, index) structs is the argmin (struct
    ordering is lexicographic, so equal distances resolve to the lower
    index deterministically).

    NULL-on-bad-row: rows with NULL or non-positive w/h get NULL
    aspect_idx/bucket_w/bucket_h instead of crashing the job (Spark 4
    ANSI raises DIVIDE_BY_ZERO on a bare w/h) or — worse — silently
    landing in the most extreme portrait bucket (NULL distances sort
    FIRST in struct ordering, so an unguarded argmin returns ladder[0]
    for every corrupt row). One height-0 record in a 10¹²-image crawl
    must be filterable, not fatal, and never trainable-on."""
    entries = [
        F.struct(
            F.lit(float(math.log(bw / bh))).alias("lar"),
            F.lit(i).alias("idx"),
            F.lit(bw).alias("bw"),
            F.lit(bh).alias("bh"),
        )
        for i, (bw, bh) in enumerate(buckets)
    ]
    ladder = F.array(*entries)
    valid = (
        F.col(w_col).isNotNull() & F.col(h_col).isNotNull()
        & (F.col(w_col) > 0) & (F.col(h_col) > 0)
    )
    lar = F.log(
        F.try_divide(F.col(w_col).cast("double"), F.col(h_col).cast("double"))
    )
    best = F.when(
        valid,
        F.array_min(
            F.transform(
                ladder,
                lambda b: F.struct(
                    F.abs(b["lar"] - lar).alias("d"),
                    b["idx"].alias("idx"),
                    b["bw"].alias("bw"),
                    b["bh"].alias("bh"),
                ),
            )
        ),
    )
    return images.withColumn("_best", best).select(
        "*",
        F.col("_best")["idx"].alias("aspect_idx"),
        F.col("_best")["bw"].alias("bucket_w"),
        F.col("_best")["bh"].alias("bucket_h"),
    ).drop("_best")


def _batch_kernel(batch_size: int):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        aspect = int(pdf["aspect_idx"].iloc[0])
        chunk = int(pdf["_chunk"].iloc[0])
        s = pdf.sort_values(["_h", "_id"])  # works for string AND long ids
        n = len(s)
        local = np.arange(n) // batch_size
        n_full = n // batch_size
        base = (aspect << 44) | (chunk << 20)
        return pd.DataFrame(
            {
                "image_id": s["_id"].to_numpy(),
                "aspect_idx": aspect,
                "batch_id": base + local,
                "slot": (np.arange(n) % batch_size).astype(np.int32),
                "partial": local >= n_full,
            }
        )

    return kernel


def form_batches(
    images: DataFrame,
    buckets: list[tuple[int, int]],
    batch_size: int,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    seed: int = 1,
    n_chunks: int | None = None,
    target_docs: int = 4096,
) -> DataFrame:
    """(image_id, aspect_idx, batch_id, slot, partial) — every non-partial
    batch holds exactly ``batch_size`` images sharing one ladder bucket,
    in deterministic scramble order (byte-identical on any partitioning /
    cluster size). ≤ 1 partial batch per (bucket, chunk); join the output
    back on ``id_col`` to carry bytes/captions into the batch writer.

    Ids may be numeric OR string (the input-hint table uses string
    image_ids): strings take an xxhash64 surrogate into the MINSTD
    scramble; the output ``image_id`` keeps the input type. Rows with
    invalid w/h (NULL aspect_idx from assignment) are EXCLUDED from the
    output — corrupt metadata must never reach a training batch; diff
    the output ids against the input to audit them."""
    assigned = assign_aspect_buckets(images, buckets, w_col, h_col).filter(
        F.col("aspect_idx").isNotNull()
    )
    if n_chunks is None:
        n_chunks = _auto_buckets(images.count(), target_docs, 1 << 24)
    id_type = images.schema[id_col].dataType.simpleString()
    numeric = id_type in ("tinyint", "smallint", "int", "bigint", "long")
    key = F.col(id_col).cast("long") if numeric else F.xxhash64(F.col(id_col))
    src = assigned.select(
        F.col(id_col).alias("_id"),
        F.col("aspect_idx"),
        key.alias("_sid"),
    ).select(
        "_id",
        "aspect_idx",
        F.pmod(scramble("_sid", seed), F.lit(n_chunks)).alias("_chunk"),
        scramble("_sid", seed + 1).alias("_h"),
    )
    schema = (
        f"image_id {id_type}, aspect_idx int, batch_id long, slot int, "
        "partial boolean"
    )
    return src.groupBy("aspect_idx", "_chunk").applyInPandas(
        _batch_kernel(batch_size), schema
    )
