"""Streaming boilerplate-line removal (CCNet line-level dedup on a stream).

The batch operator (operators/textq.strip_boilerplate_lines) is a pure
per-document transform given a heavy-hitter line set, so the streaming
form needs no watermark state at all — what it DOES need is the same
mid-stream corpus refresh discipline as streaming/dedup's
``dedup_stream_against_corpus_refreshing``: the hot-line table is fed by
the incremental df-count loop (operators/textq.update_boilerplate_corpus,
one iceberg-lite snapshot per daily batch), and a long-running stream must
pick up newly-viral lines without a query restart.

Reference parity note: the reference (mansueto-institute/prclz) has no
streaming surface; this extends its batch-only model the same way the
rest of ``prclz_spark.streaming`` does.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.textq import strip_boilerplate_lines


def strip_boilerplate_stream(
    df: DataFrame,
    corpus_loader,
    id_col: str,
    text_col: str,
    sink_fn,
    refresh_every: int = 10,
    line_sep: str = "\n",
    min_line_chars: int = 1,
    max_broadcast_rows: int = 2_000_000,
):
    """Per-micro-batch boilerplate strip against a refreshing hot-line
    corpus. Returns a ``foreachBatch`` callable::

        fn = strip_boilerplate_stream(
            stream, lambda: read_boilerplate_corpus(spark, lines_t, 10),
            "doc_id", "text",
            sink_fn=lambda stripped, bid: stripped.write...)
        stream.writeStream.foreachBatch(fn).outputMode("append").start()

    ``corpus_loader``: zero-arg callable returning the CURRENT
    (line_hash, df) heavy-hitter table — e.g.
    ``lambda: read_boilerplate_corpus(spark, lines_table, min_df)``;
    re-reading inside the loader is what picks up snapshots the daily
    ``update_boilerplate_corpus`` loop appended since the last refresh.
    It is re-evaluated every ``refresh_every`` micro-batches and cached
    in between (the static side of the per-batch anti-join would
    otherwise re-run the corpus sum-merge on EVERY trigger); the fresh
    cache is materialized before the old one is unpersisted, so a failed
    refresh never leaves a batch uncovered, and the ``_refresh_epoch``
    literal keeps the two cache entries canonically distinct (same
    CacheManager pitfall as streaming/dedup — a path-based re-read after
    an append canonicalizes EQUAL to the previous read, making the
    re-cache a silent no-op and the unpersist a live-entry drop).

    ``sink_fn(stripped_df, batch_id)`` receives
    :func:`~prclz_spark.operators.textq.strip_boilerplate_lines` output
    (id, text_clean, n_lines, n_lines_removed, removed_char_frac) per
    micro-batch. Batch input (``df`` not streaming) runs the identical
    transform once with ``batch_id=0`` — the stream ≡ batch test hook.

    Scale shape: inherits the batch operator's sized-not-assumed
    anti-join — hitter table counted first (cached, so the probe is
    cheap), broadcast LEFT ANTI when ≤ ``max_broadcast_rows``, two-level
    head/tail anti-join above it. Viral lines never shuffle; the only
    per-batch exchange is the per-document reassembly.
    """
    state = {"hot": None, "cache": None, "next_refresh": 0, "epoch": 0}

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        if state["hot"] is None or batch_id >= state["next_refresh"]:
            state["epoch"] += 1
            fresh_cache = (
                corpus_loader()
                .select("line_hash", "df")
                .withColumn("_refresh_epoch", F.lit(state["epoch"]))
                .cache()
            )
            fresh_cache.count()  # materialize BEFORE dropping the old cache
            old = state["cache"]
            state["cache"] = fresh_cache
            state["hot"] = fresh_cache.drop("_refresh_epoch")
            state["next_refresh"] = batch_id + refresh_every
            if old is not None:
                old.unpersist()
        sink_fn(
            strip_boilerplate_lines(
                batch_df,
                id_col,
                text_col,
                line_sep=line_sep,
                min_line_chars=min_line_chars,
                boilerplate=state["hot"],
                max_broadcast_rows=max_broadcast_rows,
            ),
            batch_id,
        )

    if not df.isStreaming:
        fn(df, 0)
    return fn
