"""Streaming deduplication: drop exact/near duplicates from a document
feed as it lands.

At 10^12-document ingest scale, dedup cannot be a batch afterthought — a
re-crawl surge would flood downstream training shards before a nightly
job caught it. Structured Streaming gives the engine two operators:

* ``dedup_exact_stream`` — content-hash exact dedup with bounded state:
  ``dropDuplicatesWithinWatermark`` keeps each hash in state only for the
  watermark horizon (Iceberg-style ingest is append-mostly; a re-crawl
  dup lands within hours, so a 1-day horizon catches it with O(window)
  state instead of O(corpus)). The hash is xxhash64 of the text — the
  same key the batch operator groups on, so batch and stream agree.
* ``dedup_minhash_stream`` — near-dup candidate *marking* for a stream:
  computes the same banded MinHash keys as the batch LSH
  (operators/dedup.minhash_signatures) and drops rows whose (band,
  band_hash) was already seen inside the watermark — the streaming
  analogue of the batch bucket self-join; recall/precision follow the
  batch banding analysis. Per-band state, bounded by the watermark.

Both run the identical code path in batch mode (a batch DataFrame simply
has no watermark and dedups over the whole input), which is what the
batch-equivalence tests assert with trigger(availableNow=True).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_hash(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("content_hash", F.xxhash64(F.col(text_col)))


def dedup_exact_stream(
    df: DataFrame, text_col: str, ts_col: str, watermark: str = "1 day"
) -> DataFrame:
    """First occurrence of each content hash within the watermark horizon.

    Streaming input → stateful dropDuplicatesWithinWatermark (state evicts
    hashes older than the horizon). Batch input → plain dropDuplicates
    (whole-input dedup), so the same function serves both paths.
    """
    hashed = content_hash(df, text_col)
    if hashed.isStreaming:
        return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])


def _stream_bands(
    df: DataFrame, id_col: str, text_col: str, ts_col: str,
    num_perm: int, bands: int, k: int,
) -> DataFrame:
    """(id, ts, band, band_hash) rows via the SAME shared banding
    expression as the batch operators (operators.dedup._band_explode) —
    stream, batch, and persisted-corpus fingerprints all bucket
    identically."""
    from ..operators.dedup import _band_explode, minhash_signatures

    sigs = minhash_signatures(
        df.select(id_col, text_col, ts_col), id_col, text_col, num_perm, k
    )
    src = df.select(id_col, ts_col).join(sigs, id_col)
    return src.select(F.col(id_col), F.col(ts_col), _band_explode(num_perm, bands))


def dedup_stream_against_corpus(
    df: DataFrame,
    corpus_sigs: DataFrame,
    id_col: str,
    text_col: str,
    ts_col: str,
    watermark: str = "1 day",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
) -> DataFrame:
    """Incremental near-dup suppression of a stream against a PERSISTED
    corpus (the streaming face of operators.dedup.minhash_pairs_against):
    the stream's band rows are LEFT-ANTI joined per micro-batch against
    the static corpus band table — Structured Streaming's stream-static
    join, so the corpus needs no stream state at all — and the surviving
    bands then pass the watermark-bounded within-stream dedup.

    A row is suppressed iff ANY of its bands collides with the corpus OR
    with a within-horizon arrival (finish with suppress_ids(), same
    one-stateful-operator contract as dedup_minhash_stream).

    Precision contract — band COLLISION is the decision, with no Jaccard
    verify (the same contract as dedup_minhash_stream; a per-row verify
    would need a second stateful aggregation the one-operator streaming
    budget does not allow). A single agreeing band implies only ~4
    agreeing minhash slots, so moderately-similar non-duplicates are
    sometimes suppressed (≈1−(1−j⁴)¹⁶ per corpus doc at Jaccard j); size
    bands/num_perm for the target false-suppression rate, and use the
    batch `dedup-batch` loop where verified-pair precision matters.

    ``corpus_sigs``: a static (id, sig) DataFrame — e.g.
    ``iceberg_lite.read(spark, table)``; snapshots appended between
    restarts are picked up at query (re)start, the streaming-native
    version of the daily `dedup-batch` loop. The corpus band table is
    cached: Spark re-evaluates the static side of a stream-static join
    on EVERY micro-batch, so without the cache each trigger would re-band
    the whole corpus. Batch input runs the identical path minus the
    watermark (stream≡batch test)."""
    from ..operators.dedup import _band_explode

    corpus_bands = (
        corpus_sigs.select(_band_explode(num_perm, bands))
        .select("band", "band_hash")
        .dropDuplicates()
    )
    if df.isStreaming:
        corpus_bands = corpus_bands.cache()
    banded = _stream_bands(df, id_col, text_col, ts_col, num_perm, bands, k).join(
        corpus_bands, ["band", "band_hash"], "left_anti"
    )
    if banded.isStreaming:
        return banded.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["band", "band_hash"]
        )
    from pyspark.sql.window import Window

    w = Window.partitionBy("band", "band_hash").orderBy(ts_col, id_col)
    fresh = (
        banded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return suppress_ids(fresh, id_col, bands)


def dedup_stream_against_corpus_refreshing(
    df: DataFrame,
    corpus_loader,
    id_col: str,
    text_col: str,
    ts_col: str,
    sink_fn,
    refresh_every: int = 10,
    watermark: str = "1 day",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
):
    """dedup_stream_against_corpus with a MID-STREAM corpus refresh (r5
    VERDICT #5): the plain variant caches the corpus band table once at
    query start, so snapshots appended by the daily `dedup-batch` loop
    stay invisible until query restart (and repeated invocations pile up
    cached RDDs). This variant moves the corpus anti-join into a
    ``foreachBatch`` callable that re-evaluates ``corpus_loader`` every
    ``refresh_every`` micro-batches, unpersisting the previous cache
    (the new cache is materialized before the old one is dropped, so a
    failed refresh never leaves the join uncovered).

    Operator order is FLIPPED vs the plain variant — within-stream
    watermark dedup in the stream graph, corpus anti-join per sink batch
    — which selects the same survivors: a band is suppressed iff it is
    in the corpus or seen earlier within the horizon, and both orders
    compute exactly that disjunction (a first-arrival band that is also
    a corpus band wins the in-stream state, then dies at the corpus
    join; its later re-arrivals die in-stream — dead either way).

    Usage::

        survivors, fn = dedup_stream_against_corpus_refreshing(
            stream, lambda: IL.read(spark, table), "doc_id", "text", "ts",
            sink_fn=lambda ids_df, bid: ids_df.write...,
            refresh_every=10)
        survivors.writeStream.foreachBatch(fn).outputMode("append").start()

    ``corpus_loader``: zero-arg callable returning the CURRENT static
    (id, sig) DataFrame — e.g. ``lambda: iceberg_lite.read(spark, t)``;
    re-reading inside the loader is what picks up new snapshots.
    ``sink_fn(survivor_ids_df, batch_id)`` receives the suppress_ids()
    output per micro-batch. Returns ``(survivor_bands_stream, fn)``."""
    from ..operators.dedup import _band_explode

    banded = _stream_bands(df, id_col, text_col, ts_col, num_perm, bands, k)
    if banded.isStreaming:
        survivors = banded.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["band", "band_hash"]
        )
    else:  # batch: deterministic earliest-(ts, id) band winners
        from pyspark.sql.window import Window

        w = Window.partitionBy("band", "band_hash").orderBy(ts_col, id_col)
        survivors = (
            banded.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    state = {"bands": None, "cache": None, "next_refresh": 0, "epoch": 0}

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        if state["bands"] is None or batch_id >= state["next_refresh"]:
            # The `_refresh_epoch` literal makes each refresh's plan
            # canonically DISTINCT: Spark's cache manager keys entries by
            # canonicalized plan, and a path-based parquet re-read after
            # an append canonicalizes EQUAL to the previous read — so
            # without the tag the re-cache is a silent no-op and
            # `old.unpersist()` drops the only live entry, leaving the
            # corpus re-evaluated on every later micro-batch (measured:
            # CacheManager size 0 after one refresh cycle). With the tag,
            # entries coexist and unpersist hits only its own epoch.
            state["epoch"] += 1
            fresh_cache = (
                corpus_loader()
                .select(_band_explode(num_perm, bands))
                .select("band", "band_hash")
                .dropDuplicates()
                .withColumn("_refresh_epoch", F.lit(state["epoch"]))
                .cache()
            )
            fresh_cache.count()  # materialize BEFORE dropping the old cache
            old = state["cache"]
            state["cache"] = fresh_cache
            state["bands"] = fresh_cache.drop("_refresh_epoch")
            state["next_refresh"] = batch_id + refresh_every
            if old is not None:
                old.unpersist()
        kept = batch_df.join(state["bands"], ["band", "band_hash"], "left_anti")
        sink_fn(suppress_ids(kept, id_col, bands), batch_id)

    return survivors, fn


def dedup_minhash_stream(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ts_col: str,
    watermark: str = "1 day",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
) -> DataFrame:
    """Near-dup suppression on a stream: a row is dropped when ANY of its
    LSH band keys was seen within the watermark. Implemented as
    explode(bands) → stateful dedup on (band, band_hash) → survivors =
    rows that kept ALL their bands (a row whose every band is fresh
    cannot be a near-dup of anything in the horizon; one stale band is
    enough to flag it).

    Returns the deduplicated (id, band-count) frame; `bands_kept < bands`
    never appears in the output — such rows were suppressed.
    """
    banded = _stream_bands(df, id_col, text_col, ts_col, num_perm, bands, k)
    if banded.isStreaming:
        # first ARRIVAL wins a band (stateful, watermark-bounded state).
        # Append mode supports ONE stateful operator, so the streaming
        # path returns the band SURVIVORS (id, ts, band, band_hash);
        # callers aggregate bands_kept >= bands per sink batch /
        # foreachBatch — see suppress_ids() and tests/test_streaming.py.
        return banded.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["band", "band_hash"]
        )
    else:
        # batch analogue must pick band winners DETERMINISTICALLY (plain
        # dropDuplicates keeps an arbitrary row per key — exact clones
        # could split the 16 bands between them and BOTH die): the
        # earliest (ts, id) row wins every contested band, so the first
        # occurrence always survives with all its bands
        from pyspark.sql.window import Window

        w = Window.partitionBy("band", "band_hash").orderBy(ts_col, id_col)
        fresh = (
            banded.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return suppress_ids(fresh, id_col, bands)


def suppress_ids(fresh_bands: DataFrame, id_col: str, bands: int = 16) -> DataFrame:
    """(id, bands_kept) rows for documents that kept ALL their bands —
    the suppression aggregate, applied batch-side (or per sink batch for
    the streaming survivors)."""
    return (
        fresh_bands.groupBy(id_col)
        .agg(F.count("*").alias("bands_kept"))
        .filter(F.col("bands_kept") >= bands)
    )


# ---------------------------------------------------------------------------
# phash (image) streaming near-dup — VERIFIED, not collision-only
# ---------------------------------------------------------------------------
#
# The text tiers above use band COLLISION as the streaming decision (their
# band keys are 64-bit hashes — a collision already implies similarity).
# phash bands are 16-bit byte-pair values (operators.dedup._phash_band_array):
# two UNRELATED codes collide on some band with p ≈ 28/2¹⁶ ≈ 4·10⁻⁴, so a
# collision-only stream would false-suppress ~1 in 2300 fresh images per
# in-horizon image — unusable beyond toy horizons. The streaming image
# operator therefore VERIFIES: state per (band, band_val) key holds the
# in-horizon codes, and a new arrival is flagged only when a stored code is
# within ``max_hamming`` bits (the same inline-verify contract as the batch
# tier, via applyInPandasWithState — §2.8's arbitrary-stateful surface).
#
# Recall equals the batch tier's (exact at Hamming ≤ 6: both codes of a
# ≤6-bit pair share a clean byte pair, hence a band key — and the pair is
# then Hamming-verified in that key's group). State is horizon-bounded by
# event-time pruning; each image lands in 28 (band, band_val) keys out of
# 28·2¹⁶ ≈ 1.8M, so the expected entries per live key ≈ H/2¹⁶ for an
# in-horizon population H (≈1.5k at H=10⁸, well under the default
# ``state_cap`` of 4096; the cap drops OLDEST codes first and is disclosed
# recall loss beyond it — total state is 28·H entries ≈ 67 GB of
# (id, code, ts) at H=10⁸, sharded across executors by the key hash).

import numpy as np
import pandas as pd

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _hamming_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(len(a), len(b)) pairwise Hamming distances between uint64 codes
    (numpy<2 has no bitwise_count: XOR → uint8 view → 256-entry popcount
    table → sum over the 8 bytes)."""
    if not len(a) or not len(b):
        return np.zeros((len(a), len(b)), dtype=np.int64)
    x = np.ascontiguousarray(a[:, None] ^ b[None, :])
    return _POP8[x.view(np.uint8).reshape(len(a), len(b), 8)].sum(
        axis=2, dtype=np.int64
    )


def _phash_verdict_state_func(
    key, pdfs, state, max_hamming: int, horizon_us: int, state_cap: int
):
    """Per-(band, band_val) state: arrival-ordered (ids, codes, ts_us)
    arrays of the in-horizon codes. Every arrival is appended (an earlier
    row suppresses later ones even if it was itself suppressed in another
    band — first-occurrence semantics, same as the batch orientation);
    the emitted ``dup_of`` is the EARLIEST in-state match so the global
    min over band groups is well-defined."""
    if state.hasTimedOut:
        state.remove()
        return
    batch = pd.concat(list(pdfs))
    if not len(batch):
        return
    batch = batch.sort_values(["ts_us", "_pid"])
    if state.exists:
        ids_b, codes_b, ts_b = state.get
        ids = np.frombuffer(ids_b, dtype=np.int64).copy()
        codes = np.frombuffer(codes_b, dtype=np.uint64).copy()
        tss = np.frombuffer(ts_b, dtype=np.int64).copy()
    else:
        ids = np.zeros(0, dtype=np.int64)
        codes = np.zeros(0, dtype=np.uint64)
        tss = np.zeros(0, dtype=np.int64)
    new_ids = batch["_pid"].to_numpy(np.int64)
    new_codes = batch["_code"].to_numpy(np.int64).view(np.uint64)
    new_tss = batch["ts_us"].to_numpy(np.int64)
    # Vectorized verdicts over DISTINCT codes. A viral exact-clone code
    # (blank thumbnails at crawl scale) funnels its whole micro-batch
    # share into ONE key; any per-row or per-pair formulation is O(B²)
    # exactly where B is largest. Codes factorize first — the viral key
    # collapses to U=1 distinct code — the U×U Hamming test runs on
    # distinct codes only, and each row's verdict is two binary searches
    # per allowed code: state and earlier-batch candidate lists are kept
    # sorted by (ts, id), so "earliest eligible match" is the element at
    # searchsorted(ts_row − horizon) when it exists. Eligibility is
    # arrival precedence (state ∪ strictly-earlier batch rows) AND the
    # event-time window ts_cand ≥ ts_row − horizon — the horizon gates
    # the MATCH, not just state GC, so an entry that outlived it cannot
    # flag a new row even before GC drops it this trigger; and the pick
    # is the true earliest (ts, id) match, which coincides with arrival
    # order only when data arrives in order (late rows may not).
    B = len(new_ids)
    uniq, inv = np.unique(np.concatenate([codes, new_codes]), return_inverse=True)
    inv_s, inv_n = inv[: len(codes)], inv[len(codes):]
    allowed = _hamming_matrix(uniq, uniq) <= max_hamming

    # state candidates per distinct code, sorted by (ts, id)
    state_groups: dict = {}
    for v in np.unique(inv_s):
        m = inv_s == v
        o = np.lexsort((ids[m], tss[m]))
        state_groups[int(v)] = (tss[m][o], ids[m][o])
    # batch candidates per distinct code keep batch order, which IS
    # (ts, id) order — positions ascend alongside ts
    batch_groups: dict = {}
    for u in np.unique(inv_n):
        pos = np.nonzero(inv_n == u)[0]
        batch_groups[int(u)] = (pos, new_tss[pos], new_ids[pos])

    imax = np.iinfo(np.int64).max
    best_ts = np.full(B, imax, dtype=np.int64)
    best_id = np.full(B, imax, dtype=np.int64)
    found = np.zeros(B, dtype=bool)

    def _upd(rows, cts, cids):
        better = (cts < best_ts[rows]) | (
            (cts == best_ts[rows]) & (cids < best_id[rows])
        )
        r = rows[better]
        best_ts[r], best_id[r], found[r] = cts[better], cids[better], True

    for u, (pos_u, ts_u, _ids_u) in batch_groups.items():
        cut = ts_u - horizon_us
        for v in np.nonzero(allowed[u])[0]:
            sg = state_groups.get(int(v))
            if sg is not None:
                ts_v, id_v = sg
                k = np.searchsorted(ts_v, cut, side="left")
                ok = k < len(ts_v)
                if ok.any():
                    _upd(pos_u[ok], ts_v[k[ok]], id_v[k[ok]])
            bg = batch_groups.get(int(v))  # v may be state-only
            if bg is None:
                continue
            pos_v, ts_bv, id_bv = bg
            k = np.searchsorted(ts_bv, cut, side="left")
            m = np.searchsorted(pos_v, pos_u)  # candidates strictly before
            ok = k < m
            if ok.any():
                _upd(pos_u[ok], ts_bv[k[ok]], id_bv[k[ok]])

    out = list(
        zip(
            new_ids.tolist(),
            new_tss.tolist(),
            [int(i) if f else None for i, f in zip(best_id, found)],
            [int(t) if f else None for t, f in zip(best_ts, found)],
        )
    )
    ids = np.concatenate([ids, new_ids])
    codes = np.concatenate([codes, new_codes])
    tss = np.concatenate([tss, new_tss])
    keep = tss >= tss.max() - horizon_us
    if state_cap and keep.sum() > state_cap:
        order = np.nonzero(keep)[0]
        keep = np.zeros(len(tss), dtype=bool)
        keep[order[-state_cap:]] = True  # drop OLDEST beyond the cap
    ids, codes, tss = ids[keep], codes[keep], tss[keep]
    state.update((ids.tobytes(), codes.tobytes(), tss.tobytes()))
    yield pd.DataFrame(out, columns=["_pid", "ts_us", "dup_of", "dup_ts_us"])


def dedup_phash_stream(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    phash_col: str = "phash",
    max_hamming: int = 6,
    horizon: str = "1 day",
    state_cap: int = 4096,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming verified image near-dup (see the section comment): a row
    is flagged when ANY earlier in-horizon row's phash is within
    ``max_hamming`` bits. Streaming input → per-band verdict rows
    ``(id, ts_us, band, dup_of, dup_ts_us)`` (aggregate per sink batch
    with phash_suppress_verdicts — the one-stateful-operator contract,
    like the minhash stream). Batch input → the aggregated
    ``(id, ts_us, dup_of)`` verdicts directly, whole-input horizon, via
    the batch tier's pair kernel and the same event-time horizon window —
    the stream≡batch tests pin the two paths to identical results."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.dedup import _phash_band_array, phash_near_pairs_from_sigs

    horizon_us = int(pd.Timedelta(horizon).value // 1_000)
    src = df.select(
        F.col(id_col).cast("long").alias("_pid"),
        F.col(phash_col).cast("long").alias("_code"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
    )
    if df.isStreaming:
        # no withWatermark: state is event-time pruned INSIDE the state
        # function (entries older than max-seen-ts − horizon drop on every
        # trigger), so late rows are still verified instead of silently
        # discarded; idle keys evict via the optional processing-time
        # timeout
        banded = src.select(
            "_pid", "_code", "ts_us",
            F.posexplode(_phash_band_array("_code")).alias("band", "band_val"),
        )
        timeout = (
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        )

        def fn(key, pdfs, state):
            for out in _phash_verdict_state_func(
                key, pdfs, state, max_hamming, horizon_us, state_cap
            ):
                if idle_timeout_ms is not None:
                    state.setTimeoutDuration(idle_timeout_ms)
                yield out.assign(band=key[0])

        return banded.groupBy("band", "band_val").applyInPandasWithState(
            fn,
            "_pid long, ts_us long, dup_of long, dup_ts_us long, band int",
            "ids binary, codes binary, tss binary",
            "update",
            timeout,
        ).withColumnRenamed("_pid", id_col)
    # batch path: same semantics over the whole input, built on the batch
    # tier's verified pair kernel, with the same event-time horizon window
    sig = src.select(F.col("_pid").alias(id_col), F.col("_code").alias("phash"))
    pairs = phash_near_pairs_from_sigs(sig, id_col, max_hamming=max_hamming)
    both = pairs.selectExpr("id_a AS x", "id_b AS y").unionAll(
        pairs.selectExpr("id_b AS x", "id_a AS y")
    )
    t = src.select(F.col("_pid"), "ts_us")
    oriented = (
        both.join(t.selectExpr("_pid AS x", "ts_us AS ts_x"), "x")
        .join(t.selectExpr("_pid AS y", "ts_us AS ts_y"), "y")
        .filter(
            (F.col("ts_y") < F.col("ts_x"))
            | ((F.col("ts_y") == F.col("ts_x")) & (F.col("y") < F.col("x")))
        )
        .filter(F.col("ts_y") >= F.col("ts_x") - F.lit(horizon_us))
    )
    earliest = oriented.groupBy("x").agg(
        F.min_by(F.col("y"), F.struct("ts_y", "y")).alias("dup_of")
    )
    return (
        src.join(earliest.withColumnRenamed("x", "_pid"), "_pid", "left")
        .select(F.col("_pid").alias(id_col), "ts_us", "dup_of")
    )


def phash_suppress_verdicts(verdicts: DataFrame, id_col: str) -> DataFrame:
    """Aggregate the streaming per-band verdict rows to one
    ``(id, ts_us, dup_of)`` row per image (dup_of = the globally earliest
    flagged match, NULL ⇒ survivor) — applied per sink batch, the same
    contract as suppress_ids for the minhash stream."""
    return verdicts.groupBy(id_col, "ts_us").agg(
        F.min_by(
            F.col("dup_of"),
            F.when(
                F.col("dup_of").isNotNull(), F.struct("dup_ts_us", "dup_of")
            ),
        ).alias("dup_of")
    )
