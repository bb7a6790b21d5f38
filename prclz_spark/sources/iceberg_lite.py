"""Iceberg-style table layer: snapshot manifests, time travel, file pruning,
row-level (equality) deletes, optimistic multi-writer commits.

The north rule grounds the engine "over Iceberg tables of image + caption
pairs". No Iceberg runtime jars exist in this environment, so this module
implements the *table-format mechanics that matter to a query engine* on
plain parquet + JSON, Spark-idiomatically:

* **snapshots** — every append commits a new immutable snapshot whose
  manifest lists the data files it added; a snapshot references its parent,
  so the full file set of snapshot N is the union of the manifest chain
  (the same append-only manifest-list design as Iceberg's).
* **atomic commits** — data files are written first, then the manifest is
  written to a temp file and **hard-linked into place** (`os.link` fails
  with EEXIST if the id is taken): the link is simultaneously the atomic
  claim of the snapshot id AND the durable publish of complete manifest
  content. There is no claimed-but-unpublished window — a crash at any
  point leaves either no manifest (only unreferenced orphan data files) or
  a fully committed snapshot. The `version-hint` file is a read fast-path
  CACHE, not the commit point (round-4 ADVICE: a crash between an O_EXCL
  claim and a hint flip used to wedge the table forever; with link-commit
  the hint can lag without consequence).
* **optimistic concurrency** — appends are disjoint by construction, so on
  `CommitConflict` (another writer linked the same id first) the commit
  rebases: re-reads the current snapshot, re-targets parent+1, retries with
  bounded backoff. Both writers' rows land, history is linear (dense ids).
* **row-level deletes** — `delete_rows` commits a snapshot whose manifest
  references parquet tombstone files (equality deletes on one column);
  reads anti-join the tombstones. Deletes are *sequence-aware* like
  Iceberg's: a delete applies only to files added at or before the delete's
  snapshot, so re-appending a previously deleted id later is visible.
* **time travel** — ``read(spark, path, snapshot=k)`` reconstructs the file
  set AND the delete set as of snapshot k.
* **manifest-level file pruning** — each manifest records per-file min/max
  stats for the requested columns; ``read`` with a ``prune`` range consults
  the stats and hands Spark only the files that can match — the
  metadata-side half of predicate pushdown (Catalyst still pushes the
  row-level filter into the parquet scan of the surviving files).
* **per-partition lineage** — manifests record which append produced each
  file (``added_at``) and the row count it carried: the checkpoint/lineage
  evidence the north rule asks for, at the table layer (the pipeline
  Ledger provides the same per-region).
"""

from __future__ import annotations

import json
import os
import random
import time
import uuid
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession


def _local_path(uri: str) -> str:
    """input_file_name() returns a percent-encoded URI; decode file:// URIs
    to a plain filesystem path (spaces etc. round-trip), keep non-file
    schemes (s3a://, hdfs://) verbatim — Spark re-reads those as URIs."""
    parsed = urlparse(uri)
    if parsed.scheme in ("", "file"):
        return unquote(parsed.path)
    return uri


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _hint_file(path: str) -> str:
    return os.path.join(_meta_dir(path), "version-hint.txt")


def _manifest_file(path: str, snap: int) -> str:
    return os.path.join(_meta_dir(path), f"manifest-{snap:05d}.json")


def _max_manifest_id(path: str) -> int:
    try:
        names = os.listdir(_meta_dir(path))
    except FileNotFoundError:
        return -1
    ids = [
        int(n[len("manifest-"):-len(".json")])
        for n in names
        if n.startswith("manifest-") and n.endswith(".json")
    ]
    return max(ids, default=-1)


def current_snapshot(path: str) -> int:
    """Latest committed snapshot id, or -1 for an empty/new table.

    A manifest file only ever exists fully written (link-commit), so the
    directory scan is authoritative; the hint is a lower-bound cache that
    may lag a writer that crashed before refreshing it."""
    hint = -1
    try:
        with open(_hint_file(path)) as f:
            hint = int(f.read().strip())
    except (FileNotFoundError, ValueError):
        pass
    return max(hint, _max_manifest_id(path))


def create_table(path: str, schema_ddl: str) -> None:
    """Initialize an empty table with a frozen schema (DDL string)."""
    os.makedirs(_meta_dir(path), exist_ok=True)
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    with open(os.path.join(_meta_dir(path), "schema.json"), "w") as f:
        json.dump({"schema": schema_ddl}, f)


def table_schema(path: str) -> str:
    with open(os.path.join(_meta_dir(path), "schema.json")) as f:
        return json.load(f)["schema"]


class CommitConflict(RuntimeError):
    """Optimistic-concurrency conflict: another writer committed the same
    snapshot id first. The manifest link is atomic, so a snapshot id can
    never be silently clobbered; `append`/`delete_rows`/`compact_manifests`
    rebase-and-retry on this up to their ``max_retries`` (appends and
    deletes are disjoint additions, so a rebase is always safe — the same
    commit loop Iceberg runs). Raised to the caller only once retries are
    exhausted; the loser's data files are unreferenced orphans."""


def _commit(path: str, snap: int, manifest: dict) -> None:
    """Atomic single-step commit: manifest JSON is written complete to a
    temp file, then hard-linked to its final name. `os.link` fails with
    EEXIST if the id is taken (the atomic arbiter — of two racing writers
    exactly one wins) and links only complete content (no torn manifest is
    ever visible under a committed name). The version hint is refreshed
    afterwards as a pure cache — a crash before the refresh costs readers
    one directory scan, never correctness (round-4 ADVICE wedge fix)."""
    tmp = _manifest_file(path, snap) + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _manifest_file(path, snap))
    except FileExistsError:
        raise CommitConflict(
            f"snapshot {snap} was committed concurrently at {path}"
        ) from None
    finally:
        os.unlink(tmp)
    hint_tmp = _hint_file(path) + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(hint_tmp, "w") as fh:
        fh.write(str(snap))
    os.replace(hint_tmp, _hint_file(path))


def _commit_with_rebase(path: str, build_manifest, max_retries: int) -> int:
    """Run the optimistic commit loop: ``build_manifest(snap, parent)``
    returns the manifest dict for a target id; on CommitConflict the target
    is re-derived from the new table state and the build re-run (rebased),
    with jittered backoff, up to ``max_retries`` times."""
    for attempt in range(max_retries + 1):
        parent = current_snapshot(path)
        snap = parent + 1
        manifest = build_manifest(snap, parent if parent >= 0 else None)
        try:
            _commit(path, snap, manifest)
            return snap
        except CommitConflict:
            if attempt == max_retries:
                raise
            time.sleep(random.uniform(0.0, 0.02 * (2**attempt)))
    raise AssertionError("unreachable")


def append(
    df: DataFrame,
    path: str,
    stats_cols: list[str] | None = None,
    max_retries: int = 5,
    properties: dict | None = None,
) -> int:
    """Commit ``df`` as a new snapshot; returns the new snapshot id.

    The dataframe's schema must match the table schema exactly (simple
    names — Iceberg's id-based evolution is out of scope and appends are
    rejected on mismatch rather than silently coerced).

    ``stats_cols``: columns to record per-file min/max for (enables
    ``read(..., prune=(col, lo, hi))`` file skipping). Stats are computed
    distributed — one narrow agg per file via input_file_name().

    Data files are written once; only the (metadata-sized) manifest commit
    participates in the optimistic rebase loop on concurrent writers.

    ``properties``: opaque key/values recorded on the manifest (Iceberg's
    snapshot-summary properties). The streaming ingest sink stores
    ``{"query_id": ..., "batch_id": n}`` here to make micro-batch commits
    idempotent across restarts (see streaming/ingest.py and
    last_committed_batch).
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    want = spark.createDataFrame([], table_schema(path)).schema
    if [(f.name, f.dataType) for f in df.schema.fields] != [
        (f.name, f.dataType) for f in want.fields
    ]:
        raise ValueError(
            f"schema mismatch: table {want.simpleString()} vs append {df.schema.simpleString()}"
        )
    out_dir = os.path.join(path, "data", f"add-{uuid.uuid4().hex[:12]}")
    df.write.parquet(out_dir)
    per_file = _scan_file_stats(spark, out_dir, stats_cols or [])

    def build(snap: int, parent: int | None) -> dict:
        m = {
            "snapshot": snap,
            "parent": parent,
            "files": _file_entries(per_file, stats_cols or [], snap),
            "stats_cols": stats_cols or [],
        }
        if properties:
            m["properties"] = properties
        return m

    return _commit_with_rebase(path, build, max_retries)


def _scan_file_stats(spark: SparkSession, out_dir: str, stats_cols: list[str]):
    """Per-file (rows, min/max of stats_cols) — one narrow distributed agg
    via input_file_name()."""
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in stats_cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    return (
        spark.read.parquet(out_dir)
        .withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(*aggs)
        .collect()
    )


def _file_entries(per_file, stats_cols: list[str], snap: int) -> list[dict]:
    files = []
    for r in per_file:
        ent = {"path": _local_path(r["_file"]), "rows": r["_rows"], "added_at": snap}
        for c in stats_cols:
            ent[f"min_{c}"] = r[f"_min_{c}"]
            ent[f"max_{c}"] = r[f"_max_{c}"]
        files.append(ent)
    return sorted(files, key=lambda e: e["path"])


def _merge_ingest_watermarks(chain: list[dict]) -> dict:
    """Max committed micro-batch id per streaming query_id across a
    manifest chain — both directly-stamped commit properties and maps a
    prior compaction/rewrite carried (the recursive carry-forward rule:
    absorb direct AND previously-absorbed state, or a second absorption
    silently loses it)."""
    wm: dict = {}
    for m in chain:
        for qid, b in m.get("ingest_watermarks", {}).items():
            wm[qid] = max(wm.get(qid, -1), b)
        p = m.get("properties") or {}
        if "query_id" in p and "batch_id" in p:
            wm[p["query_id"]] = max(wm.get(p["query_id"], -1), p["batch_id"])
    return wm


def rewrite_data_files(spark: SparkSession, path: str, max_retries: int = 3) -> int:
    """Materialize deletes physically (Iceberg's rewrite-data-files): read
    the table as of the current snapshot (tombstones applied), write fresh
    data files, and commit a compacted snapshot whose manifest carries the
    new files, every stats column seen so far, and NO delete specs — reads
    after this touch one manifest and run zero anti-joins, so the
    per-query tombstone cost is bounded by rewrite cadence instead of
    delete volume. Time travel to pre-rewrite snapshots is unchanged (old
    manifests stay).

    Concurrency: unlike append, a rewrite is NOT a disjoint addition — a
    commit racing it would be silently dropped by a blind rebase — so on
    CommitConflict the WHOLE rewrite (read + write) re-runs against the
    new table state, up to ``max_retries`` times."""
    for attempt in range(max_retries + 1):
        base = current_snapshot(path)
        if base < 0:
            raise ValueError(f"cannot rewrite an empty table at {path}")
        stats_cols = sorted(
            {c for m in _manifests(path, base) for c in m.get("stats_cols", [])}
        )
        out_dir = os.path.join(path, "data", f"rewrite-{uuid.uuid4().hex[:12]}")
        read(spark, path, snapshot=base).write.parquet(out_dir)
        per_file = _scan_file_stats(spark, out_dir, stats_cols)
        snap = base + 1
        manifest = {
            "snapshot": snap,
            "parent": base,
            "files": _file_entries(per_file, stats_cols, snap),
            "stats_cols": stats_cols,
            # a rewrite absorbs the chain like a compaction does — the
            # streaming-ingest watermarks must ride along or a replayed
            # micro-batch after a rewrite would double-append
            "ingest_watermarks": _merge_ingest_watermarks(_manifests(path, base)),
            "includes_through": snap,
        }
        try:
            _commit(path, snap, manifest)
            return snap
        except CommitConflict:
            if attempt == max_retries:
                raise
            time.sleep(random.uniform(0.0, 0.02 * (2**attempt)))
    raise AssertionError("unreachable")


def delete_rows(
    ids: DataFrame, path: str, id_col: str, max_retries: int = 5
) -> int:
    """Commit an equality-delete snapshot: every table row whose ``id_col``
    appears in ``ids`` (a one-column DataFrame, or one containing that
    column) is removed from reads at this snapshot and after. Returns the
    delete snapshot id.

    This is the apply-step of the LLM-pipeline dedup loop (ingest → dedup →
    delete): the dedup verdict table's loser ids become tombstones.
    Mechanics mirror Iceberg's equality deletes:

    * tombstone ids are written as parquet data (never inlined into JSON —
      a 10⁹-row verdict stays distributed);
    * the manifest records the tombstone files + column + its own snapshot
      as the delete's sequence number;
    * reads anti-join the tombstones against data files with
      ``added_at <= delete snapshot`` only — re-appending an id AFTER the
      delete makes it visible again (sequence-aware, like Iceberg), and
      time travel to a pre-delete snapshot still sees the original rows.
    """
    want = {f.name for f in ids.sparkSession.createDataFrame([], table_schema(path)).schema.fields}
    if id_col not in want:
        raise ValueError(f"delete column {id_col!r} not in table schema")
    out_dir = os.path.join(path, "data", f"delete-{uuid.uuid4().hex[:12]}")
    ids.select(id_col).dropDuplicates().write.parquet(out_dir)
    spark = ids.sparkSession
    tomb_files = sorted(
        _local_path(r["_f"])
        for r in spark.read.parquet(out_dir)
        .selectExpr("input_file_name() as _f")
        .distinct()
        .collect()
    )

    def build(snap: int, parent: int | None) -> dict:
        return {
            "snapshot": snap,
            "parent": parent,
            "files": [],
            "stats_cols": [],
            "deletes": {"col": id_col, "paths": tomb_files, "as_of": snap},
        }

    return _commit_with_rebase(path, build, max_retries)


def compact_manifests(path: str, max_retries: int = 5) -> int:
    """Merge the manifest chain into one (VERDICT r3 #10): commits a new
    snapshot whose manifest carries the FULL file set visible so far (with
    per-file ``added_at`` lineage preserved) plus every still-active delete
    spec, marked ``includes_through`` so reads walk back at most one step —
    O(files), not O(appends). Older manifests are retained verbatim, so
    time travel to any pre-compaction snapshot still reconstructs exactly
    its file set. Returns the compaction snapshot id."""

    def build(snap: int, parent: int | None) -> dict:
        base = parent if parent is not None else -1
        chain = _manifests(path, base) if base >= 0 else []
        stats_cols = sorted({c for m in chain for c in m.get("stats_cols", [])})
        # carry BOTH directly-committed and previously-carried delete
        # specs: a prior compaction stores its deletes in deletes_carried
        # (no "deletes" key), so collecting only m["deletes"] would make a
        # SECOND compaction silently resurrect deleted rows
        carried = [d for m in chain for d in m.get("deletes_carried", [])]
        carried += [m["deletes"] for m in chain if m.get("deletes")]
        return {
            "snapshot": snap,
            "parent": parent,
            "files": sorted(files_at(path, base), key=lambda e: e["path"]),
            "stats_cols": stats_cols,
            "deletes_carried": carried,
            "ingest_watermarks": _merge_ingest_watermarks(chain),
            "includes_through": snap,
        }

    return _commit_with_rebase(path, build, max_retries)


def _snapshot_ids(path: str) -> list[int]:
    """All committed snapshot ids present on disk, ascending."""
    try:
        names = os.listdir(_meta_dir(path))
    except FileNotFoundError:
        return []
    return sorted(
        int(n[len("manifest-"):-len(".json")])
        for n in names
        if n.startswith("manifest-") and n.endswith(".json")
    )


def expire_snapshots(
    path: str,
    retain_last: int = 1,
    vacuum: bool = True,
    orphan_grace_seconds: float = 3600.0,
) -> dict:
    """Iceberg's expire-snapshots maintenance: drop manifests no retained
    snapshot's chain needs and (``vacuum``) delete data files nothing
    retained references — including orphans from appends that wrote data
    but crashed before their commit. Retains the most recent
    ``retain_last`` snapshots plus every manifest their chains reach, so
    it only frees history once a compaction/rewrite has made the recent
    chain self-contained (before that, every chain walks to snapshot 0
    and nothing is expirable — by design: expiry must never break a
    retained read). Time travel to an expired snapshot raises a clear
    ValueError.

    Orphan safety: a concurrent append writes its data directory BEFORE
    its manifest commit, so unreferenced files are only removed when
    older than ``orphan_grace_seconds`` (default 1 h — far beyond any
    write-to-commit window). Like compaction, this is a single
    maintenance writer by design; it never conflicts with concurrent
    appends (their new manifest ids are above the retained set).
    Returns {"expired": [...], "data_files_removed": n,
    "dirs_removed": n}.
    """
    import time as _time

    existing = _snapshot_ids(path)
    if not existing:
        return {"expired": [], "data_files_removed": 0, "dirs_removed": 0}
    retained = existing[-max(1, retain_last):]
    needed: set[int] = set()
    for snap in retained:
        needed.update(m["snapshot"] for m in _manifests(path, snap))
    expirable = [i for i in existing if i not in needed]
    referenced = {
        os.path.realpath(e["path"])
        for snap in retained
        for e in files_at(path, snap)
    }
    # delete-spec parquet tombstones referenced by retained manifests
    for snap in retained:
        for d in deletes_at(path, snap):
            referenced.update(os.path.realpath(q) for q in d.get("paths", []))
    for i in expirable:
        os.unlink(_manifest_file(path, i))
    removed_files = removed_dirs = 0
    if vacuum:
        cutoff = _time.time() - orphan_grace_seconds
        data_root = os.path.join(path, "data")
        for sub in sorted(os.listdir(data_root)):
            subdir = os.path.join(data_root, sub)
            if not os.path.isdir(subdir):
                continue
            # only DATA files count as vacuumable; Spark sidecars
            # (_SUCCESS, .crc) ride with their directory and are cleared
            # only once every data file in it is gone
            removed_here = 0
            for fn in os.listdir(subdir):
                if not fn.endswith(".parquet"):
                    continue
                fp = os.path.join(subdir, fn)
                if os.path.realpath(fp) in referenced:
                    continue
                if os.path.getmtime(fp) > cutoff:
                    continue  # possibly an in-flight append — grace period
                os.unlink(fp)
                removed_files += 1
                removed_here += 1
            rest = os.listdir(subdir)
            clearable = (
                not any(fn.endswith(".parquet") for fn in rest)
                # an in-flight write still has Spark's _temporary subdir
                # (or nothing yet) — leave anything non-flat, and anything
                # young UNLESS this very pass just vacuumed its data
                # (unlink refreshes the dir mtime)
                and all(os.path.isfile(os.path.join(subdir, fn)) for fn in rest)
                and (removed_here > 0 or os.path.getmtime(subdir) <= cutoff)
            )
            if clearable:
                for fn in rest:
                    os.unlink(os.path.join(subdir, fn))
                os.rmdir(subdir)
                removed_dirs += 1
    return {
        "expired": expirable,
        "data_files_removed": removed_files,
        "dirs_removed": removed_dirs,
    }


def _manifests(path: str, snapshot: int) -> list[dict]:
    """Manifest chain whose union is the table state at ``snapshot``:
    follow each manifest's explicit ``parent`` pointer (Iceberg's snapshot
    lineage — ids not on the chain, e.g. another branch's, are never read)
    until a compacted manifest (``includes_through``) absorbs the rest —
    after a compaction this is one read, not one per append."""
    out = []
    s: int | None = snapshot
    while s is not None and s >= 0:
        try:
            with open(_manifest_file(path, s)) as f:
                m = json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"snapshot {s} at {path} has been expired "
                f"(expire_snapshots) or never existed"
            ) from None
        out.append(m)
        if m.get("includes_through") is not None:
            break
        # pre-round-5 manifests always chained densely; default preserved
        s = m.get("parent", s - 1)
    out.reverse()
    return out


def files_at(path: str, snapshot: int | None = None,
             prune: tuple[str, object, object] | None = None) -> list[dict]:
    """File entries visible at ``snapshot`` (default: latest), optionally
    pruned to files whose [min,max] range for a stats column intersects
    [lo, hi]. Entries carry ``added_at`` lineage (manifests from before
    this field default to 0 — conservatively, every delete applies)."""
    snap = current_snapshot(path) if snapshot is None else snapshot
    if snap < 0:
        return []
    entries = [
        dict(e, added_at=e.get("added_at", 0))
        for m in _manifests(path, snap)
        for e in m["files"]
    ]
    if prune is not None:
        col, lo, hi = prune
        kept = []
        for e in entries:
            mn, mx = e.get(f"min_{col}"), e.get(f"max_{col}")
            if mn is None or mx is None:  # no stats recorded → cannot skip
                kept.append(e)
            elif not (mx < lo or mn > hi):
                kept.append(e)
        entries = kept
    return entries


def deletes_at(path: str, snapshot: int | None = None) -> list[dict]:
    """Active delete specs ({col, paths, as_of}) visible at ``snapshot``,
    oldest first — both directly committed and carried through compaction."""
    snap = current_snapshot(path) if snapshot is None else snapshot
    if snap < 0:
        return []
    out = []
    for m in _manifests(path, snap):
        out.extend(m.get("deletes_carried", []))
        if m.get("deletes"):
            out.append(m["deletes"])
    return sorted(out, key=lambda d: d["as_of"])


def last_committed_batch(path: str, query_id: str,
                         snapshot: int | None = None) -> int | None:
    """Highest micro-batch id committed for ``query_id`` at ``snapshot``
    (default: latest), or None — the idempotence watermark the streaming
    ingest sink consults before committing a (possibly re-delivered)
    batch. Reads manifest ``properties`` on the live chain plus the
    ``ingest_watermarks`` a compaction carried for absorbed manifests."""
    snap = current_snapshot(path) if snapshot is None else snapshot
    if snap < 0:
        return None
    best = -1
    for m in _manifests(path, snap):
        best = max(best, m.get("ingest_watermarks", {}).get(query_id, -1))
        p = m.get("properties") or {}
        if p.get("query_id") == query_id and "batch_id" in p:
            best = max(best, p["batch_id"])
    return None if best < 0 else best


def snapshot_before_batch(path: str, query_id: str, batch_id: int) -> int:
    """Highest snapshot whose ``query_id`` watermark is still < ``batch_id``
    — the time-travel anchor for crash replay: a re-run of batch N must
    read corpus state as of *before* N's own first-attempt commits, or it
    would match the batch against its own first-run survivors. Walks the
    snapshot ``parent`` chain from the head; returns -1 when the table is
    empty or every retained snapshot already includes ``batch_id`` (an
    expired pre-batch snapshot raises the usual expiry ValueError —
    loudly, never a silently-wrong corpus)."""
    snap = current_snapshot(path)
    while snap >= 0:
        last = last_committed_batch(path, query_id, snap)
        if last is None or last < batch_id:
            return snap
        with open(_manifest_file(path, snap)) as f:
            parent = json.load(f).get("parent")
        snap = parent if parent is not None else -1
    return -1


def read(spark: SparkSession, path: str, snapshot: int | None = None,
         prune: tuple[str, object, object] | None = None) -> DataFrame:
    """DataFrame over the table as of ``snapshot`` (time travel), reading
    only the files whose manifest stats can match ``prune=(col, lo, hi)``,
    minus any equality-deleted rows. Row-level filtering stays the caller's
    job (and Catalyst pushes it into the parquet scan of the surviving
    files); pruning is purely the metadata-side file skip.

    Deletes are applied per file group: a delete anti-joins only the files
    added at or before its snapshot (sequence-aware). The tombstone side is
    broadcast — delete verdicts are a small fraction of the corpus; the
    data side is never shuffled by the anti-join."""
    from pyspark.sql import functions as F

    entries = files_at(path, snapshot, prune)
    if not entries:
        return spark.createDataFrame([], table_schema(path))
    dels = deletes_at(path, snapshot)
    schema = spark.createDataFrame([], table_schema(path)).schema

    # group files by which deletes apply to them (usually 1-2 groups)
    groups: dict[tuple[int, ...], list[str]] = {}
    for e in entries:
        key = tuple(i for i, d in enumerate(dels) if d["as_of"] >= e["added_at"])
        groups.setdefault(key, []).append(e["path"])
    parts = []
    for key, paths in sorted(groups.items()):
        df = spark.read.schema(schema).parquet(*paths)
        for i in key:
            if not dels[i]["paths"]:  # empty delete set: nothing to drop
                continue
            tomb = spark.read.parquet(*dels[i]["paths"]).select(dels[i]["col"])
            df = df.join(F.broadcast(tomb), dels[i]["col"], "left_anti")
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
