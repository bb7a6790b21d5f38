"""Text-quality repetition metrics and corpus-level boilerplate removal.

Two standard training-data curation steps the dedup tiers don't cover:

* ``repetition_metrics`` — the Gopher repetition filters (Rae et al. 2021,
  appendix A1): per-document duplicate-line / duplicate-n-gram fractions
  and top-n-gram concentration. A document repeating one paragraph fifty
  times is useless for training but is NOT a near-duplicate of anything
  else, so MinHash/SimHash never touch it — this is an intra-document
  signal. Every metric here is computed with row-local array expressions
  (sorted-array neighbor tests + an ``aggregate`` run-length scan), so the
  whole operator is one narrow projection: zero shuffle, zero UDF, full
  whole-stage codegen, trivially scale-safe at any corpus size.

* ``strip_boilerplate_lines`` — corpus-frequency line removal (the CCNet /
  RefinedWeb "dedup at line level" step): a line occurring in ≥ ``min_df``
  documents (navigation chrome, cookie banners, licence headers) is
  stripped from every document. Scale shape: the heavy-hitter line set is
  SMALL by definition (≤ total_lines / min_df distinct hashes — at 100 TB
  and min_df=1000, thousands of times smaller than the corpus), so it
  broadcasts; the probe side is a broadcast ANTI join — the hot keys that
  would wreck a shuffled join (a cookie banner shared by 10⁹ pages is the
  definition of a skewed key) never leave their map task. The single
  shuffle in the plan is the per-document reassembly, keyed by doc id —
  uniform by construction.

Reference scope note: prclz has no text pipeline; these extend the engine's
LLM-curation tier (SURVEY §2.8 extensions) alongside the dedup family in
operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_ngrams(words: Column, n: int) -> Column:
    """Array of space-joined word n-grams (empty below n words). Guarded:
    ``sequence(1, 0)`` is DESCENDING [1, 0] in Spark, not empty, so the
    short-document case must branch to an explicit empty array."""
    if n == 1:
        return words
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _dup_flags(sorted_arr: Column) -> Column:
    """flags[i] = 1 iff sorted_arr[i] equals a neighbor — i.e. the element
    belongs to a value class with count > 1 (works because the array is
    sorted, so equal values are adjacent). 1-indexed element_at; the
    neighbor accesses are short-circuit-guarded and the empty-array case
    branches explicitly (sequence(1, 0) is [1, 0], not empty)."""
    flags = F.transform(
        F.sequence(F.lit(1), F.size(sorted_arr)),
        lambda i: (
            ((i > 1) & (F.element_at(sorted_arr, i) == F.element_at(sorted_arr, i - 1)))
            | (
                (i < F.size(sorted_arr))
                & (F.element_at(sorted_arr, i) == F.element_at(sorted_arr, i + 1))
            )
        ).cast("int"),
    )
    return F.when(F.size(sorted_arr) > 0, flags).otherwise(
        F.array().cast("array<int>")
    )


def _sum_long(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)


def _top_run_chars(sorted_arr: Column) -> Column:
    """count × length(value) for the most frequent value of a SORTED array
    (the Gopher "characters contained in the top n-gram" accounting) via
    one run-length aggregate scan with (prev, run, best) state."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = (
            F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], (run * F.length(x)).cast("long")).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def _frac(num: Column, den: Column) -> Column:
    return F.round(F.try_divide(num.cast("double"), den.cast("double")), 6)


def repetition_metrics(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_ngram_sizes: tuple = (2, 3, 4),
    dup_ngram_sizes: tuple = (5, 6, 7),
    line_sep: str = "\n",
) -> DataFrame:
    """Per-document repetition metrics (the Gopher A1 family):

    * ``dup_line_frac`` / ``dup_line_char_frac`` — fraction of non-blank
      lines (and of their characters) that are duplicates within the doc;
    * ``top_{n}gram_char_frac`` — characters covered by the single most
      frequent word n-gram (count × gram length, over total text length),
      n ∈ ``top_ngram_sizes``;
    * ``dup_{n}gram_frac`` — fraction of word n-grams occurring more than
      once, n ∈ ``dup_ngram_sizes``.

    All fractions are NULL for empty/degenerate documents (try_divide).
    Typical thresholds (Gopher): dup_line_frac > 0.30,
    top_2gram_char_frac > 0.20, dup_5gram_frac > 0.15 ⇒ drop. Output keeps
    (id, n_words, n_lines) for downstream filters. One narrow row-local
    projection — no shuffle, no UDF.
    """
    # whitespace split (\s+), not spaces-only: word-per-line repetition
    # ("spam\nspam\nspam…") must count as repeated words, not one giant
    # token — the Gopher tokenization is whitespace-delimited
    words = F.filter(F.split(F.col(text_col), "\\s+"), lambda x: x != "")
    lines = F.filter(
        F.split(F.col(text_col), line_sep), lambda x: F.length(F.trim(x)) > 0
    )
    cur = (
        df.select(F.col(id_col), F.length(text_col).alias("_tlen"),
                  words.alias("_w"), lines.alias("_l"))
        .withColumn("n_words", F.size("_w"))
        .withColumn("n_lines", F.size("_l"))
        .withColumn("_ls", F.array_sort("_l"))
        .withColumn("_lf", _dup_flags(F.col("_ls")))
        .withColumn("dup_line_frac", _frac(_sum_long(F.col("_lf")), F.size("_ls")))
        .withColumn(
            "dup_line_char_frac",
            _frac(
                _sum_long(
                    F.zip_with(
                        F.col("_ls"), F.col("_lf"), lambda x, f: F.length(x) * f
                    )
                ),
                _sum_long(F.transform(F.col("_ls"), F.length)),
            ),
        )
        .drop("_l", "_ls", "_lf")
    )
    out_cols = [id_col, "n_words", "n_lines", "dup_line_frac", "dup_line_char_frac"]
    for n in top_ngram_sizes:
        cur = cur.withColumn(
            f"top_{n}gram_char_frac",
            _frac(
                _top_run_chars(F.array_sort(_word_ngrams(F.col("_w"), n))),
                F.col("_tlen"),
            ),
        )
        out_cols.append(f"top_{n}gram_char_frac")
    for n in dup_ngram_sizes:
        g = _word_ngrams(F.col("_w"), n)
        cur = cur.withColumn(
            f"dup_{n}gram_frac",
            _frac(F.size(g) - F.size(F.array_distinct(g)), F.size(g)),
        )
        out_cols.append(f"dup_{n}gram_frac")
    return cur.select(*out_cols)


def boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int,
    line_sep: str = "\n",
    min_line_chars: int = 1,
) -> DataFrame:
    """The heavy-hitter line table: (line_hash, df) for every distinct
    trimmed line of ≥ ``min_line_chars`` chars occurring in ≥ ``min_df``
    DISTINCT documents. One exploded scan → per-doc dedup → count — both
    exchanges are on the line-hash key with map-side partial aggregation.
    The result is bounded by total_lines / min_df rows: small enough to
    broadcast for any realistic (corpus, min_df), and persistable for the
    against-corpus form of :func:`strip_boilerplate_lines`."""
    lines = df.select(
        F.col(id_col).alias("_bid"),
        F.explode(F.split(F.col(text_col), line_sep)).alias("_line"),
    ).filter(F.length(F.trim("_line")) >= min_line_chars)
    per_doc = lines.select(
        "_bid", F.xxhash64(F.trim("_line")).alias("line_hash")
    ).dropDuplicates(["_bid", "line_hash"])
    return (
        per_doc.groupBy("line_hash")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= F.lit(min_df))
    )


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 10,
    line_sep: str = "\n",
    min_line_chars: int = 1,
    boilerplate: DataFrame | None = None,
    max_broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """Remove every line occurring in ≥ ``min_df`` documents from every
    document (CCNet/RefinedWeb line-level dedup). Returns
    (id, text_clean, n_lines, n_lines_removed, removed_char_frac); callers
    join back on the id for the remaining columns and typically drop
    documents whose ``removed_char_frac`` exceeds a budget.

    ``boilerplate``: pass a precomputed :func:`boilerplate_lines` table
    (e.g. persisted from a prior corpus pass) to skip the counting pass —
    the against-corpus shape: new batches are cleaned against last month's
    heavy-hitter set with ONE scan of the batch and zero counting work.

    Plan shape (pinned in tests/test_plans.py), sized not assumed: the
    heavy-hitter table's bound — ≤ total_lines/min_df distinct hashes —
    is NOT small at a low ``min_df`` over a big corpus (10¹² lines at
    min_df=10 bounds it at 10¹¹ rows), so the table is counted first
    (one cheap agg over an already-bounded table):

    * ≤ ``max_broadcast_rows`` — broadcast LEFT ANTI on the exploded
      lines: viral keys (a banner in 10⁹ docs) never shuffle; the only
      exchange is the uniform per-document reassembly.
    * larger — two-level anti-join: the top ``max_broadcast_rows`` hitters
      BY df (the actually-viral head, the keys that would skew a shuffle)
      still go through the broadcast anti; the long tail goes through a
      shuffled anti-join, which is safe precisely because tail keys are
      non-viral by construction (df below the head's cutoff), so the
      shuffle is uniform. Same output, no driver OOM at any ``min_df``.

    Lines shorter than ``min_line_chars`` after trimming never count
    toward document frequency and are never stripped (their join key is
    NULL, which a left-anti join retains), preserving document structure.

    When the hitter table is computed inline it is ``persist()``-ed (the
    size probe and the head/tail split must not re-run the corpus
    counting pass per scan); it is LRU-evictable and bounded, but callers
    running many strips in one session can pass a precomputed
    ``boilerplate`` to manage its lifetime themselves.
    """
    inline = boilerplate is None
    if inline:
        # the size probe (and, in the two-level regime, the head/tail
        # split) scans the hitter table more than once — an inline
        # (recomputed-from-the-corpus) table must not re-run the corpus
        # counting pass per scan, so materialize it first
        boilerplate = boilerplate_lines(
            df, id_col, text_col, min_df, line_sep, min_line_chars
        ).persist()
    n_hot = boilerplate.count()
    two_level = n_hot > max_broadcast_rows

    lines = df.select(
        F.col(id_col).alias("_bid"),
        F.length(text_col).alias("_tlen"),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias("_pos", "_line"),
    ).withColumn(
        "_lh",
        F.when(
            F.length(F.trim("_line")) >= min_line_chars,
            F.xxhash64(F.trim("_line")),
        ),
    )
    if not two_level:
        hot = F.broadcast(boilerplate.select("line_hash"))
        kept = lines.join(hot, lines["_lh"] == hot["line_hash"], "left_anti")
    else:
        head = F.broadcast(
            boilerplate.orderBy(F.col("df").desc(), F.col("line_hash"))
            .limit(max_broadcast_rows)
            .select("line_hash")
        )
        tail = (
            boilerplate.join(head, "line_hash", "left_anti")
            .select("line_hash")
            .hint("shuffle_hash")
        )
        kept = lines.join(head, lines["_lh"] == head["line_hash"], "left_anti")
        kept = kept.join(tail, kept["_lh"] == tail["line_hash"], "left_anti")
    out = kept.groupBy("_bid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            line_sep,
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = df.select(
        F.col(id_col).alias("_bid"),
        F.size(F.split(F.col(text_col), line_sep)).alias("n_lines"),
        F.length(text_col).alias("_tlen"),
    )
    return totals.join(out, "_bid", "left").select(
        F.col("_bid").alias(id_col),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        "n_lines",
        (F.col("n_lines") - F.coalesce("_n_kept", F.lit(0))).alias("n_lines_removed"),
        _frac(
            F.col("_tlen") - F.length(F.coalesce("text_clean", F.lit(""))),
            F.col("_tlen"),
        ).alias("removed_char_frac"),
    )


def update_boilerplate_corpus(
    batch_df: DataFrame,
    table_path: str,
    id_col: str,
    text_col: str,
    line_sep: str = "\n",
    min_line_chars: int = 1,
    compact_every: int = 16,
    commit_properties: dict | None = None,
) -> int:
    """The incremental form of the heavy-hitter pass: append the batch's
    per-line document-frequency counts ``(line_hash, df)`` to an
    iceberg-lite table (created on first use). Document frequency is
    ADDITIVE across disjoint batches, so the corpus-wide count is a
    sum-merge at read time (:func:`read_boilerplate_corpus`) — the same
    daily-crawl loop as operators.dedup.incremental_dedup: each batch is
    one snapshot, one scan of the batch, zero rewrites of history, the
    manifest chain auto-compacts every ``compact_every`` appends.
    Returns the new snapshot id."""
    from ..sources import iceberg_lite as IL
    import os

    counts = boilerplate_lines(
        batch_df, id_col, text_col, min_df=1,
        line_sep=line_sep, min_line_chars=min_line_chars,
    )
    if not os.path.exists(os.path.join(table_path, "metadata")):
        IL.create_table(table_path, "line_hash bigint, df bigint")
    snap = IL.append(
        counts.select(
            F.col("line_hash").cast("long"), F.col("df").cast("long")
        ),
        table_path,
        properties=commit_properties,
    )
    if compact_every and len(IL._manifests(table_path, snap)) > compact_every:
        snap = IL.compact_manifests(table_path)
    return snap


def read_boilerplate_corpus(
    spark, table_path: str, min_df: int
) -> DataFrame:
    """Corpus-wide heavy-hitter line table from the incremental counts:
    sum-merge per line_hash (map-side combinable — the per-batch rows are
    already one per distinct line) and threshold. Feed the result to
    :func:`strip_boilerplate_lines` via ``boilerplate=`` to clean new
    batches against the whole crawl history with one batch scan."""
    from ..sources import iceberg_lite as IL

    return (
        IL.read(spark, table_path)
        .groupBy("line_hash")
        .agg(F.sum("df").alias("df"))
        .filter(F.col("df") >= F.lit(min_df))
    )


# Gopher A1 default thresholds: metric column -> (operator, cutoff).
# A doc failing ANY rule is dropped. Names match repetition_metrics
# output; word/line bounds follow the same paper's length rules.
GOPHER_RULES = {
    "min_words": 50,
    "max_words": 100_000,
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_frac": 0.15,
    "dup_6gram_frac": 0.14,
    "dup_7gram_frac": 0.13,
}


def quality_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rules: dict | None = None,
    line_sep: str = "\n",
) -> DataFrame:
    """Gopher repetition/length filter verdicts: (id, keep, reasons) —
    ``reasons`` is the sorted array of rule names the document failed
    (empty ⇒ keep). Rules: ``min_words``/``max_words`` bound the word
    count; every other key names a repetition_metrics fraction column
    with a MAXIMUM (doc fails when metric > cutoff; NULL metrics —
    degenerate docs — fail the rule that inspected them only via the
    word bounds, which catch empty docs anyway). Join survivors back on
    the id, or feed the failed ids to a delete pass. Row-local like the
    metrics themselves — one narrow projection, no shuffle."""
    rules = dict(GOPHER_RULES if rules is None else rules)
    min_w = rules.pop("min_words", None)
    max_w = rules.pop("max_words", None)
    import re as _re

    need_top = tuple(sorted(
        int(_re.match(r"top_(\d+)gram", k).group(1))
        for k in rules if _re.match(r"top_(\d+)gram", k)
    ))
    need_dup = tuple(sorted(
        int(_re.match(r"dup_(\d+)gram", k).group(1))
        for k in rules if _re.match(r"dup_(\d+)gram", k)
    ))
    m = repetition_metrics(
        df, id_col, text_col,
        top_ngram_sizes=need_top, dup_ngram_sizes=need_dup,
        line_sep=line_sep,
    )
    checks = []
    if min_w is not None:
        checks.append(F.when(F.col("n_words") < min_w, F.lit("min_words")))
    if max_w is not None:
        checks.append(F.when(F.col("n_words") > max_w, F.lit("max_words")))
    for col, cutoff in rules.items():
        checks.append(F.when(F.col(col) > cutoff, F.lit(col)))
    if checks:
        reasons = F.array_sort(
            F.filter(F.array(*checks), lambda x: x.isNotNull())
        )
    else:
        reasons = F.array().cast("array<string>")
    return m.select(
        id_col,
        "n_words",
        reasons.alias("reasons"),
    ).withColumn("keep", F.size("reasons") == 0)
