"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: the prclz pipeline (street-block extraction →
building PIP assignment → k-complexity) on the deterministic synthetic geo
world, returning the complexity table (SURVEY.md §3.2).

`queries()` / `oracle_sql()` — one entry per implemented operator from
SURVEY.md §2, DuckDB-oracle-checked at sf0.01 where SQL-expressible.
Spatial operators are oracle-checked too: geometry is derived
deterministically from the relational tables (points from customer/supplier
keys, polygons as closed-form rectangles), so the cover-cell join engine's
output can be compared against brute-force inequality joins in ANSI SQL.
Geo-kernel and image queries without a SQL equivalent are rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# deterministic point derivation (identical DOUBLE arithmetic in Spark and
# DuckDB — everything cast explicitly so neither engine picks DECIMAL):
#   x = 10.0 + (key*37 % 600)/10000 ;  y = 10.0 + (key*73 % 600)/10000
_PTS_X = "CAST(10.0 AS DOUBLE) + CAST((%s * 37) %% 600 AS DOUBLE) / CAST(10000 AS DOUBLE)"
_PTS_Y = "CAST(10.0 AS DOUBLE) + CAST((%s * 73) %% 600 AS DOUBLE) / CAST(10000 AS DOUBLE)"

# 2×2 rectangle grid over the point box, edges at 10.0/10.03/10.06
# Zipf-style skew fixture (VERDICT r4 #6): 70% of probes (key % 10 < 7)
# collapse into a ~0.001° spot inside box 0 — one hot cover cell at
# _GEO_RES — while the rest keep the uniform spread. Shared verbatim by the
# Spark query and the DuckDB oracle.
_SKEW_X = (
    "CASE WHEN %s %% 10 < 7 THEN CAST(10.001 AS DOUBLE)"
    " + CAST((%s * 37) %% 97 AS DOUBLE) / CAST(100000 AS DOUBLE)"
    " ELSE " + _PTS_X + " END"
)
_SKEW_Y = (
    "CASE WHEN %s %% 10 < 7 THEN CAST(10.001 AS DOUBLE)"
    " + CAST((%s * 73) %% 97 AS DOUBLE) / CAST(100000 AS DOUBLE)"
    " ELSE " + _PTS_Y + " END"
)

_BOXES = [
    (0, 10.0, 10.0, 10.03, 10.03),
    (1, 10.03, 10.0, 10.06, 10.03),
    (2, 10.0, 10.03, 10.03, 10.06),
    (3, 10.03, 10.03, 10.06, 10.06),
]
_BOX_SQL = "(VALUES " + ", ".join(
    f"({g}, {x0}, {y0}, {x1}, {y1})" for g, x0, y0, x1, y1 in _BOXES
) + ") AS b(gid, xmin, ymin, xmax, ymax)"

_GEO_RES = 14  # ~0.022° cells over the 0.06° fixture box


def _points_df(
    spark: SparkSession, sf_dir: str, table: str, key: str, alias: str = "pid"
) -> DataFrame:
    df = _load(spark, sf_dir, table)
    return df.select(
        F.col(key).alias(alias),
        F.expr(_PTS_X % key).alias("x"),
        F.expr(_PTS_Y % key).alias("y"),
    )


def _boxes_df(spark: SparkSession) -> DataFrame:
    from prclz_spark import geom as G

    rows = [(g, G.wkb_dumps(G.box(x0, y0, x1, y1))) for g, x0, y0, x1, y1 in _BOXES]
    return spark.createDataFrame(rows, "gid long, geometry binary")


# --------------------------------------------------------------------------
# entry
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: blocks → PIP → k-complexity on the synthetic geo world."""
    from prclz_spark import cells as C
    from prclz_spark import fixtures as FX
    from prclz_spark.functions.st import st_aswkt
    from prclz_spark.operators.blocks import extract_blocks
    from prclz_spark.operators.complexity import k_complexity

    lines, gadm, bldgs = FX.geo_world(spark, 6, 6)
    res = C.choose_resolution(*FX.grid_params(6, 6), n_features=144)
    blocks = extract_blocks(lines, gadm, res)
    kdf = k_complexity(blocks, bldgs, res)
    return kdf.select(
        "block_id",
        st_aswkt(F.col("geometry")).alias("geometry"),
        "complexity",
        st_aswkt(F.col("centroids_multipoint")).alias("centroids_multipoint"),
    )


# --------------------------------------------------------------------------
# relational queries (SURVEY.md §2 operator ids in comments)
# --------------------------------------------------------------------------

def _q_pricing_summary(spark, sf_dir):  # A1/A6/A7 aggregation suite
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_join_left_notnull(spark, sf_dir):  # J6 + F1
    o = _load(spark, sf_dir, "orders")
    c = _load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .filter(F.col("c_name").isNotNull())
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


def _q_multiway_join(spark, sf_dir):  # J6/J7 chain with broadcast dims
    li = _load(spark, sf_dir, "lineitem")
    o = _load(spark, sf_dir, "orders")
    c = _load(spark, sf_dir, "customer")
    n = _load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


def _q_topk_global(spark, sf_dir):  # O2 sort+limit
    o = _load(spark, sf_dir, "orders")
    return o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc()).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).limit(20)


def _q_window_topk(spark, sf_dir):  # O1 per-group top-k window
    from pyspark.sql import Window

    o = _load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank")
    )


def _q_collect_sorted(spark, sf_dir):  # A1 collect_list → deterministic string
    o = _load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_custkey") < 50)
        .groupBy("o_custkey")
        .agg(
            F.concat_ws(
                ",", F.transform(F.array_sort(F.collect_list("o_orderkey")), lambda x: x.cast("string"))
            ).alias("orderkeys")
        )
    )


def _q_anti_join(spark, sf_dir):  # ledger resume anti-join (SURVEY §4.4)
    o = _load(spark, sf_dir, "orders")
    c = _load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    return (
        o.join(c.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


def _q_semi_join(spark, sf_dir):
    o = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li.select(F.col("l_orderkey").alias("o_orderkey")), "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


def _q_dedup_rows(spark, sf_dir):  # F8 dropDuplicates
    o = _load(spark, sf_dir, "orders")
    return o.select("o_custkey", "o_orderstatus").dropDuplicates().groupBy("o_orderstatus").agg(
        F.count("*").alias("n_distinct_cust")
    )


def _q_argmax_window(spark, sf_dir):  # A6 argmax per group
    from pyspark.sql import Window

    c = _load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


def _q_union_all(spark, sf_dir):  # F6
    c = _load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"), F.lit("c").alias("src"))
    s = _load(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("key"), F.lit("s").alias("src"))
    return c.unionByName(s).groupBy("src").agg(F.count("*").alias("n"), F.sum("key").alias("keysum"))


def _q_geo_union_area(spark, sf_dir):  # A5 distributed two-phase unary_union
    """Closed form: 40 unit-height boxes at x = i/2, width 1 (50 % overlap
    chain) union to the single rectangle [0, 20.5]×[0, 1] (area 20.5);
    one disjoint unit box at (100, 100) adds area 1 and a second part.
    The input is shuffled across 6 partitions so BOTH phases of
    operators/union_op.union_all (per-partition union_n partials → final
    union_n) are exercised end to end."""
    from prclz_spark import geom as G
    from prclz_spark.operators.union_op import union_all

    rows = [
        (i, bytearray(G.wkb_dumps(G.box(i * 0.5, 0.0, i * 0.5 + 1.0, 1.0))))
        for i in range(40)
    ] + [(99, bytearray(G.wkb_dumps(G.box(100.0, 100.0, 101.0, 101.0))))]
    df = spark.createDataFrame(rows, "id long, geometry binary").repartition(6)
    u = union_all(df)
    n_parts = len(u.data) if u.kind == G.MULTIPOLYGON else 1
    return spark.createDataFrame(
        [(n_parts, round(float(G.area(u)), 9))], "n_parts int, area double"
    )


def _q_explode_embeddings(spark, sf_dir):  # F5 multipart explode analogue
    e = _load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "pos", F.round(F.col("val").cast("double"), 5).alias("val"))


def _q_events_hourly(spark, sf_dir):  # streaming rollup, batch oracle
    ev = _load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
    )


# --------------------------------------------------------------------------
# spatial queries with closed-form SQL oracles
# --------------------------------------------------------------------------

def _q_pip_join(spark, sf_dir):  # J4 flagship PIP via cover-cell engine
    from prclz_spark.operators.sjoin import pip_join

    pts = _points_df(spark, sf_dir, "customer", "c_custkey")
    boxes = _boxes_df(spark)
    out = pip_join(pts, boxes, "pid", "gid", res=_GEO_RES, how="inner")
    return out.select("pid", "gid").groupBy("gid").agg(F.count("*").alias("n_points"))


def _q_pip_pairs(spark, sf_dir):  # J4/J5 exact pair table
    from prclz_spark.operators.sjoin import pip_join

    pts = _points_df(spark, sf_dir, "customer", "c_custkey").filter(F.col("pid") < 300)
    boxes = _boxes_df(spark)
    return pip_join(pts, boxes, "pid", "gid", res=_GEO_RES, how="inner").select("pid", "gid")


def _q_pip_join_skew(spark, sf_dir):
    """Hot-cell-skewed PIP through the SALTED NON-BROADCAST join path
    (VERDICT r4 #6): 70% of probes share one cover cell; the histogram
    pre-pass detects it and spreads that cell's work over 8 salted tasks.
    Salting changes the plan, never the answer — same closed-form PIP
    oracle as the broadcast path; max/median task-time evidence is
    recorded by bench.py (skew section)."""
    from prclz_spark.operators.sjoin import pip_join

    key = "c_custkey"
    pts = _load(spark, sf_dir, "customer").select(
        F.col(key).alias("pid"),
        F.expr(_SKEW_X % (key, key, key)).alias("x"),
        F.expr(_SKEW_Y % (key, key, key)).alias("y"),
    )
    boxes = _boxes_df(spark)
    out = pip_join(
        pts, boxes, "pid", "gid", res=_GEO_RES, how="inner",
        broadcast_build=False, salt=8, hot_threshold=200,
    )
    return out.groupBy("gid").agg(F.count("*").alias("n_points"))


def _q_knn(spark, sf_dir):  # J8-J10 ring-expansion kNN
    from prclz_spark.operators.knn import knn_join

    probes = _points_df(spark, sf_dir, "customer", "c_custkey").filter(F.col("pid") < 200)
    build = _points_df(spark, sf_dir, "supplier", "s_suppkey", alias="bid")
    out = knn_join(probes, build, "pid", "bid", k=3, res=_GEO_RES,
                   probe_x="x", probe_y="y", build_x="x", build_y="y")
    return out.select("pid", "bid", "rank", F.round("dist", 9).alias("dist"))


def _q_radius_join(spark, sf_dir):  # distance/range join via cell disk
    from prclz_spark.operators.knn import within_distance_join

    probes = _points_df(spark, sf_dir, "customer", "c_custkey").filter(F.col("pid") < 400)
    build = _points_df(spark, sf_dir, "supplier", "s_suppkey", alias="bid")
    out = within_distance_join(probes, build, "pid", "bid", radius=0.004, res=_GEO_RES)
    return out.groupBy("pid").agg(F.count("*").alias("n_within"))


# --------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings)
# --------------------------------------------------------------------------

def _q_dedup_exact(spark, sf_dir):  # exact dedup via content hash
    d = _load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dups"))
        .groupBy("dups")
        .agg(F.count("*").alias("n_groups"))
    )


def _q_token_stats(spark, sf_dir):  # token counting per language
    d = _load(spark, sf_dir, "documents")
    toks = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + F.lit(1)
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(toks.cast("long")).alias("total_tokens"),
        F.round(F.avg(toks), 4).alias("avg_tokens"),
    )


def _q_quality_score(spark, sf_dir):  # quality scoring: len/word-len/digit ratio
    d = _load(spark, sf_dir, "documents")
    n_spaces = F.length("text") - F.length(F.regexp_replace("text", " ", ""))
    n_digits = F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
    words = n_spaces + F.lit(1)
    score = F.round(
        F.length("text").cast("double") / words.cast("double"), 4
    ).alias("avg_word_len")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        words.cast("long").alias("n_words"),
        score,
        F.round(n_digits.cast("double") / F.length("text").cast("double"), 4).alias("digit_ratio"),
    ).filter(F.col("doc_id") < 500)


def _q_lang_id(spark, sf_dir):  # n-gram/stopword language heuristic
    d = _load(spark, sf_dir, "documents")
    hits = (
        (F.length("text") - F.length(F.regexp_replace("text", " the ", ""))) / 5
        + (F.length("text") - F.length(F.regexp_replace("text", " and ", ""))) / 5
        + (F.length("text") - F.length(F.regexp_replace("text", " of ", ""))) / 4
    )
    pred = F.when(hits >= 1, F.lit("en")).otherwise(F.lit("other"))
    return d.select(pred.alias("pred_lang"), "lang").groupBy("pred_lang", "lang").agg(
        F.count("*").alias("n")
    )


def _q_ngram_distinct(spark, sf_dir):  # shingle fingerprint cardinality
    d = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    shingles = F.expr(
        "transform(sequence(1, greatest(length(text) - 4, 0)), i -> substring(text, i, 5))"
    )
    return d.select(
        "doc_id",
        F.size(F.array_distinct(shingles)).alias("n_distinct_5grams"),
        F.size(shingles).alias("n_5grams"),
    )


def _q_ann_cosine(spark, sf_dir):  # brute-force cosine top-k vs query vec
    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    dot = F.expr(
        "aggregate(zip_with(embedding, qv, (a, b) -> cast(a as double) * cast(b as double)),"
        " cast(0.0 as double), (acc, x) -> acc + x)"
    )
    norm = lambda c: F.sqrt(
        F.expr(f"aggregate({c}, cast(0.0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))")
    )
    sim = F.round(dot / (norm("embedding") * norm("qv")), 6).alias("cos_sim")
    out = (
        e.crossJoin(F.broadcast(q))
        .select("vec_id", sim)
        .filter(F.col("vec_id") != 0)
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(25)
    )
    return out


def _q_minhash_jaccard_exact(spark, sf_dir):
    """Oracles the dedup SEMANTICS (k-shingle Jaccard) end to end: exact
    Jaccard over the engine's 64-bit shingle-hash sets must equal DuckDB's
    Jaccard over raw character 5-shingles. Texts are sanitized to printable
    ASCII identically in both engines so byte-shingles == char-shingles;
    hash collisions at this scale are ~2^-35."""
    from pyspark.sql.functions import pandas_udf

    from prclz_spark.operators.dedup import _shingle_hashes

    docs = (
        _load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select(
            "doc_id",
            F.regexp_replace(F.col("text"), "[^ -~]", "").alias("s"),
        )
        .filter(F.length("s") >= 5)
    )

    @pandas_udf("double")
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = []
        for a, b in zip(ta, tb):
            sa = set(_shingle_hashes(a, 5).tolist())
            sb = set(_shingle_hashes(b, 5).tolist())
            out.append(len(sa & sb) / max(len(sa | sb), 1))
        return pd.Series(out)

    l = docs.select(F.col("doc_id").alias("id_a"), F.col("s").alias("s_a"))
    r = docs.select(F.col("doc_id").alias("id_b"), F.col("s").alias("s_b"))
    pairs = l.join(r, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", F.round(_jac(F.col("s_a"), F.col("s_b")), 6).alias("jaccard")
    )


def _q_winnow_fingerprint(spark, sf_dir):
    """Winnowing fingerprints (MOSS, SIGMOD'03) per document: k=8-gram
    rolling hashes → sliding-window(4) minima → distinct. Oracled by a
    DuckDB replication of the identical polynomial hash + window min over
    ASCII-sanitized text (byte k-grams == char k-grams after sanitize)."""
    from prclz_spark.operators.dedup import winnow_fingerprints

    docs = (
        _load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", F.regexp_replace(F.col("text"), "[^ -~]", "").alias("s"))
        .filter(F.length("s") >= 11)
    )
    fps = winnow_fingerprints(docs, "doc_id", "s", k=8, w=4)
    return fps.groupBy("doc_id").agg(
        F.count("*").alias("n_fp"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    )


def _q_winnow_near_pairs(spark, sf_dir):
    """Fingerprint-sharing near-dup candidates over docs + planted clones
    (95% prefix copies): pairs sharing ≥ 5 winnowed fingerprints."""
    from prclz_spark.operators.dedup import winnow_near_pairs

    docs = (
        _load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", F.regexp_replace(F.col("text"), "[^ -~]", "").alias("s"))
        .filter(F.length("s") >= 11)
    )
    clones = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.expr("substring(s, 1, cast(length(s) * 0.95 as int))").alias("s"),
    )
    corpus = docs.unionByName(clones)
    return winnow_near_pairs(corpus, "doc_id", "s", k=8, w=4, min_shared=5)


def _q_iceberg_snapshots(spark, sf_dir):
    """Iceberg-lite table layer end to end: two appends → per-snapshot
    time-travel reads must see exactly the committed file sets. Oracled by
    plain SQL over the same source slices."""
    import tempfile

    from prclz_spark.sources import iceberg_lite as IL

    d = _load(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("text_len")
    )
    t = tempfile.mkdtemp(prefix="iceberg_lite_")
    IL.create_table(t, "doc_id bigint, text_len int")
    IL.append(d.filter(F.col("doc_id") < 200), t, stats_cols=["doc_id"])
    IL.append(d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 400)), t,
              stats_cols=["doc_id"])
    out = []
    for s in (0, 1):
        snap = IL.read(spark, t, snapshot=s).agg(
            F.count("*").alias("n_docs"),
            F.sum("text_len").alias("sum_len"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        ).withColumn("snapshot", F.lit(s))
        out.append(snap)
    return out[0].unionByName(out[1]).select(
        "snapshot", "n_docs", "sum_len", "min_id", "max_id"
    )


def _q_iceberg_delete_dedup(spark, sf_dir):
    """The LLM-pipeline table loop (round-4 VERDICT #4): ingest → dedup →
    DELETE. Documents plus planted verbatim re-crawls (doc_id+100000) are
    appended as snapshot 0; the exact-dedup verdict (min doc_id per body
    wins) produces loser tombstones committed as a delete snapshot; the
    query returns per-snapshot aggregates — snapshot 0 must still show the
    duplicates (time travel), snapshot 1 must not. Oracled by a closed-form
    DuckDB replication of the same verdict."""
    import tempfile

    from pyspark.sql import Window

    from prclz_spark.sources import iceberg_lite as IL

    base = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select(
        "doc_id", F.length("text").cast("int").alias("text_len"), F.col("text").alias("body")
    )
    full = base.unionByName(
        base.select((F.col("doc_id") + 100_000).alias("doc_id"), "text_len", "body")
    )
    t = tempfile.mkdtemp(prefix="iceberg_deldedup_")
    IL.create_table(t, "doc_id bigint, text_len int, body string")
    s0 = IL.append(full, t)
    tbl = IL.read(spark, t)
    losers = (
        tbl.withColumn("min_id", F.min("doc_id").over(Window.partitionBy("body")))
        .filter(F.col("doc_id") != F.col("min_id"))
        .select("doc_id")
    )
    s1 = IL.delete_rows(losers, t, "doc_id")
    out = []
    for s in (s0, s1):
        out.append(
            IL.read(spark, t, snapshot=s)
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("text_len").alias("sum_len"),
                F.min("doc_id").alias("min_id"),
                F.max("doc_id").alias("max_id"),
            )
            .withColumn("snapshot", F.lit(s - s0))
        )
    return out[0].unionByName(out[1]).select(
        "snapshot", "n_docs", "sum_len", "min_id", "max_id"
    )


def _q_ann_ivf_topk(spark, sf_dir):  # IVF (k-means coarse quantizer) ANN
    from prclz_spark.operators.ann import ivf_topk

    e = _load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = e.filter(F.col("vec_id") < 500)
    twins = base.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr("transform(embedding, x -> x * CAST(1.01 AS FLOAT))").alias("embedding"),
    )
    corpus = base.unionByName(twins)
    queries_df = base.filter(F.col("vec_id") < 50).withColumnRenamed("vec_id", "qid")
    dim = len(base.first().embedding)
    out = ivf_topk(
        queries_df, corpus, "qid", "vec_id", "embedding", dim=dim, k=3, n_lists=8, n_probe=3
    )
    # planted-twin closed form (VERDICT r3 #3): every twin is a pure scale
    # copy (×1.01) of its query, so cos(query, twin) = 1.0 (to 6dp through
    # the float cast) and nothing else ties it (the query's own base vector
    # is excluded as self); the IVF quantizer assigns a scale copy near its
    # base's centroid, so the twin is always probed. The full top-3 search
    # runs; the returned rank-1 slice is exactly the 50-row constant table
    # the DuckDB oracle states. Approximation quality of deeper ranks is
    # covered by the recall test (tests/test_ann.py).
    return out.filter(F.col("rank") == 1)


def _q_minhash_lsh(spark, sf_dir):  # MinHash+LSH near-dup detection
    from prclz_spark.operators.dedup import minhash_lsh_pairs

    d = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    # plant near-duplicates: truncated copies of half the docs (re-crawl sim)
    dups = d.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr("substring(text, 1, cast(length(text) * 0.9 as int))").alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(dups)
    pairs = minhash_lsh_pairs(corpus, "doc_id", "text", jaccard_threshold=0.5)
    return pairs.select(
        "id_a", "id_b", "jaccard_est"
    ).orderBy("id_a", "id_b")


def _q_dedup_against_corpus(spark, sf_dir):
    """Incremental dedup against a PERSISTED corpus (round-4 VERDICT #1):
    the corpus (doc_id < 150) signatures are committed to an iceberg-lite
    table once; the incoming batch (150 ≤ doc_id < 200 plus planted
    90%-prefix twins of every 5th corpus doc) is banded and broadcast
    against ONE scan of that table — never a corpus self-join
    (plan-asserted in tests/test_plans.py). Returns the surviving cross
    pairs (batch_id, corpus_id, jaccard_est). The DuckDB oracle replicates
    the full 64-perm signature + 16-band agreement pipeline and takes the
    corpus×batch slice."""
    import tempfile

    from prclz_spark.operators.dedup import minhash_pairs_against, minhash_signatures
    from prclz_spark.sources import iceberg_lite as IL

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 150)
    fresh = docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 200))
    twins = corpus.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.expr("substring(text, 1, cast(length(text) * 0.9 as int))").alias("text"),
    )
    batch = fresh.unionByName(twins)
    t = tempfile.mkdtemp(prefix="sig_corpus_")
    IL.create_table(t, "doc_id bigint, sig array<bigint>")
    IL.append(minhash_signatures(corpus, "doc_id", "text"), t)
    pairs = minhash_pairs_against(
        IL.read(spark, t), minhash_signatures(batch, "doc_id", "text"), "doc_id"
    )
    return pairs.orderBy("batch_id", "corpus_id")


def _q_data_mix_sample(spark, sf_dir):
    """Exact deterministic data mixing (round-5 extension): up to
    {en: 60, fr: 20, zh: 15} documents per language, selected by the
    MINSTD scramble of doc_id — byte-identical on any partitioning. The
    oracle replicates the scramble + window verbatim in SQL."""
    from prclz_spark.operators.mix import mix_strata

    d = _load(spark, sf_dir, "documents").select("doc_id", "lang")
    out = mix_strata(d, "lang", {"en": 60, "fr": 20, "zh": 15}, "doc_id", seed=7)
    return out.orderBy("doc_id")


def _q_pack_sequences(spark, sf_dir):
    """Sequence packing oracled via a closed form: with UNIFORM token
    counts (100 each, budget 950) the FFD kernel degenerates to
    consecutive groups of 9 ids per bucket in id order, so every output
    row — pack_id, the doc_ids array, counts, totals — is derivable in
    SQL. Heterogeneous-token behavior is pinned against a local FFD
    reference in tests/test_pack.py."""
    from prclz_spark.operators.pack import pack_sequences

    d = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 450).select(
        "doc_id", F.lit(100).cast("long").alias("n_tokens")
    )
    out = pack_sequences(d, "doc_id", "n_tokens", budget=950, n_buckets=8, seed=1)
    # The public API returns doc_ids as array<long>; the driver's result
    # canonicalizer cannot sort list-valued columns, so the QUERY emits a
    # deterministic scalar encoding (sorted ids joined by ',').
    return out.select(
        "pack_id",
        F.concat_ws(
            ",", F.transform(F.array_sort("doc_ids"), lambda x: x.cast("string"))
        ).alias("doc_ids"),
        "n_docs",
        "total_tokens",
        "overflow",
    ).orderBy("pack_id")


def _q_dedup_cluster_components(spark, sf_dir):
    """Transitive dedup clustering (round-5 extension): MinHash near-dup
    PAIRS over docs + chained 72%-prefix clones (A→B→C: A~B and B~C pass
    the 0.5 threshold, A~C generally does not) are closed into connected
    components via the large-star/small-star operator; each doc maps to
    its component's min id. The DuckDB oracle replicates the exact pair
    pipeline (64-perm sigs + banding + agreement estimate) and closes it
    with a recursive CTE — pair set AND closure are value-checked."""
    from prclz_spark.operators.components import connected_components
    from prclz_spark.operators.dedup import minhash_lsh_pairs

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < 100
    )
    c1 = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr("substring(text, 1, cast(floor(length(text) * 0.72) as int))").alias("text"),
    )
    c2 = c1.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr("substring(text, 1, cast(floor(length(text) * 0.72) as int))").alias("text"),
    )
    corpus = docs.unionByName(c1).unionByName(c2)
    pairs = minhash_lsh_pairs(corpus, "doc_id", "text", jaccard_threshold=0.5)
    return connected_components(pairs).orderBy("id")


def _q_simhash_dedup(spark, sf_dir):  # SimHash Hamming-band near-dup
    from prclz_spark.operators.dedup import simhash_near_pairs

    d = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    dups = d.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(dups)
    return simhash_near_pairs(corpus, "doc_id", "text", max_hamming=3).orderBy("id_a", "id_b")


def _q_embedding_near_dup(spark, sf_dir):  # hyperplane-LSH cosine near-dup
    from prclz_spark.operators.dedup import embedding_near_pairs

    e = _load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    # plant near-dups: slightly perturbed copies of every 4th vector
    dups = e.filter(F.col("vec_id") % 4 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr("transform(embedding, x -> x * CAST(1.001 AS FLOAT))").alias("embedding"),
    )
    corpus = e.select("vec_id", "embedding").unionByName(dups)
    dim = len(e.select("embedding").first()[0])
    return embedding_near_pairs(corpus, "vec_id", "embedding", dim=dim, cos_threshold=0.98)


def _q_ann_lsh_topk(spark, sf_dir):  # LSH-bucketed ANN (scale path)
    from prclz_spark.operators.ann import ann_lsh_topk

    e = _load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = e.filter(F.col("vec_id") < 500)
    twins = base.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr("transform(embedding, x -> x * CAST(1.01 AS FLOAT))").alias("embedding"),
    )
    corpus = base.unionByName(twins)
    queries_df = base.filter(F.col("vec_id") < 50).withColumnRenamed("vec_id", "qid")
    dim = len(base.first().embedding)
    out = ann_lsh_topk(
        queries_df, corpus, "qid", "vec_id", "embedding", dim=dim, k=3, n_planes=10
    )
    # planted-twin closed form (VERDICT r3 #3): a positive scale copy has
    # the identical hyperplane signature, so the twin always lands in the
    # query's own probe bucket with cos 1.0 at rank 1 (base vector excluded
    # as self). Full top-3 computed; rank-1 slice == 50-row constant oracle.
    return out.filter(F.col("rank") == 1)


def _q_embedding_norms(spark, sf_dir):  # vector math over array column
    e = _load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    norm = F.sqrt(
        F.expr("aggregate(embedding, cast(0.0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))")
    )
    return e.select("vec_id", "label", F.round(norm, 6).alias("l2_norm"))


# --------------------------------------------------------------------------
# geo-kernel queries (rows-only: no SQL-expressible oracle)
# --------------------------------------------------------------------------

def _q_geo_blocks(spark, sf_dir):
    """Block extraction on the 6×6 synthetic world, aggregated per region —
    every output value is closed-form (FIXTURES.md): each 3×3-cell quadrant
    yields 9 square blocks + 2 triangles per diagonal cell
    ((ci·6+cj) % 7 == 3), and the blocks tile the quadrant exactly, so the
    per-gadm area sum is (3·CELL)² regardless of the splits."""
    from prclz_spark import cells as C
    from prclz_spark import fixtures as FX
    from prclz_spark.operators.blocks import extract_blocks

    lines, gadm, _ = FX.geo_world(spark, 6, 6)
    res = C.choose_resolution(*FX.grid_params(6, 6), n_features=144)
    from prclz_spark.functions.st import st_area

    return (
        extract_blocks(lines, gadm, res)
        .groupBy("gadm")
        .agg(
            F.count("*").alias("n_blocks"),
            F.round(F.sum(st_area(F.col("geometry"))) * 1e6, 6).alias("area_e6"),
        )
    )


def _q_geo_complexity(spark, sf_dir):
    """K3+K6-K10 through the full distributed path (blocks → PIP → kernel)
    on the 6×6 world, projected to its replay-oracle invariants: block ids
    (closed-form enumeration, same rule the geo_parcels oracle replays),
    building count per block (6 per full cell; each diagonal-split cell's
    ring of 6 splits 3/3 — angles 75°/135°/195° lie above the y=x diagonal,
    15°/255°/315° below), and the k value. n_bldgs is read off the
    MULTIPOINT WKB length (9 + 21 bytes per point — no UDF needed). k = 2
    for every block except TST.1.2_1_11, a triangle half-block whose three
    buildings sit near-collinear along the cut diagonal, so its parcels
    form a CHAIN (path-shaped weak dual, no inner face at level 2) instead
    of the mutually-adjacent triple every other half-block gets — one
    fewer dual level, k = 1. Frozen as a replay constant, verified
    bit-identical across local[2] and local[32]."""
    from prclz_spark import cells as C
    from prclz_spark import fixtures as FX
    from prclz_spark.operators.blocks import extract_blocks
    from prclz_spark.operators.complexity import k_complexity

    lines, gadm, bldgs = FX.geo_world(spark, 6, 6)
    res = C.choose_resolution(*FX.grid_params(6, 6), n_features=144)
    blocks = extract_blocks(lines, gadm, res)
    kdf = k_complexity(blocks, bldgs, res)
    return kdf.select(
        "block_id",
        "complexity",
        # MULTIPOINT WKB: 5B header + 4B count + 21B per point
        ((F.length("centroids_multipoint") - F.lit(9)) / 21).cast("long").alias("n_bldgs"),
    )

def _q_geo_parcels(spark, sf_dir):
    from prclz_spark import cells as C
    from prclz_spark import fixtures as FX
    from prclz_spark.operators.blocks import extract_blocks
    from prclz_spark.operators.parcels import tessellate
    from prclz_spark.functions.st import st_area

    lines, gadm, bldgs = FX.geo_world(spark, 4, 4)
    res = C.choose_resolution(*FX.grid_params(4, 4), n_features=64)
    blocks = extract_blocks(lines, gadm, res)
    parcels = tessellate(blocks, bldgs, res)
    return parcels.groupBy("block_id").agg(
        F.count("*").alias("n_parcels"),
        # 4dp: parcels tile the block exactly up to S-H float dust (~4e-8
        # relative), so the per-block sum rounds to the closed-form cell
        # area — which is what the DuckDB oracle replays
        F.round(F.sum(st_area(F.col("geometry"))) * 1e6, 4).alias("area_e6"),
    )


# --------------------------------------------------------------------------
# image / raster↔vector queries (rows-only: binary payloads, no SQL oracle)
# --------------------------------------------------------------------------

def _q_geo_reblock(spark, sf_dir):  # K19: Steiner street reblocking per block
    from prclz_spark import cells as C
    from prclz_spark import fixtures as FX
    from prclz_spark.functions.st import st_length
    from prclz_spark.operators.blocks import extract_blocks
    from prclz_spark.operators.parcels import tessellate
    from prclz_spark.operators.reblock_op import reblock

    nx = 4
    lines, gadm, bldgs = FX.geo_world(spark, nx, nx)
    res = C.choose_resolution(*FX.grid_params(nx, nx), n_features=nx * nx * 4)
    blocks = extract_blocks(lines, gadm, res)
    parcels = tessellate(blocks, bldgs, res)
    rb = reblock(blocks, parcels, bldgs, res)
    return rb.select(
        "block_id",
        "road_type",
        F.round(st_length(F.col("geometry")) * 1e3, 6).alias("len_e3"),
        "bldg_count",
        "num_graph_comps",
    )


def _q_geo_reblock_golden(spark, sf_dir):
    """K10+K12+K19 against the reference's OWN golden answers
    (`/root/reference/tests/test_reblock.py:85-130`): the 2×2 grid with 2, 3
    and 4 terminal points, run through the full distributed reblock operator
    (PIP assignment → cogroup → kernel), decomposed into canonical segments.
    The DuckDB oracle is the constant table of the reference's published WKT
    linestring sets. ``reweight_existing=False`` because the reference's
    basic Steiner tests never call `update_edge_types`. The three cases are
    laid out at disjoint x-offsets (0/10/20) so the PIP join assigns each
    terminal to its own case; the offset is subtracted back out before
    comparison."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    from prclz_spark import geom as G
    from prclz_spark.operators.reblock_op import reblock

    cases = {"g2": (0.0, 2), "g3": (10.0, 3), "g4": (20.0, 4)}
    points = [(2.0, 2.0), (0.0, 0.2), (1.8, 1.0), (0.8, 2.0)]

    def grid_cells(off):
        out = []
        for i in range(2):
            for j in range(2):
                if i == 0 and j == 1:  # the triangle cell
                    out.append([(off, 1.0), (off + 1, 1.0), (off + 1, 2.0), (off, 1.0)])
                else:
                    out.append(
                        [
                            (off + i, float(j)), (off + i + 1, float(j)),
                            (off + i + 1, j + 1.0), (off + i, j + 1.0),
                            (off + i, float(j)),
                        ]
                    )
        return out

    blocks_rows, parcel_rows, bldg_rows = [], [], []
    eps = 1e-3
    for cid, (off, k) in cases.items():
        # block polygon enlarged by a margin: three of the four reference
        # terminals sit exactly ON the 2×2 grid boundary, and a boundary
        # point's ray-cast PIP classification is parity-fragile. With
        # reweight_existing=False the block geometry's ONLY role is the PIP
        # assignment, so the margin changes nothing else.
        m = 0.5
        ring = [
            (off - m, -m), (off + 2 + m, -m), (off + 2 + m, 2 + m),
            (off - m, 2 + m), (off - m, -m),
        ]
        blocks_rows.append((cid, G.wkb_dumps(G.polygon(ring))))
        for i, c in enumerate(grid_cells(off)):
            parcel_rows.append((cid, i, f"{cid}_p{i}", G.wkb_dumps(G.polygon(c))))
        for i, (x, y) in enumerate(points[:k]):
            bldg_rows.append(
                (f"{cid}_b{i}", G.wkb_dumps(G.box(off + x - eps, y - eps, off + x + eps, y + eps)))
            )
    blocks = spark.createDataFrame(blocks_rows, "block_id string, geometry binary")
    parcels = spark.createDataFrame(
        parcel_rows, "block_id string, parcel_id long, osm_id string, geometry binary"
    )
    bldgs = spark.createDataFrame(bldg_rows, "osm_id string, geometry binary")
    rb = reblock(blocks, parcels, bldgs, res=12, reweight_existing=False)

    @pandas_udf(ArrayType(ArrayType(DoubleType())))
    def _segs(geoms: pd.Series) -> pd.Series:
        out = []
        for b in geoms:
            g = G.wkb_loads(bytes(b))
            arrs = [g.data] if g.kind == G.LINESTRING else g.data
            ss = []
            for a in arrs:
                for i in range(len(a) - 1):
                    p = (float(a[i][0]), float(a[i][1]))
                    q = (float(a[i + 1][0]), float(a[i + 1][1]))
                    if q < p:
                        p, q = q, p
                    ss.append([p[0], p[1], q[0], q[1]])
            out.append(ss)
        return pd.Series(out)

    off_expr = (
        F.when(F.col("block_id") == "g3", 10.0)
        .when(F.col("block_id") == "g4", 20.0)
        .otherwise(0.0)
    )
    e = rb.select(
        "block_id", "road_type", F.explode(_segs(F.col("geometry"))).alias("s"),
        off_expr.alias("off"),
    )
    return e.select(
        F.col("block_id").alias("case_id"),
        "road_type",
        F.round(F.col("s")[0] - F.col("off"), 6).alias("xa"),
        F.round(F.col("s")[1], 6).alias("ya"),
        F.round(F.col("s")[2] - F.col("off"), 6).alias("xb"),
        F.round(F.col("s")[3], 6).alias("yb"),
    ).orderBy("case_id", "xa", "ya", "xb", "yb")


def _q_geo_parcels_orphans(spark, sf_dir):
    """K5+J9 orphan reunion on a U-shaped block, closed-form oracle.

    The U-block (area 7) cuts building A's convex Voronoi region in two;
    the far-arm piece intersects no building (orphan,
    `prclz/_parcels.py:65-103`) and is reunited with the nearest bordering
    parcel — B's (`find_parent_parcel_id` `:105-149`). Closed-form facts:
    2 parcels, total area exactly 7 (nothing dropped), the top of the right
    arm ends up in B's parcel and not in A's."""
    from prclz_spark import geom as G
    from prclz_spark.functions.st import st_area, st_contains_xy
    from prclz_spark.operators.parcels import tessellate

    ring = [(0, 0), (3, 0), (3, 3), (2, 3), (2, 1), (1, 1), (1, 3), (0, 3), (0, 0)]
    block_wkb = G.wkb_dumps(G.polygon(ring))
    a_wkb = G.wkb_dumps(G.box(0.3, 2.5, 0.7, 2.9))
    b_wkb = G.wkb_dumps(G.box(2.4, 0.1, 2.8, 0.5))
    blocks = spark.createDataFrame(
        [("U1", block_wkb)], "block_id string, geometry binary"
    )
    bldgs = spark.createDataFrame(
        [("A", a_wkb), ("B", b_wkb)], "osm_id string, geometry binary"
    )
    parcels = tessellate(blocks, bldgs, res=12)
    per = parcels.select(
        "osm_id",
        st_area(F.col("geometry")).alias("area"),
        st_contains_xy(F.col("geometry"), F.lit(2.5), F.lit(2.95)).alias("has_tr"),
    )
    return per.agg(
        F.count("*").alias("n_parcels"),
        F.round(F.sum("area"), 6).alias("total_area"),
        F.max(F.when(F.col("osm_id") == "B", F.col("has_tr"))).alias("b_has_topright"),
        F.max(F.when(F.col("osm_id") == "A", F.col("has_tr"))).alias("a_has_topright"),
    )


def _q_geo_parcels_offset(spark, sf_dir):
    """K4 momepy inward-offset seeding, closed-form oracle
    (`momepy.Tessellation` shrink semantics; reference delegates at
    `prclz/_parcels.py:52-63`).

    Block (0,0)-(8,6); building A = box(1,1)-(5,5), building B = thin box
    (5.4,2.9)-(5.6,3.1). Probe point (5.15, 3.0) sits in the gap.
    * offset=0: both seed their raw boundaries → the A|B bisector near y=3
      is x=5.2 → probe belongs to A (0.15 vs 0.25).
    * offset=0.15: A erodes to x=4.85; B (width 0.2 < 2·offset) keeps its
      raw boundary (momepy's shrink fallback) → bisector moves to x=5.125
      → probe belongs to B (0.30 vs 0.25).
    Both modes partition the block exactly (total area 48)."""
    from prclz_spark import geom as G
    from prclz_spark.functions.st import st_area, st_contains_xy
    from prclz_spark.operators.parcels import tessellate

    blocks = spark.createDataFrame(
        [("OFF1", G.wkb_dumps(G.box(0.0, 0.0, 8.0, 6.0)))], "block_id string, geometry binary"
    )
    bldgs = spark.createDataFrame(
        [
            ("A", G.wkb_dumps(G.box(1.0, 1.0, 5.0, 5.0))),
            ("B", G.wkb_dumps(G.box(5.4, 2.9, 5.6, 3.1))),
        ],
        "osm_id string, geometry binary",
    )

    def summarize(parcels, mode):
        per = parcels.select(
            F.lit(mode).alias("mode"),
            "osm_id",
            st_area(F.col("geometry")).alias("area"),
            st_contains_xy(F.col("geometry"), F.lit(5.15), F.lit(3.0)).alias("has_probe"),
        )
        return per.groupBy("mode").agg(
            F.count("*").alias("n_parcels"),
            F.round(F.sum("area"), 4).alias("total_area"),
            F.max(F.when(F.col("osm_id") == "A", F.col("has_probe"))).alias("a_has_probe"),
            F.max(F.when(F.col("osm_id") == "B", F.col("has_probe"))).alias("b_has_probe"),
        )

    raw = summarize(tessellate(blocks, bldgs, res=12), "raw")
    off = summarize(tessellate(blocks, bldgs, res=12, inward_offset=0.15), "offset")
    return raw.unionByName(off).orderBy("mode")


def _q_geo_reblock_full(spark, sf_dir):
    """K19 with every reference step ON (`prclz/reblock/_reblock.py:140-220`):
    drop already-connected buildings, outside dummy node, K17 through-
    streets (top-1), K18 corridor simplification. Dense single-block
    fixture (5×5 interior building grid) so interior parcels survive the
    connected-building drop. Rows-only (planar-graph kernel)."""
    from prclz_spark import geom as G
    from prclz_spark.functions.st import st_length
    from prclz_spark.operators.parcels import tessellate
    from prclz_spark.operators.reblock_op import reblock

    blocks = spark.createDataFrame(
        [("B1", G.wkb_dumps(G.box(0, 0, 10, 10)))], "block_id string, geometry binary"
    )
    rows = []
    i = 0
    for x in range(1, 10, 2):
        for y in range(1, 10, 2):
            rows.append((f"b{i:02d}", G.wkb_dumps(G.box(x - 0.3, y - 0.3, x + 0.3, y + 0.3))))
            i += 1
    bldgs = spark.createDataFrame(rows, "osm_id string, geometry binary")
    parcels = tessellate(blocks, bldgs, res=12)
    rb = reblock(
        blocks, parcels, bldgs, res=12,
        drop_connected=True, outside_node=True,
        thru_streets_top_n=1, simplify_roads=True,
    )
    return rb.select(
        "block_id", "road_type",
        F.round(st_length(F.col("geometry")), 6).alias("road_len"),
        "bldg_count", "num_block_coords", "num_block_coords_unmatched",
    )


def _q_images_roundtrip(spark, sf_dir):
    """Decode → re-encode PSNR invariant, closed-form oracle (north_rule
    "decoded-pixel allclose, PSNR≥40dB for lossy"): the fixture has 64 jpeg
    (i%4==0) and 192 png images, and decode∘encode is pixel-stable for both
    codecs (png lossless; the jpeg stand-in's quantization is idempotent on
    already-decoded pixels), so min PSNR ≥ 40 dB must hold for every group."""
    from prclz_spark import images as IM

    imgs = IM.images_table(spark, 256)
    u = IM.make_udfs()
    return (
        imgs.withColumn("psnr", u["img_roundtrip_psnr"](F.col("bytes"), F.col("fmt")))
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n"),
            (F.min("psnr") >= 40.0).alias("min_psnr_ge_40db"),
        )
        .orderBy("fmt")
    )


def _q_phash_dedup(spark, sf_dir):
    """Near-duplicate detection via phash buckets, closed-form oracle: the
    128 even-id images get PNG-re-encoded copies under new ids (a simulated
    re-crawl; exact-pixel dedup would miss them). All 256 fixture phashes
    are distinct and re-encoding is phash-preserving (both verified by
    phash_pair_match + unit tests), so the bucket histogram is exactly
    {copies=1: 128, copies=2: 128}."""
    from prclz_spark import images as IM

    imgs = IM.images_table(spark, 256)
    u = IM.make_udfs()
    dups = (
        imgs.filter(F.substring("image_id", 5, 8).cast("int") % 2 == 0)
        .withColumn("bytes", u["img_reencode_png"](F.col("bytes"), F.col("fmt")))
        .withColumn("fmt", F.lit("png"))
        .withColumn("image_id", F.concat(F.lit("re_"), F.col("image_id")))
    )
    all_imgs = imgs.unionByName(dups)
    hashed = all_imgs.withColumn("ph", u["img_phash"](F.col("bytes"), F.col("fmt")))
    return (
        hashed.groupBy("ph")
        .agg(F.count("*").alias("copies"), F.min("image_id").alias("keep_id"))
        .groupBy("copies")
        .agg(F.count("*").alias("n_buckets"))
        .orderBy("copies")
    )


def _q_phash_pair_match(spark, sf_dir):
    """Deterministic phash invariant, closed-form oracle: re-encoding any
    image to PNG is pixel-preserving at the phash stage (phash is computed
    on DECODED pixels for both the original and the copy), so every one of
    the 128 even-id re-crawled copies must share its original's phash."""
    from prclz_spark import images as IM

    imgs = IM.images_table(spark, 256)
    u = IM.make_udfs()
    dups = (
        imgs.filter(F.substring("image_id", 5, 8).cast("int") % 2 == 0)
        .withColumn("bytes", u["img_reencode_png"](F.col("bytes"), F.col("fmt")))
        .withColumn("fmt", F.lit("png"))
        .withColumn("image_id", F.concat(F.lit("re_"), F.col("image_id")))
    )
    hashed_orig = imgs.withColumn("ph", u["img_phash"](F.col("bytes"), F.col("fmt"))).select(
        "image_id", F.col("ph").alias("ph_orig")
    )
    hashed_re = dups.withColumn("ph", u["img_phash"](F.col("bytes"), F.col("fmt"))).select(
        F.expr("substring(image_id, 4)").alias("image_id"), F.col("ph").alias("ph_re")
    )
    j = hashed_re.join(hashed_orig, "image_id")
    return j.agg(
        F.count("*").alias("n_pairs"),
        F.sum((F.col("ph_re") == F.col("ph_orig")).cast("long")).alias("n_phash_equal"),
    )


def _q_tile_block_assignment(spark, sf_dir):  # raster tile ⋈ vector block
    from prclz_spark import cells as C
    from prclz_spark import fixtures as FX
    from prclz_spark import images as IM
    from prclz_spark import raster as R
    from prclz_spark.operators.blocks import extract_blocks

    nx = 6
    lines, gadm, _ = FX.geo_world(spark, nx, nx)
    res = C.choose_resolution(*FX.grid_params(nx, nx), n_features=nx * nx * 4)
    blocks = extract_blocks(lines, gadm, res)
    tiles = R.with_footprints(IM.images_table(spark, nx * nx), nx, nx, nx)
    assigned = R.assign_tiles_to_polys(tiles, blocks, "block_id", res)
    return assigned.groupBy("block_id").agg(F.count("*").alias("n_tiles"))


def _q_tile_region_assignment(spark, sf_dir):
    """Raster tile ⋈ admin region through the REAL machinery (images table →
    footprint UDF → cover-cell PIP join) — DuckDB-oracled via the closed-form
    tile georeference (FIXTURES.md §9: tile i center = origin + (i//T + ½)·w)."""
    from prclz_spark import fixtures as FX
    from prclz_spark import images as IM
    from prclz_spark import raster as R

    nxt = 12  # 12×12 tiles over a 12×12-cell box, 3×3 regions
    _, gadm, _ = FX.geo_world(spark, nxt, nxt, gx=3, gy=3)
    tiles = R.with_footprints(IM.images_table(spark, nxt * nxt), nxt, nxt, nxt)
    assigned = R.assign_tiles_to_polys(tiles, gadm, "gadm", res=_GEO_RES)
    return assigned.groupBy("gadm").agg(F.count("*").alias("n_tiles"))


# ---- DuckDB replications of the integer-exact dedup pipelines ----------
# These oracles recompute the ENGINE'S OWN hashes in SQL (HUGEINT modular
# arithmetic emulating uint64 wraparound), so the LSH/banding pipelines are
# value-checked end to end, not just row-counted. Float-free by design:
# every quantity is integer until the final ratio (k/64, exact in binary).

_M64 = 1 << 64
_FNV_B = 1099511628211


def _sql_poly_hash(k: int, var: str = "s", idx: str = "i") -> str:
    """Nested-expression uint64 polynomial hash of a k-char substring."""
    expr = "0::HUGEINT"
    for j in range(k):
        expr = (
            f"(({expr}) * {_FNV_B}"
            f" + ascii(substring({var}, {idx} + {j}, 1))) % {_M64}"
        )
    return expr


def _minhash_sig_sql() -> str:
    """CTE body: (doc_id, sig) with the engine's 64-perm MinHash signature
    over 5-char shingles — emulates numpy's uint64 overflow order:
    ((a*x) mod 2^64 + b) mod 2^64 mod P."""
    from prclz_spark.operators.dedup import _P, _perm_params

    a, b = _perm_params(64)
    av = ", ".join(str(int(x)) for x in a)
    bv = ", ".join(str(int(x)) for x in b)
    return f"""
      SELECT doc_id, list(mv ORDER BY p) AS sig
      FROM (
        SELECT doc_id, pr.p AS p,
               MIN(CAST(((pa.A[pr.p+1] * x) % {_M64} + pa.B[pr.p+1]) % {_M64} % {_P}
                        AS BIGINT)) AS mv
        FROM (
          SELECT doc_id,
                 unnest(list_distinct([{_sql_poly_hash(5)}
                                       for i in range(1, length(s) - 3)])) AS x
          FROM f
        ), (SELECT [{av}]::HUGEINT[] AS A, [{bv}]::HUGEINT[] AS B) pa,
        generate_series(0, 63) pr(p)
        GROUP BY doc_id, pr.p
      ) GROUP BY doc_id
"""


_MINHASH_LSH_ORACLE_TMPL = """
    WITH d AS (
      SELECT doc_id, text AS s FROM documents WHERE doc_id < 400
    ), f AS (
      SELECT doc_id, s FROM d
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             substring(s, 1, CAST(FLOOR(length(s) * 0.9) AS INT)) AS s
      FROM d WHERE doc_id % 2 = 0
    ), sg AS (
      {SIG}
    )
    SELECT id_a, id_b, ROUND(CAST(ag AS DOUBLE) / 64, 4) AS jaccard_est
    FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             [a.sig[i] = b.sig[i] for i in range(1, 65)] AS eq
      FROM sg a JOIN sg b ON a.doc_id < b.doc_id
    ), LATERAL (SELECT length(list_filter(eq, x -> x)) AS ag) t
    WHERE ag >= 32
      AND length(list_filter(range(0, 16),
                 bnd -> eq[bnd*4+1] AND eq[bnd*4+2] AND eq[bnd*4+3] AND eq[bnd*4+4])) > 0
"""

_DEDUP_AGAINST_ORACLE_TMPL = """
    WITH d AS (
      SELECT doc_id, text AS s FROM documents WHERE doc_id < 200
    ), f AS (
      SELECT doc_id, s FROM d
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id,
             substring(s, 1, CAST(FLOOR(length(s) * 0.9) AS INT)) AS s
      FROM d WHERE doc_id < 150 AND doc_id % 5 = 0
    ), sg AS (
      {SIG}
    )
    SELECT id_b AS batch_id, id_a AS corpus_id,
           ROUND(CAST(ag AS DOUBLE) / 64, 4) AS jaccard_est
    FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             [a.sig[i] = b.sig[i] for i in range(1, 65)] AS eq
      FROM sg a JOIN sg b ON a.doc_id < 150 AND b.doc_id >= 150
    ), LATERAL (SELECT length(list_filter(eq, x -> x)) AS ag) t
    WHERE ag >= 32
      AND length(list_filter(range(0, 16),
                 bnd -> eq[bnd*4+1] AND eq[bnd*4+2] AND eq[bnd*4+3] AND eq[bnd*4+4])) > 0
    ORDER BY batch_id, corpus_id
"""

_DEDUP_CLUSTER_ORACLE_TMPL = """
    WITH RECURSIVE d AS (
      SELECT doc_id, text AS s FROM documents WHERE doc_id < 100
    ), c1 AS (
      SELECT doc_id + 1000000 AS doc_id,
             substring(s, 1, CAST(FLOOR(length(s) * 0.72) AS INT)) AS s
      FROM d WHERE doc_id % 10 = 0
    ), c2 AS (
      SELECT doc_id + 1000000 AS doc_id,
             substring(s, 1, CAST(FLOOR(length(s) * 0.72) AS INT)) AS s
      FROM c1
    ), f AS (
      SELECT doc_id, s FROM d
      UNION ALL SELECT doc_id, s FROM c1
      UNION ALL SELECT doc_id, s FROM c2
    ), sg AS (
      {SIG}
    ), pairs AS (
      SELECT id_a, id_b
      FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               [a.sig[i] = b.sig[i] for i in range(1, 65)] AS eq
        FROM sg a JOIN sg b ON a.doc_id < b.doc_id
      ), LATERAL (SELECT length(list_filter(eq, x -> x)) AS ag) t
      WHERE ag >= 32
        AND length(list_filter(range(0, 16),
                   bnd -> eq[bnd*4+1] AND eq[bnd*4+2] AND eq[bnd*4+3] AND eq[bnd*4+4])) > 0
    ), bidir AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM pairs
    ), reach AS (
      SELECT a, b FROM bidir
      UNION
      SELECT r.a, e.b FROM reach r JOIN bidir e ON r.b = e.a
    )
    SELECT a AS id, LEAST(MIN(b), a) AS rep
    FROM reach GROUP BY a
    ORDER BY id
"""

_SIMHASH_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, text AS s FROM documents WHERE doc_id < 400
    ), f AS (
      SELECT doc_id, s FROM d
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, s || ' extra token' AS s FROM d
      WHERE doc_id % 2 = 0
    ), th AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(0::HUGEINT,
                 [ascii(substring(tok, i, 1))::HUGEINT
                  for i in range(1, length(tok) + 1)]),
               (acc, x) -> (acc * {_FNV_B} + x) % {_M64}) AS h
      FROM (SELECT doc_id,
                   unnest(list_filter(string_split(s, ' '), x -> x != '')) AS tok
            FROM f)
    ), votes AS (
      SELECT doc_id, b.bit,
             SUM(CASE WHEN (h // (1::HUGEINT << b.bit)) % 2 = 1
                      THEN 1 ELSE -1 END) AS v
      FROM th, generate_series(0, 63) b(bit)
      GROUP BY doc_id, b.bit
    ), sig AS (
      SELECT doc_id,
             SUM(CASE WHEN v > 0 THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END) AS u
      FROM votes GROUP BY doc_id
    ), s64 AS (
      SELECT doc_id,
             CAST(CASE WHEN u >= {1 << 63} THEN u - {_M64} ELSE u END AS BIGINT) AS h
      FROM sig
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
    FROM s64 a JOIN s64 b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.h, b.h)) <= 3
"""

# DuckDB replication of the engine's polynomial k-gram rolling hash
# (h = (h·FNV + byte) mod 2^64 over 8 ASCII chars, masked to 63 bits) —
# validated char-for-char against dedup._kgram_hash_seq.
_WINNOW_HASH_EXPR = "0::HUGEINT"
for _j in range(8):
    _WINNOW_HASH_EXPR = (
        f"(({_WINNOW_HASH_EXPR}) * 1099511628211"
        f" + ascii(substring(s, i + {_j}, 1))) % 18446744073709551616"
    )
_WINNOW_HASH_EXPR = f"(({_WINNOW_HASH_EXPR}) % 9223372036854775808)"

# per-doc winnowed fingerprint sets (k=8, w=4) as a DuckDB CTE bundle
_WINNOW_FPS_CTE = f"""
      SELECT doc_id,
             list_distinct([list_min(hs[j:j+3]) for j in range(1, len(hs) - 2)]) AS fps
      FROM (
        SELECT doc_id, [{_WINNOW_HASH_EXPR} for i in range(1, length(s) - 6)] AS hs
        FROM f
      )
"""

_WINNOW_FP_ORACLE = f"""
    WITH f AS (
      SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS s
      FROM documents WHERE doc_id < 30 AND length(regexp_replace(text, '[^ -~]', '', 'g')) >= 11
    ), wn AS (
      {_WINNOW_FPS_CTE}
    )
    SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
           CAST(list_min(fps) AS BIGINT) AS min_fp,
           CAST(list_max(fps) AS BIGINT) AS max_fp
    FROM wn
"""

_WINNOW_PAIRS_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS s
      FROM documents WHERE doc_id < 60 AND length(regexp_replace(text, '[^ -~]', '', 'g')) >= 11
    ), f AS (
      SELECT doc_id, s FROM d
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             substring(s, 1, CAST(FLOOR(length(s) * 0.95) AS INT)) AS s
      FROM d WHERE doc_id % 4 = 0
    ), wn AS (
      {_WINNOW_FPS_CTE}
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(length(list_intersect(a.fps, b.fps)) AS BIGINT) AS shared
    FROM wn a JOIN wn b ON a.doc_id < b.doc_id
    WHERE length(list_intersect(a.fps, b.fps)) >= 5
"""

# 6×6 world, one tile per cell (center at the cell center): every
# block gets exactly one tile — a diagonal cell's center lies ON the
# diagonal, matching both triangles under closed PIP semantics.
# Block ids replay polygonize_region's (miny, minx) face enumeration:
# cells ordered (cj, ci) per quadrant, diagonal cells claiming two
# consecutive ids.
_TILE_BLOCK_ORACLE = """
    WITH cells AS (
      SELECT a.i AS ci, b.j AS cj,
             CAST(a.i // 3 AS INT) AS gi, CAST(b.j // 3 AS INT) AS gj,
             CASE WHEN (a.i * 6 + b.j) % 7 = 3 THEN 2 ELSE 1 END AS nb
      FROM generate_series(0, 5) a(i), generate_series(0, 5) b(j)
    ), numbered AS (
      SELECT *, COALESCE(SUM(nb) OVER (PARTITION BY gi, gj ORDER BY cj, ci
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
      FROM cells
    )
    SELECT 'TST.' || CAST(gi + 1 AS VARCHAR) || '.' || CAST(gj + 1 AS VARCHAR)
             || '_1_' || CAST(base + s.k AS VARCHAR) AS block_id,
           CAST(1 AS BIGINT) AS n_tiles
    FROM numbered, generate_series(0, 1) s(k)
    WHERE s.k < nb
"""

# 4×4 world, 32×32-pixel tiles: square blocks fully cover their tile
# (coverage 1); a diagonal triangle covers 528/1024 pixel centers
# (j ≤ i plus the 32 on-diagonal centers, closed PIP) = 0.5156
_TILE_COVERAGE_ORACLE = """
    WITH cells AS (
      SELECT a.i AS ci, b.j AS cj,
             CAST(a.i // 2 AS INT) AS gi, CAST(b.j // 2 AS INT) AS gj,
             CASE WHEN (a.i * 4 + b.j) % 7 = 3 THEN 2 ELSE 1 END AS nb
      FROM generate_series(0, 3) a(i), generate_series(0, 3) b(j)
    ), numbered AS (
      SELECT *, COALESCE(SUM(nb) OVER (PARTITION BY gi, gj ORDER BY cj, ci
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
      FROM cells
    )
    SELECT 'img_' || LPAD(CAST(ci * 4 + cj AS VARCHAR), 8, '0') AS image_id,
           'TST.' || CAST(gi + 1 AS VARCHAR) || '.' || CAST(gj + 1 AS VARCHAR)
             || '_1_' || CAST(base + s.k AS VARCHAR) AS block_id,
           CAST(CASE WHEN nb = 2 THEN 0.5156 ELSE 1.0 END AS DOUBLE) AS coverage
    FROM numbered, generate_series(0, 1) s(k)
    WHERE s.k < nb
"""

_TILE_REGION_ORACLE = """
    WITH tiles AS (
      SELECT i,
             10.0 + (CAST(i // 12 AS DOUBLE) + 0.5) * 0.01 AS x,
             10.0 + (CAST(i % 12 AS DOUBLE) + 0.5) * 0.01 AS y
      FROM generate_series(0, 143) t(i)
    ), boxes AS (
      SELECT 'TST.' || CAST(i + 1 AS VARCHAR) || '.' || CAST(j + 1 AS VARCHAR) || '_1' AS gadm,
             10.0 + i * 0.04 AS xmin, 10.0 + j * 0.04 AS ymin,
             10.0 + (i + 1) * 0.04 AS xmax, 10.0 + (j + 1) * 0.04 AS ymax
      FROM generate_series(0, 2) a(i), generate_series(0, 2) b(j)
    )
    SELECT gadm, COUNT(*) AS n_tiles
    FROM tiles p JOIN boxes b
      ON p.x >= b.xmin AND p.x <= b.xmax AND p.y >= b.ymin AND p.y <= b.ymax
    GROUP BY gadm
"""


def _q_tile_block_coverage(spark, sf_dir):  # vector → raster mask stats
    from prclz_spark import cells as C
    from prclz_spark import fixtures as FX
    from prclz_spark import images as IM
    from prclz_spark import raster as R
    from prclz_spark.operators.blocks import extract_blocks

    nx = 4
    lines, gadm, _ = FX.geo_world(spark, nx, nx)
    res = C.choose_resolution(*FX.grid_params(nx, nx), n_features=nx * nx * 4)
    blocks = extract_blocks(lines, gadm, res)
    tiles = R.with_footprints(IM.images_table(spark, nx * nx, w=32, h=32), nx, nx, nx)
    assigned = R.assign_tiles_to_polys(tiles, blocks, "block_id", res)
    cov = R.block_coverage(assigned.select("image_id", "block_id", "geometry", "w", "h"), blocks)
    return cov.select("image_id", "block_id", F.round("coverage", 4).alias("coverage"))


# ---- consolidated driver queries (round 6) --------------------------------
# The driver verifies the first 50 registry entries; r5 had 54 registered so
# the last four went unchecked. These union-with-label wrappers keep every
# invariant value-checked while fitting the registry to exactly 50 entries.


def _q_tile_raster_checks(spark, sf_dir):
    """All three raster⋈vector invariants in one checked query: per-block
    tile counts (6×6 world), per-region tile counts (12×12 world, 3×3
    regions), and per-tile pixel-mask coverage (4×4 world, 32×32 tiles).
    Each sub-pipeline is the REAL machinery (images table → footprint UDF →
    cover-cell PIP join → mask stats); the oracle unions the three
    closed-form replays under the same (check, key, value) projection."""
    a = _q_tile_block_assignment(spark, sf_dir).select(
        F.lit("block_tiles").alias("check"),
        F.col("block_id").alias("key"),
        F.col("n_tiles").cast("double").alias("value"),
    )
    r = _q_tile_region_assignment(spark, sf_dir).select(
        F.lit("region_tiles").alias("check"),
        F.col("gadm").alias("key"),
        F.col("n_tiles").cast("double").alias("value"),
    )
    c = _q_tile_block_coverage(spark, sf_dir).select(
        F.lit("coverage").alias("check"),
        F.concat_ws("|", "image_id", "block_id").alias("key"),
        F.col("coverage").cast("double").alias("value"),
    )
    return a.unionByName(r).unionByName(c).orderBy("check", "key")


def _q_phash_checks(spark, sf_dir):
    """All three phash invariants in one checked query: the bucket
    histogram (256 distinct phashes + 128 phash-preserving PNG re-crawl
    copies ⇒ {copies=1: 128, copies=2: 128}), the pair-match count (all
    128 re-encoded copies share their original's phash), and the round-6
    NEAR-dup tier through the real engine path
    (phash_near_pairs_from_sigs: byte-pair pigeonhole bands → capped
    self-join → Hamming verify): 200 xxhash64-derived codes, each with a
    planted twin at Hamming EXACTLY 6 (the band guarantee boundary —
    6 flips spread over 6 distinct bytes). Closed form: the pair set is
    exactly the 200 planted (base, base+10⁶) pairs, because the minimum
    off-family Hamming distance in this frozen fixture is 17 (verified
    exhaustively at build time; xxhash64 is deterministic)."""
    from prclz_spark.operators.dedup import phash_near_pairs_from_sigs

    hist = _q_phash_dedup(spark, sf_dir).select(
        F.lit("copies_hist").alias("check"),
        F.col("copies").cast("long").alias("k"),
        F.col("n_buckets").cast("long").alias("v"),
    )
    pair = _q_phash_pair_match(spark, sf_dir).select(
        F.lit("pair_match").alias("check"),
        F.col("n_pairs").cast("long").alias("k"),
        F.col("n_phash_equal").cast("long").alias("v"),
    )
    mask = sum(1 << b for b in (0, 9, 18, 27, 36, 45))
    base = spark.range(0, 200).selectExpr(
        "id AS doc_id", "xxhash64(cast(id AS string)) AS phash"
    )
    twins = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr(f"phash ^ CAST({mask} AS BIGINT)").alias("phash"),
    )
    near = phash_near_pairs_from_sigs(
        base.unionByName(twins), "doc_id", max_hamming=6
    ).select(
        F.lit("near_pair").alias("check"),
        F.col("id_a").cast("long").alias("k"),
        F.col("id_b").cast("long").alias("v"),
    )
    return hist.unionByName(pair).unionByName(near).orderBy("check", "k")


def _q_winnow_checks(spark, sf_dir):
    """Both winnowing invariants in one checked query: per-doc fingerprint
    stats (count/min/max of the k=8,w=4 winnowed set, DuckDB-replicated
    hash-for-hash) and the planted-clone near-pair set (≥5 shared fps)."""
    fp = _q_winnow_fingerprint(spark, sf_dir).select(
        F.lit("fp").alias("check"),
        F.col("doc_id").cast("long").alias("k1"),
        F.col("n_fp").cast("long").alias("k2"),
        F.col("min_fp").cast("long").alias("v1"),
        F.col("max_fp").cast("long").alias("v2"),
    )
    pr = _q_winnow_near_pairs(spark, sf_dir).select(
        F.lit("pair").alias("check"),
        F.col("id_a").cast("long").alias("k1"),
        F.col("id_b").cast("long").alias("k2"),
        F.col("shared").cast("long").alias("v1"),
        F.lit(0).cast("long").alias("v2"),
    )
    return fp.unionByName(pr).orderBy("check", "k1", "k2")


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

def _q_rowops_checks(spark, sf_dir):
    """Composite of four stable row-op suites (anti/semi/dedup/union —
    SURVEY F6/F8 + ledger-resume + semi join), consolidated to one
    registry row (VERDICT r6 #1) to make room for the session-2
    operators. Each part keeps its full original oracle, reshaped to a
    shared (part, key, n, extra) schema."""

    def shape(df, part, key, n, extra=None):
        return df.select(
            F.lit(part).alias("part"),
            F.col(key).cast("string").alias("key"),
            F.col(n).cast("long").alias("n"),
            (F.col(extra) if extra else F.lit(None)).cast("long").alias("extra"),
        )

    return (
        shape(_q_anti_join(spark, sf_dir), "anti", "o_orderstatus", "n")
        .unionByName(shape(_q_semi_join(spark, sf_dir), "semi", "o_orderpriority", "n"))
        .unionByName(
            shape(_q_dedup_rows(spark, sf_dir), "dedup", "o_orderstatus", "n_distinct_cust")
        )
        .unionByName(shape(_q_union_all(spark, sf_dir), "union", "src", "n", "keysum"))
    )


def _q_geo_parcels_cases(spark, sf_dir):
    """Composite of the two closed-form tessellation cases (K4 offset
    seeding + K5 orphan reunion) under one constant-row oracle."""
    orph = _q_geo_parcels_orphans(spark, sf_dir).select(
        F.lit("orphan_u").alias("case_id"),
        "n_parcels",
        F.col("total_area").cast("double"),
        F.col("a_has_topright").alias("a_flag"),
        F.col("b_has_topright").alias("b_flag"),
    )
    off = _q_geo_parcels_offset(spark, sf_dir).select(
        F.concat(F.lit("offset_"), F.col("mode")).alias("case_id"),
        "n_parcels",
        F.col("total_area").cast("double"),
        F.col("a_has_probe").alias("a_flag"),
        F.col("b_has_probe").alias("b_flag"),
    )
    return orph.unionByName(off)


def _q_text_quality_lang(spark, sf_dir):
    """quality_score + lang_id_heuristic merged: per-doc quality metrics
    AND the n-gram language prediction in one row set (row-level, which
    is strictly stronger than the old grouped lang_id form)."""
    d = _load(spark, sf_dir, "documents")
    n_spaces = F.length("text") - F.length(F.regexp_replace("text", " ", ""))
    n_digits = F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
    words = n_spaces + F.lit(1)
    hits = (
        (F.length("text") - F.length(F.regexp_replace("text", " the ", ""))) / 5
        + (F.length("text") - F.length(F.regexp_replace("text", " and ", ""))) / 5
        + (F.length("text") - F.length(F.regexp_replace("text", " of ", ""))) / 4
    )
    return d.select(
        "doc_id",
        "lang",
        F.when(hits >= 1, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
        F.length("text").alias("n_chars_m"),
        words.cast("long").alias("n_words"),
        F.round(F.length("text").cast("double") / words.cast("double"), 4).alias(
            "avg_word_len"
        ),
        F.round(n_digits.cast("double") / F.length("text").cast("double"), 4).alias(
            "digit_ratio"
        ),
    ).filter(F.col("doc_id") < 500)


def _q_token_ngram_stats(spark, sf_dir):
    """token_stats + ngram_distinct merged: per-language token counting
    AND 5-gram shingle cardinality aggregated in one pass."""
    d = _load(spark, sf_dir, "documents")
    toks = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + F.lit(1)
    shingles = F.expr(
        "transform(sequence(1, greatest(length(text) - 4, 0)), i -> substring(text, i, 5))"
    )
    return (
        d.select(
            "lang",
            toks.cast("long").alias("_t"),
            F.size(F.array_distinct(shingles)).cast("long").alias("_d5"),
            F.size(shingles).cast("long").alias("_n5"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_t").alias("total_tokens"),
            F.round(F.avg("_t"), 4).alias("avg_tokens"),
            F.sum("_d5").alias("distinct_5grams"),
            F.sum("_n5").alias("total_5grams"),
        )
    )


# --------------------------------------------------------------------------
# session-2 operator rows (VERDICT r6 #1: rotated into the oracle registry)
# --------------------------------------------------------------------------

# Gopher-rule cutoffs for the quality_filter row, tuned to split the sf
# corpus nontrivially (word-soup fixture: dup-word median 0.83, top-2gram
# median 0.07, dup-2gram median 0.03, words q10/q90 = 21/92)
_QF_RULES = {
    "min_words": 30,
    "max_words": 90,
    "dup_line_frac": 0.80,
    "top_2gram_char_frac": 0.09,
    "dup_2gram_frac": 0.04,
}


def _q_repetition_metrics(spark, sf_dir):
    """Gopher repetition metrics (operators/textq.py) with words-as-lines
    (the fixture docs have no newlines; line_sep=' ' makes the dup-line
    machinery nontrivial and splits identically in DuckDB)."""
    from prclz_spark.operators.textq import repetition_metrics

    d = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return repetition_metrics(
        d, "doc_id", "text", top_ngram_sizes=(2, 3), dup_ngram_sizes=(5,),
        line_sep=" ",
    )


def _q_quality_filter(spark, sf_dir):
    """Gopher verdicts over the repetition metrics; the reasons array is
    scalar-encoded (sorted, comma-joined) for the driver canonicalizer."""
    from prclz_spark.operators.textq import quality_filter

    d = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    qf = quality_filter(d, "doc_id", "text", rules=dict(_QF_RULES), line_sep=" ")
    return qf.select(
        "doc_id",
        "n_words",
        F.array_join("reasons", ",").alias("reasons"),
        "keep",
    )


def _q_strip_boilerplate(spark, sf_dir):
    """CCNet line-level boilerplate strip with words-as-lines: words in
    ≥ min_df of the 400 docs are stripped from every doc; text_clean is
    compared byte-for-byte against the DuckDB reassembly."""
    from prclz_spark.operators.textq import strip_boilerplate_lines

    d = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return strip_boilerplate_lines(d, "doc_id", "text", min_df=310, line_sep=" ")


def _aspect_images(spark, sf_dir):
    """Deterministic synthetic image-metadata table in the input-hint
    shape (w/h int columns), derived from doc_id with planted corrupt
    rows (NULL width every 101st, zero height every 97th)."""
    d = _load(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id"),
        F.when(F.col("doc_id") % 101 == 0, F.lit(None))
        .otherwise(F.lit(256) + F.pmod(F.col("doc_id") * 37, F.lit(1545)))
        .cast("int")
        .alias("w"),
        F.when(F.col("doc_id") % 97 == 0, F.lit(0))
        .otherwise(F.lit(256) + F.pmod(F.col("doc_id") * 91, F.lit(1545)))
        .cast("int")
        .alias("h"),
    )


def _q_aspect_buckets(spark, sf_dir):
    """NovelAI aspect-ratio bucket assignment (operators/aspect.py):
    ladder argmin on |log(w/h) − log(bw/bh)|, NULL for corrupt rows. The
    ladder log values are Python literals shared verbatim with the
    DuckDB oracle; only log(w/h) is computed per-engine."""
    from prclz_spark.operators.aspect import assign_aspect_buckets, make_aspect_buckets

    out = assign_aspect_buckets(
        _aspect_images(spark, sf_dir), make_aspect_buckets(), "w", "h"
    )
    return out.select("doc_id", "w", "h", "aspect_idx", "bucket_w", "bucket_h")


def _q_form_batches(spark, sf_dir):
    """Deterministic training batches (operators/aspect.py): numeric ids
    feed the MINSTD scramble directly, so chunking, ordering, batch_id
    layout, slots and partial flags are ALL replayed closed-form in the
    DuckDB oracle — a full value oracle, not rows-only."""
    from prclz_spark.operators.aspect import form_batches, make_aspect_buckets

    imgs = _aspect_images(spark, sf_dir).withColumnRenamed("doc_id", "image_id")
    return form_batches(
        imgs, make_aspect_buckets(), batch_size=16, id_col="image_id",
        seed=3, n_chunks=4,
    )


def _q_ivf_pq_topk(spark, sf_dir):
    """IVF-PQ ANN with exact re-rank (operators/ann.py). Rows-only: the
    k-means/PQ training floats aren't SQL-replicable; value-level checks
    live in tests/test_ann.py (recall gates, planted twins, ADC error)."""
    from prclz_spark.operators.ann import ivf_pq_topk

    e = _load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return ivf_pq_topk(
        q, e, "qid", "vec_id", "embedding", dim=64, k=5,
        n_lists=8, n_probe=3, m=8, refine_k=50,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": _q_pricing_summary,
        "rowops_checks": _q_rowops_checks,
        "join_left_notnull": _q_join_left_notnull,
        "multiway_join_revenue": _q_multiway_join,
        "topk_global": _q_topk_global,
        "window_topk_per_cust": _q_window_topk,
        "collect_sorted_list": _q_collect_sorted,
        "argmax_per_nation": _q_argmax_window,
        "explode_embeddings": _q_explode_embeddings,
        "events_hourly_rollup": _q_events_hourly,
        "pip_join_counts": _q_pip_join,
        "pip_join_pairs": _q_pip_pairs,
        "pip_join_skew": _q_pip_join_skew,
        "knn_ring_expansion": _q_knn,
        "radius_join": _q_radius_join,
        "dedup_exact_hash": _q_dedup_exact,
        "token_ngram_stats": _q_token_ngram_stats,
        "text_quality_lang": _q_text_quality_lang,
        "repetition_metrics": _q_repetition_metrics,
        "quality_filter": _q_quality_filter,
        "strip_boilerplate": _q_strip_boilerplate,
        "ann_cosine_topk": _q_ann_cosine,
        "embedding_norms": _q_embedding_norms,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "ivf_pq_topk": _q_ivf_pq_topk,
        "minhash_lsh_neardup": _q_minhash_lsh,
        "dedup_against_corpus": _q_dedup_against_corpus,
        "dedup_cluster_components": _q_dedup_cluster_components,
        "data_mix_sample": _q_data_mix_sample,
        "pack_sequences_uniform": _q_pack_sequences,
        "minhash_jaccard_exact": _q_minhash_jaccard_exact,
        "winnow_checks": _q_winnow_checks,
        "iceberg_snapshots": _q_iceberg_snapshots,
        "iceberg_delete_dedup": _q_iceberg_delete_dedup,
        "simhash_neardup": _q_simhash_dedup,
        "embedding_lsh_neardup": _q_embedding_near_dup,
        "geo_blocks_pipeline": _q_geo_blocks,
        "geo_union_area": _q_geo_union_area,
        "geo_k_complexity": _q_geo_complexity,
        "geo_parcels": _q_geo_parcels,
        "geo_parcels_cases": _q_geo_parcels_cases,
        "geo_reblock_steiner": _q_geo_reblock_golden,
        "geo_reblock_world": _q_geo_reblock,
        "geo_reblock_full": _q_geo_reblock_full,
        "aspect_buckets": _q_aspect_buckets,
        "form_batches": _q_form_batches,
        "images_roundtrip_psnr": _q_images_roundtrip,
        "phash_checks": _q_phash_checks,
        "tile_raster_checks": _q_tile_raster_checks,
    }


def _extra_oracles() -> dict[str, str]:
    """Oracles whose SQL embeds computed literals: the aspect ladder's
    log-ratio values (the SAME Python floats the Spark query broadcasts,
    so only log(w/h) is computed per-engine) and the MINSTD multipliers
    for the form_batches scramble replay (seed 3 -> chunk, seed 4 ->
    order; the arithmetic stays below 2^62, replicable verbatim)."""
    import math

    from prclz_spark.operators.aspect import make_aspect_buckets

    lad = make_aspect_buckets()
    lad_vals = ", ".join(
        f"({i}, {math.log(bw / bh)!r}, {bw}, {bh})"
        for i, (bw, bh) in enumerate(lad)
    )
    P = 2_147_483_647
    a3 = (48_271 + 3 * 2_654_435_761) % P
    a4 = (48_271 + 4 * 2_654_435_761) % P
    imgs = """
          SELECT doc_id,
                 CASE WHEN doc_id % 101 = 0 THEN NULL
                      ELSE CAST(256 + (doc_id * 37) % 1545 AS INT) END AS w,
                 CASE WHEN doc_id % 97 = 0 THEN 0
                      ELSE CAST(256 + (doc_id * 91) % 1545 AS INT) END AS h
          FROM documents
    """
    return {
        "aspect_buckets": f"""
            WITH imgs AS ({imgs}),
            lad(idx, lar, bw, bh) AS (VALUES {lad_vals}),
            asg AS (
              SELECT image_id, idx, bw, bh FROM (
                SELECT i.doc_id AS image_id, l.idx, l.bw, l.bh,
                       ROW_NUMBER() OVER (PARTITION BY i.doc_id
                         ORDER BY ABS(l.lar - LN(i.w::DOUBLE / i.h::DOUBLE)) ASC,
                                  l.idx ASC) AS rn
                FROM imgs i CROSS JOIN lad l
                WHERE i.w IS NOT NULL AND i.h IS NOT NULL AND i.w > 0 AND i.h > 0
              ) WHERE rn = 1)
            SELECT i.doc_id, i.w, i.h,
                   CAST(a.idx AS INT) AS aspect_idx,
                   CAST(a.bw AS INT) AS bucket_w,
                   CAST(a.bh AS INT) AS bucket_h
            FROM imgs i LEFT JOIN asg a ON a.image_id = i.doc_id
        """,
        "form_batches": f"""
            WITH imgs AS ({imgs}),
            lad(idx, lar, bw, bh) AS (VALUES {lad_vals}),
            asg AS (
              SELECT image_id, idx AS aspect_idx FROM (
                SELECT i.doc_id AS image_id, l.idx,
                       ROW_NUMBER() OVER (PARTITION BY i.doc_id
                         ORDER BY ABS(l.lar - LN(i.w::DOUBLE / i.h::DOUBLE)) ASC,
                                  l.idx ASC) AS rn
                FROM imgs i CROSS JOIN lad l
                WHERE i.w IS NOT NULL AND i.h IS NOT NULL AND i.w > 0 AND i.h > 0
              ) WHERE rn = 1),
            keyed AS (
              SELECT image_id, aspect_idx,
                     (((image_id % {P}) * {a3}) % {P}) % 4 AS chunk,
                     ((image_id % {P}) * {a4}) % {P} AS h2
              FROM asg),
            ranked AS (
              SELECT image_id, aspect_idx, chunk,
                     ROW_NUMBER() OVER (PARTITION BY aspect_idx, chunk
                                        ORDER BY h2, image_id) - 1 AS pos,
                     COUNT(*) OVER (PARTITION BY aspect_idx, chunk) AS nn
              FROM ranked_src_placeholder)
            SELECT image_id,
                   CAST(aspect_idx AS INT) AS aspect_idx,
                   CAST(aspect_idx AS BIGINT) * 17592186044416
                     + chunk * 1048576 + pos // 16 AS batch_id,
                   CAST(pos % 16 AS INT) AS slot,
                   pos // 16 >= nn // 16 AS partial
            FROM ranked
        """.replace("ranked_src_placeholder", "keyed"),
    }


def oracle_sql() -> dict[str, str]:
    pts_c = (
        "SELECT c_custkey AS pid, "
        f"{_PTS_X % 'c_custkey'} AS x, {_PTS_Y % 'c_custkey'} AS y FROM customer"
    )
    pts_s = (
        "SELECT s_suppkey AS bid, "
        f"{_PTS_X % 's_suppkey'} AS x, {_PTS_Y % 's_suppkey'} AS y FROM supplier"
    )
    return {
        **_extra_oracles(),
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                   ROUND(AVG(l_discount), 6) AS avg_disc,
                   COUNT(*) AS n
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "rowops_checks": """
            SELECT 'anti' AS part, o_orderstatus AS key, COUNT(*) AS n,
                   CAST(NULL AS BIGINT) AS extra
            FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM customer
                              WHERE c_acctbal > 0 AND c_custkey = o_custkey)
            GROUP BY 2
            UNION ALL
            SELECT 'semi', o_orderpriority, COUNT(*), NULL FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_quantity > 45 AND l_orderkey = o_orderkey)
            GROUP BY 2
            UNION ALL
            SELECT 'dedup', o_orderstatus, COUNT(*), NULL FROM (
              SELECT DISTINCT o_custkey, o_orderstatus FROM orders) GROUP BY 2
            UNION ALL
            SELECT 'union', src, COUNT(*), CAST(SUM(key) AS BIGINT) FROM (
              SELECT c_custkey AS key, 'c' AS src FROM customer
              UNION ALL
              SELECT s_suppkey AS key, 's' AS src FROM supplier) GROUP BY 2
        """,
        "token_ngram_stats": """
            WITH s AS (
              SELECT lang,
                     LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS toks,
                     [text[i:i+4] FOR i IN RANGE(1, GREATEST(LENGTH(text) - 4, 0) + 1)] AS sh
              FROM documents)
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(toks) AS BIGINT) AS total_tokens,
                   ROUND(AVG(toks), 4) AS avg_tokens,
                   CAST(SUM(len(list_distinct(sh))) AS BIGINT) AS distinct_5grams,
                   CAST(SUM(len(sh)) AS BIGINT) AS total_5grams
            FROM s GROUP BY 1
        """,
        "text_quality_lang": """
            SELECT doc_id, lang,
                   CASE WHEN
                     (LENGTH(text) - LENGTH(REPLACE(text, ' the ', ''))) / 5
                   + (LENGTH(text) - LENGTH(REPLACE(text, ' and ', ''))) / 5
                   + (LENGTH(text) - LENGTH(REPLACE(text, ' of ', ''))) / 4 >= 1
                   THEN 'en' ELSE 'other' END AS pred_lang,
                   LENGTH(text) AS n_chars_m,
                   CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_words,
                   ROUND(CAST(LENGTH(text) AS DOUBLE) /
                         (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1), 4) AS avg_word_len,
                   ROUND(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')) AS DOUBLE)
                         / LENGTH(text), 4) AS digit_ratio
            FROM documents WHERE doc_id < 500
        """,
        "repetition_metrics": """
            WITH d AS (SELECT doc_id, text, LENGTH(text) AS tlen
                       FROM documents WHERE doc_id < 300),
            w AS (SELECT doc_id, tlen,
                    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws,
                    list_filter(string_split(text, ' '), x -> LENGTH(TRIM(x)) > 0) AS ls
                  FROM d),
            lc AS (SELECT doc_id, v, COUNT(*) AS cnt
                   FROM (SELECT doc_id, unnest(ls) AS v FROM w) GROUP BY 1, 2),
            dl AS (SELECT doc_id,
                     ROUND(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::DOUBLE
                           / SUM(cnt), 6) AS dup_line_frac,
                     ROUND(SUM(CASE WHEN cnt > 1 THEN cnt * LENGTH(v) ELSE 0 END)::DOUBLE
                           / SUM(cnt * LENGTH(v)), 6) AS dup_line_char_frac
                   FROM lc GROUP BY 1),
            g2 AS (SELECT doc_id, unnest([array_to_string(ws[i:i+1], ' ')
                                          FOR i IN RANGE(1, len(ws))]) AS g FROM w),
            t2 AS (SELECT doc_id, MAX(cnt * LENGTH(g)) AS topc
                   FROM (SELECT doc_id, g, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2)
                   GROUP BY 1),
            g3 AS (SELECT doc_id, unnest([array_to_string(ws[i:i+2], ' ')
                                          FOR i IN RANGE(1, len(ws) - 1)]) AS g FROM w),
            t3 AS (SELECT doc_id, MAX(cnt * LENGTH(g)) AS topc
                   FROM (SELECT doc_id, g, COUNT(*) AS cnt FROM g3 GROUP BY 1, 2)
                   GROUP BY 1),
            d5 AS (SELECT doc_id,
                     ROUND((len(gs) - len(list_distinct(gs)))::DOUBLE
                           / NULLIF(len(gs), 0), 6) AS dup_5gram_frac
                   FROM (SELECT doc_id, [array_to_string(ws[i:i+4], ' ')
                                         FOR i IN RANGE(1, len(ws) - 3)] AS gs FROM w))
            SELECT w.doc_id,
                   CAST(len(w.ws) AS INT) AS n_words,
                   CAST(len(w.ls) AS INT) AS n_lines,
                   dl.dup_line_frac, dl.dup_line_char_frac,
                   ROUND(COALESCE(t2.topc, 0)::DOUBLE / w.tlen, 6) AS top_2gram_char_frac,
                   ROUND(COALESCE(t3.topc, 0)::DOUBLE / w.tlen, 6) AS top_3gram_char_frac,
                   d5.dup_5gram_frac
            FROM w LEFT JOIN dl USING (doc_id) LEFT JOIN t2 USING (doc_id)
                   LEFT JOIN t3 USING (doc_id) LEFT JOIN d5 USING (doc_id)
        """,
        "quality_filter": """
            WITH d AS (SELECT doc_id, text, LENGTH(text) AS tlen
                       FROM documents WHERE doc_id < 300),
            w AS (SELECT doc_id, tlen,
                    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws,
                    list_filter(string_split(text, ' '), x -> LENGTH(TRIM(x)) > 0) AS ls
                  FROM d),
            lc AS (SELECT doc_id, v, COUNT(*) AS cnt
                   FROM (SELECT doc_id, unnest(ls) AS v FROM w) GROUP BY 1, 2),
            dl AS (SELECT doc_id,
                     ROUND(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::DOUBLE
                           / SUM(cnt), 6) AS dup_line_frac
                   FROM lc GROUP BY 1),
            g2 AS (SELECT doc_id, unnest([array_to_string(ws[i:i+1], ' ')
                                          FOR i IN RANGE(1, len(ws))]) AS g FROM w),
            t2 AS (SELECT doc_id, MAX(cnt * LENGTH(g)) AS topc
                   FROM (SELECT doc_id, g, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2)
                   GROUP BY 1),
            d2 AS (SELECT doc_id,
                     ROUND((len(gs) - len(list_distinct(gs)))::DOUBLE
                           / NULLIF(len(gs), 0), 6) AS dup2
                   FROM (SELECT doc_id, [array_to_string(ws[i:i+1], ' ')
                                         FOR i IN RANGE(1, len(ws))] AS gs FROM w)),
            m AS (SELECT w.doc_id, CAST(len(w.ws) AS INT) AS n_words,
                    dl.dup_line_frac,
                    ROUND(COALESCE(t2.topc, 0)::DOUBLE / w.tlen, 6) AS top2,
                    d2.dup2
                  FROM w LEFT JOIN dl USING (doc_id) LEFT JOIN t2 USING (doc_id)
                         LEFT JOIN d2 USING (doc_id)),
            r AS (SELECT doc_id, n_words,
                    list_sort(list_filter([
                      CASE WHEN n_words < 30 THEN 'min_words' END,
                      CASE WHEN n_words > 90 THEN 'max_words' END,
                      CASE WHEN dup_line_frac > CAST(0.80 AS DOUBLE) THEN 'dup_line_frac' END,
                      CASE WHEN top2 > CAST(0.09 AS DOUBLE) THEN 'top_2gram_char_frac' END,
                      CASE WHEN dup2 > CAST(0.04 AS DOUBLE) THEN 'dup_2gram_frac' END
                    ], x -> x IS NOT NULL)) AS rs
                  FROM m)
            SELECT doc_id, n_words,
                   COALESCE(array_to_string(rs, ','), '') AS reasons,
                   COALESCE(len(rs), 0) = 0 AS keep
            FROM r
        """,
        "strip_boilerplate": """
            WITH base AS (
              SELECT doc_id, LENGTH(text) AS tlen,
                     string_split(text, ' ') AS l,
                     len(string_split(text, ' ')) AS n_lines
              FROM documents WHERE doc_id < 400),
            pr AS (
              SELECT doc_id, tlen, n_lines, t['p'] AS p, t['w'] AS w
              FROM (SELECT doc_id, tlen, n_lines,
                           unnest([{'p': i, 'w': l[i]} FOR i IN RANGE(1, len(l) + 1)]) AS t
                    FROM base)),
            hot AS (
              SELECT TRIM(w) AS k FROM pr WHERE LENGTH(TRIM(w)) >= 1
              GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 310),
            kept AS (
              SELECT doc_id, p, w FROM pr
              WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.k = TRIM(pr.w))),
            re AS (
              SELECT doc_id, string_agg(w, ' ' ORDER BY p) AS text_clean,
                     COUNT(*) AS n_kept
              FROM kept GROUP BY 1)
            SELECT b.doc_id,
                   COALESCE(re.text_clean, '') AS text_clean,
                   CAST(b.n_lines AS INT) AS n_lines,
                   CAST(b.n_lines - COALESCE(re.n_kept, 0) AS BIGINT) AS n_lines_removed,
                   ROUND((b.tlen - LENGTH(COALESCE(re.text_clean, '')))::DOUBLE
                         / b.tlen, 6) AS removed_char_frac
            FROM (SELECT DISTINCT doc_id, tlen, n_lines FROM base) b
            LEFT JOIN re USING (doc_id)
        """,
        "join_left_notnull": """
            SELECT c_mktsegment, COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            WHERE c_name IS NOT NULL GROUP BY 1
        """,
        "multiway_join_revenue": """
            SELECT n_name,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   COUNT(*) AS n
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1
        """,
        "topk_global": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
        """,
        "window_topk_per_cust": """
            SELECT o_custkey, o_orderkey, rank FROM (
              SELECT o_custkey, o_orderkey,
                     CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank
              FROM orders) WHERE rank <= 3
        """,
        "collect_sorted_list": """
            SELECT o_custkey, STRING_AGG(CAST(o_orderkey AS VARCHAR), ','
                   ORDER BY o_orderkey) AS orderkeys
            FROM orders WHERE o_custkey < 50 GROUP BY 1
        """,
        "argmax_per_nation": """
            SELECT c_nationkey, c_custkey, c_acctbal FROM (
              SELECT c_nationkey, c_custkey, c_acctbal,
                     ROW_NUMBER() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
              FROM customer) WHERE rn = 1
        """,
        "explode_embeddings": """
            SELECT vec_id,
                   CAST(UNNEST(range(0, len(embedding))) AS INT) AS pos,
                   ROUND(CAST(UNNEST(embedding) AS DOUBLE), 5) AS val
            FROM embeddings WHERE vec_id < 200
        """,
        "events_hourly_rollup": """
            SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H') AS hour,
                   event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
            FROM events GROUP BY 1, 2
        """,
        "pip_join_counts": f"""
            SELECT gid, COUNT(*) AS n_points
            FROM ({pts_c}) p JOIN {_BOX_SQL}
              ON p.x >= b.xmin AND p.x <= b.xmax AND p.y >= b.ymin AND p.y <= b.ymax
            GROUP BY gid
        """,
        "pip_join_pairs": f"""
            SELECT pid, gid
            FROM ({pts_c}) p JOIN {_BOX_SQL}
              ON p.x >= b.xmin AND p.x <= b.xmax AND p.y >= b.ymin AND p.y <= b.ymax
            WHERE pid < 300
        """,
        "pip_join_skew": f"""
            SELECT gid, COUNT(*) AS n_points
            FROM (
              SELECT c_custkey AS pid,
                     {_SKEW_X % ('c_custkey', 'c_custkey', 'c_custkey')} AS x,
                     {_SKEW_Y % ('c_custkey', 'c_custkey', 'c_custkey')} AS y
              FROM customer
            ) p JOIN {_BOX_SQL}
              ON p.x >= b.xmin AND p.x <= b.xmax AND p.y >= b.ymin AND p.y <= b.ymax
            GROUP BY gid
        """,
        "knn_ring_expansion": f"""
            SELECT pid, bid, rank, ROUND(dist, 9) AS dist FROM (
              SELECT p.pid, s.bid,
                     SQRT((p.x - s.x) * (p.x - s.x) + (p.y - s.y) * (p.y - s.y)) AS dist,
                     CAST(ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY
                          SQRT((p.x - s.x) * (p.x - s.x) + (p.y - s.y) * (p.y - s.y)) ASC,
                          s.bid ASC) AS INT) AS rank
              FROM ({pts_c}) p CROSS JOIN ({pts_s}) s
              WHERE p.pid < 200)
            WHERE rank <= 3
        """,
        "radius_join": f"""
            SELECT pid, COUNT(*) AS n_within
            FROM ({pts_c}) p JOIN ({pts_s}) s
              ON SQRT((p.x - s.x) * (p.x - s.x) + (p.y - s.y) * (p.y - s.y)) <= 0.004
            WHERE p.pid < 400
            GROUP BY pid
        """,
        "dedup_exact_hash": """
            SELECT dups, COUNT(*) AS n_groups FROM (
              SELECT MD5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS dups
              FROM documents GROUP BY 1) GROUP BY 1
        """,
        "ann_cosine_topk": """
            SELECT vec_id, ROUND(
                     LIST_SUM(LIST_TRANSFORM(LIST_ZIP(e.embedding, q.qv),
                              x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                     / (SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * SQRT(LIST_SUM(LIST_TRANSFORM(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                   6) AS cos_sim
            FROM embeddings e CROSS JOIN
                 (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
            WHERE vec_id != 0
            ORDER BY cos_sim DESC, vec_id ASC LIMIT 25
        """,
        "embedding_norms": """
            SELECT vec_id, label,
                   ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
            FROM embeddings WHERE vec_id < 300
        """,
        # the three tile invariants unioned under (check, key, value) —
        # each sub-oracle is the unchanged r4/r5 closed-form replay
        "tile_raster_checks": f"""
            SELECT 'block_tiles' AS "check", block_id AS key,
                   CAST(n_tiles AS DOUBLE) AS value
            FROM ({_TILE_BLOCK_ORACLE})
            UNION ALL
            SELECT 'region_tiles' AS "check", gadm AS key,
                   CAST(n_tiles AS DOUBLE) AS value
            FROM ({_TILE_REGION_ORACLE})
            UNION ALL
            SELECT 'coverage' AS "check", image_id || '|' || block_id AS key,
                   CAST(coverage AS DOUBLE) AS value
            FROM ({_TILE_COVERAGE_ORACLE})
            ORDER BY 1, 2
        """,
        # fingerprint stats + planted near-pairs unioned under a label
        "winnow_checks": f"""
            SELECT 'fp' AS "check", doc_id AS k1, n_fp AS k2,
                   min_fp AS v1, max_fp AS v2
            FROM ({_WINNOW_FP_ORACLE})
            UNION ALL
            SELECT 'pair' AS "check", id_a AS k1, id_b AS k2,
                   shared AS v1, CAST(0 AS BIGINT) AS v2
            FROM ({_WINNOW_PAIRS_ORACLE})
            ORDER BY 1, 2, 3
        """,
        "minhash_lsh_neardup": _MINHASH_LSH_ORACLE_TMPL.format(SIG=_minhash_sig_sql()),
        "dedup_against_corpus": _DEDUP_AGAINST_ORACLE_TMPL.format(SIG=_minhash_sig_sql()),
        "dedup_cluster_components": _DEDUP_CLUSTER_ORACLE_TMPL.format(SIG=_minhash_sig_sql()),
        # uniform-token closed form: FFD == consecutive groups of 9 per
        # scramble bucket in id order (heterogeneous case: local-FFD test)
        "pack_sequences_uniform": """
            SELECT (bucket * 4294967296 + pack_local) AS pack_id,
                   STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids,
                   CAST(COUNT(*) AS INT) AS n_docs,
                   CAST(COUNT(*) * 100 AS BIGINT) AS total_tokens,
                   FALSE AS overflow
            FROM (
              SELECT doc_id, bucket,
                     (ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1) // 9
                       AS pack_local
              FROM (
                SELECT doc_id,
                       ((doc_id % 2147483647) * 507000385) % 2147483647 % 8 AS bucket
                FROM documents WHERE doc_id < 450
              )
            )
            GROUP BY bucket, pack_local
            ORDER BY pack_id
        """,
        # the MINSTD scramble replicated verbatim: selection is a pure
        # function of (doc_id, seed), independent of partitioning
        "data_mix_sample": """
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY ((doc_id % 2147483647) * 1401229422) % 2147483647,
                                doc_id) AS rn
              FROM documents WHERE lang IN ('en', 'fr', 'zh')
            )
            WHERE rn <= CASE lang WHEN 'en' THEN 60 WHEN 'fr' THEN 20 ELSE 15 END
            ORDER BY doc_id
        """,
        "simhash_neardup": _SIMHASH_ORACLE,
        # 4×4 world closed form: 14 square-cell blocks (6 ring buildings →
        # 6 parcels, area CELL²=1e-4 deg² → 100.0e-6) + 2 diagonal cells
        # (cell_idx%7==3 → cells (0,3) and (2,2)) each split into two
        # triangles; the 45° diagonal through the ring center splits the 6
        # buildings 3/3 (ring angles 15°..315°, min |sin(θ-45°)|=0.5 →
        # margin 0.11·CELL, 4× the multipart-centroid shift). Block ids
        # replay polygonize's (cj, ci)-ordered face enumeration per
        # quadrant, diagonal cells claiming two consecutive ids (same
        # replay as tile_block_coverage).
        "geo_parcels": """
            WITH cells AS (
              SELECT a.i AS ci, b.j AS cj,
                     CAST(a.i // 2 AS INT) AS gi, CAST(b.j // 2 AS INT) AS gj,
                     CASE WHEN (a.i * 4 + b.j) % 7 = 3 THEN 2 ELSE 1 END AS nb
              FROM generate_series(0, 3) a(i), generate_series(0, 3) b(j)
            ), numbered AS (
              SELECT *, COALESCE(SUM(nb) OVER (PARTITION BY gi, gj ORDER BY cj, ci
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
              FROM cells
            )
            SELECT 'TST.' || CAST(gi + 1 AS VARCHAR) || '.' || CAST(gj + 1 AS VARCHAR)
                     || '_1_' || CAST(base + s.k AS VARCHAR) AS block_id,
                   CAST(CASE WHEN nb = 2 THEN 3 ELSE 6 END AS BIGINT) AS n_parcels,
                   CAST(CASE WHEN nb = 2 THEN 50.0 ELSE 100.0 END AS DOUBLE) AS area_e6
            FROM numbered, generate_series(0, 1) s(k)
            WHERE s.k < nb
        """,
        # both tessellation cases are closed-form (see the _q_geo_parcels_*
        # docstrings), so the composite oracle is a constant table
        "geo_parcels_cases": """
            SELECT case_id, CAST(n_parcels AS BIGINT) AS n_parcels,
                   CAST(total_area AS DOUBLE) AS total_area, a_flag, b_flag
            FROM (VALUES
                ('orphan_u',      2,  7.0, false, true),
                ('offset_raw',    2, 48.0, true,  false),
                ('offset_offset', 2, 48.0, false, true)
            ) AS t(case_id, n_parcels, total_area, a_flag, b_flag)
        """,
        "iceberg_snapshots": """
            SELECT 0 AS snapshot, COUNT(*) AS n_docs,
                   CAST(SUM(length(text)) AS BIGINT) AS sum_len,
                   MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
            FROM documents WHERE doc_id < 200
            UNION ALL
            SELECT 1, COUNT(*), CAST(SUM(length(text)) AS BIGINT),
                   MIN(doc_id), MAX(doc_id)
            FROM documents WHERE doc_id < 400
        """,
        # closed form of the ingest→dedup→delete loop: snapshot 0 holds the
        # originals + planted re-crawls, the delete snapshot keeps only the
        # min-doc_id winner per body (the same verdict the engine computes)
        "iceberg_delete_dedup": """
            WITH base AS (
              SELECT doc_id, CAST(length(text) AS INT) AS text_len, text AS body
              FROM documents WHERE doc_id < 100
            ), f AS (
              SELECT doc_id, text_len, body FROM base
              UNION ALL
              SELECT doc_id + 100000, text_len, body FROM base
            ), keep AS (
              SELECT doc_id, text_len,
                     doc_id = MIN(doc_id) OVER (PARTITION BY body) AS winner
              FROM f
            )
            SELECT 0 AS snapshot, COUNT(*) AS n_docs,
                   CAST(SUM(text_len) AS BIGINT) AS sum_len,
                   MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
            FROM keep
            UNION ALL
            SELECT 1, COUNT(*), CAST(SUM(text_len) AS BIGINT),
                   MIN(doc_id), MAX(doc_id)
            FROM keep WHERE winner
            ORDER BY snapshot
        """,
        # exact k-shingle Jaccard computed from raw character shingles —
        # must match the engine's hashed-shingle-set Jaccard exactly
        "minhash_jaccard_exact": """
            WITH d AS (
              SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS s
              FROM documents WHERE doc_id < 40
            ), sh AS (
              SELECT doc_id,
                     list_distinct([substring(s, i, 5) for i in range(1, length(s) - 3)]) AS sg
              FROM d WHERE length(s) >= 5
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   ROUND(CAST(length(list_intersect(a.sg, b.sg)) AS DOUBLE)
                         / GREATEST(length(a.sg) + length(b.sg)
                                    - length(list_intersect(a.sg, b.sg)), 1), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        """,
        # 6×6 world blocks, per-quadrant closed form: 9 squares + 2 triangles
        # per diagonal cell ((ci·6+cj)%7==3); blocks tile the quadrant so the
        # area sum is (3·0.01°)² = 9e-4 regardless of the splits
        "geo_blocks_pipeline": """
            WITH cells AS (
              SELECT a.i AS ci, b.j AS cj,
                     CAST(a.i // 3 AS INT) AS gi, CAST(b.j // 3 AS INT) AS gj,
                     CASE WHEN (a.i * 6 + b.j) % 7 = 3 THEN 2 ELSE 1 END AS nb
              FROM generate_series(0, 5) a(i), generate_series(0, 5) b(j)
            )
            SELECT 'TST.' || CAST(gi + 1 AS VARCHAR) || '.' || CAST(gj + 1 AS VARCHAR)
                     || '_1' AS gadm,
                   CAST(SUM(nb) AS BIGINT) AS n_blocks,
                   CAST(900.0 AS DOUBLE) AS area_e6
            FROM cells GROUP BY 1
        """,
        # U-block orphan reunion: every fact is closed-form (see
        # _q_geo_parcels_orphans docstring), so the oracle is a constant row
        # the reference's own golden Steiner answers, verbatim
        # (/root/reference/tests/test_reblock.py:88-129), as canonical
        # lex-sorted segments
        "geo_reblock_steiner": """
            SELECT case_id, road_type,
                   CAST(xa AS DOUBLE) AS xa, CAST(ya AS DOUBLE) AS ya,
                   CAST(xb AS DOUBLE) AS xb, CAST(yb AS DOUBLE) AS yb
            FROM (VALUES
                ('g2','new', 0.0,0.2, 0.0,1.0),
                ('g2','new', 0.0,1.0, 1.0,2.0),
                ('g2','new', 1.0,2.0, 2.0,2.0),
                ('g3','new', 0.0,0.2, 0.0,1.0),
                ('g3','new', 0.0,1.0, 1.0,1.0),
                ('g3','new', 1.0,1.0, 1.8,1.0),
                ('g3','new', 1.8,1.0, 2.0,1.0),
                ('g3','new', 2.0,1.0, 2.0,2.0),
                ('g4','new', 0.0,0.2, 0.0,1.0),
                ('g4','new', 0.0,1.0, 0.9,1.9),
                ('g4','new', 0.9,1.9, 1.0,2.0),
                ('g4','new', 1.0,2.0, 2.0,2.0),
                ('g4','new', 1.8,1.0, 2.0,1.0),
                ('g4','new', 2.0,1.0, 2.0,2.0)
            ) AS t(case_id, road_type, xa, ya, xb, yb)
            ORDER BY case_id, xa, ya, xb, yb
        """,
        # closed forms proven in docstrings + unit tests: 64 jpeg / 192 png
        # fixture images, decode∘encode pixel-stable for both codecs
        "images_roundtrip_psnr": """
            SELECT fmt, CAST(n AS BIGINT) AS n, min_psnr_ge_40db
            FROM (VALUES ('jpeg', 64, true), ('png', 192, true))
                 AS t(fmt, n, min_psnr_ge_40db)
            ORDER BY fmt
        """,
        # 256 distinct phashes + phash-preserving re-encode ⇒ exactly 128
        # singleton / 128 pair buckets, and all 128 re-crawl copies share
        # their original's phash (both invariants closed-form)
        "phash_checks": """
            SELECT "check", CAST(k AS BIGINT) AS k, CAST(v AS BIGINT) AS v
            FROM (SELECT 'copies_hist' AS "check", 1 AS k, 128 AS v
                  UNION ALL SELECT 'copies_hist', 2, 128
                  UNION ALL SELECT 'pair_match', 128, 128
                  UNION ALL
                  SELECT 'near_pair', i, i + 1000000 FROM range(200) t(i))
            ORDER BY 1, 2
        """,
        # planted-twin closed forms (derivations in the query docstrings):
        # each of the 50 queries' rank-1 hit must be its ×1.01 scale twin
        # at cosine exactly 1.0 — same-signature bucketing (LSH) / probed
        # coarse list (IVF) guarantees the twin is a candidate, and no
        # other corpus vector ties cos 1.0 (the base vector is excluded as
        # self). rank is 1 by construction of the returned slice.
        "ann_lsh_topk": """
            SELECT vec_id AS qid, vec_id + 1000000 AS vec_id,
                   CAST(1.0 AS DOUBLE) AS cos_sim, CAST(1 AS INTEGER) AS rank
            FROM embeddings WHERE vec_id < 50 ORDER BY qid
        """,
        "ann_ivf_topk": """
            SELECT vec_id AS qid, vec_id + 1000000 AS vec_id,
                   CAST(1.0 AS DOUBLE) AS cos_sim, CAST(1 AS INTEGER) AS rank
            FROM embeddings WHERE vec_id < 50 ORDER BY qid
        """,
        # every 4th base vector (125 of vec_id<500) has a ×1.001 perturbed
        # clone planted: identical hyperplane signs in every table → always
        # a candidate pair, cosine 1.0 to 4dp; no unplanted pair reaches
        # cos ≥ 0.98 on the synthetic embeddings (verified — the result IS
        # the planted set).
        "embedding_lsh_neardup": """
            SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
                   CAST(1.0 AS DOUBLE) AS cos_sim
            FROM embeddings WHERE vec_id < 500 AND vec_id % 4 = 0
            ORDER BY id_a
        """,
        # geo_reblock_full replay oracle (VERDICT r3 #4) — every fact
        # derivable from the fixture: B1 = box(0,0,10,10), buildings =
        # 5×5 grid of 0.6-boxes at odd integer centers; with
        # drop_connected=True the 16 perimeter buildings' parcels touch
        # the block-boundary street and are dropped, leaving the interior
        # 3×3 ⇒ bldg_count 9. The uniform tessellation's parcel edges lie
        # on even-integer grid lines, so every road length is an integer:
        # existing = 12.0 (the K18-simplified boundary corridor retained),
        # new = 17.0 (Steiner tree over the interior parcel grid linking
        # the 9 interior parcels to the outside node). num_block_coords =
        # 4 box corners, all snap-matched (unmatched 0).
        "geo_reblock_full": """
            SELECT block_id, road_type, CAST(road_len AS DOUBLE) AS road_len,
                   CAST(bldg_count AS BIGINT) AS bldg_count,
                   CAST(nbc AS BIGINT) AS num_block_coords,
                   CAST(nbcu AS BIGINT) AS num_block_coords_unmatched
            FROM (VALUES
                ('B1', 'existing', 12.0, 9, 4, 0),
                ('B1', 'new',      17.0, 9, 4, 0)
            ) AS t(block_id, road_type, road_len, bldg_count, nbc, nbcu)
            ORDER BY road_type
        """,
        # geo_reblock_world replay oracle (VERDICT r3 #4) — deterministic
        # 4×4 geo_world fixture. Derivable structure: 18 blocks (16 grid +
        # 2 diagonal splits per split cell), diagonal half-blocks carry 3
        # buildings, full blocks 6; every Steiner graph is connected
        # (num_graph_comps 1); 'existing' rows appear exactly for the
        # blocks whose fixture layout reweights an interior road
        # (reweight_existing path). The 6dp lengths are replay-frozen
        # constants — verified bit-stable across local[2/8/32] (the kernel
        # is deterministic float math; no reduction-order dependence) —
        # pinning the Steiner/corridor geometry against regression.
        "geo_reblock_world": """
            SELECT block_id, road_type, CAST(len_e3 AS DOUBLE) AS len_e3,
                   CAST(bldg_count AS BIGINT) AS bldg_count,
                   CAST(ngc AS BIGINT) AS num_graph_comps
            FROM (VALUES
                ('TST.1.1_1_0', 'new',      15.898865, 6, 1),
                ('TST.1.1_1_1', 'new',      15.404623, 6, 1),
                ('TST.1.1_1_2', 'new',      16.027150, 6, 1),
                ('TST.1.1_1_3', 'new',      15.898492, 6, 1),
                ('TST.1.2_1_0', 'new',      15.104152, 6, 1),
                ('TST.1.2_1_1', 'new',      16.110274, 6, 1),
                ('TST.1.2_1_2', 'existing',  2.529270, 3, 1),
                ('TST.1.2_1_2', 'new',       5.997230, 3, 1),
                ('TST.1.2_1_3', 'new',       5.944600, 3, 1),
                ('TST.1.2_1_4', 'existing', 21.098401, 6, 1),
                ('TST.1.2_1_4', 'new',      12.674803, 6, 1),
                ('TST.2.1_1_0', 'new',      15.274303, 6, 1),
                ('TST.2.1_1_1', 'new',      16.450436, 6, 1),
                ('TST.2.1_1_2', 'new',      15.899033, 6, 1),
                ('TST.2.1_1_3', 'new',      15.898847, 6, 1),
                ('TST.2.2_1_0', 'new',       6.024179, 3, 1),
                ('TST.2.2_1_1', 'new',       5.944413, 3, 1),
                ('TST.2.2_1_2', 'existing', 20.827648, 6, 1),
                ('TST.2.2_1_2', 'new',      12.306693, 6, 1),
                ('TST.2.2_1_3', 'new',      15.899052, 6, 1),
                ('TST.2.2_1_4', 'existing', 22.087030, 6, 1),
                ('TST.2.2_1_4', 'new',      11.553524, 6, 1)
            ) AS t(block_id, road_type, len_e3, bldg_count, ngc)
            ORDER BY block_id, road_type
        """,
        # 6×6-world replay oracle (derivations in _q_geo_complexity's
        # docstring): closed-form block enumeration (the geo_parcels rule
        # at 6×6: diagonal cells where (ci*6+cj)%7==3 contribute two
        # 3-building triangle blocks, others one 6-building block), k = 2
        # everywhere except the one near-collinear triangle (chain dual).
        # Deep kernel parity is separately gated by the DJI golden replay
        # (tests/test_dji_replay.py, ≥155/196 exact).
        # A5 closed form (derived in _q_geo_union_area's docstring):
        # 40-box 50%-overlap chain → rectangle area 20.5 + disjoint unit
        # box → 2 parts, total area 21.5
        "geo_union_area": """
            SELECT CAST(2 AS INT) AS n_parts, CAST(21.5 AS DOUBLE) AS area
        """,
        "geo_k_complexity": """
            WITH cells AS (
              SELECT a.i AS ci, b.j AS cj,
                     CAST(a.i // 3 AS INT) AS gi, CAST(b.j // 3 AS INT) AS gj,
                     CASE WHEN (a.i * 6 + b.j) % 7 = 3 THEN 2 ELSE 1 END AS nb
              FROM generate_series(0, 5) a(i), generate_series(0, 5) b(j)
            ), numbered AS (
              SELECT *, COALESCE(SUM(nb) OVER (PARTITION BY gi, gj ORDER BY cj, ci
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
              FROM cells
            ), blocks AS (
              SELECT 'TST.' || CAST(gi + 1 AS VARCHAR) || '.' || CAST(gj + 1 AS VARCHAR)
                       || '_1_' || CAST(base + s.k AS VARCHAR) AS block_id,
                     nb
              FROM numbered, generate_series(0, 1) s(k)
              WHERE s.k < nb
            )
            SELECT block_id,
                   CAST(CASE WHEN block_id = 'TST.1.2_1_11' THEN 1 ELSE 2 END AS INT)
                     AS complexity,
                   CAST(CASE WHEN nb = 2 THEN 3 ELSE 6 END AS BIGINT) AS n_bldgs
            FROM blocks ORDER BY block_id
        """,
    }
