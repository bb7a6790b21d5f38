"""Round-8 optimization harness (guide §1: measure first; NOT the frozen
driver bench — bench.py is untouched).

Modes:
  python bench_extra.py queries [name ...]   — per-query steady-state times
      (min of N reps, noop-sink semantics via .count() exactly as bench.py
      times them) plus per-stage breakdown off the status REST API.
  python bench_extra.py pipeline             — one fused-pipeline pass at
      local[32] with per-stage executorRunTime / task counts, so the probe
      prep (st_cells / st_centroid_xy_cell) vs kernel split is visible.
  python bench_extra.py plans [name ...]     — dump .explain('formatted')
      for the named queries to plans/r08/<name>_<tag>.txt (tag from
      $PLAN_TAG, default 'now').

Uses the same $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS contract as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BX_REPS", "3"))


def get_session(ui: bool = True):
    from prclz_spark.session import get_spark

    extra = {"spark.ui.enabled": "true", "spark.ui.port": "4047"} if ui else None
    spark = get_spark(f"local[{CPUS}]", app="bench-extra", shuffle_partitions=CPUS,
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    # identical warm-up contract to bench.py: JIT + pre-fork workers
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        import networkx  # noqa: F401

        import prclz_spark.cells  # noqa: F401
        import prclz_spark.geom  # noqa: F401
        import prclz_spark.kernels.planar  # noqa: F401

        return s

    spark.range(0, 1 << 14, 1, CPUS).select(_warm("id")).count()
    return spark


def _rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}{path}") as r:
        return json.load(r)


def stage_report(spark, prev_stage: int):
    stages = [s for s in _rest(spark, "/stages?status=COMPLETE") if s["stageId"] > prev_stage]
    out = []
    for s in sorted(stages, key=lambda s: s["stageId"]):
        out.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": s["numCompleteTasks"],
                "runtime_ms": s.get("executorRunTime", 0),
                "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
                "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 2),
            }
        )
    return out


def max_stage(spark):
    return max((s["stageId"] for s in _rest(spark, "/stages")), default=-1)


# bench-local query bodies (identical to bench.py's frozen copies)
def _x_strip_boilerplate(s, d):
    from prclz_spark.operators.textq import strip_boilerplate_lines
    docs = s.read.parquet(f"{d}/documents.parquet")
    return strip_boilerplate_lines(docs, "doc_id", "text", min_df=20)


def _x_ivf_pq(s, d):
    from pyspark.sql import functions as F
    from prclz_spark.operators.ann import ivf_pq_topk
    e = s.read.parquet(f"{d}/embeddings.parquet").select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < 64).withColumnRenamed("vec_id", "qid")
    return ivf_pq_topk(q, e, "qid", "vec_id", "embedding", dim=64,
                       k=10, n_lists=16, n_probe=4, m=8, refine_k=100)


def _x_mix_tokens(s, d):
    from pyspark.sql import functions as F
    from prclz_spark.operators.mix import mix_strata_tokens
    docs = s.read.parquet(f"{d}/documents.parquet").select(
        "doc_id", "lang",
        F.size(F.split("text", r"\s+")).alias("n_tok"),
    )
    return mix_strata_tokens(
        docs, "lang", {"en": 200_000, "fr": 80_000}, "doc_id", "n_tok"
    )


def _x_token_stats(s, d):
    from pyspark.sql import functions as F
    docs = s.read.parquet(f"{d}/documents.parquet")
    toks = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + F.lit(1)
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(toks.cast("long")).alias("total_tokens"),
        F.round(F.avg(toks), 4).alias("avg_tokens"),
    )


def _x_ngram_distinct(s, d):
    from pyspark.sql import functions as F
    docs = s.read.parquet(f"{d}/documents.parquet").filter(F.col("doc_id") < 300)
    shingles = F.expr(
        "transform(sequence(1, greatest(length(text) - 4, 0)), i -> substring(text, i, 5))"
    )
    return docs.select(
        "doc_id",
        F.size(F.array_distinct(shingles)).alias("n_distinct_5grams"),
        F.size(shingles).alias("n_5grams"),
    )


EXTRA = {
    "strip_boilerplate": _x_strip_boilerplate,
    "ivf_pq_topk_x": _x_ivf_pq,
    "mix_tokens_sample": _x_mix_tokens,
    "token_stats": _x_token_stats,
    "ngram_distinct": _x_ngram_distinct,
}


def run_queries(names):
    import __spark_entry__ as E

    spark = get_session()
    qs = E.queries()
    qs.update({k: v for k, v in EXTRA.items()})
    names = names or [
        "q1_pricing_summary", "multiway_join_revenue", "window_topk_per_cust",
        "events_hourly_rollup", "pip_join_counts", "knn_ring_expansion",
        "radius_join", "dedup_exact_hash", "ann_cosine_topk",
        "minhash_lsh_neardup", "ann_lsh_topk", "pip_join_skew",
        "data_mix_sample", "pack_sequences_uniform", "token_stats",
        "ngram_distinct", "strip_boilerplate", "ivf_pq_topk_x",
        "mix_tokens_sample",
    ]
    results = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bx:{name}")
        reps = []
        prev = max_stage(spark)
        for i in range(REPS):
            if i == REPS - 1:
                prev = max_stage(spark)  # stage report covers the LAST rep
            t0 = time.time()
            fn(spark, SF_DIR).count()
            reps.append(round(time.time() - t0, 3))
        rep = stage_report(spark, prev)
        results[name] = {"min": min(reps), "reps": reps, "stages": rep}
        tot_cpu = sum(s["cpu_ms"] for s in rep)
        print(f"== {name}: min={min(reps)} reps={reps} last_rep_cpu_ms={tot_cpu} "
              f"stages={len(rep)}")
        for s in rep:
            print(f"   {s}")
        sys.stdout.flush()
    print(json.dumps({k: v["min"] for k, v in results.items()}))
    spark.stop()
    return results


def run_pipeline():
    from prclz_spark import cells as C
    from prclz_spark import fixtures as FX
    from prclz_spark.operators.fused import fused_blocks_k

    GEO_NX = int(os.environ.get("BENCH_GEO_NX", "80"))
    GEO_GX = int(os.environ.get("BENCH_GEO_GX", "16"))
    PER_CELL = int(os.environ.get("BENCH_GEO_PER_CELL", "24"))
    spark = get_session()
    lines, gadm, bldgs = FX.geo_world(
        spark, GEO_NX, GEO_NX, per_cell=PER_CELL, gx=GEO_GX, gy=GEO_GX
    )
    lines = lines.persist(); gadm = gadm.persist(); bldgs = bldgs.persist()
    bldgs.count(); lines.count(); gadm.count()
    res = C.choose_resolution(*FX.grid_params(GEO_NX, GEO_NX), n_features=GEO_NX * GEO_NX * 4)
    # warm pass (plan JIT) then a measured pass, like bench reps=2 min
    for tag in ("warm", "measured"):
        prev = max_stage(spark)
        t0 = time.time()
        n = fused_blocks_k(lines, gadm, bldgs, res).count()
        w = time.time() - t0
        print(f"== pipeline {tag}: {w:.2f}s blocks={n}")
        for s in stage_report(spark, prev):
            print(f"   {s}")
    sys.stdout.flush()
    spark.stop()


def dump_plans(names, tag):
    import __spark_entry__ as E

    spark = get_session(ui=False)
    qs = E.queries()
    qs.update(EXTRA)
    os.makedirs("plans/r08", exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(f"plans/r08/{name}_{tag}.txt", "w") as f:
            f.write(p)
        print(f"wrote plans/r08/{name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        run_queries(sys.argv[2:])
    elif mode == "pipeline":
        run_pipeline()
    elif mode == "plans":
        dump_plans(sys.argv[2:], os.environ.get("PLAN_TAG", "now"))
    else:
        raise SystemExit(f"unknown mode {mode}")
