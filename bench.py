"""Benchmark harness (driver contract + BASELINE.md scaling protocol).

Runs the headline workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1):

* the end-to-end prclz pipeline — street-block extraction → building PIP
  assignment → k-complexity — on the deterministic synthetic geo world
  (BASELINE.json metric: "blocks+parcels processed/sec, end-to-end block
  extraction → k-index"), and
* the headline relational/spatial queries from __spark_entry__.

Two-cluster-size scaling evidence (north_rule: throughput efficiency ≥0.8
from N to 4N executors), measured honestly on a single 32-core VM:

* the SAME pipeline on the SAME input at local[2] vs local[8] (N vs 4N) —
  the primary `scaling_efficiency` — and at local[8] vs local[32];
* a HARDWARE CONTROL: the identical per-region kernel load run through a
  bare multiprocessing.Pool (no Spark at all) at the same core counts.
  This VM's per-core throughput drops as cores activate (memory bandwidth /
  turbo: the control itself scales at only ~0.66 from 8→32 and ~0.89 from
  2→8), so the control separates what the MACHINE loses from what the
  ENGINE loses: engine_efficiency = spark_efficiency / control_efficiency.
  A real 4N-executor cluster multiplies memory bandwidth with the nodes —
  the 8→32 wall-clock pair understates the engine.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "pipeline": {"blocks": n, "buildings": n,
                "local2"/"local8"/"local32": {"sec":…, "items_per_sec":…},
                "scaling_efficiency": eff(2→8),
                "scaling_efficiency_8to32": …,
                "hw_control": {...}, "engine_efficiency": …}}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GEO_NX = int(os.environ.get("BENCH_GEO_NX", "80"))
GEO_GX = int(os.environ.get("BENCH_GEO_GX", "16"))
PER_CELL = int(os.environ.get("BENCH_GEO_PER_CELL", "24"))
MP_TASKS = int(os.environ.get("BENCH_MP_TASKS", "64"))


def run_pipeline(spark, lines, gadm, bldgs, res) -> dict:
    """blocks → k-index end to end on materialized inputs, via the fused
    single-pass region operator (operators/fused.py — proven equivalent to
    the staged blocks→complexity path in tests/test_fused.py)."""
    from prclz_spark.operators.fused import fused_blocks_k

    n_blocks = fused_blocks_k(lines, gadm, bldgs, res).count()
    return {"blocks": n_blocks}


def _proc_tree_cpu() -> float:
    """Total CPU seconds (utime+stime, incl. reaped children) of this
    process and every live descendant — the driver JVM and its Python/Arrow
    workers. CPU time is what co-tenant load can NOT inflate (it steals our
    wall-clock, not our cycles), so the CPU-based scaling ratio survives
    busy phases that wreck the wall-clock ratio (VERDICT r2 item #10)."""
    clk = os.sysconf("SC_CLK_TCK")
    info: dict[int, tuple[int, int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # utime+stime of the process + cutime+cstime of reaped children
            ticks = int(parts[11]) + int(parts[12]) + int(parts[13]) + int(parts[14])
            info[int(d)] = (int(parts[1]), ticks)
        except OSError:
            continue
    children: dict[int, list[int]] = {}
    for p, (pp, _) in info.items():
        children.setdefault(pp, []).append(p)
    total, stack = 0, [os.getpid()]
    while stack:
        p = stack.pop()
        if p in info:
            total += info[p][1]
        stack.extend(children.get(p, []))
    return total / clk


def timed_pipeline(master: str, shuffle_partitions: int, reps: int = 2) -> dict:
    from prclz_spark import cells as C
    from prclz_spark import fixtures as FX
    from prclz_spark.session import get_spark

    spark = get_spark(master, app=f"bench-{master}", shuffle_partitions=shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        # Warm-up: JVM JIT + PRE-FORK the Python/Arrow worker pool (the
        # first pandas_udf stage otherwise pays a fork storm) — every
        # parallelism level gets the same treatment.
        spark.range(10_000_000).selectExpr("sum(id)").collect()
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _warm(s):
            # pre-import the kernel stack: python workers persist across
            # stages, so module import cost is paid here, not in the
            # measured stages
            import networkx  # noqa: F401

            import prclz_spark.kernels.planar  # noqa: F401
            import prclz_spark.kernels.reblock  # noqa: F401

            return s

        spark.range(0, 1 << 14, 1, shuffle_partitions).select(_warm("id")).count()

        # Input synthesis is NOT part of the measured pipeline (the
        # reference reads files; BASELINE.json's metric is "end-to-end
        # block extraction → k-index"): materialize inputs first.
        lines, gadm, bldgs = FX.geo_world(
            spark, GEO_NX, GEO_NX, per_cell=PER_CELL, gx=GEO_GX, gy=GEO_GX
        )
        lines = lines.persist()
        gadm = gadm.persist()
        bldgs = bldgs.persist()
        n_bldgs = bldgs.count()
        lines.count()
        gadm.count()
        res = C.choose_resolution(*FX.grid_params(GEO_NX, GEO_NX), n_features=GEO_NX * GEO_NX * 4)

        # best-of-N: this VM's wall-clock noise is ±20-35% (co-tenant/turbo
        # effects, measured even for pure multiprocessing off Spark), so the
        # min is the only stable estimator of steady-state throughput
        wall, cpu = float("inf"), float("inf")
        for _ in range(reps):
            c0 = _proc_tree_cpu()
            t0 = time.time()
            counts = run_pipeline(spark, lines, gadm, bldgs, res)
            w = time.time() - t0
            c = _proc_tree_cpu() - c0
            if w < wall:
                wall, cpu = w, c
        counts["buildings"] = n_bldgs
    finally:
        spark.stop()
    items = counts["blocks"] + counts["buildings"]
    return {
        **counts,
        "sec": round(wall, 2),
        "cpu_sec": round(cpu, 2),
        "items_per_sec": round(items / wall, 1),
    }


# --- hardware control: the same kernel load, bare multiprocessing ---------

def skew_evidence(cpus: int) -> dict:
    """Task-time evidence for hot-cell salting (VERDICT r4 #6): a 2M-probe
    workload with 70% of probes in ONE cover cell runs the non-broadcast
    cell join three ways — naive (no salting, AQE skew-join off), stock
    Spark (AQE skew-join split), and the engine's explicit histogram+salt
    path — and records per-task executorRunTime median/max off the status
    REST API (fresh UI-enabled session; the UI is normally off). AQE's
    splitter only fixes sort-merge joins; the explicit salt is what also
    protects grouped-kernel stages, so all three are reported."""
    import urllib.request

    from pyspark.sql import functions as F

    from prclz_spark import geom as G
    from prclz_spark.operators.sjoin import pip_join
    from prclz_spark.session import get_spark

    spark = get_spark(
        f"local[{cpus}]", app="bench-skew", shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.enabled": "true", "spark.ui.port": "4049",
            # emulate the build-too-big-to-broadcast regime the salted path
            # exists for: with a broadcastable build side there is no
            # cell-keyed shuffle and hence no skew to defuse
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    n = int(os.environ.get("BENCH_SKEW_N", "2000000"))
    pts = spark.range(0, n, 1, cpus).selectExpr(
        "id as pid",
        "CASE WHEN id % 10 < 7 THEN CAST(10.001 AS DOUBLE)"
        " + CAST((id*37) % 97 AS DOUBLE)/100000"
        " ELSE CAST(10.0 AS DOUBLE) + CAST((id*37) % 600 AS DOUBLE)/10000 END as x",
        "CASE WHEN id % 10 < 7 THEN CAST(10.001 AS DOUBLE)"
        " + CAST((id*73) % 97 AS DOUBLE)/100000"
        " ELSE CAST(10.0 AS DOUBLE) + CAST((id*73) % 600 AS DOUBLE)/10000 END as y",
    ).localCheckpoint()  # freeze the input so every variant joins the same rows
    boxes = spark.createDataFrame(
        [(g, G.wkb_dumps(G.box(10.0 + 0.03 * (g % 2), 10.0 + 0.03 * (g // 2),
                               10.03 + 0.03 * (g % 2), 10.03 + 0.03 * (g // 2))))
         for g in range(4)],
        "gid long, geometry binary",
    )
    base = sc.uiWebUrl
    app_id = sc.applicationId

    def _get(path):
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    def run(salt: int, aqe_skew: bool) -> dict:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
        prev = max((s["stageId"] for s in _get("/stages")), default=-1)
        t0 = time.time()
        cnt = pip_join(
            pts, boxes, "pid", "gid", res=14, how="inner",
            broadcast_build=False, salt=salt, hot_threshold=100_000,
        ).count()
        sec = round(time.time() - t0, 2)
        stages = [s for s in _get("/stages?status=COMPLETE") if s["stageId"] > prev]
        # the skewed work lives in the JOIN stage (the one reading the
        # shuffled candidate pairs) — not the uniform probe-side UDF stage,
        # whose total run time can be larger
        reading = [s for s in stages if s.get("shuffleReadBytes", 0) > 0] or stages
        heavy = max(reading, key=lambda s: s.get("executorRunTime", 0))
        q = _get(
            f"/stages/{heavy['stageId']}/{heavy['attemptId']}/taskSummary"
            "?quantiles=0.5,1.0"
        )
        med_ms, max_ms = q["executorRunTime"]
        return {
            "sec": sec, "rows": cnt, "n_tasks": heavy["numCompleteTasks"],
            "median_task_ms": round(med_ms), "max_task_ms": round(max_ms),
        }

    out = {
        "n_probes": n, "hot_frac": 0.7,
        "unsalted_no_aqe": run(0, False),
        "unsalted_aqe": run(0, True),
        "salted": run(8, True),
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.stop()
    return out


def mix_skew_evidence(cpus: int) -> dict:
    """Task-time evidence for the round-6 mix_strata rewrite (VERDICT r5
    #2): a 4M-row corpus with 90% of rows in ONE stratum runs both the r5
    single-window formulation (each stratum ranked in one task — the
    dominant stratum serializes) and the shipped threshold-selection path
    (histogram pre-pass + map-side filter + boundary-bucket-only rank),
    recording the max/median per-task executorRunTime of each variant's
    heaviest post-shuffle stage off the status REST API. Both variants
    select the byte-identical set (pinned by test_mix); the numbers here
    show only the threshold path survives a dominant stratum."""
    import urllib.request

    from prclz_spark.operators.mix import mix_strata, mix_strata_windowed
    from prclz_spark.session import get_spark

    spark = get_spark(
        f"local[{cpus}]", app="bench-mix-skew", shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4048"},
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    n = int(os.environ.get("BENCH_MIX_N", "4000000"))
    rows = spark.range(0, n, 1, cpus).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 10 < 9 THEN 'en' ELSE 'fr' END AS lang",
    ).localCheckpoint()  # freeze the input so both variants rank the same rows
    quotas = {"en": n // 20, "fr": n // 40}
    base = sc.uiWebUrl
    app_id = sc.applicationId

    def _get(path):
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    def run(fn) -> dict:
        prev = max((s["stageId"] for s in _get("/stages")), default=-1)
        t0 = time.time()
        cnt = fn(rows, "lang", quotas, "doc_id", seed=3).count()
        sec = round(time.time() - t0, 2)
        stages = [s for s in _get("/stages?status=COMPLETE") if s["stageId"] > prev]
        # the serialization risk lives in the post-shuffle (rank) stages,
        # not the uniform map-side scan
        reading = [s for s in stages if s.get("shuffleReadBytes", 0) > 0] or stages
        heavy = max(reading, key=lambda s: s.get("executorRunTime", 0))
        q = _get(
            f"/stages/{heavy['stageId']}/{heavy['attemptId']}/taskSummary"
            "?quantiles=0.5,1.0"
        )
        med_ms, max_ms = q["executorRunTime"]
        return {
            "sec": sec, "rows": cnt, "n_tasks": heavy["numCompleteTasks"],
            "median_task_ms": round(med_ms), "max_task_ms": round(max_ms),
        }

    out = {
        "n_rows": n, "dominant_frac": 0.9, "quotas": quotas,
        "windowed_r5": run(mix_strata_windowed),
        "threshold": run(mix_strata),
    }
    spark.stop()
    return out


def _mp_work(seed: int) -> int:
    """One region's worth of fused-kernel load (polygonize a 5×5-cell grid,
    bulk-PIP 600 points, k-complexity per block) — the same numpy/networkx
    code Spark runs inside applyInPandas, with zero Spark around it."""
    import numpy as np

    from prclz_spark import geom as G
    from prclz_spark.kernels import planar as P

    rng = np.random.default_rng(seed)
    lines = []
    for i in range(6):
        lines.append(np.array([[i * 1.0, 0.0], [i * 1.0, 5.0]]))
        lines.append(np.array([[0.0, i * 1.0], [5.0, i * 1.0]]))
    ring = np.array([[0, 0], [5, 0], [5, 5], [0, 5], [0, 0]], dtype=float)
    blocks = P.polygonize_region(ring, lines)
    pts = rng.uniform(0, 5, size=(600, 2))
    k = 0
    for blk in blocks:
        g = G.Geom(G.POLYGON, [blk])
        m = G.points_in_polygon_bulk(pts[:, 0], pts[:, 1], g)
        c = pts[m]
        if len(c):
            k += P.block_complexity(blk, c)
    return k


def mp_control(nproc: int, tasks: int = MP_TASKS) -> float:
    """tasks/sec of the kernel load on a bare process pool."""
    with mp.Pool(nproc) as pool:
        pool.map(_mp_work, range(min(8, tasks)))  # warm: imports + allocs
        t0 = time.time()
        pool.map(_mp_work, range(tasks))
        dt = time.time() - t0
    return round(tasks / dt, 2)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    # --- two-parallelism scaling evidence (same job, same input) ---------
    # co-tenant load on this VM drifts on minute scales (±20-35% even for
    # the no-Spark control); BRACKET the slow local[2] phase with local[8]
    # runs on both sides and min-merge, so a drift during one phase cannot
    # skew the ratio in either direction
    # SAME physical plan at every level: a FIXED kernel-stage task count
    # (32 = one task per region-octet) so only the parallelism varies —
    # scaling per-level task counts with the core count conflated per-task
    # fixed cost (Arrow eval setup + driver scheduling, ~25ms/task) with
    # compute scaling and penalized the high-parallelism levels. reps=2
    # min inside each run excludes the one-time plan-JIT of the first
    # execution (the steady-state min-estimator BASELINE.md documents).
    def scaling_pass():
        p8 = timed_pipeline("local[8]", 32, reps=2)
        p2 = timed_pipeline("local[2]", 32, reps=2)
        p8b = timed_pipeline("local[8]", 32, reps=2)
        if p8b["sec"] < p8["sec"]:
            p8 = p8b
        return p2, p8

    def merge(a, b):
        return a if a["sec"] <= b["sec"] else b

    def control_pass():
        k8 = mp_control(8)
        k2 = mp_control(2)
        k8 = max(k8, mp_control(8))
        return k2, k8

    # min-merge across a FIXED, unconditional number of passes spread in
    # time: co-tenant bursts inflate individual samples one-sidedly, so the
    # min over a wide window estimates the unloaded machine (BASELINE.md
    # protocol). The pass count does NOT depend on the outcome — the r2
    # retry-only-on-miss rule was a one-sided stopping rule that biased the
    # reported efficiency upward (ADVICE r2); every sample is also reported
    # verbatim so the estimator is auditable.
    n_passes = int(os.environ.get("BENCH_SCALING_PASSES", "3"))
    samples: list[tuple[dict, dict]] = []
    c2, c8 = 0.0, 0.0
    for i in range(n_passes):
        samples.append(scaling_pass())
        if i < 2:
            c2i, c8i = control_pass()
            c2, c8 = max(c2, c2i), max(c8, c8i)
    n2, n8 = samples[0]
    for p2, p8 in samples[1:]:
        n2, n8 = merge(n2, p2), merge(n8, p8)
    eff_2_8 = round((n2["sec"] / n8["sec"]) / 4.0, 3)
    hw_2_8 = round((c8 / c2) / 4.0, 3)
    n32 = timed_pipeline(f"local[{cpus}]", 32, reps=2)
    eff_8_32 = round((n8["sec"] / n32["sec"]) / (cpus / 8.0), 3)
    c32 = mp_control(cpus)
    hw_8_32 = round((c32 / c8) / (cpus / 8.0), 3)
    engine_2_8 = round(min(eff_2_8 / hw_2_8, 1.0) if hw_2_8 else 0.0, 3)
    engine_8_32 = round(min(eff_8_32 / hw_8_32, 1.0) if hw_8_32 else 0.0, 3)
    # CPU-time work-invariance: total CPU seconds burned by the job at N vs
    # 4N cores. Co-tenant load steals wall-clock but not our cycles, so
    # cpu(N)/cpu(4N) ≈ 1 says the engine does no extra work at higher
    # parallelism — the noise-immune half of the scaling claim.
    cpu_2_8 = round(n2["cpu_sec"] / n8["cpu_sec"], 3) if n8.get("cpu_sec") else None
    cpu_8_32 = round(n8["cpu_sec"] / n32["cpu_sec"], 3) if n32.get("cpu_sec") else None

    # --- headline queries at sf ------------------------------------------
    import __spark_entry__ as E
    from prclz_spark.session import get_spark

    spark = get_spark(f"local[{cpus}]", app="bench-queries", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # same steady-state treatment as the pipeline sessions: JIT + pre-fork
    # the Python worker pool so per-query timings measure the operator, not
    # the first pandas_udf stage's fork storm
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf("long")
    def _warm_q(s):
        import networkx  # noqa: F401

        import prclz_spark.cells  # noqa: F401
        import prclz_spark.geom  # noqa: F401
        import prclz_spark.kernels.planar  # noqa: F401

        return s

    spark.range(0, 1 << 14, 1, cpus).select(_warm_q("id")).count()
    headline = [
        "q1_pricing_summary",
        "multiway_join_revenue",
        "window_topk_per_cust",
        "events_hourly_rollup",
        "pip_join_counts",
        "knn_ring_expansion",
        "radius_join",
        "dedup_exact_hash",
        "ann_cosine_topk",
        # round-4 additions: the shuffle-hygiene band join (VERDICT r3 #7)
        # and the LSH ANN tier, timed so their scale paths are tracked
        "minhash_lsh_neardup",
        "ann_lsh_topk",
        # round-5 addition (VERDICT r4 #6/#10: new key, prior keys frozen):
        # hot-cell-skewed PIP through the salted non-broadcast path
        "pip_join_skew",
        # round-6 additions (VERDICT r5 #9: new keys, prior keys frozen):
        # the LLM-mixture tier gets perf tracking
        "data_mix_sample",
        "pack_sequences_uniform",
    ]
    qs = E.queries()
    q_times = {}
    total = n2["sec"] + n8["sec"] + n32["sec"]
    for name in headline:
        try:
            # steady-state min of 2 runs — the same treatment the pipeline
            # levels get (reps=2 min). A single cold run is dominated by
            # plan JIT + broadcast build + per-worker module import
            # (measured: pip_join_counts 6.0 s cold vs 1.1 s steady), which
            # is a per-SESSION cost, not operator throughput; r3's
            # "regressed queries" were exactly this fixed cost flapping
            # with co-tenant load.
            reps = []
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                reps.append(round(time.time() - t0, 3))
            q_times[name] = min(reps)
            total += min(reps)
        except Exception as ex:  # a failing query must not kill the bench
            q_times[name] = -1.0
            print(f"# bench query {name} failed: {ex}", file=sys.stderr)
    # round-6 session-2 additions (new keys, prior keys frozen): the two
    # operators added after the registry was fitted to the driver's 50-row
    # check — timed here from bench-local callables instead of queries()
    # token_stats / ngram_distinct left the registry in the round-7
    # consolidation (merged into token_ngram_stats) but their bench keys
    # stay FROZEN: identical query bodies, timed bench-locally, so
    # BENCH_r07+ stays key-for-key comparable with every prior round.
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
        # round-7 key (new key, prior keys frozen): token-budget mixture
        from pyspark.sql import functions as F
        from prclz_spark.operators.mix import mix_strata_tokens
        docs = s.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", "lang",
            F.size(F.split("text", r"\s+")).alias("n_tok"),
        )
        return mix_strata_tokens(
            docs, "lang", {"en": 200_000, "fr": 80_000}, "doc_id", "n_tok"
        )

    for name, fn in [("token_stats", _x_token_stats),
                     ("ngram_distinct", _x_ngram_distinct),
                     ("strip_boilerplate", _x_strip_boilerplate),
                     ("ivf_pq_topk", _x_ivf_pq),
                     ("mix_tokens_sample", _x_mix_tokens)]:
        try:
            reps = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).count()
                reps.append(round(time.time() - t0, 3))
            q_times[name] = min(reps)
            total += min(reps)
        except Exception as ex:
            q_times[name] = -1.0
            print(f"# bench query {name} failed: {ex}", file=sys.stderr)

    # round-7 addition (VERDICT r6 #4, new key, prior keys frozen):
    # the PRODUCTION IVF-PQ path — train + corpus encode happen outside
    # the timer (the `ann-index build` decomposition); the key times only
    # what a daily query batch costs against the persisted index. The
    # self-contained `ivf_pq_topk` key above keeps its historical meaning
    # (end-to-end incl. training) — read them together.
    try:
        from pyspark.sql import functions as F  # noqa: F811
        from prclz_spark.operators.ann import (
            ivf_pq_encode_corpus, ivf_pq_topk, train_centroids, train_pq,
        )
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        cents = train_centroids(e, "embedding", 64, n_lists=16)
        books = train_pq(e, "embedding", 64, m=8)
        codes = ivf_pq_encode_corpus(e, "vec_id", "embedding", cents, books)
        codes.persist().count()  # the persisted index, built off-clock
        qv = e.filter(F.col("vec_id") < 64).withColumnRenamed("vec_id", "qid")
        reps = []
        for _ in range(2):
            t0 = time.time()
            ivf_pq_topk(
                qv, e, "qid", "vec_id", "embedding", dim=64, k=10,
                n_probe=4, refine_k=100,
                cents=cents, books=books, corpus_codes=codes,
            ).count()
            reps.append(round(time.time() - t0, 3))
        q_times["ivf_pq_query"] = min(reps)
        total += min(reps)
        codes.unpersist()
    except Exception as ex:
        q_times["ivf_pq_query"] = -1.0
        print(f"# bench query ivf_pq_query failed: {ex}", file=sys.stderr)

    q_times["pipeline_local2"] = n2["sec"]
    q_times["pipeline_local8"] = n8["sec"]
    q_times[f"pipeline_local{cpus}"] = n32["sec"]
    spark.stop()

    # --- hot-cell salting task-time evidence (VERDICT r4 #6) -------------
    try:
        skew = skew_evidence(cpus)
    except Exception as ex:  # evidence must not kill the bench
        skew = {"error": str(ex)}
        print(f"# bench skew evidence failed: {ex}", file=sys.stderr)

    # --- dominant-stratum mixing task-time evidence (VERDICT r5 #2) ------
    try:
        mix_skew = mix_skew_evidence(cpus)
    except Exception as ex:
        mix_skew = {"error": str(ex)}
        print(f"# bench mix skew evidence failed: {ex}", file=sys.stderr)

    out = {
        "metric": "blocks+parcels processed/sec (end-to-end block extraction -> k-index) "
        "+ headline query secs; N vs 4N scaling at local[2] vs local[8] "
        "(+ local[8] vs local[%d]) with a no-Spark hardware control" % cpus,
        "value": round(total, 2),
        "unit": "sec",
        "queries": q_times,
        "sf": sf,
        "skew": skew,
        "mix_skew": mix_skew,
        "pipeline": {
            "geo_grid": f"{GEO_NX}x{GEO_NX}",
            "blocks": n32["blocks"],
            "buildings": n32["buildings"],
            "local2": {
                "sec": n2["sec"], "cpu_sec": n2["cpu_sec"], "items_per_sec": n2["items_per_sec"]
            },
            "local8": {
                "sec": n8["sec"], "cpu_sec": n8["cpu_sec"], "items_per_sec": n8["items_per_sec"]
            },
            f"local{cpus}": {
                "sec": n32["sec"], "cpu_sec": n32["cpu_sec"],
                "items_per_sec": n32["items_per_sec"],
            },
            # every raw sample (fixed pass count, min-merged above): the
            # estimator is auditable, not outcome-conditioned
            "scaling_samples": [
                {"local2_sec": p2["sec"], "local8_sec": p8["sec"]} for p2, p8 in samples
            ],
            # N vs 4N (2 -> 8 cores): the pair where the HARDWARE can still
            # scale (see hw_control) — the north_rule gate
            "scaling_efficiency": eff_2_8,
            "scaling_efficiency_8to32": eff_8_32,
            # identical kernel load on a bare process pool (no Spark):
            # this machine's own scaling ceiling at each pair
            "hw_control": {
                "tasks_per_sec": {"n2": c2, "n8": c8, f"n{cpus}": c32},
                "efficiency_2to8": hw_2_8,
                "efficiency_8to32": hw_8_32,
            },
            # engine efficiency = spark wall efficiency / hardware ceiling
            "engine_efficiency_2to8": engine_2_8,
            "engine_efficiency_8to32": engine_8_32,
            # CPU-time work-invariance ratio (≈1 ⇒ no extra work at 4N):
            # the co-tenant-noise-immune complement to the wall ratios
            "cpu_work_invariance_2to8": cpu_2_8,
            "cpu_work_invariance_8to32": cpu_8_32,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
