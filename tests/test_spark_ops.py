"""Spark-level operator tests: spatial joins vs brute-force oracles,
kNN, radius join, skew salting, pipeline stages, ledger resume."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from prclz_spark import cells as C
from prclz_spark import fixtures as FX
from prclz_spark import geom as G
from prclz_spark.functions.st import st_centroid, st_x, st_y
from prclz_spark.operators.blocks import extract_blocks
from prclz_spark.operators.complexity import building_centroids, k_complexity
from prclz_spark.operators.knn import knn_join, within_distance_join
from prclz_spark.operators.parcels import tessellate
from prclz_spark.operators.sjoin import pip_join, sjoin_pairs

NX = 6


@pytest.fixture(scope="module")
def world(spark):
    lines, gadm, bldgs = FX.geo_world(spark, NX, NX)
    res = C.choose_resolution(*FX.grid_params(NX, NX), n_features=NX * NX * 4)
    return lines.cache(), gadm.cache(), bldgs.cache(), res


def test_pip_join_closed_form(spark, world):
    lines, gadm, bldgs, res = world
    pts = building_centroids(bldgs, res=res)
    out = pip_join(pts, gadm, "osm_id", "gadm", res=res, how="inner").toPandas()
    assert len(out) == bldgs.count()  # every centroid in exactly one region
    x0, y0, x1, y1 = FX.grid_params(NX, NX)
    wx, wy = (x1 - x0) / 2, (y1 - y0) / 2
    for r in out.itertuples():
        i = min(1, int((r.x - x0) // wx))
        j = min(1, int((r.y - y0) // wy))
        assert r.gadm == f"TST.{i+1}.{j+1}_1"


def test_sjoin_vs_bruteforce(spark, world):
    lines, gadm, bldgs, res = world
    pairs = sjoin_pairs(lines, gadm, "osm_id", "gadm", res=res).toPandas()
    lp, gp = lines.toPandas(), gadm.toPandas()
    truth = {
        (lr.osm_id, gr.gadm)
        for _, lr in lp.iterrows()
        for _, gr in gp.iterrows()
        if G.intersects(G.wkb_loads(bytes(lr.geometry)), G.wkb_loads(bytes(gr.geometry)))
    }
    got = set(map(tuple, pairs[["osm_id", "gadm"]].values))
    assert got == truth


def test_knn_vs_bruteforce(spark):
    rng = np.random.default_rng(3)
    probes = pd.DataFrame({"pid": range(40), "x": rng.uniform(10, 10.05, 40), "y": rng.uniform(10, 10.05, 40)})
    build = pd.DataFrame({"bid": range(25), "x": rng.uniform(10, 10.05, 25), "y": rng.uniform(10, 10.05, 25)})
    res = 16
    out = knn_join(
        spark.createDataFrame(probes), spark.createDataFrame(build), "pid", "bid", k=3, res=res
    ).toPandas()
    for pid, grp in out.groupby("pid"):
        px, py = probes.loc[probes.pid == pid, ["x", "y"]].iloc[0]
        d = np.hypot(build.x - px, build.y - py)
        expect = build.assign(d=d).sort_values(["d", "bid"]).head(3).bid.tolist()
        got = grp.sort_values("rank").bid.tolist()
        assert got == expect, (pid, got, expect)
    assert out.groupby("pid").size().eq(3).all() and out.pid.nunique() == 40


def test_radius_join_vs_bruteforce(spark):
    rng = np.random.default_rng(4)
    probes = pd.DataFrame({"pid": range(50), "x": rng.uniform(10, 10.05, 50), "y": rng.uniform(10, 10.05, 50)})
    build = pd.DataFrame({"bid": range(30), "x": rng.uniform(10, 10.05, 30), "y": rng.uniform(10, 10.05, 30)})
    radius = 0.004
    res = 15  # cell ≥ radius required
    out = within_distance_join(
        spark.createDataFrame(probes), spark.createDataFrame(build), "pid", "bid", radius, res
    ).toPandas()
    truth = {
        (p.pid, b.bid)
        for _, p in probes.iterrows()
        for _, b in build.iterrows()
        if np.hypot(p.x - b.x, p.y - b.y) <= radius
    }
    assert set(map(tuple, out[["pid", "bid"]].values)) == truth


def test_blocks_closed_form_count(spark, world):
    lines, gadm, bldgs, res = world
    blocks = extract_blocks(lines, gadm, res)
    ndiag = sum(1 for ci in range(NX) for cj in range(NX) if (ci * NX + cj) % 7 == 3)
    assert blocks.count() == NX * NX + ndiag
    # block_ids unique (reference asserts this too, prclz/utils.py:53)
    assert blocks.select("block_id").distinct().count() == blocks.count()


def test_k_complexity_rows(spark, world):
    lines, gadm, bldgs, res = world
    blocks = extract_blocks(lines, gadm, res).cache()
    kdf = k_complexity(blocks, bldgs, res).toPandas()
    assert len(kdf) == blocks.count()  # every block has buildings in fixture
    assert (kdf.complexity >= 0).all() and (kdf.complexity <= 3).all()
    # centroids multipoint round-trips
    mp = G.wkb_loads(bytes(kdf.centroids_multipoint.iloc[0]))
    assert mp.kind == G.MULTIPOINT


def test_parcels_invariants(spark, world):
    lines, gadm, bldgs, res = world
    blocks = extract_blocks(lines, gadm, res).cache()
    parcels = tessellate(blocks, bldgs, res).toPandas()
    # ≤1 building per parcel by construction; every parcel area > 0
    dup = parcels[parcels.osm_id.notna()].groupby(["block_id", "osm_id"]).size()
    assert (dup == 1).all()
    areas = [G.area(G.wkb_loads(bytes(b))) for b in parcels.geometry]
    assert all(a > 0 for a in areas)
    # every building's parcel contains the building's centroid — the
    # reference's check_within QC (`prclz/_parcels.py:218-237`)
    cent = building_centroids(bldgs).toPandas().set_index("osm_id")
    for r in parcels[parcels.osm_id.notna()].itertuples():
        g = G.wkb_loads(bytes(r.geometry))
        assert G.contains_point(g, cent.loc[r.osm_id, "x"], cent.loc[r.osm_id, "y"]), r.osm_id


def test_ledger_resume(spark, tmp_path):
    from prclz_spark.operators.ledger import Ledger

    led = Ledger(spark, str(tmp_path / "ledger"))
    inp = spark.createDataFrame([(f"k{i}",) for i in range(10)], "partition_key string")
    pend = led.filter_pending(inp.withColumnRenamed("partition_key", "gadm"), "s1", "gadm")
    assert pend.count() == 10
    done = spark.createDataFrame([(f"k{i}", 1) for i in range(4)], "gadm string, n int")
    led.record("s1", done, "gadm")
    pend2 = led.filter_pending(inp.withColumnRenamed("partition_key", "gadm"), "s1", "gadm")
    assert pend2.count() == 6
    assert set(r.gadm for r in pend2.collect()) == {f"k{i}" for i in range(4, 10)}


def test_salting_balances_hot_cell(spark):
    """north_rule skew evidence: a megacity cell's work spreads over the
    salt space — the max per-(cell,salt) group size drops by ~the salt
    factor (deterministic row-count check, no timing flakiness)."""
    from prclz_spark.operators.skew import hot_cells

    # one hot cell (id 7) with 10k rows, 50 cold cells with 10 each
    probe = spark.range(10_000).select(
        F.col("id"), F.lit(7).alias("cell")
    ).unionByName(
        spark.range(500).select((F.col("id") + 20_000).alias("id"), (F.col("id") % 50 + 100).alias("cell"))
    )
    assert hot_cells(probe, hot_threshold=1000) == [7]
    salts = 8
    salted = probe.withColumn(
        "salt",
        F.when(F.col("cell") == 7, F.pmod(F.xxhash64("id"), F.lit(salts))).otherwise(F.lit(0)),
    )
    sizes = salted.groupBy("cell", "salt").count().agg(F.max("count")).first()[0]
    unsalted_max = probe.groupBy("cell").count().agg(F.max("count")).first()[0]
    assert unsalted_max == 10_000
    assert sizes < 10_000 / salts * 1.5  # balanced within 50% of ideal


def test_salted_join_equivalence(spark):
    from prclz_spark.operators.skew import salt_exploded_join

    probe = spark.createDataFrame(
        [(i, i % 5) for i in range(1000)], "id long, cell long"
    )
    build = spark.createDataFrame([(c, f"v{c}") for c in range(5)], "cell long, val string")
    plain = probe.join(build, "cell").count()
    salted = salt_exploded_join(probe, build, key="cell", salts=4, probe_id="id", hot_threshold=10).count()
    assert plain == salted == 1000


def test_blocks_kernel_failure_not_masked(spark, world):
    """A region whose kernel raises must surface as a status='error' row and
    must NOT be resurrected as a phantom whole-region block by the
    zero-street backfill (round-1 ADVICE / VERDICT 'What's wrong' #5)."""
    lines, gadm, bldgs, res = world
    poisoned = gadm.withColumn(
        "geometry",
        F.when(F.col("gadm") == "TST.1.1_1", F.lit(b"\x00garbage-not-wkb")).otherwise(
            F.col("geometry")
        ),
    )
    full = extract_blocks(lines, poisoned, res, keep_status=True).toPandas()
    errs = full[full.status != "ok"]
    assert set(errs.gadm) == {"TST.1.1_1"}, errs
    # the poisoned gadm contributes NO ok rows — in particular no
    # whole-region "_0" backfill block
    ok = full[full.status == "ok"]
    assert not (ok.gadm == "TST.1.1_1").any()
    # default (clean) output excludes the errored region entirely
    clean = extract_blocks(lines, poisoned, res).toPandas()
    assert not (clean.gadm == "TST.1.1_1").any()
    assert "status" not in clean.columns
    # healthy regions are unaffected
    assert set(clean.gadm) == {g for g in full.gadm.unique() if g != "TST.1.1_1"}


def test_parcels_orphan_reunion_kernel():
    """K5+J9 (prclz/_parcels.py:65-168): a U-shaped block cuts the top
    building's convex Voronoi region into two pieces; the piece in the far
    arm intersects no building (orphan) and must be reunited with the
    nearest bordering parcel, with no area dropped."""
    from prclz_spark.operators.parcels import _parcels_kernel

    ring = np.asarray(
        [(0, 0), (3, 0), (3, 3), (2, 3), (2, 1), (1, 1), (1, 3), (0, 3), (0, 0)],
        dtype=float,
    )
    block = G.Geom(G.POLYGON, [ring])
    A = G.box(0.3, 2.5, 0.7, 2.9)   # top of LEFT arm
    B = G.box(2.4, 0.1, 2.8, 0.5)   # base, under the RIGHT arm
    pdf = pd.DataFrame(
        {
            "block_id": ["U1"] * 2,
            "block_geom": [G.wkb_dumps(block)] * 2,
            "osm_id": ["A", "B"],
            "bldg_geom": [G.wkb_dumps(A), G.wkb_dumps(B)],
        }
    )
    out = _parcels_kernel(pdf)
    assert set(out.osm_id) == {"A", "B"}
    geoms = {r.osm_id: G.wkb_loads(bytes(r.geometry)) for r in out.itertuples()}
    # no area dropped: parcels partition the block (area 3+2+2 = 7)
    total = sum(G.area(g) for g in geoms.values())
    assert abs(total - 7.0) < 1e-6, total
    # the orphan (top of right arm) was assigned to B, whose parcel borders
    # it across the A/B bisector — not to A, which it cannot touch
    assert G.contains_point(geoms["B"], 2.5, 2.95)
    assert not G.contains_point(geoms["A"], 2.5, 2.95)
    # each building is inside its own parcel (check_within, _parcels.py:218-237)
    for osm, bg in (("A", A), ("B", B)):
        c = G.centroid(bg)
        assert G.contains_point(geoms[osm], c[0], c[1])


def test_sjoin_how_right(spark, world):
    """J2: geopandas sjoin how='right' — keep unmatched build rows."""
    from prclz_spark.operators.sjoin import sjoin

    lines, gadm, bldgs, res = world
    # add a region nothing intersects
    extra = spark.createDataFrame(
        [("TST.FAR_1", G.wkb_dumps(G.box(99.0, 99.0, 99.1, 99.1)))],
        "gadm string, geometry binary",
    )
    gadm2 = gadm.unionByName(extra, allowMissingColumns=True)
    out = sjoin(lines, gadm2, "osm_id", "gadm", res=res, how="right").toPandas()
    far = out[out.gadm == "TST.FAR_1"]
    assert len(far) == 1 and far.osm_id.isna().all()  # kept, null probe attrs
    assert out[out.gadm != "TST.FAR_1"].osm_id.notna().all()


def test_street_graph_parquet_roundtrip(spark, tmp_path):
    """S10: a StreetGraph survives a Parquet edge-list round trip with
    identical structure, weights, terminals, and Steiner answer."""
    from prclz_spark.kernels.reblock import StreetGraph

    g = StreetGraph.from_polygons(
        [np.asarray([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)], dtype=float),
         np.asarray([(1, 0), (2, 0), (2, 1), (1, 1), (1, 0)], dtype=float)],
        [0, 1],
    )
    g.add_node_to_closest_edge((0.5, 0.0), terminal=True)
    g.add_node_to_closest_edge((2.0, 0.5), terminal=True)
    df = spark.createDataFrame(g.to_edge_rows(), StreetGraph.EDGE_SCHEMA)
    path = str(tmp_path / "graph.pq")
    df.write.parquet(path)
    rows = [tuple(r) for r in spark.read.parquet(path).collect()]
    g2 = StreetGraph.from_edge_rows(rows)
    assert g2.stats() == g.stats()
    assert sorted(g2.terminals()) == sorted(g.terminals())
    g.steiner_tree_approx()
    g2.steiner_tree_approx()
    n1, e1 = g.steiner_segments()
    n2, e2 = g2.steiner_segments()
    assert {frozenset(s) for s in n1} == {frozenset(s) for s in n2}


def test_tessellate_inward_offset_keeps_buildings_whole(spark):
    """momepy inward-offset seeding: with the offset on, no parcel boundary
    cuts into a building — every building polygon is fully inside its own
    parcel (momepy.Tessellation's contract), not merely centroid-inside."""
    from prclz_spark.operators.parcels import tessellate

    blocks = spark.createDataFrame(
        [("B1", G.wkb_dumps(G.box(0, 0, 10, 10)))], "block_id string, geometry binary"
    )
    rows = []
    i = 0
    for x in range(2, 10, 3):
        for y in range(2, 10, 3):
            rows.append((f"b{i}", G.wkb_dumps(G.box(x - 1.0, y - 1.0, x + 1.0, y + 1.0))))
            i += 1
    bldgs = spark.createDataFrame(rows, "osm_id string, geometry binary")
    parcels = tessellate(blocks, bldgs, res=12, inward_offset=0.25).toPandas()
    geoms = {r.osm_id: G.wkb_loads(bytes(r.geometry)) for r in parcels.itertuples()}
    for osm, bw in rows:
        bg = G.wkb_loads(bytes(bw))
        pg = geoms[osm]
        # sample the building boundary densely: all points inside the parcel
        ring = bg.data[0]
        import numpy as _np

        ts = _np.linspace(0, 1, 9)[:-1]
        for k in range(len(ring) - 1):
            for t in ts:
                p = ring[k] + t * (ring[k + 1] - ring[k])
                assert G.contains_point(pg, float(p[0]), float(p[1])), (osm, p)


def test_k_complexity_unique_assign_smallest_block(spark):
    """unique_assign=True recovers planar-partition semantics on an
    OVERLAPPING blocks layer: a point inside both an umbrella block and a
    contained block is assigned only to the smaller; multi-assign (default)
    gives it to both."""
    umbrella = G.wkb_dumps(G.box(0.0, 0.0, 1.0, 1.0))
    inner = G.wkb_dumps(G.box(0.2, 0.2, 0.4, 0.4))
    blocks = spark.createDataFrame(
        [("umbrella", bytearray(umbrella)), ("inner", bytearray(inner))],
        "block_id string, geometry binary",
    )
    # three points inside `inner` (also inside umbrella), three only in umbrella
    pts = [(f"b{i}", bytearray(G.wkb_dumps(G.point(x, y)))) for i, (x, y) in enumerate(
        [(0.25, 0.25), (0.3, 0.3), (0.35, 0.25), (0.7, 0.7), (0.8, 0.6), (0.6, 0.8)]
    )]
    bldgs = spark.createDataFrame(pts, "osm_id string, geometry binary")
    res = 14
    multi = {r.block_id: r for r in k_complexity(blocks, bldgs, res).collect()}
    uniq = {r.block_id: r for r in k_complexity(blocks, bldgs, res, unique_assign=True).collect()}

    def npts(row):
        return len(np.asarray(G.wkb_loads(bytes(row.centroids_multipoint)).data).reshape(-1, 2))

    assert npts(multi["umbrella"]) == 6 and npts(multi["inner"]) == 3
    assert npts(uniq["umbrella"]) == 3 and npts(uniq["inner"]) == 3


def test_knn_adversarial_edges(spark):
    """kNN edge cases: duplicate coordinates (zero distances, deterministic
    tie-break by build_id), k larger than the corpus (every probe gets all
    |corpus| rows), and a probe far outside the build extent (ring
    expansion must still find its neighbors within max_ring)."""
    from prclz_spark.operators.knn import knn_join

    res = 16
    probes = pd.DataFrame({"pid": [0, 1], "x": [10.0, 10.001], "y": [10.0, 10.0]})
    # corpus: three coincident points + one distinct
    build = pd.DataFrame(
        {"bid": [0, 1, 2, 3], "x": [10.0, 10.0, 10.0, 10.002], "y": [10.0] * 4}
    )
    out = knn_join(
        spark.createDataFrame(probes), spark.createDataFrame(build), "pid", "bid",
        k=3, res=res,
    ).toPandas()
    p0 = out[out.pid == 0].sort_values("rank")
    assert p0.bid.tolist() == [0, 1, 2]          # ties broken by bid asc
    assert (p0.dist.values == 0.0).all()
    # k > |corpus|: every probe must get all 4 rows, ranked
    out_all = knn_join(
        spark.createDataFrame(probes), spark.createDataFrame(build), "pid", "bid",
        k=10, res=res,
    ).toPandas()
    assert out_all.groupby("pid").size().eq(4).all()
    # far-away probe: outside the build bbox by many cells
    far = pd.DataFrame({"pid": [9], "x": [10.01], "y": [10.01]})
    out_far = knn_join(
        spark.createDataFrame(far), spark.createDataFrame(build), "pid", "bid",
        k=2, res=res, max_ring=64,
    ).toPandas()
    assert len(out_far) == 2
    d = np.hypot(build.x - 10.01, build.y - 10.01)
    expect = build.assign(d=d).sort_values(["d", "bid"]).head(2).bid.tolist()
    assert out_far.sort_values("rank").bid.tolist() == expect


def test_cell_point_col_bit_equal_udf(spark):
    """Round-8: the pure-JVM cell expression (st_cell_point_col) must be
    bit-equal to cells.cell_of_xy for every finite coordinate — the PIP /
    kNN / radius probe paths ride on it. Sweep: fixture-like coords, cell
    edges, world corners, negatives, several resolutions."""
    from prclz_spark.functions.st import st_cell_point_col

    rng = np.random.default_rng(11)
    xs = np.concatenate([
        rng.uniform(-180, 180, 400),
        10.0 + (np.arange(200) * 37 % 600) / 10000.0,   # the _PTS_X derivation
        np.array([-180.0, 180.0, 0.0, -179.9999999, 179.9999999]),
        # exact cell-edge values at res 14
        -180.0 + np.arange(16) * (360.0 / (1 << 14)),
    ])
    ys = np.concatenate([
        rng.uniform(-90, 90, 400),
        10.0 + (np.arange(200) * 73 % 600) / 10000.0,
        np.array([-90.0, 90.0, 0.0, -89.9999999, 89.9999999]),
        -90.0 + np.arange(16) * (180.0 / (1 << 14)),
    ])
    pdf = pd.DataFrame({"x": xs, "y": ys})
    df = spark.createDataFrame(pdf)
    for res in (3, 7, 14, 16, 28):
        got = (
            df.select(st_cell_point_col(res, F.col("x"), F.col("y")).alias("c"))
            .toPandas()["c"].to_numpy()
        )
        want = C.cell_of_xy(xs, ys, res)
        assert (got == want).all(), (res, np.nonzero(got != want)[0][:5])


def test_knn_multi_iteration_sparse(spark):
    """Round-8 loop restructure: force the proof bound to FAIL on the first
    batch (build points much farther than disk(2) at a fine res) so the
    ring loop actually iterates, and check exactness still holds."""
    probes = pd.DataFrame({"pid": [0, 1], "x": [10.0, 10.001], "y": [10.0, 10.001]})
    build = pd.DataFrame(
        {"bid": range(6), "x": 10.0 + np.arange(6) * 0.01, "y": [10.02] * 6}
    )
    res = 18  # cell ~0.0014 deg: nearest build point is ~15 cells away
    out = knn_join(
        spark.createDataFrame(probes), spark.createDataFrame(build),
        "pid", "bid", k=2, res=res, max_ring=24,
    ).toPandas()
    for pid, grp in out.groupby("pid"):
        px, py = probes.loc[probes.pid == pid, ["x", "y"]].iloc[0]
        d = np.hypot(build.x - px, build.y - py)
        expect = build.assign(d=d).sort_values(["d", "bid"]).head(2).bid.tolist()
        assert grp.sort_values("rank").bid.tolist() == expect
