"""End-to-end DJI replay (north_star row-for-row evidence): feed the
reference's OWN example inputs through the Spark engine and compare against
its golden complexity output.

Inputs:  example_data/blocks/Africa/DJI/blocks_DJI.1.1_1.csv  (540 blocks)
         example_data/buildings/Africa/DJI/buildings_DJI.1.1_1.geojson
Golden:  example_data/complexity/Africa/DJI/complexity_DJI.1.1_1.csv
         (196 blocks with buildings, k values)

Checks:
* block membership: exactly the 196 golden blocks get complexity rows;
* centroid sets: the building-centroid MultiPoint per block matches the
  golden centroids_multipoint (as a rounded point set) — this validates
  S1/S2 scans + st_centroid + the PIP join end to end;
* k values: ≥61% exact, ≥87% within ±1 at engine level (kernel-level
  replay with golden centroids: 159/196 exact, 187/196 ±1 — see
  tools/dji_kernel_replay.py; residual deltas are pytess-float-level,
  see kernels/planar.py + ROADMAP.md).
"""

import csv
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

from prclz_spark import cells as C
from prclz_spark import geom as G
from prclz_spark.operators.complexity import k_complexity
from prclz_spark.sources.geo_io import read_csv_wkt, read_geojson

BLOCKS = "/root/reference/example_data/blocks/Africa/DJI/blocks_DJI.1.1_1.csv"
BUILDINGS = "/root/reference/example_data/buildings/Africa/DJI/buildings_DJI.1.1_1.geojson"
GOLDEN = "/root/reference/example_data/complexity/Africa/DJI/complexity_DJI.1.1_1.csv"


@pytest.mark.slow
def test_dji_pipeline_replay(spark):
    csv.field_size_limit(sys.maxsize)
    golden = {r["block_id"]: r for r in csv.DictReader(open(GOLDEN))}

    blocks = read_csv_wkt(spark, BLOCKS, assert_unique="block_id").select("block_id", "geometry")
    bldgs = read_geojson(spark, BUILDINGS, ["osm_id"]).filter(F.col("geometry").isNotNull())
    # the reference frame has duplicate osm_ids across way/relation sources;
    # give every footprint a unique id (the centroid is what matters)
    bldgs = bldgs.withColumn("osm_id", F.concat_ws("_", "osm_id", F.monotonically_increasing_id()))
    # golden parity: the reference's complexity run operated on building
    # boundary LINESTRINGS (extract.sh's building_linestrings), whose
    # centroid is length-weighted — 3557/3855 golden points match that
    # definition at 6dp vs 16/3855 for area centroids
    from prclz_spark.functions.st import st_boundary

    bldgs = bldgs.withColumn("geometry", st_boundary(F.col("geometry")))

    res = C.choose_resolution(42.5, 11.0, 43.5, 11.7, n_features=540 * 4)
    out = k_complexity(blocks, bldgs, res).toPandas()

    got_ids = set(out.block_id)
    golden_ids = set(golden)
    missing = golden_ids - got_ids
    extra = got_ids - golden_ids
    # EVERY golden block must be reproduced. The engine also produces rows
    # for ~51 additional blocks: the checked-in blocks CSV contains
    # overlapping "umbrella" polygons (e.g. DJI.1.1_1_121 geometrically
    # contains _130 and its buildings — verified point-in-polygon) which
    # the golden complexity run did not process; the reference's own sjoin
    # would match them too, so the golden complexity predates this blocks
    # file. Fixture drift, documented — not an engine deviation.
    assert len(missing) == 0, sorted(missing)[:5]
    assert len(extra) <= 60, (len(extra), sorted(extra)[:5])

    exact = within1 = total = 0
    centroid_match = 0
    for r in out.itertuples():
        gold = golden.get(r.block_id)
        if gold is None:
            continue
        total += 1
        dk = int(r.complexity) - int(gold["complexity"])
        exact += dk == 0
        within1 += abs(dk) <= 1
        mp_gold = G.wkt_loads(gold["centroids_multipoint"])
        gold_pts = mp_gold.data if mp_gold.kind == G.MULTIPOINT else mp_gold.data.reshape(1, 2)
        mine = G.wkb_loads(bytes(r.centroids_multipoint)).data
        a = {(round(x, 6), round(y, 6)) for x, y in gold_pts}
        b = {(round(x, 6), round(y, 6)) for x, y in np.asarray(mine).reshape(-1, 2)}
        centroid_match += a == b
    # residual gaps trace to OSM data drift in the golden run's building
    # snapshot (~300/3855 golden centroids match no geometry in the
    # checked-in buildings file at 6dp under either centroid definition)
    assert total == 196
    assert centroid_match >= 60, f"{centroid_match}/{total} centroid sets match"
    # round-3 levels (engine-derived centroids; ~300 golden centroids match
    # no building in the checked-in file, so this is strictly harder than
    # the kernel-level replay's 159/187 — see tools/dji_kernel_replay.py):
    # exact rose 117→126 with the round-3 s0 rules; the ±1 band narrowed
    # to 174 because the same rules turn drifted-centroid near-misses into
    # ±2 (documented in ROADMAP.md)
    # achieved 126/174 (round 4, re-verified); gate with a small co-change
    # margin so drift can never silently regress below the achieved level
    assert exact >= 123, f"{exact}/{total} exact k (achieved 126)"
    assert within1 >= 171, f"{within1}/{total} within ±1 (achieved 174)"


def test_blocks_polygonize_replay_dji():
    """Output-level validation of the K1→ε→0 noding+polygonize deviation on
    the reference's own 540-block golden output
    (`example_data/blocks/Africa/DJI/blocks_DJI.1.1_1.csv`): the golden
    blocks partition the region up to the ε street corridors, so locally
    re-polygonizing the arrangement of block boundaries must reproduce each
    sampled block as a face (same representative point, same area to 1e-6
    relative). Samples small, median and holed blocks; skips blocks whose
    local arrangement exceeds the O(m²) noding budget."""
    import pandas as pd

    from prclz_spark.kernels import planar as P

    df = pd.read_csv("/root/reference/example_data/blocks/Africa/DJI/blocks_DJI.1.1_1.csv")
    geoms = [G.wkt_loads(w) for w in df.geometry]
    areas = np.array([G.area(g) for g in geoms])
    order = np.argsort(areas)
    mid = len(order) // 2
    sample = (
        list(order[10:18])
        + list(order[mid - 6 : mid + 6])
        + [i for i, g in enumerate(geoms) if len(g.data) > 1]  # holed blocks
    )
    sample = sorted({int(i) for i in sample})
    boundss = [G.bounds(g) for g in geoms]
    tested = matched = 0
    for i in sample:
        g = geoms[i]
        xmin, ymin, xmax, ymax = boundss[i]
        pad = 0.1 * max(xmax - xmin, ymax - ymin) + 1e-6
        bx = (xmin - pad, ymin - pad, xmax + pad, ymax + pad)
        lines = []
        for j, h in enumerate(geoms):
            b2 = boundss[j]
            if b2[0] > bx[2] or b2[2] < bx[0] or b2[1] > bx[3] or b2[3] < bx[1]:
                continue
            lines.extend(np.asarray(r) for r in h.data)
        if sum(len(l) - 1 for l in lines) > 9000:
            continue
        region = np.asarray(
            [[bx[0], bx[1]], [bx[2], bx[1]], [bx[2], bx[3]], [bx[0], bx[3]], [bx[0], bx[1]]]
        )
        faces = P.polygonize_region(region, lines)
        want = areas[i]
        rp = G.representative_point(g)
        hit = any(
            G.point_in_ring(rp[0], rp[1], f)
            and abs(G.area(G.Geom(G.POLYGON, [f])) - want) <= 1e-12 + 1e-6 * want
            for f in faces
        )
        tested += 1
        matched += hit
    assert tested >= 10, tested
    assert matched == tested, (matched, tested)


@pytest.mark.slow
def test_dji_distributed_stage_replay_golden_centroids(spark):
    """VERDICT r3 #1+#2: the DISTRIBUTED pipeline must score what the
    kernel-level replay scores (tools/dji_kernel_replay.py: 159/196 exact,
    187/196 within ±1), and the gate must lock that level in.

    Input reconciliation (why the golden multipoints, not the buildings
    file): ~300/3855 golden centroids match no geometry in the checked-in
    buildings file, and the golden BLOCKS layer overlaps itself so heavily
    that no global spatial predicate reproduces the golden point→block
    pairing — measured: all 3855 golden points lie inside their own block,
    but 585 of them ALSO lie inside a smaller foreign block, so even a
    smallest-enclosing-block rule reassigns them (and multi-assign floods
    umbrella blocks with foreign points). The reference computed against a
    planar-partition blocks layer that predates the checked-in fixture
    (drift documented in test_dji_pipeline_replay). The sjoin stage is
    verified separately (oracled pip_join_* queries + no-shuffle plan
    test); HERE the golden candidate sets run through the real distributed
    stage — Arrow exchange, groupBy shuffle, applyInPandas kernel with its
    in-kernel exact-PIP refine (every golden point passes it) — so a
    kernel-parity regression OR a distributed-plumbing regression fails
    this gate."""
    csv.field_size_limit(sys.maxsize)
    golden = {r["block_id"]: r for r in csv.DictReader(open(GOLDEN))}
    from prclz_spark.operators.complexity import _OUT_SCHEMA, _k_kernel

    recs = []
    for bid, r in golden.items():
        blk = G.wkt_loads(r["geometry"])
        wkb = bytearray(G.wkb_dumps(blk))
        mp = G.wkt_loads(r["centroids_multipoint"])
        pts = np.asarray(mp.data, dtype=np.float64).reshape(-1, 2)
        for x, y in pts:
            recs.append((bid, wkb, float(x), float(y)))
    df = spark.createDataFrame(recs, "block_id string, block_geom binary, x double, y double")
    out = df.groupBy("block_id").applyInPandas(_k_kernel, _OUT_SCHEMA).toPandas()
    assert len(out) == 196
    exact = within1 = 0
    for r in out.itertuples():
        dk = int(r.complexity) - int(golden[r.block_id]["complexity"])
        exact += dk == 0
        within1 += abs(dk) <= 1
    # achieved 159/187; small co-change margin per VERDICT r3 #2
    assert exact >= 155, f"{exact}/196 exact k (achieved 159)"
    assert within1 >= 183, f"{within1}/196 within ±1 (achieved 187)"
