"""DJI s0-construction ablation harness: sweeps the geometry/graph options
and reports exact / ±1 parity per building-count family.

Usage: python tools/dji_ablate.py [quick]
"""

import csv
import sys

import numpy as np

sys.path.insert(0, ".")
csv.field_size_limit(sys.maxsize)

from prclz_spark import geom as G  # noqa: E402
from prclz_spark.kernels import planar as P  # noqa: E402

GOLDEN = "/root/reference/example_data/complexity/Africa/DJI/complexity_DJI.1.1_1.csv"


def load():
    data = []
    for r in csv.DictReader(open(GOLDEN)):
        blk = G.wkt_loads(r["geometry"])
        ring = np.asarray(
            blk.data[0] if blk.kind == G.POLYGON else blk.data[0][0], dtype=float
        )
        mp = G.wkt_loads(r["centroids_multipoint"])
        pts = np.asarray(mp.data, dtype=float).reshape(-1, 2)
        n = len({(float(x), float(y)) for x, y in pts})
        data.append((r["block_id"], int(r["complexity"]), ring, pts, n))
    return data


def score(data, kfn, label=""):
    fam = {}
    tot_e = tot_w = 0
    percase = {}
    for bid, want, ring, pts, n in data:
        got = kfn(ring, pts)
        key = "n1" if n == 1 else "n2" if n == 2 else "n3+" if n else "?"
        e, w, t = fam.get(key, (0, 0, 0))
        fam[key] = (e + (got == want), w + (abs(got - want) <= 1), t + 1)
        tot_e += got == want
        tot_w += abs(got - want) <= 1
        percase[bid] = (want, got, n)
    fams = "  ".join(f"{k}:{v[0]}/{v[2]}" for k, v in sorted(fam.items()))
    print(f"{label}: exact {tot_e}/196 within1 {tot_w}  [{fams}]", flush=True)
    return percase


if __name__ == "__main__":
    data = load()
    score(data, P.block_complexity, "current")
