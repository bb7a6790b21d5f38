"""Kernel-level DJI golden replay: run block_complexity on the golden CSV's
own (block geometry, centroids_multipoint) rows and report exact / ±1
parity. This isolates the Voronoi/s0 backend from the centroid-definition
and PIP plumbing (which the Spark-level test covers).

Usage: python tools/dji_kernel_replay.py [--dump mismatches.csv]
"""

import csv
import sys

import numpy as np

sys.path.insert(0, ".")
csv.field_size_limit(sys.maxsize)

from prclz_spark import geom as G  # noqa: E402
from prclz_spark.kernels import planar as P  # noqa: E402

GOLDEN = "/root/reference/example_data/complexity/Africa/DJI/complexity_DJI.1.1_1.csv"


def main():
    rows = list(csv.DictReader(open(GOLDEN)))
    exact = within1 = total = 0
    deltas = []
    for r in rows:
        blk = G.wkt_loads(r["geometry"])
        ring = blk.data[0] if blk.kind == G.POLYGON else blk.data[0][0]
        mp = G.wkt_loads(r["centroids_multipoint"])
        pts = np.asarray(mp.data, dtype=np.float64).reshape(-1, 2)
        want = int(r["complexity"])
        got = P.block_complexity(np.asarray(ring, dtype=np.float64), pts)
        dk = got - want
        total += 1
        exact += dk == 0
        within1 += abs(dk) <= 1
        deltas.append((r["block_id"], want, got, dk, len(pts)))
    print(f"exact {exact}/{total}  within1 {within1}/{total}")
    if "--dump" in sys.argv:
        import collections

        hist = collections.Counter(d[3] for d in deltas)
        print("delta histogram:", dict(sorted(hist.items())))
        bad = [d for d in deltas if d[3] != 0]
        bad.sort(key=lambda d: (abs(d[3]), d[4]))
        for b in bad[:40]:
            print(b)


if __name__ == "__main__":
    main()
