"""Build the optional C inner-loop module (kernels/planar_fast.c).

Usage: python tools/build_native.py

Flags matter for bit-exactness (see the .c header): -ffp-contract=off
forbids FMA contraction (a fused a*x+b*y rounds differently from the
Python expression) and no -ffast-math variant is ever passed. The .so is
committed so a fresh checkout needs no build step; this script rebuilds
it after editing the C source. planar.py falls back to the pure-Python
loops whenever the import fails, so a missing/incompatible .so can only
cost speed, never correctness.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

HERE = os.path.dirname(os.path.abspath(__file__))
KDIR = os.path.join(HERE, "..", "prclz_spark", "kernels")
SRC = os.path.join(KDIR, "planar_fast.c")


def main() -> int:
    inc = sysconfig.get_paths()["include"]
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(KDIR, f"planar_fast{suffix}")
    cmd = [
        "cc", "-shared", "-fPIC", "-O2",
        "-ffp-contract=off",  # no FMA: keep IEEE op-for-op parity with Python
        f"-I{inc}", SRC, "-o", out,
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    # smoke-test the artifact in-process
    sys.path.insert(0, os.path.join(HERE, ".."))
    from prclz_spark.kernels import planar_fast  # noqa: F401

    r = planar_fast.clip_list([0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0],
                              1.0, 0.0, 0.5, 1e-12, 0, 0.0, 0.0)
    assert r is not None and len(r) == 3, r
    print(f"built + smoke-tested {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
