"""The north-rule deployment path, actually driven: zip the package, run a
real `spark-submit --py-files prclz_spark.zip` subprocess, and check the
engine answers through it (executors must import the package FROM THE ZIP
— the path that breaks on stray absolute imports or package data)."""

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
from pyspark.sql import SparkSession
spark = SparkSession.builder.getOrCreate()
from prclz_spark import geom as G
from prclz_spark.operators.sjoin import pip_join
pts = spark.createDataFrame(
    [(i, 10.0 + (i % 60) * 1e-3, 10.0 + (i % 60) * 1e-3) for i in range(500)],
    "pid long, x double, y double",
)
boxes = spark.createDataFrame(
    [(0, G.wkb_dumps(G.box(10.0, 10.0, 10.03, 10.03))),
     (1, G.wkb_dumps(G.box(10.03, 10.03, 10.06, 10.06)))],
    "gid long, geometry binary",
)
out = pip_join(pts, boxes, "pid", "gid", res=14, how="inner")
counts = {r.gid: r.c for r in
          out.groupBy("gid").count().withColumnRenamed("count", "c").collect()}
print("SUBMIT_PROBE_RESULT", sorted(counts.items()))
spark.stop()
"""


def test_spark_submit_pyfiles_zip(tmp_path):
    import pyspark

    zpath = str(tmp_path / "prclz_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "prclz_spark")):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    probe = tmp_path / "probe.py"
    probe.write_text(_PROBE)
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    res = subprocess.run(
        [submit, "--master", "local[4]", "--py-files", zpath, str(probe)],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path), env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("SUBMIT_PROBE_RESULT")]
    # the (10.03, 10.03) corner points sit on BOTH boxes (closed PIP):
    # 60-cycle → ids 30 and 90·k give 9 corner points in box0's run, 8 in 1
    assert line and line[0] == "SUBMIT_PROBE_RESULT [(0, 268), (1, 240)]", (
        line, res.stdout[-500:]
    )
