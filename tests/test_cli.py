"""CLI smoke: blocks + complexity subcommands over fixture files."""

import sys
from pathlib import Path

from prclz_spark import fixtures as FX


def test_cli_blocks_and_complexity(spark, tmp_path, monkeypatch):
    # stage fixture inputs as parquet files
    lines, gadm, bldgs = FX.geo_world(spark, 3, 3)
    lines.write.mode("overwrite").parquet(str(tmp_path / "lines.pq"))
    gadm.write.mode("overwrite").parquet(str(tmp_path / "gadm.pq"))
    bldgs.write.mode("overwrite").parquet(str(tmp_path / "bldgs.pq"))

    import prclz_spark.cli as cli

    # run within the existing test session (get_spark returns the active one)
    cli.main(
        [
            "blocks",
            "--lines", str(tmp_path / "lines.pq"),
            "--gadm", str(tmp_path / "gadm.pq"),
            "--out", str(tmp_path / "blocks.pq"),
        ]
    )
    blocks = spark.read.parquet(str(tmp_path / "blocks.pq"))
    assert blocks.count() >= 9

    cli.main(
        [
            "--format", "csv",
            "complexity",
            "--blocks", str(tmp_path / "blocks.pq"),
            "--buildings", str(tmp_path / "bldgs.pq"),
            "--out", str(tmp_path / "cplx.pq"),
        ]
    )
    out = spark.read.option("header", "true").csv(str(tmp_path / "cplx.pq"))
    assert out.count() > 0
    assert "complexity" in out.columns


def test_cli_ingest_images(spark, tmp_path):
    from prclz_spark import cli
    from prclz_spark.sources import iceberg_lite as IL

    t = str(tmp_path / "imgtbl")
    cli.main(["ingest-images", "--table", t, "--n", "16"])
    cli.main(["ingest-images", "--table", t, "--n", "8"])
    assert IL.current_snapshot(t) == 1
    assert IL.read(spark, t).count() == 24
    assert IL.read(spark, t, snapshot=0).count() == 16
