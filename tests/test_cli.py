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


def test_cli_dedup_batch(spark, tmp_path):
    """The daily incremental-dedup loop as a product surface: day 0 seeds
    the signature table; day 1's batch (fresh docs + planted twins of the
    corpus) is deduped against the persisted snapshot, survivors appended,
    verdicts written."""
    from pyspark.sql import functions as F

    from prclz_spark import cli
    from prclz_spark.sources import iceberg_lite as IL

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    d.filter(F.col("doc_id") < 100).write.parquet(str(tmp_path / "day0.pq"))
    fresh = d.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 140))
    twins = d.filter((F.col("doc_id") < 100) & (F.col("doc_id") % 5 == 0)).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.expr("substring(text, 1, cast(length(text) * 0.95 as int))").alias("text"),
    )
    fresh.unionByName(twins).write.parquet(str(tmp_path / "day1.pq"))

    t = str(tmp_path / "sigs")
    cli.main(["dedup-batch", "--table", t, "--batch", str(tmp_path / "day0.pq")])
    assert IL.current_snapshot(t) == 0
    cli.main(["dedup-batch", "--table", t, "--batch", str(tmp_path / "day1.pq"),
              "--out", str(tmp_path / "verdicts")])
    assert IL.current_snapshot(t) == 1
    v = spark.read.parquet(str(tmp_path / "verdicts"))
    corpus_hits = {r.batch_id for r in v.filter(F.col("kind") == "corpus").collect()}
    assert {int(x) + 2_000_000 for x in range(0, 100, 5)} <= corpus_hits
    # no planted twin survived into the table
    sigs = {r.doc_id for r in IL.read(spark, t).select("doc_id").collect()}
    assert sigs.isdisjoint({int(x) + 2_000_000 for x in range(0, 100, 5)})


def test_cli_mix_and_pack(spark, tmp_path):
    from pyspark.sql import functions as F

    from prclz_spark import cli

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d.select("doc_id", "lang").write.parquet(str(tmp_path / "docs.pq"))
    cli.main(["mix", "--docs", str(tmp_path / "docs.pq"),
              "--quota", "en=20", "--quota", "fr=8",
              "--out", str(tmp_path / "mixed.pq")])
    m = spark.read.parquet(str(tmp_path / "mixed.pq"))
    got = {r.lang: r.n for r in m.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == {"en": 20, "fr": 8}

    d.select("doc_id", (F.length("text") / 4).cast("long").alias("n_tokens")).write.parquet(
        str(tmp_path / "toks.pq"))
    cli.main(["pack", "--docs", str(tmp_path / "toks.pq"), "--budget", "1024",
              "--buckets", "8", "--out", str(tmp_path / "packs.pq")])
    p = spark.read.parquet(str(tmp_path / "packs.pq"))
    assert p.agg(F.sum("n_docs")).first()[0] == d.count()
    assert p.filter((F.col("total_tokens") > 1024) & ~F.col("overflow")).count() == 0


def test_cli_textq(spark, tmp_path):
    from pyspark.sql import functions as F

    from prclz_spark import cli

    banner = "NAVIGATION MENU"
    docs = [(i, f"{banner}\ncontent {i} " + "w " * (i % 5)) for i in range(30)]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "docs.pq")
    )
    cli.main([
        "textq", "--docs", str(tmp_path / "docs.pq"),
        "--metrics-out", str(tmp_path / "metrics.pq"),
        "--strip-out", str(tmp_path / "clean.pq"),
        "--boilerplate-out", str(tmp_path / "hh.pq"),
        "--min-df", "20",
    ])
    m = spark.read.parquet(str(tmp_path / "metrics.pq"))
    assert m.count() == 30 and "dup_line_frac" in m.columns
    hh = spark.read.parquet(str(tmp_path / "hh.pq"))
    assert hh.count() == 1  # the banner
    clean = spark.read.parquet(str(tmp_path / "clean.pq"))
    assert clean.filter(F.col("text_clean").contains(banner)).count() == 0
    assert clean.agg(F.sum("n_lines_removed")).first()[0] == 30

    # against-corpus form: a fresh batch stripped with the persisted table
    spark.createDataFrame(
        [(100, f"{banner}\nfresh")], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "batch.pq"))
    cli.main([
        "textq", "--docs", str(tmp_path / "batch.pq"),
        "--boilerplate", str(tmp_path / "hh.pq"),
        "--strip-out", str(tmp_path / "clean2.pq"),
    ])
    c2 = spark.read.parquet(str(tmp_path / "clean2.pq"))
    assert c2.first()["text_clean"] == "fresh"


def test_cli_textq_corpus_table(spark, tmp_path):
    from pyspark.sql import functions as F

    from prclz_spark import cli

    banner = "SITE FOOTER"
    t = str(tmp_path / "bp_tbl")
    for day in range(2):
        spark.createDataFrame(
            [(day * 10 + i, f"{banner}\nday{day} {i}") for i in range(3)],
            "doc_id long, text string",
        ).write.mode("overwrite").parquet(str(tmp_path / f"day{day}.pq"))
        cli.main([
            "textq", "--docs", str(tmp_path / f"day{day}.pq"),
            "--corpus-table", t, "--min-df", "5",
            "--strip-out", str(tmp_path / f"clean{day}.pq"),
        ])
    # day 0: banner df=3 < 5 -> untouched; day 1: summed df=6 -> stripped
    c0 = spark.read.parquet(str(tmp_path / "clean0.pq"))
    assert c0.filter(F.col("text_clean").contains(banner)).count() == 3
    c1 = spark.read.parquet(str(tmp_path / "clean1.pq"))
    assert c1.filter(F.col("text_clean").contains(banner)).count() == 0


def test_cli_textq_corpus_table_with_boilerplate_out(spark, tmp_path):
    """--corpus-table alone is a valid run (the append-only daily loop),
    and --boilerplate-out persists the merged heavy-hitter view in every
    branch instead of being silently ignored."""
    from prclz_spark import cli

    spark.createDataFrame(
        [(i, "COMMON\nu %d" % i) for i in range(6)], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "d.pq"))
    t = str(tmp_path / "tbl")
    cli.main(["textq", "--docs", str(tmp_path / "d.pq"),
              "--corpus-table", t, "--min-df", "5"])  # append-only: no p.error
    cli.main(["textq", "--docs", str(tmp_path / "d.pq"),
              "--corpus-table", t, "--min-df", "5",
              "--boilerplate-out", str(tmp_path / "hh.pq")])
    hh = spark.read.parquet(str(tmp_path / "hh.pq"))
    assert hh.count() == 1 and hh.first()["df"] == 12  # merged over 2 appends


def test_cli_textq_verdicts(spark, tmp_path):
    from pyspark.sql import functions as F

    from prclz_spark import cli

    good = " ".join(f"w{i}" for i in range(80))
    docs = [(0, good), (1, "spam " * 200), (2, "tiny")]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "d.pq")
    )
    cli.main(["textq", "--docs", str(tmp_path / "d.pq"),
              "--verdicts-out", str(tmp_path / "v.pq")])
    v = {r["doc_id"]: r.asDict()
         for r in spark.read.parquet(str(tmp_path / "v.pq")).collect()}
    assert v[0]["keep"] and not v[1]["keep"] and not v[2]["keep"]
    assert "min_words" in v[2]["reasons"]
