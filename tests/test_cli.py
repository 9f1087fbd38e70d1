"""CLI smoke: the pipeline subcommands (sample / split / pack) run
parquet-to-parquet through ``cli.main`` and report faithful JSON; the
driver-side ``analyze`` subcommand needs no Spark session."""

import json

import pytest
from pyspark.sql import functions as F

from parser_indexer_py_spark.cli import main


@pytest.fixture(scope="module")
def src_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli_src") / "docs")
    spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 13 + 7, F.lit(90)) + 10).alias("n_chars"),
    ).write.parquet(p)
    return p


def _run(capsys, argv):
    assert main(argv) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_sample(src_parquet, tmp_path, capsys):
    out = str(tmp_path / "sampled")
    rep = _run(capsys, [
        "sample", "--input", src_parquet, "--out", out,
        "--id-col", "doc_id", "--fraction", "0.25",
    ])
    assert rep["of"] == 400 and 0.15 < rep["rows"] / 400 < 0.35


def test_cli_split(src_parquet, tmp_path, capsys):
    out = str(tmp_path / "splits")
    rep = _run(capsys, [
        "split", "--input", src_parquet, "--out", out,
        "--id-col", "doc_id", "--splits", "train=0.8,val=0.1,test=0.1",
    ])
    per = rep["per_split"]
    assert sum(per.values()) == 400 and per["train"] > per["val"]


def test_cli_pack(src_parquet, spark, tmp_path, capsys):
    out = str(tmp_path / "packed")
    rep = _run(capsys, [
        "pack", "--input", src_parquet, "--out", out,
        "--id-col", "doc_id", "--len-col", "n_chars", "--budget", "256",
    ])
    total = (
        spark.read.parquet(src_parquet)
        .agg(F.sum("n_chars").alias("s"))
        .collect()[0]["s"]
    )
    assert rep["rows"] == 400 and rep["stream_len"] == total
    assert rep["n_sequences"] == (total + 255) // 256


def test_cli_analyze(capsys):
    rep = _run(capsys, ["analyze", "--text", "Hello  World", "-q", "hello"])
    stages = [st["stage"] for st in rep["index"]]
    assert "tokenize" in stages and "normalize" in stages
    toks = next(
        st for st in rep["index"] if st["stage"] == "tokenize"
    )["tokens"]
    assert [(t["text"], t["match"]) for t in toks] == [
        ("hello", True), ("world", False),
    ]


def test_cli_mix(src_parquet, spark, tmp_path, capsys):
    # add a skewed group column derived from doc_id (300 "a" / 100 "b")
    src2 = str(tmp_path / "mix_src")
    spark.read.parquet(src_parquet).withColumn(
        "grp", F.when(F.col("doc_id") < 300, "a").otherwise("b")
    ).write.parquet(src2)
    out = str(tmp_path / "mixed")
    rep = _run(capsys, [
        "mix", "--input", src2, "--out", out,
        "--group-col", "grp", "--temperature", "2.0",
    ])
    # T=2: w=(sqrt300, sqrt100), b keeps rate 1.0, a downsamples
    assert rep["rates"]["b"]["rate"] == 1.0
    assert 0 < rep["rates"]["a"]["rate"] < 1.0
    assert rep["rows"] < rep["of"] == 400


def test_cli_components(spark, tmp_path, capsys):
    nodes = str(tmp_path / "nodes")
    edges = str(tmp_path / "edges")
    spark.range(0, 10).select(F.col("id").alias("doc_id")).write.parquet(nodes)
    spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "a long, b long"
    ).write.parquet(edges)
    out = str(tmp_path / "comp")
    rep = _run(capsys, [
        "components", "--nodes", nodes, "--edges", edges, "--out", out,
    ])
    assert rep["rows"] == 10 and rep["n_components"] == 7
