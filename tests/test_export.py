"""/export twin: the name-ordered concatenation of the written files must
replay the full match set in sort order (the 'one sorted stream'
contract), for parquet and jsonl, with the observed row count exact."""

import glob
import os

import pytest

from parser_indexer_py_spark.datagen import (
    generate_transcripts,
    generate_transcripts_pandas,
)
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.export import export_results
from parser_indexer_py_spark.index.oracle import BM25Oracle
from parser_indexer_py_spark.index.search import load_index

N_CONVS = 70


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_export"))
    df = generate_transcripts(spark, N_CONVS, partitions=3)
    build_index(spark, df, out, n_partitions=5, n_buckets=8, salt=2, n_chunks=1)
    return load_index(spark, out)


@pytest.fixture(scope="module")
def oracle(index):
    docmap = index.docmap.select("doc_id", "conv_id", "turn_idx").toPandas()
    pdf = generate_transcripts_pandas(N_CONVS)
    merged = pdf.merge(docmap, on=["conv_id", "turn_idx"], validate="1:1")
    return BM25Oracle.from_pandas(merged[["doc_id", "text", "role"]])


def _expected(index, oracle, term, keys):
    match = set(oracle.postings[term])
    meta = {
        r["doc_id"]: r
        for r in index.docmap.select(
            "doc_id", "conv_id", "turn_idx", "role", "ts"
        ).collect()
        if r["doc_id"] in match
    }
    return sorted(meta.values(), key=keys)


def _read_in_file_order(spark, path, fmt):
    pat = "part-*.parquet" if fmt == "parquet" else "part-*.json"
    rows = []
    for f in sorted(glob.glob(os.path.join(path, pat))):
        df = (
            spark.read.parquet(f) if fmt == "parquet" else spark.read.json(f)
        )
        rows += df.collect()
    return rows


@pytest.mark.parametrize("fmt", ["parquet", "jsonl"])
def test_export_is_one_sorted_stream(spark, index, oracle, fmt, tmp_path):
    term = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    out = str(tmp_path / f"exp_{fmt}")
    res = export_results(
        index, term, out, sort="turn_idx asc, conv_id desc", fmt=fmt
    )
    want = _expected(
        index, oracle, term,
        keys=lambda r: (r["turn_idx"], _neg_str(r["conv_id"]), r["doc_id"]),
    )
    assert res["rows"] == len(want)
    got = _read_in_file_order(spark, out, fmt)
    assert [int(r["doc_id"]) for r in got] == [r["doc_id"] for r in want]


class _neg_str(str):
    """Descending comparator for strings in a sort key tuple."""

    def __lt__(self, other):  # noqa: D105
        return str.__gt__(self, other)

    def __gt__(self, other):  # noqa: D105
        return str.__lt__(self, other)


def test_export_fl_and_contracts(index, tmp_path):
    with pytest.raises(ValueError):
        export_results(index, "bace", str(tmp_path / "x"), sort="score desc")
    with pytest.raises(ValueError):
        export_results(
            index, "bace", str(tmp_path / "x"), sort="ts asc", fmt="csvish"
        )
    with pytest.raises(ValueError):
        export_results(
            index, "bace", str(tmp_path / "x"), sort="ts asc", fl=["nope"]
        )
    out = str(tmp_path / "ok")
    res = export_results(
        index, "bace", out, sort="ts asc", fl=["doc_id", "ts"]
    )
    assert res["rows"] > 0
    # second write to the same path must refuse (errorifexists)
    with pytest.raises(Exception):
        export_results(index, "bace", out, sort="ts asc")
