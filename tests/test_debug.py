"""DebugComponent twin (``debugQuery=true``): per-(doc, term) BM25
Explanation rows must be bit-identical (pre-rounding, so compared at the
same 6-decimal display precision) to a pure-Python oracle breakdown, and
the per-doc contrib sum must reproduce the search() score exactly."""

import pytest

from parser_indexer_py_spark.datagen import (
    generate_transcripts,
    generate_transcripts_pandas,
)
from parser_indexer_py_spark.functions.analyzer import analyze_text
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.debug import explain
from parser_indexer_py_spark.index.oracle import BM25Oracle
from parser_indexer_py_spark.index.scoring import bm25_contrib, bm25_idf
from parser_indexer_py_spark.index.search import load_index, search

N_CONVS = 90


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_debug"))
    df = generate_transcripts(spark, N_CONVS, partitions=4)
    build_index(spark, df, out, n_partitions=6, n_buckets=8, salt=2, n_chunks=1)
    return load_index(spark, out)


@pytest.fixture(scope="module")
def oracle(index):
    docmap = index.docmap.select("doc_id", "conv_id", "turn_idx").toPandas()
    pdf = generate_transcripts_pandas(N_CONVS)
    merged = pdf.merge(docmap, on=["conv_id", "turn_idx"], validate="1:1")
    merged["role_x"] = merged["role"]
    return BM25Oracle.from_pandas(
        merged[["doc_id", "text", "role"]]
    )


def _oracle_explain(oracle: BM25Oracle, query: str, k: int):
    """Driver twin: the same flattened Explanation rows."""
    terms = sorted(set(analyze_text(query)))
    top = oracle.search(query, k=k)
    keep = {d for d, _ in top}
    score = dict(top)
    rows = []
    for t in terms:
        pl = oracle.postings.get(t)
        if not pl:
            continue
        idf = bm25_idf(len(pl), oracle.n_docs)
        for d, tf in pl.items():
            if d not in keep:
                continue
            contrib = bm25_contrib(
                float(tf), float(oracle.dl[d]), idf, oracle.avgdl
            )
            rows.append(
                (
                    d,
                    t,
                    tf,
                    len(pl),
                    round(idf, 6),
                    round(contrib, 6),
                    round(score[d], 6),
                )
            )
    rows.sort(key=lambda r: (-r[6], r[0], r[1]))
    return rows


@pytest.mark.parametrize("query", ["bace", "bace cedi", "bace cedi wedi rikizudi"])
def test_explain_matches_oracle(index, oracle, query):
    got = [
        (r.doc_id, r.term, r.tf, r.df, r.idf, r.contrib, r.score)
        for r in explain(index, query, k=10).collect()
    ]
    want = _oracle_explain(oracle, query, k=10)
    # same multiset of rows; within equal-score docs the engine's global
    # orderBy and the twin's sort agree because the tiebreak is (doc, term)
    assert got == want


def test_explain_rows_sum_to_search_score(index):
    q = "bace cedi"
    page = {r.doc_id: r.score for r in search(index, q, k=10, with_meta=False).collect()}
    df = explain(index, q, k=10).toPandas()
    assert set(df.doc_id) == set(page)
    for d, grp in df.groupby("doc_id"):
        # explanation rows must sum back to the root score they explain
        assert abs(grp.contrib.sum() - page[d]) < 1e-6
        assert (grp.score == round(page[d], 6)).all()


def test_explain_empty_query_raises(index):
    with pytest.raises(ValueError):
        explain(index, "  !!  ", k=5)


def test_explain_no_hits_returns_empty(index):
    out = explain(index, "zzzzunseenterm", k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "term", "tf", "df", "idf", "contrib", "score",
    ]
