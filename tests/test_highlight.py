"""HighlightComponent twin tests — engine vs the pure-Python twin, the
fragment-boundary rule, and the highlighting() page section with the
alternateField fallback (solrconfig.xml:916-928, :1427-1530)."""

import pytest

from parser_indexer_py_spark.index.highlight import (
    highlight_fragments,
    highlight_text,
    highlighting,
)

TEXTS = [
    "merge sort beats bubble sort on big tables when the merge step streams",
    "window functions rank rows inside a window without a self join",
    "hash join small build side broadcast the dim table to every node",
    "the merge window closes after the last late row arrives in the merge",
    "plain words only no query terms at all in this one honest row",
    "merge merge merge window window tiny",
]
TERMS = ["merge", "window"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


@pytest.mark.parametrize("fragsize", [0, 30, 100])
@pytest.mark.parametrize("snippets", [1, 3])
def test_engine_matches_python_twin(docs, fragsize, snippets):
    rows = highlight_fragments(
        docs, TERMS, fragsize=fragsize, snippets=snippets
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append((r["snippet_rank"], r["snippet"]))
    for did in got:
        got[did] = [s for _, s in sorted(got[did])]
    want = {
        i: highlight_text(t, TERMS, fragsize=fragsize, snippets=snippets)
        for i, t in enumerate(TEXTS)
        if highlight_text(t, TERMS, fragsize=fragsize, snippets=snippets)
    }
    assert got == want


def test_fragment_rule_by_hand(spark):
    # tokens 'aa bb merge cc' -> offsets 0,3,6,12; fragsize=6 puts 'merge'
    # (offset 6) in fragment 1 with 'cc' (offset 12 -> frag 2)
    df = spark.createDataFrame([(0, "aa bb merge cc")], "doc_id long, text string")
    rows = highlight_fragments(df, ["merge"], fragsize=6).collect()
    assert len(rows) == 1
    assert rows[0]["snippet"] == "<em>merge</em>"
    # fragsize=0: the whole field is one fragment
    rows0 = highlight_fragments(df, ["merge"], fragsize=0).collect()
    assert rows0[0]["snippet"] == "aa bb <em>merge</em> cc"


def test_best_fragment_ordering(spark):
    # fragment with BOTH terms outranks a fragment with more matches of one
    text = "merge merge merge merge merge xx " + "yy " * 10 + "merge window zz"
    df = spark.createDataFrame([(0, text.strip())], "doc_id long, text string")
    rows = highlight_fragments(
        df, TERMS, fragsize=30, snippets=1
    ).collect()
    assert "<em>window</em>" in rows[0]["snippet"]


def test_no_match_docs_absent(docs):
    rows = highlight_fragments(docs, ["zzzznope"], fragsize=50).collect()
    assert rows == []


def test_contracts(docs):
    with pytest.raises(ValueError):
        highlight_fragments(docs, [])
    with pytest.raises(ValueError):
        highlight_fragments(docs, TERMS, fragsize=-1)
    with pytest.raises(ValueError):
        highlight_fragments(docs, TERMS, snippets=0)


def test_custom_tags_and_case(spark):
    df = spark.createDataFrame(
        [(0, "the Merge step and the MERGE step")], "doc_id long, text string"
    )
    rows = highlight_fragments(
        df, ["merge"], fragsize=0, pre="<b>", post="</b>"
    ).collect()
    assert rows[0]["snippet"] == "the <b>Merge</b> step and the <b>MERGE</b> step"


class _FakeIndex:
    def __init__(self, docmap):
        self.docmap = docmap


def test_highlighting_section_with_alternate(spark, docs):
    index = _FakeIndex(docs)
    page = docs.select("doc_id")  # every doc on the "page"
    out = highlighting(
        index, page, TERMS, fragsize=0, snippets=1, alternate=True,
        max_alternate=10,
    ).collect()
    by_id = {r["doc_id"]: r["snippets"] for r in out}
    assert len(by_id) == len(TEXTS)
    assert "<em>merge</em>" in by_id[0][0]
    # doc 4 has no query term: untagged fallback truncated to 10 chars
    assert by_id[4] == [TEXTS[4][:10]]
    # without alternate: empty list for the no-match doc
    out2 = highlighting(index, page, TERMS, fragsize=0, alternate=False).collect()
    by_id2 = {r["doc_id"]: r["snippets"] for r in out2}
    assert by_id2[4] == []
    assert "<em>" in by_id2[0][0]
