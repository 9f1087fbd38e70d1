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


@pytest.mark.parametrize("fragsize", [0, 30])
def test_phrase_highlighter_engine_matches_twin(docs, fragsize):
    """round-5f hl.usePhraseHighlighter: engine == twin with phrase
    spans on every corpus doc (bare terms + an exact phrase mixed)."""
    phrases = [("merge", "window")]
    rows = highlight_fragments(
        docs, ["rank"], phrases=phrases, fragsize=fragsize, snippets=3
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["snippet_rank"], r["snippet"])
        )
    for did in got:
        got[did] = [s for _, s in sorted(got[did])]
    want = {
        i: hl
        for i, t in enumerate(TEXTS)
        if (hl := highlight_text(t, ["rank"], phrases=phrases,
                                 fragsize=fragsize, snippets=3))
    }
    assert got == want


def test_phrase_highlighter_spans_only(docs):
    """The discriminating rule: the phrase ("merge", "window") tags ONLY
    adjacent occurrences — doc 0 (merge without window) and doc 1
    (window without merge) get nothing; docs 3 and 5 contain the
    adjacent pair and tag exactly it, leaving the other
    merges/windows untagged."""
    rows = highlight_fragments(
        docs, [], phrases=[("merge", "window")], fragsize=0, snippets=1
    ).collect()
    got = {r["doc_id"]: r["snippet"] for r in rows}
    assert set(got) == {3, 5}
    assert got[3] == (
        "the <em>merge</em> <em>window</em> closes after the last late "
        "row arrives in the merge"
    )
    assert got[5] == (
        "merge merge <em>merge</em> <em>window</em> window tiny"
    )
    # twin agrees
    assert highlight_text(TEXTS[5], [], phrases=[("merge", "window")],
                          fragsize=0) == [got[5]]
    # repeated-phrase doc: both occurrences tagged when adjacent
    import pyspark.sql.functions as F  # noqa: F401
    two = docs.sparkSession.createDataFrame(
        [(0, "a merge window b merge window c")], "doc_id long, text string"
    )
    out = highlight_fragments(
        two, [], phrases=[("merge", "window")], fragsize=0
    ).collect()
    assert out[0]["snippet"] == (
        "a <em>merge</em> <em>window</em> b <em>merge</em> "
        "<em>window</em> c"
    )


def test_phrase_highlighter_select_section(spark):
    """select(hl=True) on a phrase query: with the default
    usePhraseHighlighter only span occurrences are tagged; flipping it
    off restores term tagging (Solr's pre-flag behavior)."""
    from parser_indexer_py_spark.datagen import generate_transcripts
    from parser_indexer_py_spark.index.boolean import select
    from parser_indexer_py_spark.index.build import build_index
    from parser_indexer_py_spark.index.search import load_index
    import tempfile

    out = tempfile.mkdtemp(prefix="hlp_idx_")
    build_index(
        spark, generate_transcripts(spark, 60, partitions=2), out,
        n_buckets=8, salt=4, n_chunks=1, positions=True,
    )
    idx = load_index(spark, out)
    # find a phrase that actually occurs: take two adjacent tokens of
    # some doc
    txt = idx.docmap.select("text").first()["text"].split()
    w1, w2 = txt[0], txt[1]
    q = f'"{w1} {w2}"'
    on = select(idx, q, rows=3, hl=True)["highlighting"].collect()
    off = select(
        idx, q, rows=3, hl=True, hl_use_phrase_highlighter=False
    )["highlighting"].collect()
    assert on and off
    joined_on = " ".join(s for r in on for s in r["snippets"])
    joined_off = " ".join(s for r in off for s in r["snippets"])
    # span tagging never tags MORE tokens than term tagging
    assert joined_on.count("<em>") <= joined_off.count("<em>")
    assert "<em>" in joined_on


def test_sloppy_phrase_spans(docs, spark):
    """round-5h: slop>0 phrases highlight their actual ordered-window
    occurrences (the shared greedy matcher), not every term occurrence.
    'merge ... window' with slop 2 matches in doc 3 ('merge window' at
    distance 0) and in 'merge the big window' (stretch 2), but NOT when
    the gap exceeds the slop or order is reversed."""
    from parser_indexer_py_spark.index.highlight import (
        _sloppy_span_positions,
    )

    # shared-matcher unit: positions mirror sloppy_phrase_freq's window
    low = "a merge x y window b window merge c".split()
    assert _sloppy_span_positions(low, ["merge", "window"], 2) == {1, 4}
    assert _sloppy_span_positions(low, ["merge", "window"], 1) == set()
    # second (reversed) pair never matches the ordered matcher; the
    # greedy earliest-completion picks window@4 for merge@1
    assert _sloppy_span_positions(low, ["merge", "window"], 3) == {1, 4}

    two = spark.createDataFrame(
        [(0, " ".join(low)), (1, "window then merge only")],
        "doc_id long, text string",
    )
    rows = highlight_fragments(
        two, [], sloppy_phrases=[(("merge", "window"), 2)], fragsize=0
    ).collect()
    got = {r["doc_id"]: r["snippet"] for r in rows}
    assert set(got) == {0}
    assert got[0] == (
        "a <em>merge</em> x y <em>window</em> b window merge c"
    )
    # twin agrees
    assert highlight_text(
        " ".join(low), [], sloppy_phrases=[(("merge", "window"), 2)],
        fragsize=0,
    ) == [got[0]]


def test_sloppy_phrase_select_section(spark):
    """select(hl=True) on a slop query tags only window occurrences —
    strictly fewer tags than term mode, never zero when matches exist."""
    import tempfile

    from parser_indexer_py_spark.datagen import generate_transcripts
    from parser_indexer_py_spark.index.boolean import select
    from parser_indexer_py_spark.index.build import build_index
    from parser_indexer_py_spark.index.search import load_index

    out = tempfile.mkdtemp(prefix="hls_idx_")
    build_index(
        spark, generate_transcripts(spark, 60, partitions=2), out,
        n_buckets=8, salt=4, n_chunks=1, positions=True,
    )
    idx = load_index(spark, out)
    txt = idx.docmap.select("text").first()["text"].split()
    w1, w3 = txt[0], txt[2]
    q = f'"{w1} {w3}"~1'
    on = select(idx, q, rows=3, hl=True)["highlighting"].collect()
    off = select(
        idx, q, rows=3, hl=True, hl_use_phrase_highlighter=False
    )["highlighting"].collect()
    j_on = " ".join(s for r in on for s in r["snippets"])
    j_off = " ".join(s for r in off for s in r["snippets"])
    assert 0 < j_on.count("<em>") <= j_off.count("<em>")
