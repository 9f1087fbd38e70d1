"""Analyzer goldens + three-way implementation equality.

Golden cases per FIXTURES.md §4: lowercase folding, unicode punctuation
translation (paper_parser.py:36-52), end-of-line dehyphenation
(paper_parser.py:54-59), digits/apostrophes/periods inside tokens
(StandardTokenizer UAX#29 behavior, managed-schema:541), empty stopword set
(stopwords.txt is comments-only).
"""

import pandas as pd
from pyspark.sql import functions as F

from parser_indexer_py_spark.functions.analyzer import (
    analyze_text,
    tokenize_udf,
    tokens_expr,
)

GOLDENS = [
    ("Hello World", ["hello", "world"]),
    ("Don’t “stop” now", ["don't", "stop", "now"]),
    ("state-of-the-art", ["state", "of", "the", "art"]),
    ("wrap-\nped line", ["wrapped", "line"]),
    ("U.S.A. costs $3.14!", ["u.s.a", "costs", "3.14"]),
    ("en–dash em—dash", ["en", "dash", "em", "dash"]),
    ("nb sp and • bullet", ["nb", "sp", "and", "bullet"]),
    ("ellipsis…here", ["ellipsis", "here"]),
    ("", []),
    ("   ", []),
    ("mixed CASE text", ["mixed", "case", "text"]),
    ("a_b under_score", ["a_b", "under_score"]),
    # reference-exact folds (paper_parser.py:36-52; ADVICE r1): bullets
    # fold to '.', which is kept INSIDE tokens; fullwidth comma and the
    # PUA degree sign split tokens
    ("a•b and c∙d", ["a.b", "and", "c.d"]),
    ("x，y", ["x", "y"]),
    ("5C warm", ["5", "c", "warm"]),
]


def test_python_goldens():
    for text, want in GOLDENS:
        assert analyze_text(text) == want, text


def test_none_and_stopwords():
    assert analyze_text(None) == []
    assert analyze_text("the cat", stopwords=frozenset({"the"})) == ["cat"]


def test_three_way_equality(spark, corpus_pdf):
    """JVM expression path == pandas-UDF path == pure-Python oracle,
    on goldens AND on a real slice of the synthetic corpus."""
    texts = [t for t, _ in GOLDENS] + corpus_pdf["text"].head(300).tolist()
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    out = df.select(
        tokens_expr(F.col("text")).alias("jvm"),
        tokenize_udf(F.col("text")).alias("udf"),
        "text",
    ).collect()
    for row in out:
        want = analyze_text(row["text"])
        assert row["jvm"] == want, row["text"]
        assert row["udf"] == want, row["text"]


def test_jvm_stopword_hook(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["the cat the hat"]}))
    got = df.select(tokens_expr(F.col("text"), stopwords=["the"]).alias("t")).head()
    assert got["t"] == ["cat", "hat"]


def test_synonym_hook_query_side_only(spark):
    """VERDICT r1 #5: SynonymFilter twin (managed-schema:548-553) — query
    analysis expands; index-side tokens_expr is untouched."""
    from parser_indexer_py_spark.functions.analyzer import (
        expand_synonyms,
        parse_synonyms,
    )

    syn = parse_synonyms(
        [
            "# comment",
            "",
            "GB,gib,gigabyte",          # group, expand=true
            "pixima => pixma",          # explicit mapping (LHS replaced)
            "a, b => x, y",             # multi-LHS mapping
        ]
    )
    # group: every member -> the whole group, ignoreCase via lowercasing
    assert syn["gb"] == ["gb", "gib", "gigabyte"]
    assert syn["gigabyte"] == ["gb", "gib", "gigabyte"]
    assert syn["pixima"] == ["pixma"]
    assert syn["a"] == ["x", "y"] and syn["b"] == ["x", "y"]
    # query side: analyze then expand
    toks = expand_synonyms(analyze_text("My Pixima has 4 GB"), syn)
    assert toks == ["my", "pixma", "has", "4", "gb", "gib", "gigabyte"]
    # default-empty hook: no map, no change
    assert expand_synonyms(["gb"], None) == ["gb"]
    # index side unchanged: tokens_expr has no synonym path
    df = spark.createDataFrame(pd.DataFrame({"text": ["Pixima GB"]}))
    got = df.select(tokens_expr(F.col("text")).alias("t")).head()
    assert got["t"] == ["pixima", "gb"]


def test_field_analysis_handler():
    """/analysis/field twin: stage-by-stage streams, offsets into the
    normalized text, stop gaps, query-side synonyms, showmatch markers."""
    from parser_indexer_py_spark.functions.analyzer import field_analysis

    syn = {"gb": ["gb", "gigabyte"]}
    r = field_analysis(
        "The Flat-\nScreen has 4 GB",
        stopwords=frozenset({"the", "has"}),
        synonyms=syn,
        query="THE GB",
    )
    idx = {s["stage"]: s for s in r["index"]}
    # normalize: fold + de-hyphenation join + lowercase
    assert idx["normalize"]["text"] == "the flatscreen has 4 gb"
    toks = idx["tokenize"]["tokens"]
    assert [t["text"] for t in toks] == ["the", "flatscreen", "has", "4", "gb"]
    # offsets recover the token from the normalized text
    norm = idx["normalize"]["text"]
    assert all(norm[t["start"]:t["end"]] == t["text"] for t in toks)
    assert [t["pos"] for t in toks] == [1, 2, 3, 4, 5]
    # stop: survivors keep their original positions (position gaps)
    stop = idx["stop"]["tokens"]
    assert [(t["text"], t["pos"]) for t in stop] == [
        ("flatscreen", 2), ("4", 4), ("gb", 5)
    ]
    # index chain has no synonym stage; query chain does
    assert "synonyms" not in idx
    q = {s["stage"]: s for s in r["query"]}
    qfinal = q["synonyms"]["tokens"]
    assert [t["text"] for t in qfinal] == ["gb", "gigabyte"]
    assert all(t["pos"] == 2 for t in qfinal)  # share the source position
    # showmatch: index tokens matching a FINAL query token are marked
    assert [t["text"] for t in stop if t["match"]] == ["gb"]
    assert all("match" not in t for t in q["tokenize"]["tokens"])
    # no query: query section absent, no match markers
    r2 = field_analysis("plain text")
    assert r2["query"] is None
    assert all(
        "match" not in t for t in r2["index"][1]["tokens"]
    )


def test_document_analysis_handler():
    from parser_indexer_py_spark.functions.analyzer import document_analysis

    docs = [
        {"id": "d1", "title": "Flat Screen", "text": "4 GB of RAM", "n": 7},
        {"id": "d2", "title": "Other"},
    ]
    r = document_analysis(docs, query="gb")
    assert set(r) == {"d1", "d2"}
    # string fields analyzed, non-strings and the uniqueKey skipped
    assert set(r["d1"]) == {"title", "text"}
    toks = {s["stage"]: s for s in r["d1"]["text"]["index"]}
    assert [t["text"] for t in toks["tokenize"]["tokens"]] == [
        "4", "gb", "of", "ram"
    ]
    assert [t["text"] for t in toks["stop"]["tokens"] if t["match"]] == ["gb"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing uniqueKey"):
        document_analysis([{"title": "x"}])
    with _pytest.raises(ValueError, match="duplicate"):
        document_analysis([{"id": "a"}, {"id": "a"}])
