"""THE REFERENCE QUERY SET, replayed end-to-end.

The reference documents its entire user-facing query surface as a list of
sample queries (docs/mte-samplequeries.md): structured field queries over
a parent/child (document/annotation) corpus, nested-children projection,
single-doc fetch, child filters, /suggest completion, annotation-type and
annotation-name facets, a free-text ``fq``, and delete-by-query ``*:*``.
This module replays EVERY query in that document against this engine and
checks each result against an independent pandas oracle computed from the
same synthetic rows — the "reference query set" gate.

The reference corpus is Solr block-join documents (parent ``type:doc``
with nested annotation children carrying ``source``/``type``/``name`` and
``_depth``). This engine's document model is the transcript table, so the
MTE shape maps onto it field-for-field (the same flattened block-join
layout operators/enrich.py documents — parents and children share a
block key, children are ordinal rows under it):

    MTE field          transcript column
    ---------          -----------------
    id                 conv_id           ("doc-NNNN")
    _depth:0 / 1       turn_idx == 0 / >= 1
    type (doc/ann)     tool              (parent rows: "doc")
    source             role              (parent rows: "doc")
    name / content     text              (child rows hold the ann name)

Queries replayed (docs/mte-samplequeries.md, top to bottom):

  1.  ``q=type:doc``                          -> select(q="tool:doc")
  2.  ``fl=*,[child limit=10000]``            -> block-join child collect
  3.  ``... fq=id:1249``                      -> fq='conv_id:"doc-0012"'
  4.  ``childFilter=source:corenlp``          -> child query + conv fq
  5.  ``childFilter="source:corenlp AND type:target"``
  6.  ``/suggest?q=wind``                     -> components.suggest
  7.  ``q=_depth:1&facet.field=type``         -> facet over tool
  8.  ``q=_depth:1 AND source:corenlp`` + facet.limit=5
  9.  ``... AND type:target&facet.field=name`` -> facet over child text
  10. ``q=type:doc&fq=Manganese``             -> free-text fq semi-join
  11. delete ``<query>*:*</query>``           -> catalog.delete_all
"""

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parser_indexer_py_spark.index.boolean import select
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.search import load_index

NAMES = [
    "windjana", "windjanas", "windy", "stephen", "cumberland",
    "dillinger", "darwin",
]
ANN_TYPES = ["element", "mineral", "target", "contains", "shows"]
SOURCES = ["corenlp", "brat"]
N_PARENTS = 40
TS0 = datetime.datetime(2024, 1, 1)


def _rows():
    """Deterministic MTE-shaped corpus in the transcript schema."""
    rows = []
    for i in range(N_PARENTS):
        content = f"mars rover report r{i} sample analysis " + (
            "manganese oxide detected" if i % 4 == 0
            else "basalt texture observed"
        )
        conv = f"doc-{i:04d}"
        rows.append((conv, 0, "doc", content, "doc", TS0))
        for j in range(2 + i % 4):
            rows.append(
                (
                    conv,
                    j + 1,
                    SOURCES[(i + j) % len(SOURCES)],
                    NAMES[(i + 2 * j) % len(NAMES)],
                    ANN_TYPES[(i * 3 + j) % len(ANN_TYPES)],
                    TS0 + datetime.timedelta(minutes=j + 1),
                )
            )
    return rows


COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


@pytest.fixture(scope="module")
def mte(spark, tmp_path_factory):
    df = spark.createDataFrame(
        _rows(),
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = str(tmp_path_factory.mktemp("mte_idx"))
    build_index(spark, df, out, n_partitions=4, n_chunks=1)
    idx = load_index(spark, out)
    oracle = pd.DataFrame(_rows(), columns=COLS)
    return idx, oracle


def _facet_oracle(sub: pd.DataFrame, col: str, limit: int):
    """Solr facet.field ordering: count desc, value asc, top limit."""
    c = sub[col].value_counts()
    rows = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]
    return [(v, int(n)) for v, n in rows]


def _facet_rows(facets, col):
    return [(r[col], r["n"]) for r in facets.collect()]


# -- 1: q=type:doc -----------------------------------------------------------
def test_all_documents(mte):
    idx, p = mte
    resp = select(idx, q="tool:doc", rows=1000)["response"]
    got = resp.select("conv_id", "score").collect()
    assert {r["conv_id"] for r in got} == set(
        p[p.turn_idx == 0].conv_id
    )
    # pure-filter q is Solr's *:* rewrite: constant score
    assert {r["score"] for r in got} == {1.0}


# -- 2: all documents with all annotations nested ---------------------------
def test_nested_children_projection(mte):
    idx, p = mte
    parents = select(idx, q="tool:doc", rows=1000)["response"]
    children = idx.docmap.filter(F.col("turn_idx") > 0)
    nested = parents.select("conv_id").join(
        children.groupBy("conv_id").agg(
            F.sort_array(
                F.collect_list(F.struct("turn_idx", "role", "tool", "text"))
            ).alias("anns")
        ),
        "conv_id",
        "left",
    )
    got = {
        r["conv_id"]: [(a["turn_idx"], a["role"], a["tool"], a["text"])
                       for a in (r["anns"] or [])]
        for r in nested.collect()
    }
    kids = p[p.turn_idx > 0].sort_values(["conv_id", "turn_idx"])
    exp = {
        conv: list(g[["turn_idx", "role", "tool", "text"]].itertuples(
            index=False, name=None
        ))
        for conv, g in kids.groupby("conv_id")
    }
    assert len(got) == N_PARENTS
    for conv in got:
        assert got[conv] == exp.get(conv, []), conv


# -- 3: single document, all details (fq=id:1249) ---------------------------
def test_single_document_fetch(mte):
    idx, _ = mte
    r = select(idx, q="tool:doc", fq='conv_id:"doc-0012"', rows=10)[
        "response"
    ].collect()
    assert [x["conv_id"] for x in r] == ["doc-0012"]
    assert r[0]["turn_idx"] == 0


# -- 4/5: child filters for one document ------------------------------------
def test_child_filter_source(mte):
    idx, p = mte
    r = select(
        idx,
        q="turn_idx:[1 TO 999] AND role:corenlp",
        fq='conv_id:"doc-0012"',
        rows=100,
    )["response"].collect()
    exp = p[(p.conv_id == "doc-0012") & (p.turn_idx > 0)
            & (p.role == "corenlp")]
    assert sorted(x["turn_idx"] for x in r) == sorted(exp.turn_idx)


def test_child_filter_source_and_type(mte):
    idx, p = mte
    r = select(
        idx,
        q="turn_idx:[1 TO 999] AND role:corenlp AND tool:target",
        rows=1000,
    )["response"].collect()
    exp = p[(p.turn_idx > 0) & (p.role == "corenlp") & (p.tool == "target")]
    assert sorted((x["conv_id"], x["turn_idx"]) for x in r) == sorted(
        zip(exp.conv_id, exp.turn_idx)
    )


# -- 6: /suggest?q=wind ------------------------------------------------------
def test_suggest_wind(mte):
    from parser_indexer_py_spark.index.components import suggest

    idx, p = mte
    names = idx.docmap.filter(F.col("turn_idx") > 0).select("text")
    got = [
        (r["suggestion"], r["weight"])
        for r in suggest(names, "wind", count=5).collect()
    ]

    # mini FuzzyLookup oracle (defaults: maxEdits=1, nonFuzzyPrefix=1):
    # some prefix of the name within 1 edit of "wind", first char exact
    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def matches(an):
        if an[:1] != "w":
            return False
        rem = an[1:]
        return any(lev(rem[:L], "ind") <= 1 for L in range(len(rem) + 1))

    exp = sorted(
        {n for n in p[p.turn_idx > 0].text.unique() if matches(n)}
    )[:5]
    # DocumentDictionary weights default to 0 -> ordered suggestion asc,
    # exactly the reference response shape (weight: 0 for every row)
    assert got == [(n, 0) for n in exp]
    assert "windjana" in exp and "windjanas" in exp


# -- 7/8/9: annotation facets ------------------------------------------------
def test_facet_annotation_types(mte):
    idx, p = mte
    facets = select(
        idx, q="turn_idx:[1 TO 999]", rows=0, facet_field="tool",
        facet_limit=10,
    )["facets"]
    exp = _facet_oracle(p[p.turn_idx > 0], "tool", 10)
    assert _facet_rows(facets, "tool") == exp


def test_facet_types_corenlp_only(mte):
    idx, p = mte
    facets = select(
        idx,
        q="turn_idx:[1 TO 999] AND role:corenlp",
        rows=0,
        facet_field="tool",
        facet_limit=5,
    )["facets"]
    exp = _facet_oracle(
        p[(p.turn_idx > 0) & (p.role == "corenlp")], "tool", 5
    )
    assert _facet_rows(facets, "tool") == exp


def test_facet_target_names(mte):
    idx, p = mte
    facets = select(
        idx,
        q="turn_idx:[1 TO 999] AND role:corenlp AND tool:target",
        rows=0,
        facet_field="text",
        facet_limit=5,
    )["facets"]
    exp = _facet_oracle(
        p[(p.turn_idx > 0) & (p.role == "corenlp") & (p.tool == "target")],
        "text",
        5,
    )
    assert _facet_rows(facets, "text") == exp


# -- 10: q=type:doc&fq=Manganese ---------------------------------------------
def test_free_text_fq(mte):
    idx, p = mte
    r = select(idx, q="tool:doc", fq="Manganese", rows=1000)[
        "response"
    ].collect()
    exp = p[(p.turn_idx == 0) & p.text.str.contains("manganese")]
    assert sorted(x["conv_id"] for x in r) == sorted(exp.conv_id)
    assert len(r) == N_PARENTS // 4


# -- 11: delete-by-query *:* -------------------------------------------------
def test_delete_all(mte, spark, tmp_path_factory):
    from parser_indexer_py_spark.catalog import TableCatalog

    _, p = mte
    cat = TableCatalog(spark, str(tmp_path_factory.mktemp("mte_cat")))
    df = spark.createDataFrame(
        _rows(),
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    cat.append(df, "docs")
    assert cat.read("docs").count() == len(p)
    cat.delete_all("docs")
    emptied = cat.read("docs")
    assert emptied.count() == 0
    # schema survives truncation (an empty read is still queryable)
    assert set(COLS) <= set(emptied.columns)
