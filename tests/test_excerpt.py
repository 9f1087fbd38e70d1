"""F11 excerpt extraction goldens (reference heuristic:
brat_ann_indexer.py:104-132) + Spark UDF == Python twin equality."""

import pandas as pd
import pytest

from parser_indexer_py_spark.functions.excerpt import (
    extract_excerpt,
    with_excerpts,
)

# (content, anchor substring, expected excerpt). Expectations encode the
# reference's exact behavior, including its quirks (the start heuristic
# walks back past abbreviation capitals; "wt."/"ig."/"(e"/".g" never end a
# sentence).
GOLDENS = [
    (
        "Intro words here. The Fe-rich mineral occurs at the site. Next one.",
        "mineral",
        "The Fe-rich mineral occurs at the site.",
    ),
    (
        # "wt." must not terminate the sentence
        "Samples contain 5 wt. percent olivine near Gale crater. Later text.",
        "olivine",
        "Samples contain 5 wt. percent olivine near Gale crater.",
    ),
    (
        # "Fig." pulls the start back (reference quirk); "(e.g." is skipped
        "See Fig. 3 for context. Pyroxene was detected (e.g. in rover data). End.",
        "Pyroxene",
        "See Fig. 3 for context. Pyroxene was detected (e.g. in rover data).",
    ),
    (
        # no capitals, no terminator: whole document
        "no capitals at all span here and no period ever",
        "span",
        "no capitals at all span here and no period ever",
    ),
    (
        # anchor at document start
        "Anchor at document start. Rest.",
        "Anchor",
        "Anchor at document start.",
    ),
]


@pytest.mark.parametrize("content,anchor,want", GOLDENS)
def test_excerpt_goldens(content, anchor, want):
    s = content.index(anchor)
    assert extract_excerpt(content, s, s + len(anchor)) == want


def test_excerpt_udf_null_spans(spark):
    """Non-text-bound brat rows (E/R/A) carry NULL spans — the UDF must
    yield null excerpts for them, not crash on int(NaN)."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(text="Has a Span here. More.", span_start=6, span_end=10),
            Row(text="Relation row payload", span_start=None, span_end=None),
            Row(text=None, span_start=None, span_end=None),
        ]
    )
    rows = with_excerpts(df).collect()
    by_text = {r["text"]: r["excerpt"] for r in rows}
    assert by_text["Has a Span here. More."] == "Has a Span here."
    assert by_text["Relation row payload"] is None
    assert by_text[None] is None


def test_excerpt_udf_matches_twin(spark):
    rows = []
    for content, anchor, _ in GOLDENS:
        s = content.index(anchor)
        rows.append((content, s, s + len(anchor)))
    pdf = pd.DataFrame(rows, columns=["text", "span_start", "span_end"])
    df = with_excerpts(spark.createDataFrame(pdf))
    got = [r["excerpt"] for r in df.orderBy("span_start", "text").collect()]
    want_pdf = pdf.assign(
        excerpt=[
            extract_excerpt(c, s, e)
            for c, s, e in zip(pdf["text"], pdf["span_start"], pdf["span_end"])
        ]
    ).sort_values(["span_start", "text"])
    assert got == want_pdf["excerpt"].tolist()
