"""F11: excerpt / sentence-boundary extraction around an annotation span.

Reimplements the reference heuristic exactly
(`src/parserindexer/brat_ann_indexer.py:104-132` extract_excerpt):

- sentence START: last capital letter before the span, backed up to the
  last period before THAT capital, then forward to the next capital;
- sentence END: first ``". "`` / ".\\n" after the span that is not part of
  the abbreviations "wt." / "ig." (Figure) / "(e" / ".g" (e.g.), else end
  of document.

Two surfaces:
- :func:`extract_excerpt` — pure-Python twin (the oracle, and usable on
  driver-side single documents);
- :func:`excerpt_udf` / :func:`with_excerpts` — the Arrow-batched pandas
  UDF for DataFrames of (content, span_start, span_end). The regex walk is
  per-row inside the batch (variable-length strings), but transfer is
  columnar Arrow and no row ever crosses the JVM/Python boundary alone —
  the same discipline as the analyzer's pandas twin.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CAP = re.compile(r"[A-Z]")
# fixed-width alternation lookbehind — same pattern string as the reference
_END = re.compile(r"(?<!(wt|ig|\(e|\.g))\.[ \n]")


def extract_excerpt(content: str, span_start: int, span_end: int) -> str:
    """Pure-Python twin of the reference heuristic (brat_ann_indexer.py:
    104-132) — identical control flow, Python-3 syntax."""
    anchor_start, anchor_end = span_start, span_end
    # Start: first capital letter after last period before last capital
    sent_start = 0
    caps = list(_CAP.finditer(content[:anchor_start]))
    if caps:
        sent_start = caps[-1].start()
    # Last preceding period
    sent_start = max(content[:sent_start].rfind("."), 0)
    # Next capital
    m = _CAP.search(content[sent_start:])
    if m:
        sent_start = sent_start + m.start()
    # End: next period followed by {space, newline}, or end of document,
    # skipping "wt.", "ig." (Figure), "(e" or ".g"
    m = _END.search(content[anchor_end:])
    if m is not None:
        sent_end = anchor_end + m.start() + 1
    else:
        sent_end = len(content)
    return content[sent_start:sent_end]


@F.pandas_udf(T.StringType())
def excerpt_udf(
    content: pd.Series, span_start: pd.Series, span_end: pd.Series
) -> pd.Series:
    """Arrow-batched excerpt extraction over (content, span_start,
    span_end) columns. Rows with a null span (e.g. non-text-bound brat
    kinds — E/R/A annotations carry no offsets, readers.py:76-77) yield a
    null excerpt instead of crashing on int(NaN)."""
    return pd.Series(
        [
            None
            if pd.isna(s) or pd.isna(e)
            else extract_excerpt(c if c is not None else "", int(s), int(e))
            for c, s, e in zip(content, span_start, span_end)
        ],
        index=content.index,
    )


def excerpt_for_terms_udf(terms: list[str]):
    """Excerpt around the FIRST occurrence of any query term (the search-
    results surface of F11: Solr-highlight-like snippets built on the same
    reference sentence heuristic). Case-insensitive term location; returns
    '' when no term occurs literally (e.g. matched via analysis folds)."""
    lows = sorted({t.lower() for t in terms})

    @F.pandas_udf(T.StringType())
    def udf(texts: pd.Series) -> pd.Series:
        out = []
        for c in texts:
            c = c or ""
            lc = c.lower()
            pos, ln = -1, 0
            for t in lows:
                p = lc.find(t)
                if p != -1 and (pos == -1 or p < pos):
                    pos, ln = p, len(t)
            out.append(extract_excerpt(c, pos, pos + ln) if pos != -1 else "")
        return pd.Series(out, index=texts.index)

    return udf


def with_excerpts(
    df: DataFrame,
    content_col: str | Column = "text",
    start_col: str | Column = "span_start",
    end_col: str | Column = "span_end",
    out_col: str = "excerpt",
) -> DataFrame:
    """Attach an ``excerpt`` column to an annotations DataFrame (the shape
    produced by the brat .ann source joined to its document text)."""
    return df.withColumn(
        out_col,
        excerpt_udf(
            F.col(content_col) if isinstance(content_col, str) else content_col,
            F.col(start_col) if isinstance(start_col, str) else start_col,
            F.col(end_col) if isinstance(end_col, str) else end_col,
        ),
    )
