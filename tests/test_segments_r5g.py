"""Segments parity for the round-5f/g surfaces: date-math ranges,
date facet.range, and bf/bq/function boosts must behave identically over
a federated MergedSegmentsView (from_roots) and a monolithic index on
the same corpus — the duck-typing invariant every other surface already
keeps (test_streaming.py)."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F  # noqa: F401

from parser_indexer_py_spark.datagen import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts_pandas,
)
from parser_indexer_py_spark.index.boolean import boolean_search, select
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.search import load_index
from parser_indexer_py_spark.streaming.merged import MergedSegmentsView

NOW = datetime(2026, 8, 18, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    pdf = generate_transcripts_pandas(50)
    conv_num = pdf["conv_id"].str[5:].astype(int)
    roots = []
    for i, keep in enumerate([conv_num < 25, conv_num >= 25]):
        out = str(tmp_path_factory.mktemp(f"seg{i}"))
        build_index(
            spark,
            spark.createDataFrame(pdf[keep], schema=TRANSCRIPT_SCHEMA),
            out, n_buckets=8, salt=2, n_chunks=1,
        )
        roots.append(out)
    mono_dir = str(tmp_path_factory.mktemp("mono"))
    build_index(
        spark, spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA),
        mono_dir, n_buckets=8, salt=2, n_chunks=1,
    )
    return (
        MergedSegmentsView.from_roots(spark, roots),
        load_index(spark, mono_dir),
    )


def _keyed(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in df.collect()
    )


def test_date_range_query_parity(pair):
    view, mono = pair
    q = "cedi ts:{NOW/YEAR-1YEAR+3MONTHS TO NOW-10MONTHS]"
    a = boolean_search(view, q, k=10**6, now=NOW)
    b = boolean_search(mono, q, k=10**6, now=NOW)
    ka, kb = _keyed(a), _keyed(b)
    assert ka == kb and ka


def test_date_facet_range_parity(pair):
    view, mono = pair
    kw = dict(
        rows=0,
        facet_range=("ts", "NOW/YEAR-1YEAR", "NOW/YEAR", "+3MONTHS"),
        now=NOW,
    )
    a = select(view, "cedi", **kw)["range_facets"].collect()
    b = select(mono, "cedi", **kw)["range_facets"].collect()
    assert [(r["bucket"], r["n"]) for r in a] == [
        (r["bucket"], r["n"]) for r in b
    ]
    assert sum(r["n"] for r in a) > 0


def test_boost_parity(pair):
    view, mono = pair
    kw = dict(
        k=25, now=NOW,
        boost_funcs="log(sum(turn_idx,1))",
        boost_queries="bace^2",
        multiplicative_boost="recip(ms(NOW,ts),1,86400000,86400000)",
    )
    a = boolean_search(view, "cedi", **kw)
    b = boolean_search(mono, "cedi", **kw)
    ka, kb = _keyed(a), _keyed(b)
    assert ka == kb and ka
