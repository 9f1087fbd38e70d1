"""Property-based tests of the posting encode/merge pipeline as pure
functions (no Spark session — fast hypothesis iteration):

decode(merge(encode(postings))) == postings, df/cf correct, blocks sorted,
and block_max_score is a TRUE upper bound of every contribution in the
block (the WAND-soundness invariant, SURVEY.md §7.2)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from parser_indexer_py_spark.functions.varint import decode_deltas, decode_varint
from parser_indexer_py_spark.index.build import (
    _encode_partials_batch,
    _make_merge,
    term_bucket,
)
from parser_indexer_py_spark.index.scoring import bm25_contrib, bm25_idf


@st.composite
def postings_frame(draw):
    n_terms = draw(st.integers(1, 8))
    rows = []
    for t in range(n_terms):
        term = f"term{t:02d}"
        docs = draw(
            st.lists(
                st.integers(0, 5000), min_size=1, max_size=300, unique=True
            )
        )
        for d in docs:
            rows.append(
                (term, d, draw(st.integers(1, 50)), draw(st.integers(1, 200)))
            )
    pdf = pd.DataFrame(rows, columns=["term", "doc_id", "tf", "dl"])
    return pdf


@given(postings_frame(), st.integers(1, 6))
@settings(max_examples=40, deadline=None)
def test_encode_merge_roundtrip(pdf, salt):
    n_docs = 10_000
    avgdl = 37.5
    pdf = pdf.copy()
    pdf["salt"] = pdf["doc_id"] % salt
    pdf = pdf.sort_values(["term", "salt", "doc_id"]).reset_index(drop=True)
    partials = _encode_partials_batch(pdf)
    partials = partials.sort_values("term").reset_index(drop=True)
    merge = _make_merge(n_docs, avgdl, n_buckets=8)
    blocks = merge(partials)

    for term, g in pdf.groupby("term"):
        tb = blocks[blocks["term"] == term].sort_values("block_id")
        want = g.sort_values("doc_id")
        docs = np.concatenate(
            [decode_deltas(b, n) for b, n in zip(tb["docs_bin"], tb["n"])]
        ).astype(np.int64)
        tfs = np.concatenate(
            [decode_varint(b, n) for b, n in zip(tb["tfs_bin"], tb["n"])]
        ).astype(np.int64)
        dls = np.concatenate(
            [decode_varint(b, n) for b, n in zip(tb["dls_bin"], tb["n"])]
        ).astype(np.int64)
        assert list(docs) == list(want["doc_id"])
        assert list(tfs) == list(want["tf"])
        assert list(dls) == list(want["dl"])
        # strictly increasing docIDs across the whole term
        assert (np.diff(docs) > 0).all() or len(docs) == 1
        # df / cf / idf
        df_ = len(want)
        assert (tb["df"] == df_).all()
        assert (tb["cf"] == int(want["tf"].sum())).all()
        assert (tb["idf"] == bm25_idf(df_, n_docs)).all()
        assert (tb["bucket"] == term_bucket(term, 8)).all()
        # WAND soundness: every contribution <= its block's bound
        idf = bm25_idf(df_, n_docs)
        pos = 0
        for _, blk in tb.iterrows():
            sl = slice(pos, pos + blk["n"])
            contribs = bm25_contrib(
                tfs[sl].astype(np.float64), dls[sl].astype(np.float64), idf, avgdl
            )
            assert (contribs <= blk["block_max_score"] + 0.0).all()
            assert np.isclose(contribs.max(), blk["block_max_score"], rtol=0, atol=0)
            pos += blk["n"]
