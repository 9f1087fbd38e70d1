"""Canonical BM25 arithmetic — ONE implementation of the float expression.

Rank-identity across the engine, the block-max bounds, and the pure-Python
oracle requires bit-identical doubles, which requires a single canonical
operation order (SURVEY.md §7.2 "rank-identity under floats"). Every place
that computes a BM25 contribution calls these functions (numpy array or
scalar — numpy float64 scalar ops and Python float ops are both C doubles
with identical IEEE semantics, so the twins agree bit-for-bit).

Formula (Lucene 6 BM25, solrconfig.xml:38 luceneMatchVersion 6.1.0):
    idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
    norm = k1 * ((1 - b) + (b * dl) / avgdl)
    contrib = idf * ((tf * (k1 + 1)) / (tf + norm))
Per-document score = fold-left sum of contribs in ascending term order
(ties impossible: one contrib per (term, doc)). Tie-break: ascending docID.
"""

from __future__ import annotations

import math

import numpy as np

BM25_K1 = 1.2
BM25_B = 0.75
_K1P1 = BM25_K1 + 1.0
_OMB = 1.0 - BM25_B


def bm25_idf(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_contrib(tf, dl, idf: float, avgdl: float):
    """Works elementwise on numpy float64 arrays AND on Python scalars —
    the canonical op order; do not re-derive this expression elsewhere."""
    tf_f = tf if isinstance(tf, float) else np.asarray(tf, dtype=np.float64)
    dl_f = dl if isinstance(dl, float) else np.asarray(dl, dtype=np.float64)
    norm = BM25_K1 * (_OMB + (BM25_B * dl_f) / avgdl)
    return idf * ((tf_f * _K1P1) / (tf_f + norm))
