"""Unigram cross-entropy quality signal (q_quality_unigram_xent).

The oracle row gives cross-engine equality; this gate pins the MATH to a
hand-computed toy corpus so a same-bug-both-twins regression can't hide.
"""

from __future__ import annotations

import math

import pytest


def test_unigram_xent_hand_computed(spark, tmp_path):
    from parser_indexer_py_spark.entry_text_queries import (
        q_quality_unigram_xent,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: (r["xent"], r["n_tokens"])
        for r in q_quality_unigram_xent(spark, str(tmp_path)).collect()
    }
    # cf: a=2 b=2 c=1, total=5
    # d1 = (2*-ln(2/5) + 1*-ln(2/5)) / 3 = -ln(0.4)
    # d2 = (-ln(0.4) + -ln(0.2)) / 2
    assert got[1][1] == 3 and got[2][1] == 2
    assert got[1][0] == pytest.approx(-math.log(0.4), abs=1e-6)
    assert got[2][0] == pytest.approx(
        (-math.log(0.4) - math.log(0.2)) / 2, abs=1e-6
    )


def test_substring_signal_hand_computed(spark, tmp_path):
    from parser_indexer_py_spark.entry_text_queries import (
        q_dedup_substring_signal,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),   # windows: [a b c d e], [b c d e f]
            (2, "z a b c d e"),   # windows: [z a b c d], [a b c d e]
            (3, "q r s t u"),     # one unshared window
            (4, "x y"),           # too short: no windows, absent
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_windows"], r["n_shared"], r["shared_frac"])
        for r in q_dedup_substring_signal(spark, str(tmp_path)).collect()
    }
    assert got == {1: (2, 1, 0.5), 2: (2, 1, 0.5), 3: (1, 0, 0.0)}


def test_substring_spans_hand_computed(spark, tmp_path):
    from parser_indexer_py_spark.entry_text_queries import (
        q_dedup_substring_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),       # shared window [a b c d e] at pos 1
            (2, "z a b c d e"),       # same window at pos 2
            (3, "q r s t u"),         # = window at pos 2 of docs 5 and 6
            (5, "p q r s t u"),       # two overlapping shared windows
            (6, "p q r s t u v"),     # ... shared with doc 5
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in q_dedup_substring_spans(spark, str(tmp_path)).collect()
    )
    assert got == [
        (1, 1, 5, 1),
        (2, 2, 6, 1),
        (3, 1, 5, 1),
        (5, 1, 6, 2),
        (6, 1, 6, 2),
    ]
