"""Training-pipeline hygiene operators: benchmark decontamination
(operators/decontam.py) and PII scrubbing (functions/pii.py)."""

import pytest
from pyspark.sql import functions as F

from parser_indexer_py_spark.functions.pii import (
    PII_PATTERNS,
    count_pii,
    scrub_pii,
)
from parser_indexer_py_spark.operators.decontam import (
    decontaminate,
    doc_ngrams,
    ngram_contamination,
)

TRAIN = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown fox appears in this training row"),   # shares 2x 3-gram
    (2, "completely unrelated text about window functions"),
    (3, "the lazy dog sleeps all day long"),                  # shares "the lazy dog"
    (4, "short doc"),                                         # < n tokens for n=3? no: 2 toks
]
BENCH = [
    (100, "benchmark mentions the quick brown fox and the lazy dog"),
]


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(TRAIN, "doc_id long, text string")
    b = spark.createDataFrame(BENCH, "doc_id long, text string")
    return t, b


def _py_grams(text, n):
    toks = [w for w in text.lower().split(" ") if w]
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_doc_ngrams_matches_python(frames, spark):
    t, _ = frames
    for n in (1, 2, 3, 8):
        got = {}
        for r in doc_ngrams(t, n).collect():
            got.setdefault(r["doc_id"], set()).add(r["g"])
        want = {
            d: g for d, txt in TRAIN if (g := _py_grams(txt, n))
        }
        assert got == want, n
    with pytest.raises(ValueError):
        doc_ngrams(t, 0)


def test_contamination_counts_and_drop(frames):
    t, b = frames
    bench_grams = set().union(*(_py_grams(x, 3) for _, x in BENCH))
    want = {
        d: len(_py_grams(txt, 3) & bench_grams)
        for d, txt in TRAIN
        if _py_grams(txt, 3) & bench_grams
    }
    got = {
        r["doc_id"]: r["n_hits"]
        for r in ngram_contamination(t, b, n=3).collect()
    }
    assert got == want and got  # sanity: some contamination exists
    # min_hits raises the bar
    got2 = {
        r["doc_id"]: r["n_hits"]
        for r in ngram_contamination(t, b, n=3, min_hits=2).collect()
    }
    assert got2 == {d: c for d, c in want.items() if c >= 2}
    # the drop-filter keeps exactly the unflagged docs
    kept = {r["doc_id"] for r in decontaminate(t, b, n=3).collect()}
    assert kept == {d for d, _ in TRAIN} - set(want)
    with pytest.raises(ValueError):
        ngram_contamination(t, b, min_hits=0)


def test_contamination_broadcast_plan(frames):
    t, b = frames
    plan = (
        ngram_contamination(t, b, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Broadcast" in plan, plan[:1500]


def test_scrub_and_count(spark):
    rows = [
        (0, "mail me at jane.doe+x@corp.example.com today"),
        (1, "call 555-123-4567 or 555 987 6543 now"),
        (2, "server at 10.0.0.1 and 192.168.255.3"),
        (3, "a@b.io and c_d@e-f.org in one row"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["s"], r["ne"], r["np"], r["ni"])
        for r in df.select(
            "doc_id",
            scrub_pii("text").alias("s"),
            count_pii("text", "EMAIL").alias("ne"),
            count_pii("text", "PHONE").alias("np"),
            count_pii("text", "IP").alias("ni"),
        ).collect()
    }
    assert out[0] == ("mail me at <EMAIL> today", 1, 0, 0)
    # "555 987 6543" has a space separator on both gaps — matches
    assert out[1] == ("call <PHONE> or <PHONE> now", 0, 2, 0)
    assert out[2] == ("server at <IP> and <IP>", 0, 0, 2)
    assert out[3] == ("<EMAIL> and <EMAIL> in one row", 2, 0, 0)
    assert out[4] == ("nothing sensitive here", 0, 0, 0)
    with pytest.raises(ValueError, match="unknown PII kind"):
        count_pii("text", "NAME")
    assert [t for t, _ in PII_PATTERNS] == ["<EMAIL>", "<PHONE>", "<IP>"]
