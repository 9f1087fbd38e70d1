"""Phrase queries over positional postings (VERDICT r2 'Missing #1').

Gates:
- engine phrase top-k (docIDs AND scores AND phrase freqs) == pure-Python
  oracle bit-for-bit, including repeated-token phrases;
- phrase results are a SUBSET of conjunctive-AND results (a doc matching
  "a b" adjacently necessarily contains both terms);
- a positions=False index refuses phrase queries loudly;
- a single-token phrase scores identically to the plain term query
  (Lucene rewrites a 1-term PhraseQuery to a TermQuery).
"""

from collections import Counter

import pytest

from parser_indexer_py_spark.datagen import generate_transcripts
from parser_indexer_py_spark.functions.analyzer import analyze_text
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.oracle import BM25Oracle
from parser_indexer_py_spark.index.search import load_index, search

N_CONVS = 100


@pytest.fixture(scope="module")
def pindex(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pidx"))
    df = generate_transcripts(spark, N_CONVS, partitions=4)
    build_index(
        spark, df, out, n_partitions=6, n_buckets=8, salt=4, n_chunks=2,
        positions=True,
    )
    return load_index(spark, out)


@pytest.fixture(scope="module")
def poracle(pindex):
    pdf = pindex.docmap.select("doc_id", "text", "role").toPandas()
    return BM25Oracle.from_pandas(pdf)


@pytest.fixture(scope="module")
def bigrams(pindex):
    """Most common adjacent token pairs in the corpus (driver twin)."""
    pdf = pindex.docmap.select("text").toPandas()
    bg = Counter()
    for text in pdf["text"]:
        toks = analyze_text(text)
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
    return [f"{a} {b}" for (a, b), _ in bg.most_common(8)]


def _collect(df):
    return [
        (r["doc_id"], r["score"], r["phrase_freq"]) for r in df.collect()
    ]


def test_phrase_rank_identity_vs_oracle(pindex, poracle, bigrams):
    for q in bigrams[:5]:
        eng = _collect(search(pindex, q, k=10, phrase=True, with_meta=False))
        assert eng == poracle.phrase_search(q, k=10), q


def test_phrase_repeated_token(pindex, poracle, bigrams):
    # "x x" phrases exercise the offset-shift chain on ONE positions array
    t = bigrams[0].split()[0]
    q = f"{t} {t}"
    eng = _collect(search(pindex, q, k=10, phrase=True, with_meta=False))
    assert eng == poracle.phrase_search(q, k=10)


def test_phrase_subset_of_and(pindex, bigrams):
    q = bigrams[0]
    phrase_docs = {
        r["doc_id"]
        for r in search(
            pindex, q, k=10**6, phrase=True, with_meta=False
        ).collect()
    }
    assert phrase_docs, "fixture corpus should contain the top bigram"
    and_docs = {
        r["doc_id"]
        for r in search(
            pindex, q, k=10**6, conjunctive=True, with_meta=False
        ).collect()
    }
    assert phrase_docs <= and_docs


def test_phrase_role_filter(pindex, poracle, bigrams):
    q = bigrams[0]
    eng = _collect(
        search(pindex, q, k=10, phrase=True, role="user", with_meta=False)
    )
    assert eng == poracle.phrase_search(q, k=10, role="user")


def test_single_token_phrase_equals_term_query(pindex, bigrams):
    t = bigrams[0].split()[0]
    one = [
        (r["doc_id"], r["score"])
        for r in search(pindex, t, k=10, phrase=True, with_meta=False).collect()
    ]
    two = [
        (r["doc_id"], r["score"])
        for r in search(pindex, t, k=10, with_meta=False).collect()
    ]
    assert one == two


def test_phrase_absent_term_is_empty(pindex, bigrams):
    t = bigrams[0].split()[0]
    assert (
        search(
            pindex, f"{t} zzzznotaword", k=10, phrase=True, with_meta=False
        ).collect()
        == []
    )


def test_phrase_requires_positions(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("npidx"))
    df = generate_transcripts(spark, 10, partitions=2)
    build_index(spark, df, out, n_buckets=4, salt=2, n_chunks=1)
    idx = load_index(spark, out)
    assert idx.positions is False
    with pytest.raises(ValueError, match="positions=True"):
        search(idx, "a b", k=5, phrase=True).collect()


def test_phrase_rejects_conjunctive_and_synonyms(pindex):
    with pytest.raises(ValueError, match="phrase"):
        search(pindex, "a b", k=5, phrase=True, conjunctive=True)
    with pytest.raises(ValueError, match="phrase"):
        search(pindex, "a b", k=5, phrase=True, synonyms={"a": ["c"]})


def test_sloppy_freq_unit():
    """sloppy_phrase_freq semantics: slop=0 == adjacency; ordered-only;
    window stretch counted as (last - first) - (m-1)."""
    from parser_indexer_py_spark.index.search import sloppy_phrase_freq

    # "a b" in 'a x b': gap of 1 -> needs slop >= 1
    assert sloppy_phrase_freq([[0], [2]], 0) == 0
    assert sloppy_phrase_freq([[0], [2]], 1) == 1
    # reordering is NOT allowed (ordered subset of Lucene slop)
    assert sloppy_phrase_freq([[2], [0]], 5) == 0
    # two valid starts: 'a b a b' for "a b"
    assert sloppy_phrase_freq([[0, 2], [1, 3]], 0) == 2
    # repeated token "a a": strictly increasing positions required
    assert sloppy_phrase_freq([[0, 1], [0, 1]], 0) == 2 - 1  # starts: 0 only
    # trigram window: a(0) b(2) c(3) -> stretch (3-0)-2 = 1
    assert sloppy_phrase_freq([[0], [2], [3]], 0) == 0
    assert sloppy_phrase_freq([[0], [2], [3]], 1) == 1


def test_phrase_slop_rank_identity_vs_oracle(pindex, poracle, bigrams):
    for q in bigrams[:3]:
        for slop in (1, 3):
            eng = _collect(
                search(
                    pindex, q, k=10, phrase=True, slop=slop, with_meta=False
                )
            )
            assert eng == poracle.phrase_search(q, k=10, slop=slop), (q, slop)


def test_phrase_slop_monotone(pindex, bigrams):
    """Relaxing slop can only grow the match set (same start criterion)."""
    q = bigrams[0]

    def matches(slop):
        return {
            r["doc_id"]: r["phrase_freq"]
            for r in search(
                pindex, q, k=10**6, phrase=True, slop=slop, with_meta=False
            ).collect()
        }

    m0, m2 = matches(0), matches(2)
    assert set(m0) <= set(m2)
    assert all(m2[d] >= f for d, f in m0.items())


def test_slop_requires_phrase(pindex):
    with pytest.raises(ValueError, match="slop"):
        search(pindex, "a b", k=5, slop=2)


def test_phrase_prune_equals_straight(spark, tmp_path_factory):
    """Rare-term candidate pruning (block-range semi-join before the
    positional decode) is lossless: pruned == unpruned == oracle, on a
    monolithic index AND across a 2-segment merged view (where the stored
    block ranges are segment-local and must be compared base-offset)."""
    from datetime import datetime

    from parser_indexer_py_spark.index.oracle import BM25Oracle
    from parser_indexer_py_spark.index.search import phrase_scores
    from parser_indexer_py_spark.streaming.incremental import SegmentedIndex
    from parser_indexer_py_spark.streaming.merged import MergedSegmentsView

    ts = datetime(2026, 1, 1)
    rows = []
    for i in range(60):  # hot background
        rows.append((f"c{i:03d}", 0, "user", "hot hot cold hot", "", ts))
    for i in (7, 23, 41):  # rare term adjacent (and one non-adjacent)
        rows.append((f"r{i:03d}", 0, "user", "rare hot cold", "", ts))
    rows.append(("r999", 0, "user", "hot rare", "", ts))  # "rare hot" absent
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = str(tmp_path_factory.mktemp("pprune"))
    build_index(spark, df, out, n_chunks=1, positions=True)
    idx = load_index(spark, out)
    oracle = BM25Oracle.from_pandas(
        idx.docmap.select("doc_id", "text", "role").toPandas()
    )

    def rows_of(res):
        return sorted(
            (r["doc_id"], r["score"], r["phrase_freq"]) for r in res.collect()
        )

    for q, slop in [("rare hot", 0), ("rare cold", 1), ("hot cold", 0)]:
        toks = q.split()
        pruned = rows_of(
            phrase_scores(idx, toks, slop=slop, prune_cand_cap=10**9)
        )
        straight = rows_of(
            phrase_scores(idx, toks, slop=slop, prune_cand_cap=0)
        )
        want = sorted(
            (d, s, f)
            for d, (s, f) in oracle._phrase_scores(toks, slop).items()
        )
        assert pruned == straight == want, (q, slop)

    # merged view: same corpus over 2 segments (base-offset range branch)
    from pyspark.sql import functions as F

    seg = SegmentedIndex(
        spark, str(tmp_path_factory.mktemp("ppruneseg")), positions=True
    )
    seg.append_batch(
        df.filter(F.pmod(F.crc32(F.col("conv_id")), F.lit(2)) == 0), 0
    )
    seg.append_batch(
        df.filter(F.pmod(F.crc32(F.col("conv_id")), F.lit(2)) == 1), 1
    )
    view = MergedSegmentsView(seg)
    vo = BM25Oracle.from_pandas(
        view.docmap.select("doc_id", "text", "role").toPandas()
    )
    for q, slop in [("rare hot", 0), ("rare cold", 1)]:
        toks = q.split()
        pruned = rows_of(
            phrase_scores(view, toks, slop=slop, prune_cand_cap=10**9)
        )
        want = sorted(
            (d, s, f)
            for d, (s, f) in vo._phrase_scores(toks, slop).items()
        )
        assert pruned == want, (q, slop, "merged")
