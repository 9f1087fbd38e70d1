"""Spellcheck (DirectSolrSpellChecker twin) + MoreLikeThis.

Gates:
- engine suggestion lists == pure-Python oracle bit-for-bit
  (suggestion, df, similarity triples, same ranking);
- frequent terms are presumed correct (no suggestions, no collation);
- collation swaps each checked term for its top suggestion;
- MLT engine top-k == oracle (docIDs AND scores), source doc excluded,
  interesting-term selection identical.
"""

import pytest

from parser_indexer_py_spark.datagen import generate_transcripts
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.mlt import interesting_terms, more_like_this
from parser_indexer_py_spark.index.oracle import BM25Oracle, _levenshtein
from parser_indexer_py_spark.index.search import load_index
from parser_indexer_py_spark.index.spell import spellcheck

N_CONVS = 100


@pytest.fixture(scope="module")
def sindex(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sidx"))
    df = generate_transcripts(spark, N_CONVS, partitions=4)
    build_index(spark, df, out, n_partitions=6, n_buckets=8, salt=4, n_chunks=2)
    return load_index(spark, out)


@pytest.fixture(scope="module")
def soracle(sindex):
    pdf = sindex.docmap.select("doc_id", "text", "role").toPandas()
    return BM25Oracle.from_pandas(pdf)


@pytest.fixture(scope="module")
def typo(soracle):
    """(misspelling, source_term): a vocabulary term >=5 chars with one
    letter changed such that the result is OUT of vocabulary."""
    terms = sorted(soracle.postings, key=lambda t: (-len(soracle.postings[t]), t))
    for t in terms:
        if len(t) < 5:
            continue
        for i in (2, 3, 1):
            for c in "zqxj":
                cand = t[:i] + c + t[i + 1:]
                if cand not in soracle.postings and cand[0] == t[0]:
                    return cand, t
    raise AssertionError("no typo constructible")


def test_levenshtein_unit():
    assert _levenshtein("kitten", "sitting") == 3
    assert _levenshtein("abc", "abc") == 0
    assert _levenshtein("abc", "") == 3


def test_spell_suggest_rank_identity(sindex, soracle, typo):
    bad, src = typo
    res = spellcheck(sindex, bad)
    assert bad in res["suggestions"]
    eng = res["suggestions"][bad]
    assert eng == soracle.spell_suggest(bad)
    assert src in [s for s, _, _ in eng], "the source term should be suggested"


def test_spell_transpositions(sindex, soracle):
    """round-5f: transpositions=True scores with true Damerau distance —
    an adjacent-swap typo gets the source term at distance 1 (similarity
    1 - 1/len) instead of plain Levenshtein's 2. Engine == oracle twin
    under BOTH flags; the flags genuinely disagree on the swap typo."""
    # construct an adjacent-swap typo that stays out-of-vocabulary and
    # keeps the first char (minPrefix envelope)
    terms = sorted(
        soracle.postings, key=lambda t: (-len(soracle.postings[t]), t)
    )
    bad = src = None
    for t in terms:
        if len(t) < 5:
            continue
        for i in range(1, len(t) - 1):
            if t[i] == t[i + 1]:
                continue
            cand = t[:i] + t[i + 1] + t[i] + t[i + 2:]
            if cand not in soracle.postings:
                bad, src = cand, t
                break
        if bad:
            break
    assert bad, "no swap typo constructible"

    for flag in (False, True):
        res = spellcheck(sindex, bad, transpositions=flag)
        eng = res["suggestions"].get(bad, [])
        assert eng == soracle.spell_suggest(bad, transpositions=flag), flag
    dl_sims = {
        s: sim
        for s, _, sim in spellcheck(sindex, bad, transpositions=True)[
            "suggestions"
        ][bad]
    }
    lev_res = spellcheck(sindex, bad)["suggestions"].get(bad, [])
    lev_sims = {s: sim for s, _, sim in lev_res}
    want_sim = round(1.0 - 1.0 / min(len(bad), len(src)), 6)
    assert dl_sims.get(src) == want_sim, (src, dl_sims)
    assert lev_sims.get(src, 0.0) < want_sim, (src, lev_sims)


def test_spell_frequent_terms_presumed_correct(sindex, soracle):
    # the highest-df term is way above maxQueryFrequency=0.01
    hot = max(soracle.postings, key=lambda t: len(soracle.postings[t]))
    if len(hot) >= 4:
        res = spellcheck(sindex, hot)
        assert res["suggestions"] == {} and res["collation"] is None
    # short tokens are never checked (minQueryLength=4)
    res = spellcheck(sindex, "ab")
    assert res["suggestions"] == {} and res["collation"] is None


def test_spell_collation(sindex, soracle, typo):
    bad, _ = typo
    hot = max(soracle.postings, key=lambda t: len(soracle.postings[t]))
    res = spellcheck(sindex, f"{hot} {bad}")
    top = soracle.spell_suggest(bad)[0][0]
    assert res["collation"] == f"{hot} {top}"


def test_spell_collations_verified(sindex, soracle, typo):
    """Round-5 (solrconfig.xml:936-939): max_collations>1 returns up to
    maxCollations VERIFIED collations — hit counts from re-running each
    candidate conjunctively, per-term corrections attached, best-first
    over correction combinations, never more than max_collation_tries
    verification queries. The legacy single-collation shape (the default)
    is unchanged."""
    bad, src = typo
    hot = max(soracle.postings, key=lambda t: len(soracle.postings[t]))
    legacy = spellcheck(sindex, f"{hot} {bad}")
    res = spellcheck(
        sindex, f"{hot} {bad}", max_collations=3, collate_extended=True
    )
    assert "collations" not in legacy
    colls = res["collations"]
    assert colls and len(colls) <= 3
    for c in colls:
        toks = c["collation"].split()
        # conjunctive verification: every reported collation really has
        # docs containing ALL its tokens — recount in the pure oracle
        docsets = [set(soracle.postings.get(t, {})) for t in toks]
        want_hits = len(set.intersection(*docsets))
        assert c["hits"] == want_hits and want_hits > 0
        assert set(c["corrections"]) == {bad}
    # headline collation = best verified one; suggestions unchanged
    assert res["collation"] == colls[0]["collation"]
    assert res["suggestions"] == legacy["suggestions"]
    # an uncorrectable query yields no collations
    none = spellcheck(
        sindex, "zzzz qqqq", max_collations=3, collate_extended=True
    )
    assert none["collations"] == [] and none["collation"] is None


def test_spell_alternative_term_count(sindex, soracle, typo):
    """spellcheck.alternativeTermCount (/browse default 2 at
    solrconfig.xml:936): in-dictionary checked terms get at most
    alternative_term_count suggestions (a truncation of the same ranked
    list); absent (df=0) terms keep the full count."""
    bad, _ = typo
    max_df = 0.01 * sindex.n_docs
    low = sorted(
        t for t, p in soracle.postings.items()
        if len(t) >= 4 and 0 < len(p) <= max_df
    )
    cand = next(
        (t for t in low if len(soracle.spell_suggest(t)) >= 2), None
    )
    if cand is None:
        pytest.skip("corpus has no low-df term with >= 2 suggestions")
    plain = spellcheck(sindex, f"{cand} {bad}")
    alt = spellcheck(sindex, f"{cand} {bad}", alternative_term_count=1)
    # the in-dictionary term's list truncates to 1
    assert alt["suggestions"][cand] == plain["suggestions"][cand][:1]
    assert len(plain["suggestions"][cand]) >= 2
    # the df=0 typo keeps the full ranked list
    assert alt["suggestions"][bad] == plain["suggestions"][bad]


def test_spell_max_results_for_suggest(sindex, soracle, typo):
    """spellcheck.maxResultsForSuggest (:937): no suggestions when the
    original query already has more hits than the threshold; num_found
    short-circuits the probe; a 0-hit typo query still suggests."""
    bad, _ = typo
    # caller-supplied numFound above the threshold: silenced
    silenced = spellcheck(
        sindex, bad, max_results_for_suggest=5, num_found=10
    )
    assert silenced["suggestions"] == {} and silenced["collation"] is None
    # at/below the threshold: suggestions as usual
    kept = spellcheck(sindex, bad, max_results_for_suggest=5, num_found=5)
    assert kept["suggestions"][bad] == soracle.spell_suggest(bad)
    # probe path: the typo has zero conjunctive hits -> suggest
    probed = spellcheck(sindex, bad, max_results_for_suggest=5)
    assert probed["suggestions"][bad] == soracle.spell_suggest(bad)


def test_spell_extended_results(sindex, soracle, typo):
    """spellcheck.extendedResults (:934): the response carries each
    checked term's own frequency beside the per-suggestion dfs."""
    bad, _ = typo
    res = spellcheck(sindex, bad, extended_results=True)
    assert res["original_freq"] == {bad: 0}
    hot = max(soracle.postings, key=lambda t: len(soracle.postings[t]))
    quiet = spellcheck(sindex, hot, extended_results=True)
    assert quiet["suggestions"] == {} and quiet["original_freq"] == {}


def test_mlt_rank_identity(sindex, soracle):
    docs = sorted(soracle.docs)[:1] + sorted(soracle.docs)[50:51]
    checked = 0
    for d in docs:
        eng = [
            (r["doc_id"], r["score"])
            for r in more_like_this(sindex, d, with_meta=False).collect()
        ]
        assert eng == soracle.more_like_this(d), d
        assert all(x[0] != d for x in eng)
        checked += 1
    assert checked


def test_mlt_interesting_terms_match(sindex, soracle):
    from parser_indexer_py_spark.index.mlt import select_interesting

    d = sorted(soracle.docs)[10]
    eng = interesting_terms(sindex, d)
    ora = select_interesting(
        soracle.docs[d],
        lambda t: len(soracle.postings.get(t, {})),
        soracle.n_docs,
    )
    assert eng == ora


def test_mlt_max_doc_freq_pct(sindex, soracle):
    """Lucene's setMaxDocFreqPct: too-common terms drop out of the
    interesting set; engine and oracle twin agree (and a tiny cap that
    excludes everything yields an empty result, not an error)."""
    d = sorted(soracle.docs)[10]
    capped = interesting_terms(sindex, d, max_doc_freq_pct=0.5)
    dfs = {t: len(soracle.postings.get(t, {})) for t, _ in capped}
    assert all(v <= 0.5 * soracle.n_docs for v in dfs.values())
    eng = [
        (r["doc_id"], r["score"])
        for r in more_like_this(
            sindex, d, with_meta=False, max_doc_freq_pct=0.5
        ).collect()
    ]
    assert eng == soracle.more_like_this(d, max_doc_freq_pct=0.5)
    assert more_like_this(
        sindex, d, with_meta=False, max_doc_freq_pct=1e-9
    ).count() == 0


def test_mlt_missing_doc_raises(sindex):
    with pytest.raises(ValueError, match="not in the index"):
        more_like_this(sindex, 10**12)


def test_spell_and_mlt_on_segments(spark, tmp_path_factory):
    """Spellcheck and MLT compose with the streaming merged view like
    every other query surface (MergedSegmentsView implements the Index
    API they use): results over 2 segments == a monolithic build of the
    same corpus."""
    from pyspark.sql import functions as F

    from parser_indexer_py_spark.streaming.incremental import SegmentedIndex
    from parser_indexer_py_spark.streaming.merged import MergedSegmentsView

    src = generate_transcripts(spark, 60, partitions=2)
    root = str(tmp_path_factory.mktemp("smseg"))
    seg = SegmentedIndex(spark, root)
    seg.append_batch(
        src.filter(F.pmod(F.crc32(F.col("conv_id")), F.lit(2)) == 0), 0
    )
    seg.append_batch(
        src.filter(F.pmod(F.crc32(F.col("conv_id")), F.lit(2)) == 1), 1
    )
    view = MergedSegmentsView(seg)
    mono_dir = str(tmp_path_factory.mktemp("smmono"))
    build_index(spark, src, mono_dir, n_chunks=1)
    mono = load_index(spark, mono_dir)

    o = BM25Oracle.from_pandas(
        view.docmap.select("doc_id", "text", "role").toPandas()
    )
    bad = next(
        t[:3] + "q" + t[4:]
        for t in sorted(o.postings, key=lambda t: (-len(o.postings[t]), t))
        if len(t) >= 5 and (t[:3] + "q" + t[4:]) not in o.postings
    )
    sv = spellcheck(view, bad)
    sm = spellcheck(mono, bad)
    assert sv["suggestions"] == sm["suggestions"] and sv["suggestions"][bad]
    assert sv["collation"] == sm["collation"]

    # MLT over the merged view == the pure-Python oracle built from the
    # view's own docmap (exact doc_ids AND scores, the standard gate)
    d_view = int(
        view.docmap.orderBy("conv_id", "turn_idx").first()["doc_id"]
    )
    eng = [
        (r["doc_id"], r["score"])
        for r in more_like_this(view, d_view, with_meta=False).collect()
    ]
    assert eng == o.more_like_this(d_view)
    assert len(eng) == 3


def test_wordbreak(spark, tmp_path):
    """WordBreak spellchecker (the reference's second checker): breaks an
    OOV concatenation into dictionary halves; combines an adjacent pair
    whose concatenation is a dictionary term. Engine == oracle."""
    from datetime import datetime

    from parser_indexer_py_spark.index.spell import wordbreak

    ts = datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "user", "alpha beta alphabeta", "", ts),
        ("c1", 1, "user", "alpha beta gamma", "", ts),
        ("c2", 0, "user", "alpha delta gamma", "", ts),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = str(tmp_path / "wbidx")
    build_index(spark, df, out, n_chunks=1)
    idx = load_index(spark, out)
    o = BM25Oracle.from_pandas(
        idx.docmap.select("doc_id", "text", "role").toPandas()
    )

    # break: betagamma is OOV; beta+gamma are both dictionary terms
    wb = wordbreak(idx, "betagamma alpha")
    assert wb["breaks"] == {"betagamma": [("beta", "gamma", 2)]}
    assert wb == o.wordbreak("betagamma alpha")
    # combine: alpha+beta == alphabeta (df 1); in-vocab terms not broken
    wb = wordbreak(idx, "alpha beta")
    assert wb["combines"] == [(("alpha", "beta"), "alphabeta", 1)]
    assert "alphabeta" not in wb["breaks"]
    assert wb == o.wordbreak("alpha beta")
    # alphabeta itself is in-vocabulary -> never broken
    wb = wordbreak(idx, "alphabeta")
    assert wb["breaks"] == {} and wb["combines"] == []
    assert wb == o.wordbreak("alphabeta")


def test_mlt_qf_multi_field(sindex, spark, tmp_path_factory):
    """Round-5d: multi-field MoreLikeThis (the /browse handler's mlt.qf
    shape) — per-field interesting-term selection with per-field stats,
    qf-weighted SUM across fields (BooleanQuery, not DisMax), source
    excluded. Gate: engine == pandas recombination of the engine's own
    per-field full match sets (exact — same two floats, same add
    order)."""
    from pyspark.sql import functions as F

    from parser_indexer_py_spark.functions.queryparser import parse_query
    from parser_indexer_py_spark.index.boolean import _scored_docs
    from parser_indexer_py_spark.index.mlt import more_like_this_qf

    title = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 3), " ")
    src = sindex.docmap.select(
        "conv_id", "turn_idx", "role", title.alias("text"), "tool", "ts"
    )
    tdir = str(tmp_path_factory.mktemp("mltqf_title"))
    build_index(spark, src, tdir, n_partitions=4, n_chunks=1)
    tidx = load_index(spark, tdir)
    idxs = {"text": sindex, "title": tidx}
    qf = {"text": 0.5, "title": 10.0}
    kw = {"min_term_freq": 1, "min_doc_freq": 2, "count": 5}
    did = int(
        sindex.docmap.orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    )

    got = [
        (r["doc_id"], r["score"])
        for r in more_like_this_qf(idxs, did, qf, **kw).collect()
    ]
    # oracle: engine's own per-field match sets, recombined in pandas
    acc: dict[int, float] = {}
    for f in sorted(qf):
        from parser_indexer_py_spark.index.mlt import interesting_terms

        terms = [t for t, _ in interesting_terms(idxs[f], did, **kw)]
        if not terms:
            continue
        sub = _scored_docs(idxs[f], parse_query(" ".join(sorted(terms))))
        for r in sub.collect():
            acc[r["doc_id"]] = acc.get(r["doc_id"], 0.0) + (
                r["score"] * qf[f]
            )
    acc.pop(did, None)
    exp = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (gd, gs), (ed, es) in zip(got, exp):
        assert abs(gs - es) < 1e-9, (gd, gs, es)
    # contract: unknown qf field raises
    with pytest.raises(ValueError, match="not in indexes"):
        more_like_this_qf(idxs, did, {"body": 1.0})
    # the /browse facade routes multi-index requests through mlt.qf
    from parser_indexer_py_spark.index.browse import browse

    r = browse(idxs, "bace cedi", qf, rows=1, mm=0, spell=False, mlt_docs=1)
    (bid,) = r["mlt"].keys()
    via_browse = [
        (x["doc_id"], x["score"]) for x in r["mlt"][bid].collect()
    ]
    direct = [
        (x["doc_id"], x["score"])
        for x in more_like_this_qf(idxs, bid, qf, count=3).collect()
    ]
    assert via_browse == direct and len(via_browse) > 0
