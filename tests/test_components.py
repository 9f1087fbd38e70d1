"""Solr searchComponent twins (index/components.py): TermsComponent,
TermVectorComponent, StatsComponent, QueryElevationComponent — checked
against driver-side pandas recomputations over the same corpus (the
engine's analyzer twin re-derives the expected term/tf/position facts)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parser_indexer_py_spark.datagen import generate_transcripts
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.components import (
    elevate,
    stats_field,
    term_vectors,
    terms_enum,
)
from parser_indexer_py_spark.index.search import load_index, search

N_CONVS = 80


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cidx"))
    df = generate_transcripts(spark, N_CONVS, partitions=4)
    build_index(spark, df, out, n_partitions=6, n_buckets=8, salt=2, n_chunks=1)
    return load_index(spark, out)


@pytest.fixture(scope="module")
def tok_pdf(index):
    """(doc_id, term, pos) via the engine's own analyzer twin."""
    from parser_indexer_py_spark.functions.analyzer import analyze_text

    rows = []
    for r in index.docmap.select("doc_id", "text").collect():
        for i, t in enumerate(analyze_text(r["text"])):
            rows.append((r["doc_id"], t, i + 1))
    return pd.DataFrame(rows, columns=["doc_id", "term", "pos"])


def test_terms_enum_count_sort(index, tok_pdf):
    df_by_term = tok_pdf.groupby("term")["doc_id"].nunique()
    prefix = tok_pdf["term"].iloc[0][0]
    exp = (
        df_by_term[df_by_term.index.str.startswith(prefix)]
        .reset_index(name="df")
        .sort_values(["df", "term"], ascending=[False, True])
        .head(5)
    )
    got = terms_enum(index, prefix, limit=5).toPandas()
    assert list(got["term"]) == list(exp["term"])
    assert list(got["df"]) == list(exp["df"])


def test_terms_enum_mincount_and_index_sort(index, tok_pdf):
    got = terms_enum(index, "", mincount=3, limit=20, sort="index").toPandas()
    assert (got["df"] >= 3).all()
    assert list(got["term"]) == sorted(got["term"])
    with pytest.raises(ValueError):
        terms_enum(index, sort="bogus")


def test_term_vectors_tf_positions_df(index, tok_pdf):
    ids = sorted(tok_pdf["doc_id"].unique())[:3]
    got = term_vectors(index, ids).toPandas()
    sub = tok_pdf[tok_pdf["doc_id"].isin(ids)]
    exp_tf = (
        sub.groupby(["doc_id", "term"])
        .agg(tf=("pos", "size"), positions=("pos", lambda s: sorted(s)))
        .reset_index()
    )
    assert len(got) == len(exp_tf)
    m = got.merge(exp_tf, on=["doc_id", "term"], suffixes=("", "_e"))
    assert len(m) == len(exp_tf)
    assert (m["tf"] == m["tf_e"]).all()
    assert all(list(a) == list(b) for a, b in zip(m["positions"], m["positions_e"]))
    # df is corpus-wide, from termstats
    corpus_df = tok_pdf.groupby("term")["doc_id"].nunique()
    assert all(corpus_df[t] == d for t, d in zip(m["term"], m["df"]))


def test_stats_field_matches_pandas(index):
    dm = index.docmap.select("doc_id", "role", "dl")
    got = (
        stats_field(dm, "dl", by="role")
        .orderBy("role")
        .toPandas()
        .set_index("role")
    )
    pdf = dm.toPandas()
    for role, grp in pdf.groupby("role"):
        r = got.loc[role]
        assert r["count"] == len(grp)
        assert r["missing"] == 0
        assert r["min"] == grp["dl"].min()
        assert r["max"] == grp["dl"].max()
        assert r["sum"] == grp["dl"].sum()
        assert abs(r["mean"] - grp["dl"].mean()) < 1e-9
        assert abs(r["stddev"] - grp["dl"].std(ddof=1)) < 1e-9
    # global (no `by`) single row
    g = stats_field(dm, "dl").toPandas()
    assert len(g) == 1 and g.loc[0, "count"] == len(pdf)


def test_elevate_pins_and_fills(index, tok_pdf):
    df_by_term = tok_pdf.groupby("term")["doc_id"].nunique()
    hot = df_by_term.idxmax()
    organic = search(index, hot, k=10, with_meta=False).toPandas()
    # pin: one doc from deep in the organic ranking + one non-matching doc
    deep = int(organic["doc_id"].iloc[-1])
    matching = set(tok_pdf[tok_pdf["term"] == hot]["doc_id"])
    non_match = int(next(d for d in sorted(tok_pdf["doc_id"].unique())
                         if d not in matching))
    got = elevate(index, hot, [deep, non_match], k=10).toPandas()
    assert list(got["doc_id"][:2]) == [deep, non_match]
    assert list(got["elevated"][:2]) == [True, True]
    assert not got["elevated"][2:].any()
    # pinned doc keeps its exact organic score; forced doc scores 0.0
    exp_score = float(organic.loc[organic["doc_id"] == deep, "score"].iloc[0])
    assert got.loc[0, "score"] == exp_score
    assert got.loc[1, "score"] == 0.0
    # the fill is the organic order with elevated rows removed
    exp_fill = [d for d in organic["doc_id"] if d != deep][:8]
    assert list(got["doc_id"][2:]) == exp_fill
    # force=False drops the non-matching doc
    nf = elevate(index, hot, [deep, non_match], k=10, force=False).toPandas()
    assert non_match not in set(nf["doc_id"])
    assert list(nf["doc_id"][:1]) == [deep]


def test_elevate_by_key_and_errors(index):
    # conv_id maps to several turns (docs) in the transcripts corpus —
    # key-based elevation must refuse the ambiguity, not pin arbitrarily
    conv = index.docmap.select("conv_id").limit(1).collect()[0]["conv_id"]
    with pytest.raises(ValueError, match="ambiguous"):
        elevate(index, "x", [conv], key="conv_id")
    with pytest.raises(ValueError, match="not found"):
        elevate(index, "x", ["no-such-conv"], key="conv_id")
    with pytest.raises(ValueError, match="duplicate"):
        elevate(index, "x", [1, 1])


def test_cluster_results(index, tok_pdf):
    import math

    from parser_indexer_py_spark.index.components import cluster_results

    df_by_term = tok_pdf.groupby("term")["doc_id"].nunique()
    hot = df_by_term.idxmax()
    got = cluster_results(index, hot, k=15, clusters=4).toPandas()
    top_ids = set(
        search(index, hot, k=15, with_meta=False).toPandas()["doc_id"]
    )
    # every result doc appears exactly once
    assert sorted(got["doc_id"]) == sorted(top_ids)
    # at most `clusters` labels incl. the Other Topics bucket; never the
    # query term itself as a label
    labels = set(got["label"])
    assert len(labels) <= 4 and hot not in labels
    # size column is the actual per-label doc count
    assert (
        got.groupby("label")["doc_id"].transform("size") == got["size"]
    ).all()
    # labels are each doc's argmax tf*ln(N/df) non-query term (unless
    # folded into Other Topics)
    n_docs = tok_pdf["doc_id"].nunique()
    sub = tok_pdf[tok_pdf["doc_id"].isin(top_ids) & (tok_pdf["term"] != hot)]
    tfd = sub.groupby(["doc_id", "term"]).size().reset_index(name="tf")
    tfd["w"] = [
        tf * math.log(n_docs / df_by_term[t])
        for t, tf in zip(tfd["term"], tfd["tf"])
    ]
    exp_label = {}
    for d, grp in tfd.groupby("doc_id"):
        grp = grp.sort_values(["w", "term"], ascending=[False, True])
        exp_label[d] = grp["term"].iloc[0]
    for _, row in got.iterrows():
        if row["label"] != "Other Topics":
            assert row["label"] == exp_label[row["doc_id"]]


def test_elevate_page_is_one_action_two_subtrees(index, tok_pdf):
    """The elevate plan unions the organic and pinned search subtrees
    into ONE lazy action (they execute concurrently — the measured-best
    shape; see the docstring's rejected driver-merge note)."""
    df_by_term = tok_pdf.groupby("term")["doc_id"].nunique()
    hot = df_by_term.idxmax()
    out = elevate(index, hot, [0], k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan, plan[:2000]


# ---------------------------------------------------------------------------
# SuggestComponent (suggest) — FuzzyLookupFactory over DocumentDictionary
# ---------------------------------------------------------------------------

def _brute_suggest(entries, q, *, max_edits=1, npf=1, min_fuzzy=3,
                   count=20, exact_first=True, dist=None):
    """Reference FuzzySuggester: entries = [(surface, analyzed, weight)];
    match iff some prefix of analyzed is within max_edits of q, the first
    npf chars exact (distance computed on the remainders)."""
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def matches(an):
        if len(q) < min_fuzzy or max_edits == 0:
            return an.startswith(q)
        k = min(npf, len(q))
        if an[:k] != q[:k]:
            return False
        rem, srem = q[k:], an[k:]
        d = dist or lev
        return any(
            d(srem[:L], rem) <= max_edits
            for L in range(0, len(srem) + 1)
        )

    best = {}
    for surface, an, w in entries:
        if matches(an):
            prev = best.get(surface)
            if prev is None or w > prev[0]:
                best[surface] = (w, an)
    rows = [
        (s, w, an == q if exact_first else False)
        for s, (w, an) in best.items()
    ]
    rows.sort(key=lambda r: (not r[2], -r[1], r[0]))
    return [(s, w) for s, w, _ in rows[:count]]


@pytest.fixture(scope="module")
def suggest_dict(spark):
    rows = [
        ("window scan merge", 10),
        ("window scan batch", 30),
        ("window scan batch", 7),     # duplicate surface, lower weight
        ("windows are nice", 25),
        ("wandow scan", 40),          # 1 edit inside the fuzzy region
        ("mindow scan", 99),          # first char differs -> excluded
        ("win", 5),                   # short entry: prefix of the query
        ("wi", 3),
        ("table scan", 50),
        ("window", 12),               # exact analyzed == query test uses q="window"
    ]
    return spark.createDataFrame(rows, "name string, price long")


def test_suggest_matches_bruteforce(suggest_dict):
    from parser_indexer_py_spark.index.components import suggest

    entries = [
        (r["name"], r["name"], r["price"])
        for r in suggest_dict.collect()
    ]  # analyzer is identity on these plain strings
    for q, kw in [
        ("window", {}),                      # exactFirst fires on "window"
        ("windoe", {}),                      # trailing typo
        ("wndow", {}),                       # deletion
        ("wi", {}),                          # < minFuzzyLength -> exact prefix
        ("window scan", {"max_edits": 2}),
        ("window", {"max_edits": 0}),        # pure prefix mode
        ("window", {"exact_first": False}),
    ]:
        got = [
            (r["suggestion"], r["weight"])
            for r in suggest(
                suggest_dict, q, field="name", weight_field="price", **kw
            ).collect()
        ]
        exp = _brute_suggest(
            entries, q,
            max_edits=kw.get("max_edits", 1),
            exact_first=kw.get("exact_first", True),
        )
        assert got == exp, f"q={q!r} kw={kw}: {got} != {exp}"


def test_suggest_transpositions(suggest_dict):
    """round-5f FuzzySuggester transpositions: 'wnidow' is 'window' with
    an adjacent swap AFTER the exact first char — Damerau distance 1 on
    the remainders, plain Levenshtein 2, so max_edits=1 matches ONLY
    under the flag. Engine == brute twin with the independent _damerau
    on every query shape."""
    from parser_indexer_py_spark.index.components import suggest
    from parser_indexer_py_spark.index.oracle import _damerau

    entries = [
        (r["name"], r["name"], r["price"]) for r in suggest_dict.collect()
    ]
    for q in ("wnidow scan", "wnidow", "windoe", "window scan"):
        got = [
            (r["suggestion"], r["weight"])
            for r in suggest(
                suggest_dict, q, field="name", weight_field="price",
                transpositions=True,
            ).collect()
        ]
        exp = _brute_suggest(entries, q, dist=_damerau)
        assert got == exp, f"q={q!r}: {got} != {exp}"
    # the discriminating case: plain Levenshtein misses the swap typo
    assert not suggest(
        suggest_dict, "wnidow scan", field="name", weight_field="price"
    ).collect()
    assert suggest(
        suggest_dict, "wnidow scan", field="name", weight_field="price",
        transpositions=True,
    ).collect()


def test_suggest_npf_blocks_first_char_edit(suggest_dict):
    from parser_indexer_py_spark.index.components import suggest

    got = {
        r["suggestion"]
        for r in suggest(
            suggest_dict, "window", field="name", weight_field="price"
        ).collect()
    }
    assert "wandow scan" in got          # edit beyond the non-fuzzy prefix
    assert "mindow scan" not in got      # edit ON the non-fuzzy prefix
    assert "window scan batch" in got


def test_suggest_dedupes_max_weight(suggest_dict):
    from parser_indexer_py_spark.index.components import suggest

    rows = {
        r["suggestion"]: r["weight"]
        for r in suggest(
            suggest_dict, "window scan", field="name", weight_field="price"
        ).collect()
    }
    assert rows["window scan batch"] == 30


def test_suggest_errors(suggest_dict):
    from parser_indexer_py_spark.index.components import suggest

    with pytest.raises(ValueError, match="max_edits"):
        suggest(suggest_dict, "window", field="name", max_edits=3)
    with pytest.raises(ValueError, match="analyzes to nothing"):
        suggest(suggest_dict, "...", field="name")


def test_suggest_fuzz_vs_bruteforce(spark):
    """Seeded randomized gate: tiny alphabet forces dense edit-distance
    collisions; engine must equal the all-prefix brute force on every
    (dictionary, query, params) draw. Surfaces exercise the analyzer
    (uppercase + fold chars), so analyzed != surface on some entries."""
    import numpy as np

    from parser_indexer_py_spark.functions.analyzer import analyze_text
    from parser_indexer_py_spark.index.components import suggest

    rng = np.random.default_rng(20260817)
    alpha = list("abc")
    decorations = ["", "", "", "X", "•"]  # occasional case/fold noise

    for trial in range(3):
        entries_raw = []
        for i in range(40):
            n_words = int(rng.integers(1, 4))
            words = [
                "".join(
                    alpha[int(j)]
                    for j in rng.integers(0, len(alpha), rng.integers(1, 6))
                )
                for _ in range(n_words)
            ]
            deco = decorations[int(rng.integers(0, len(decorations)))]
            surface = deco + " ".join(words)
            entries_raw.append((surface, int(rng.integers(0, 50))))
        dict_df = spark.createDataFrame(
            entries_raw, "name string, price long"
        )
        entries = [
            (s, " ".join(analyze_text(s)), w) for s, w in entries_raw
        ]
        queries = ["ab", "abc", "acb ba", "aaaa", "cab", "abba"]
        for q in queries:
            me = int(rng.integers(0, 3))
            npf = int(rng.integers(1, 3))
            got = [
                (r["suggestion"], r["weight"])
                for r in suggest(
                    dict_df, q, field="name", weight_field="price",
                    max_edits=me, non_fuzzy_prefix=npf, count=10,
                ).collect()
            ]
            exp = _brute_suggest(
                entries, " ".join(analyze_text(q)),
                max_edits=me, npf=npf, count=10,
            )
            assert got == exp, (
                f"trial={trial} q={q!r} me={me} npf={npf}: {got} != {exp}"
            )


def test_suggest_prebuilt_equals_raw_and_pushes_range(suggest_dict, tmp_path):
    """build_suggest_dict + prebuilt lookup == raw lookup, and the
    prefix guard reaches the parquet scan as a pushed range predicate
    over the sorted dictionary (the buildOnStartup serving path)."""
    from parser_indexer_py_spark.index.components import (
        build_suggest_dict,
        suggest,
    )
    from parser_indexer_py_spark.plans.explain_audit import (
        assert_pushed_filter,
        assert_take_ordered,
    )

    out = str(tmp_path / "sugg_dict")
    build_suggest_dict(
        suggest_dict, out, field="name", weight_field="price", n_partitions=3
    )
    spark = suggest_dict.sparkSession
    pre = spark.read.parquet(out)

    for q, kw in [
        ("window", {}),
        ("windoe", {}),
        ("wi", {}),                     # exact-prefix (short) path
        ("window scan", {"max_edits": 2}),
        ("window", {"exact_first": False}),
    ]:
        raw = suggest(
            suggest_dict, q, field="name", weight_field="price", **kw
        ).collect()
        built = suggest(pre, q, prebuilt=True, **kw).collect()
        assert [tuple(r) for r in built] == [tuple(r) for r in raw], (
            f"q={q!r} kw={kw}"
        )

    df = suggest(pre, "windoe", prebuilt=True)
    assert_pushed_filter(df, "GreaterThanOrEqual(analyzed,w)")
    assert_pushed_filter(df, "LessThan(analyzed,x)")
    assert_take_ordered(df)


def test_prefix_upper_edges():
    from parser_indexer_py_spark.index.components import _prefix_upper

    assert _prefix_upper("ab") == "ac"
    assert _prefix_upper("az") == "a{"
    assert _prefix_upper("a" + chr(0x10FFFF)) == "b"
    assert _prefix_upper(chr(0x10FFFF)) is None
    assert _prefix_upper(chr(0xD7FF)) == chr(0xE000)


def test_terms_enum_regex_range_maxcount(index, tok_pdf):
    """round-5g /terms tail: terms.regex (anchored full-match, literal
    head pushed), terms.lower/upper dictionary range, terms.maxcount —
    all vs the pandas dictionary."""
    import re

    from parser_indexer_py_spark.index.components import terms_enum

    df_by_term = tok_pdf.groupby("term")["doc_id"].nunique()

    pat = "c.*i"
    got = terms_enum(index, regex=pat, sort="index", limit=10**6).toPandas()
    exp = sorted(t for t in df_by_term.index if re.fullmatch(pat, t))
    assert list(got["term"]) == exp and exp

    lo, hi = "ba", "bf"
    got = terms_enum(
        index, lower=lo, upper=hi, sort="index", limit=10**6
    ).toPandas()
    exp = sorted(t for t in df_by_term.index if lo <= t < hi)
    assert list(got["term"]) == exp and exp

    # a df value that actually exists at >= 2, so the window is nonempty
    cap = int(min(d for d in df_by_term.values if d >= 2))
    got = terms_enum(
        index, maxcount=cap, mincount=2, sort="index", limit=10**6
    ).toPandas()
    exp = sorted(
        t for t, d in df_by_term.items() if 2 <= d <= cap
    )
    assert list(got["term"]) == exp and exp

    with pytest.raises(re.error):
        terms_enum(index, regex="c[")


def test_spell_only_more_popular(index, tok_pdf):
    """spellcheck.onlyMorePopular (SUGGEST_MORE_POPULAR): suggestions
    restricted to df > the checked term's own df; engine == oracle twin
    under the flag."""
    from parser_indexer_py_spark.index.oracle import BM25Oracle
    from parser_indexer_py_spark.index.spell import spellcheck

    orc = BM25Oracle.from_pandas(
        index.docmap.select("doc_id", "text", "role").toPandas()
    )
    # an in-dictionary RARE term (df small): plenty of more-popular
    # neighbours exist, and the flag must drop the less-popular ones
    df_by_term = tok_pdf.groupby("term")["doc_id"].nunique()
    rare = None
    for t, d in df_by_term.sort_values().items():
        if len(t) >= 5:
            rare = (t, int(d))
            break
    assert rare
    term, own = rare
    plain = spellcheck(index, term)["suggestions"].get(term, [])
    flagged = spellcheck(index, term, only_more_popular=True)[
        "suggestions"
    ].get(term, [])
    assert flagged == orc.spell_suggest(
        term, only_more_popular=True, own_df=own
    )
    assert all(d > own for _, d, _ in flagged)
    assert set(flagged) <= set(
        orc.spell_suggest(term, count=10**6)
    ) and len(flagged) <= len(plain) or plain == []
