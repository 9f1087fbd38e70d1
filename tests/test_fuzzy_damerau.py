"""Fuzzy transpositions (Damerau-Levenshtein) — Lucene FuzzyQuery's
``transpositions=true`` default, exposed as
``boolean_search(fuzzy_transpositions=True)`` on both twins.

Gates:
- BOTH Damerau DPs (engine ``boolean._damerau_dist`` and oracle
  ``oracle._damerau``) == DuckDB's ``damerau_levenshtein`` on exhaustive
  small-alphabet pairs + seeded random pairs, including the true-DL /
  optimal-string-alignment discriminators;
- the ``lev <= 2*DL`` engine prefilter bound, exhaustively;
- engine top-k (docIDs AND scores) == oracle with the flag on, across
  clause shapes including groups (the rewrite must recurse);
- a transposed typo at ``~1`` reaches the original term's docs ONLY with
  the flag on (lev distance of an adjacent swap is 2);
- Damerau expansion is a superset of the Levenshtein expansion.
"""

import itertools
import random

import duckdb
import pytest

from parser_indexer_py_spark.datagen import generate_transcripts
from parser_indexer_py_spark.index.boolean import (
    _damerau_dist,
    _expand_fuzzy,
    boolean_search,
)
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.oracle import BM25Oracle, _damerau
from parser_indexer_py_spark.index.search import load_index


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _pairs():
    strs = [
        "".join(p)
        for n in range(0, 5)
        for p in itertools.product("ab", repeat=n)
    ]
    out = [(a, b) for a in strs for b in strs]
    rng = random.Random(11)
    for _ in range(3000):
        out.append(
            (
                "".join(
                    rng.choice("abcd") for _ in range(rng.randint(0, 8))
                ),
                "".join(
                    rng.choice("abcd") for _ in range(rng.randint(0, 8))
                ),
            )
        )
    # the canonical true-DL vs OSA discriminators
    out += [("ca", "abc"), ("abc", "ca"), ("abcd", "badc"), ("xy", "yx")]
    return out


def test_damerau_twins_match_duckdb():
    con = duckdb.connect()
    for a, b in _pairs():
        want = con.execute(
            "select damerau_levenshtein(?, ?), levenshtein(?, ?)",
            [a, b, a, b],
        ).fetchone()
        dl, lev = int(want[0]), int(want[1])
        assert _damerau_dist(a, b) == dl, (a, b)
        assert _damerau(a, b) == dl, (a, b)
        # the engine's JVM prefilter bound: lev <= 2*DL always
        assert lev <= 2 * dl or (a == b), (a, b, lev, dl)


def test_damerau_known_values():
    assert _damerau_dist("wnidow", "window") == 1  # adjacent swap
    assert _damerau("wnidow", "window") == 1
    assert _damerau_dist("ca", "abc") == 2  # OSA would say 3
    assert _damerau_dist("spark", "spark") == 0


N_CONVS = 60


@pytest.fixture(scope="module")
def didx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("didx"))
    df = generate_transcripts(spark, N_CONVS, partitions=4)
    build_index(
        spark, df, out, n_partitions=4, n_buckets=8, salt=4, n_chunks=2,
        positions=True,
    )
    return load_index(spark, out)


@pytest.fixture(scope="module")
def doracle(didx):
    pdf = didx.docmap.select("doc_id", "text", "role").toPandas()
    return BM25Oracle.from_pandas(pdf)


def _swap_typo(oracle):
    """(term, typo): a high-df corpus term with two distinct adjacent
    characters swapped — Damerau distance 1, plain Levenshtein 2."""
    for t, pl in sorted(
        oracle.postings.items(), key=lambda kv: -len(kv[1])
    ):
        for i in range(len(t) - 1):
            if t[i] != t[i + 1]:
                typo = t[:i] + t[i + 1] + t[i] + t[i + 2:]
                # the typo must not itself be (or be lev<=1 from) another
                # dictionary term, so flag-off genuinely finds nothing
                from parser_indexer_py_spark.index.oracle import (
                    _levenshtein,
                )

                if all(
                    _levenshtein(typo, v) > 1 for v in oracle.postings
                ):
                    return t, typo
    pytest.skip("no swap typo available in this vocabulary")


def test_transposed_typo_needs_the_flag(didx, doracle):
    term, typo = _swap_typo(doracle)
    on = {
        d
        for d, _ in _rows(
            boolean_search(
                didx, f"{typo}~1", k=10**6, with_meta=False,
                fuzzy_transpositions=True,
            )
        )
    }
    off = {
        d
        for d, _ in _rows(
            boolean_search(
                didx, f"{typo}~1", k=10**6, with_meta=False,
            )
        )
    }
    assert set(doracle.postings[term]) <= on
    assert not off  # lev(adjacent swap) == 2 > 1, and no other neighbor


def test_fuzzy_transpositions_engine_vs_oracle(didx, doracle):
    term, typo = _swap_typo(doracle)
    other = next(
        t
        for t, _ in sorted(
            doracle.postings.items(), key=lambda kv: -len(kv[1])
        )
        if t != term
    )
    for q in [
        f"{typo}~1",
        f"{typo}~1 {other}",
        f"+{other} {typo}~1^2",
        f"{other} -{typo}~1",
        f"({typo}~1 OR {other}) AND {term}",  # rewrite must recurse
    ]:
        eng = _rows(
            boolean_search(
                didx, q, k=10, with_meta=False, fuzzy_transpositions=True
            )
        )
        assert eng == doracle.boolean_search(
            q, k=10, fuzzy_transpositions=True
        ), q


def test_damerau_expansion_is_superset(didx, doracle):
    term, typo = _swap_typo(doracle)
    lev = set(_expand_fuzzy(didx, typo, 2))
    dam = set(_expand_fuzzy(didx, typo, 2, transpositions=True))
    assert lev <= dam
    assert term in dam
