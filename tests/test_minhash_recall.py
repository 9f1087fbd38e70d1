"""MinHash-LSH recall property (VERDICT r1 #7): observed candidate recall
on synthetic near-dup pairs must meet the documented formula
1-(1-s^r)^b (entry_text_queries.lsh_recall) at the default (bands, rows).

Pure-Python simulation of the IDENTICAL hash pipeline the Spark query and
the DuckDB oracle run (first 15 hex digits of md5(f"{i}#{gram}") as int),
so this gates the real pipeline's parameters, not an idealized model.
Deterministic: fixed RNG for pair construction, md5 for hashing.
"""

import hashlib

import numpy as np

from parser_indexer_py_spark.entry_text_queries import (
    N_BANDS,
    N_ROWS,
    lsh_recall,
)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _signature(grams: list[str], n_hashes: int) -> list[int]:
    return [min(_md5_long(f"{i}#{g}") for g in grams) for i in range(n_hashes)]


def _is_candidate(sa: list[int], sb: list[int], bands: int, rows: int) -> bool:
    return any(
        sa[b * rows : (b + 1) * rows] == sb[b * rows : (b + 1) * rows]
        for b in range(bands)
    )


def test_lsh_recall_meets_formula():
    n_hashes = N_BANDS * N_ROWS
    rng = np.random.default_rng(7)
    n_pairs, set_size = 200, 100
    hits, predicted = 0, []
    for p in range(n_pairs):
        # pair with |A|=|B|=set_size and ~89 shared grams -> Jaccard ~0.80
        shared = [f"p{p}_s{i}" for i in range(89)]
        a = shared + [f"p{p}_a{i}" for i in range(set_size - 89)]
        b = shared + [f"p{p}_b{i}" for i in range(set_size - 89)]
        rng.shuffle(a), rng.shuffle(b)
        j = 89 / (2 * set_size - 89)
        predicted.append(lsh_recall(j, N_BANDS, N_ROWS))
        if _is_candidate(
            _signature(a, n_hashes), _signature(b, n_hashes), N_BANDS, N_ROWS
        ):
            hits += 1
    observed = hits / n_pairs
    expected = float(np.mean(predicted))
    # defaults are chosen so recall at tau=0.8 is ~0.9997; the observed
    # rate on 200 pairs must not undershoot the formula materially
    assert expected > 0.999, expected
    assert observed >= expected - 0.02, (observed, expected)


def test_lsh_recall_formula_shape():
    # monotone in s; near-0 for dissimilar pairs, near-1 at tau with defaults
    assert lsh_recall(0.8) > 0.999
    assert lsh_recall(0.5) < lsh_recall(0.8)
    assert lsh_recall(0.1) < 0.1
