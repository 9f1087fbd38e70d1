"""Corpus-scale k-means (Lloyd) over an embedding column.

Reference anchor: the ClusteringComponent declaration in
``/root/reference/conf/solr/docs/conf/solrconfig.xml:1297-1319`` (Lingo
over the result page — that page-scoped behavior is
``index.components.cluster_results``). THIS module is the corpus-scale
counterpart a training-data pipeline needs — topic bucketing for data
mixing, dedup scoping, IVF coarse quantizers — expressed Spark-first
rather than as a per-page heuristic.

Determinism contract (what makes a cross-engine DuckDB oracle row
possible for an *iterative* algorithm — the existing IVF entry
deliberately stopped at "first K vectors" centroids for this reason):

- init centroids = embeddings of the K smallest ids, coordinates
  ROUNDED to 6dp;
- every assignment compares cosines ROUNDED to 6dp, ties to the lowest
  centroid id (numpy ``argmax`` returns the first maximum, which is the
  lowest cid because centroid columns are laid out in ascending cid
  order);
- every centroid update is the per-dimension MEAN, ROUNDED to 6dp;
- empty clusters drop (documented Lloyd variant — their cid simply
  stops existing; no re-seeding, which would need a randomness source).

Rounding *at every step* is the mechanism: it absorbs the ~1-ulp
summation-order drift between numpy block sums + Spark's partial
aggregate combine on one side and DuckDB's single-pass SUM/AVG on the
other, so the integer assignments — the actual output — are identical,
not just close. Same accepted float class as the ANN oracle family
(see q_ann_cosine_topk's float policy note).

Scale shape (the 100 TB story):

- per iteration, assignment + partial sums are ONE ``mapInPandas`` pass:
  a numpy matmul per Arrow batch, zero row amplification, zero shuffle
  before the partial aggregate — each partition emits at most
  k*dims tiny (cid, dim, sum, count) rows;
- the cross-partition combine is a groupBy over those partials:
  P*k*dims rows total, map-side-combined;
- centroids live driver-side between iterations (k*dims doubles — a
  bounded driver object, like the WAND term-stat rows) and ship back
  inside the next iteration's closure;
- the FINAL assignment is the same zero-shuffle mapInPandas matmul pass
  the fit steps use (one BLAS call per Arrow batch) — a Catalyst
  transform/aggregate formulation was measured slower because
  higher-order functions are interpreted (CodegenFallback), and sharing
  the fit's float path keeps one rounding story end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seed_centroids(emb: DataFrame, k: int, id_col: str, vec_col: str):
    """Deterministic init: the k smallest ids, coordinates rounded 6dp."""
    import numpy as np

    rows = emb.select(id_col, vec_col).orderBy(F.asc(id_col)).limit(k).collect()
    return [
        (int(r[id_col]), np.round(np.asarray(r[vec_col], dtype=np.float64), 6))
        for r in rows
    ]


def _lloyd_update(emb: DataFrame, centroids, id_col: str, vec_col: str):
    """One Lloyd step: assign every vector to its max-rounded-cosine
    centroid, return the per-cluster rounded mean vectors. Assignment and
    per-partition partial sums happen in one mapInPandas pass (numpy
    matmul per Arrow batch); the shuffle is only the k*dims-row partial
    aggregate. Empty clusters drop."""
    import numpy as np

    cids = np.array([c for c, _ in centroids], dtype=np.int64)
    M = np.stack([v for _, v in centroids])  # k x dims, already rounded
    n_dims = M.shape[1]
    cnorm = np.sqrt((M * M).sum(axis=1))

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            vnorm = np.sqrt((E * E).sum(axis=1))
            # cosine in the oracle's exact form dot / (|v| * |c|)
            S = np.round((E @ M.T) / (vnorm[:, None] * cnorm[None, :]), 6)
            A = np.argmax(S, axis=1)  # first max = lowest cid
            out_cid, out_i, out_s, out_n = [], [], [], []
            for j in range(len(cids)):
                mask = A == j
                n = int(mask.sum())
                if not n:
                    continue
                psum = E[mask].sum(axis=0)
                out_cid.extend([int(cids[j])] * n_dims)
                out_i.extend(range(n_dims))
                out_s.extend(psum.tolist())
                out_n.extend([n] * n_dims)
            yield pd.DataFrame(
                {"cid": out_cid, "i": out_i, "s": out_s, "n": out_n}
            )

    partials = emb.select(id_col, vec_col).mapInPandas(
        gen, "cid long, i int, s double, n long"
    )
    agg = (
        partials.groupBy("cid", "i")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()  # bounded: k * dims rows
    )
    sums: dict = {}
    for r in agg:
        vec, cnt = sums.setdefault(int(r["cid"]), [np.zeros(n_dims), 0])
        vec[int(r["i"])] = float(r["s"])
        sums[int(r["cid"])][1] = int(r["n"])
    return [
        (cid, np.round(vec / cnt, 6))
        for cid, (vec, cnt) in sorted(sums.items())
    ]


def kmeans_fit(
    emb: DataFrame,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic spherical Lloyd: returns [(cid, centroid ndarray)]
    sorted by cid after ``iters`` update steps. Centroid = plain mean
    (cosine to an unnormalized mean has the same argmax as to the
    normalized one, so the extra normalization float ops are omitted)."""
    cents = _seed_centroids(emb, k, id_col, vec_col)
    for _ in range(iters):
        cents = _lloyd_update(emb, cents, id_col, vec_col)
    return cents


def kmeans_assign(
    emb: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment as one zero-shuffle mapInPandas matmul
    pass — the EXACT numpy expression ``_lloyd_update`` assigns with
    (rounded-6dp cosine in the oracle's dot/(|v||c|) form; ``argmax``
    first-max tie-break = lowest cid, centroids in ascending cid order),
    so fit-step and final assignments share one float path and the
    equality gate in tests/test_clustering_kmeans.py is the same
    expression verbatim. Replaces the previous Catalyst
    transform/aggregate formulation: higher-order functions are
    interpreted (CodegenFallback), costing k x dims allocations per row,
    where the batched numpy matmul is one BLAS call per Arrow batch
    (guide §4.2). Still embarrassingly parallel scan work at 1000
    executors — no shuffle on either side of the pass.

    Output: (id_col, cluster int, cosine double)."""
    import numpy as np

    cids = np.array([c for c, _ in centroids], dtype=np.int64)
    M = np.stack([v for _, v in centroids])  # ascending cid order
    cnorm = np.sqrt((M * M).sum(axis=1))

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            vnorm = np.sqrt((E * E).sum(axis=1))
            S = np.round((E @ M.T) / (vnorm[:, None] * cnorm[None, :]), 6)
            A = np.argmax(S, axis=1)  # first max = lowest cid
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": cids[A].astype(np.int32),
                    "cosine": S[np.arange(len(A)), A],
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} long, cluster int, cosine double"
    )


def kmeans_cte_chain(k: int, iters: int) -> str:
    """The shared DuckDB CTE chain: init + ``iters`` Lloyd steps + a
    final per-(vector, centroid) rounded-cosine table ``sf``. Reused by
    the k-means oracle (assignment = QUALIFY top-1 of sf) and the
    IVF-with-trained-quantizer oracle (probes = top-NPROBE of sf at the
    query vector)."""
    sql = f"""
WITH ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS e,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), c0 AS (
  SELECT vec_id AS cid, i, ROUND(e, 6) AS ce FROM ex WHERE vec_id < {k}
)"""
    prev = "c0"
    for t in range(1, iters + 1):
        sql += f"""
, s{t} AS (
  SELECT a.vec_id, c.cid,
         ROUND(SUM(a.e * c.ce) /
               (SQRT(SUM(a.e * a.e)) * SQRT(SUM(c.ce * c.ce))), 6) AS cos
  FROM ex a JOIN {prev} c ON a.i = c.i GROUP BY a.vec_id, c.cid
), a{t} AS (
  SELECT vec_id, cid FROM s{t}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) = 1
), c{t} AS (
  SELECT a.cid, x.i, ROUND(AVG(x.e), 6) AS ce
  FROM a{t} a JOIN ex x ON a.vec_id = x.vec_id GROUP BY a.cid, x.i
)"""
        prev = f"c{t}"
    sql += f"""
, sf AS (
  SELECT a.vec_id, c.cid,
         ROUND(SUM(a.e * c.ce) /
               (SQRT(SUM(a.e * a.e)) * SQRT(SUM(c.ce * c.ce))), 6) AS cos
  FROM ex a JOIN {prev} c ON a.i = c.i GROUP BY a.vec_id, c.cid
)"""
    return sql


def kmeans_sql(k: int, iters: int) -> str:
    """The DuckDB oracle twin of kmeans_fit + kmeans_assign: the identical
    iteration chain expressed as CTEs (declarative join + AVG per step —
    linear in corpus size but with the 64x unnest amplification the
    engine's mapInPandas pass avoids; the oracle's job is exactness,
    not scale)."""
    return kmeans_cte_chain(k, iters) + """
SELECT vec_id, CAST(cid AS INTEGER) AS cluster, cos AS cosine FROM sf
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) = 1
"""
