"""Connected components (operators/components.py).

Gates:
- toy graphs: chain + pair + singleton resolve to min-id labels;
- a 200-node chain converges (pointer jumping — plain neighbor-min
  propagation would need 200 rounds, far past max_iter=60, so passing
  proves the path-halving step actually engages);
- the driver query equals a pure-Python union-find twin over the same
  verified near-dup pairs at sf0.001.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _cc(spark, node_ids, pairs, **kw):
    from parser_indexer_py_spark.operators.components import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] or [(None, None)], "a long, b long"
    )
    if not pairs:
        edges = edges.filter("a IS NOT NULL")
    out = connected_components(nodes, edges, **kw)
    return {r["id"]: r["component"] for r in out.collect()}

def test_toy_graph(spark):
    got = _cc(spark, range(8), [(0, 1), (1, 2), (2, 3), (5, 6)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7}


def test_no_edges(spark):
    got = _cc(spark, [3, 1, 2], [])
    assert got == {1: 1, 2: 2, 3: 3}


def test_long_chain_converges(spark):
    # driver_edge_cap=0 forces the DISTRIBUTED loop (the small-graph
    # union-find cutover would otherwise absorb this case), so passing
    # still proves path halving engages
    n = 200
    got = _cc(
        spark, range(n), [(i, i + 1) for i in range(n - 1)],
        driver_edge_cap=0,
    )
    assert set(got.values()) == {0}


def test_driver_and_distributed_paths_agree(spark):
    """The r6 small-graph cutover: driver union-find output must equal
    the distributed fixpoint on the same graph, including untouched
    nodes."""
    ids = range(40)
    pairs = [(0, 1), (1, 2), (5, 9), (9, 12), (12, 5), (30, 31)]
    via_driver = _cc(spark, ids, pairs)  # under the default cap
    via_loop = _cc(spark, ids, pairs, driver_edge_cap=0)
    assert via_driver == via_loop


def test_driver_query_matches_union_find(spark):
    from parser_indexer_py_spark.entry_text_queries import (
        q_dedup_components,
        q_dedup_minhash_lsh,
    )

    pairs = [
        (r["da"], r["db"]) for r in q_dedup_minhash_lsh(spark, SF_DIR).collect()
    ]
    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]

    parent = {i: i for i in doc_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_comp = {i: find(i) for i in doc_ids}
    sizes: dict = {}
    for c in want_comp.values():
        sizes[c] = sizes.get(c, 0) + 1

    got = {
        r["doc_id"]: (r["component"], r["csize"])
        for r in q_dedup_components(spark, SF_DIR).collect()
    }
    assert got == {
        i: (want_comp[i], sizes[want_comp[i]]) for i in doc_ids
    }
    # the corpus actually exercises the operator: planted near-dup
    # clusters exist (some component bigger than a lone pair)
    assert max(sizes.values()) >= 2


def test_keep_canonical_policy(spark):
    """Exactly one kept doc per component, and it is the longest
    (smallest doc_id at ties)."""
    from parser_indexer_py_spark.entry_text_queries import (
        q_dedup_keep_canonical,
    )

    rows = q_dedup_keep_canonical(spark, SF_DIR).collect()
    chars = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    for comp, members in by_comp.items():
        kept = [r["doc_id"] for r in members if r["kept"]]
        assert len(kept) == 1
        want = min(
            (m["doc_id"] for m in members),
            key=lambda d: (-chars[d], d),
        )
        assert kept[0] == want


def test_random_graphs_match_union_find(spark):
    """Property gate: on randomized graph shapes (chains, stars, cliques,
    sparse noise) the operator equals union-find. Seeded RNG — the
    failure case is replayable."""
    import random

    rng = random.Random(20260818)
    for trial in range(4):
        n = rng.randrange(30, 120)
        ids = list(range(n))
        edges = set()
        # sparse random edges
        for _ in range(rng.randrange(10, n)):
            a, b = rng.sample(ids, 2)
            edges.add((min(a, b), max(a, b)))
        # one chain and one star to force interesting diameters
        chain = rng.sample(ids, min(12, n))
        edges.update(
            (min(x, y), max(x, y)) for x, y in zip(chain, chain[1:])
        )
        hub = rng.choice(ids)
        for leaf in rng.sample(ids, 5):
            if leaf != hub:
                edges.add((min(hub, leaf), max(hub, leaf)))

        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {i: find(i) for i in ids}

        got = _cc(spark, ids, sorted(edges))
        assert got == want, f"trial {trial} (n={n}) diverged"
