"""Measure the round-5d surfaces at 6.5M docs over the topical skew
index (built by scripts/bench_skewed.py): the block-join parent query
(index/blockjoin.py) and the searcher caches (index/caches.py).

    python scripts/bench_caches_blockjoin.py [index_root]

Refuses to run beside another live Spark JVM (same policy as
bench_scaling.py). Prints one JSON line per measurement."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def other_spark_alive() -> bool:
    out = subprocess.run(
        ["pgrep", "-af", "java"], capture_output=True, text=True
    ).stdout
    return any("spark" in ln.lower() for ln in out.splitlines())


def main() -> None:
    if other_spark_alive():
        print("REFUSING: another Spark JVM is alive", file=sys.stderr)
        raise SystemExit(2)
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew_idx_200000"
    from parser_indexer_py_spark.index.blockjoin import parent_search
    from parser_indexer_py_spark.index.boolean import boolean_search
    from parser_indexer_py_spark.index.caches import SearcherCaches
    from parser_indexer_py_spark.index.search import load_index
    from parser_indexer_py_spark.session import get_spark

    spark = get_spark("bench-cbj", cores=8, shuffle_partitions=32)
    idx = load_index(spark, root)

    def run(name, fn, reps=2):
        best, n = None, 0
        for _ in range(reps):
            t0 = time.time()
            n = len(fn().collect())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({
            "surface": name, "sec": round(best, 2), "rows": n,
            "n_docs": idx.n_docs,
        }), flush=True)

    q = "bace cedi"
    # conversation ranking: full child match set + rollup (no top-k
    # truncation possible — compare against the plain doc top-10)
    run("doc_top10_baseline", lambda: boolean_search(idx, q, k=10))
    for mode in ("max", "total"):
        run(
            f"parent_rollup_{mode}",
            lambda m=mode: parent_search(idx, q, k=10, score_mode=m),
        )

    caches = SearcherCaches()
    fq = "role:assistant"
    t0 = time.time()
    n0 = len(caches.search(idx, q, rows=10, fq=fq).collect())
    cold = time.time() - t0
    t0 = time.time()
    n1 = len(caches.search(idx, q, rows=10, start=10, fq=fq).collect())
    warm_page = time.time() - t0
    t0 = time.time()
    n2 = len(caches.search(idx, "cedi wedi", rows=10, fq=fq).collect())
    warm_filter = time.time() - t0
    print(json.dumps({
        "surface": "caches", "cold_page_sec": round(cold, 2),
        "cached_window_page_sec": round(warm_page, 3),
        "new_q_cached_filter_sec": round(warm_filter, 2),
        "rows": [n0, n1, n2], "stats": caches.stats,
    }), flush=True)


if __name__ == "__main__":
    main()
