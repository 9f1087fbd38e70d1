"""Measure the round-5b searchComponent twins at 6.5M docs over the
topical skew index (built by scripts/bench_skewed.py). Usage:

    python scripts/bench_components.py [index_root]

Refuses to run beside another live Spark JVM (same policy as
bench_scaling.py — cross-JVM contention is the round-4 bench scare).
Prints one JSON line per component with wall seconds and result size.
"""

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
    from parser_indexer_py_spark.index.components import (
        cluster_results,
        elevate,
        stats_field,
        suggest,
        term_vectors,
        terms_enum,
    )
    from parser_indexer_py_spark.index.search import load_index
    from parser_indexer_py_spark.session import get_spark

    spark = get_spark("bench-components", cores=8, shuffle_partitions=32)
    idx = load_index(spark, root)
    first_ids = [r["doc_id"] for r in idx.docmap.orderBy("doc_id").limit(5).collect()]

    def run(name, fn):
        t0 = time.time()
        n = fn().count()
        print(json.dumps({
            "component": name, "sec": round(time.time() - t0, 2),
            "rows": n, "n_docs": idx.n_docs,
        }), flush=True)

    run("terms_enum", lambda: terms_enum(idx, "ba", mincount=2, limit=20))
    run("term_vectors_5docs", lambda: term_vectors(idx, first_ids))
    run("stats_field_dl_by_role", lambda: stats_field(idx.docmap, "dl", by="role"))
    run(
        "elevate",
        lambda: elevate(idx, "bace cedi", [first_ids[0], first_ids[1]], k=10),
    )
    run("cluster_results_k20", lambda: cluster_results(idx, "bace cedi", k=20))
    # /suggest over the full 6.5M-doc docmap as the dictionary: the whole
    # cost is one codegen'd scan + TakeOrderedAndProject (no join/UDF)
    run("suggest_fuzzy", lambda: suggest(idx.docmap, "jekide", field="text", count=20))

    # round-5c surfaces -----------------------------------------------------
    from parser_indexer_py_spark.index.boolean import cursor_page
    from parser_indexer_py_spark.index.boolean import select as solr_select
    from parser_indexer_py_spark.index.debug import explain

    run("debug_explain_k10", lambda: explain(idx, "bace cedi", k=10))
    run(
        "facet_pivot_role_tool",
        lambda: solr_select(
            idx, "bace", rows=0, facet_pivot=("role", "tool"), facet_limit=20
        )["pivot_facets"],
    )

    # deep paging A/B at depth 100k over the hot-term match set: the
    # offset page's top-k heap (and driver CollectLimit) carry
    # depth+rows rows; the cursor page stays rows-bounded. The cursor
    # mark is positioned from an UNTIMED offset page so both timed runs
    # return the identical 10 docs (asserted).
    depth = 100_000
    boundary = solr_select(idx, "bace", rows=1, start=depth - 1)[
        "response"
    ].collect()[0]
    from parser_indexer_py_spark.index.boolean import encode_cursor

    mark = encode_cursor([boundary["score"], boundary["doc_id"]])

    def timed(name, thunk):
        t0 = time.time()
        out = thunk()
        print(
            json.dumps(
                {
                    "component": name,
                    "sec": round(time.time() - t0, 2),
                    "rows": len(out),
                    "n_docs": idx.n_docs,
                }
            ),
            flush=True,
        )
        return out

    off = timed(
        "deep_page_offset_100k",
        lambda: solr_select(idx, "bace", rows=10, start=depth)[
            "response"
        ].collect(),
    )
    cur = timed(
        "deep_page_cursor_100k",
        lambda: cursor_page(idx, "bace", rows=10, cursor_mark=mark)[
            "response"
        ].collect(),
    )
    assert [r["doc_id"] for r in off] == [r["doc_id"] for r in cur], (
        "cursor page != offset page at depth 100k"
    )


if __name__ == "__main__":
    main()
