"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Components:
- transcripts inverted-index build (the north-star pipeline) on a
  deterministic synthetic corpus sized to the scale factor, reporting
  turns/sec;
- BM25 top-10 searches (hot term / multi-term OR / block-max pruned path);
- representative operator queries over $SPARK_GRAFT_SF_DIR parquet
  (aggregation, dedup LSH, ANN, sessionization).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Scaling evidence (local[8] vs local[32]) is produced by
scripts/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parser_indexer_py_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# ~33 turns/conv average -> sf0.1 ≈ 132k turns, sf0.01 ≈ 13k
CONVS_PER_SF = 40_000


def infer_sf(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.1


def main() -> None:
    sf = infer_sf(SF_DIR)
    spark = get_spark("bench", cores=CORES)
    timings: dict[str, float] = {}
    t_all = time.time()

    # ---- index build -------------------------------------------------------
    from parser_indexer_py_spark.datagen import generate_transcripts
    from parser_indexer_py_spark.index.build import build_index
    from parser_indexer_py_spark.index.search import load_index, search

    n_convs = max(50, int(CONVS_PER_SF * sf))
    idx_dir = os.path.join(
        os.environ.get("BENCH_TMP", "/tmp"), f"bench_idx_sf{sf}_c{CORES}"
    )
    df = generate_transcripts(spark, n_convs)
    # partition sizing: ~8k docs/partition at this corpus scale (fixed
    # per-task Python/Arrow costs amortize; measured at 130k docs/32 cores:
    # P=64 ~8s vs P=32 ~5.3s vs P=16 ~4.3s warm — 16, i.e. CORES/2, wins
    # there because single-JVM local mode stops scaling past ~8-16 threads
    # anyway; see DESIGN.md's local-mode-ceiling note). Floor = CORES/2.
    n_parts = max(CORES // 2, min(2 * CORES, int(n_convs * 33 / 8000)))
    # best-of-reps for the headline build too (same ±30% host-burst
    # rationale as run()); each rep is a full from-scratch build
    build_best = None
    for _ in range(int(os.environ.get("BENCH_BUILD_REPS", "2"))):
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.time()
        build_index(
            spark, df, idx_dir, n_partitions=n_parts, n_chunks=1,
            checkpoint_input=True,
        )
        dt = time.time() - t0
        build_best = dt if build_best is None else min(build_best, dt)
    idx = load_index(spark, idx_dir)
    timings["index_build"] = build_best
    turns_per_sec = idx.n_docs / timings["index_build"]
    idx.cache()  # query-heavy phase: pin segments in executor memory

    # ---- searches ----------------------------------------------------------
    def run(name: str, fn, reps: int = 2) -> None:
        """min-of-reps: the host shows ±30%+ bursts on identical jobs; the
        minimum is the standard noise-robust latency estimator. Builds are
        single-shot (reps=1): too expensive, and throughput is the metric."""
        best = None
        for _ in range(reps):
            t = time.time()
            fn()
            dt = time.time() - t
            best = dt if best is None else min(best, dt)
        timings[name] = best

    run("search_hot", lambda: search(idx, "bace", k=10).collect())
    run(
        "search_multi_or",
        lambda: search(idx, "bace cedi wedi rikizudi", k=10).collect(),
    )
    run(
        "search_pruned",
        lambda: search(idx, "bace cedi wedi rikizudi", k=10, mode="pruned").collect(),
    )
    run(
        "search_filtered",
        lambda: search(idx, "bace cedi", k=10, role="assistant").collect(),
    )

    # ---- positional index + phrase search (round-3 capability) -------------
    # separate build so the headline index_build stays comparable across
    # rounds; the delta between the two numbers IS the positional payload
    # cost (~cf extra varints encoded/merged)
    pidx_dir = idx_dir + "_pos"
    shutil.rmtree(pidx_dir, ignore_errors=True)
    t0 = time.time()
    build_index(
        spark, df, pidx_dir, n_partitions=n_parts, n_chunks=1,
        checkpoint_input=True, positions=True,
    )
    timings["index_build_positional"] = time.time() - t0
    pidx = load_index(spark, pidx_dir).cache()
    run(
        "search_phrase",
        lambda: search(pidx, "bace cedi", k=10, phrase=True).collect(),
    )
    from parser_indexer_py_spark.index.boolean import boolean_search

    run(
        "search_boolean",
        lambda: boolean_search(
            pidx, 'cedi +bace -rikizudi "bace cedi"', k=10
        ).collect(),
    )
    # round-4: negation/boost queries delegate to the WAND pruned path
    run(
        "search_boolean_neg_pruned",
        lambda: boolean_search(
            pidx, "cedi +bace -rikizudi wedi", k=10, mode="pruned"
        ).collect(),
    )
    # round-4: parenthesized group + fuzzy term through the classic parser
    run(
        "search_lucene_grouped",
        lambda: boolean_search(
            pidx, "(bace OR cedi) AND wedi bacq~1", k=10
        ).collect(),
    )
    from parser_indexer_py_spark.index.boolean import edismax_search, select

    # round-4: edismax mm=100% + pf phrase boost (positions available here)
    run(
        "edismax_mm_pf",
        lambda: edismax_search(pidx, "bace cedi", k=10).collect(),
    )
    pidx.uncache()
    # round-4: /select facet.range buckets + result grouping over the full
    # match set of a hot term
    run(
        "select_facet_range",
        lambda: select(
            idx, q="bace", rows=0, facet_range=("turn_idx", 0, 40, 10)
        )["range_facets"].collect(),
    )
    run(
        "select_grouping",
        lambda: select(idx, q="bace", rows=0, group_field="role")[
            "groups"
        ].count(),
    )

    # ---- streaming segment search (distributed multi-segment BM25) ---------
    from parser_indexer_py_spark.streaming.incremental import (
        SegmentedIndex,
        search_segments_df,
    )

    seg_root = os.path.join(
        os.environ.get("BENCH_TMP", "/tmp"), f"bench_seg_sf{sf}_c{CORES}"
    )
    shutil.rmtree(seg_root, ignore_errors=True)
    seg = SegmentedIndex(spark, seg_root)
    seg_src = generate_transcripts(spark, max(30, n_convs // 8))
    from pyspark.sql import functions as F

    def build_segments():
        for i in range(2):  # two arrival chunks -> two segments
            seg.append_batch(
                seg_src.filter(F.pmod(F.crc32(F.col("conv_id")), F.lit(2)) == i), i
            )

    run("segment_build_x2", build_segments, reps=1)
    run(
        "segment_search",
        lambda: search_segments_df(seg, "bace cedi wedi rikizudi", k=10).collect(),
    )
    run(
        "segment_search_pruned",
        lambda: search_segments_df(
            seg, "bace cedi wedi rikizudi", k=10, mode="pruned",
            full_cutover=0,
        ).collect(),
    )
    # tiered postings-level merge of the two segments (no re-tokenization;
    # cost ~ merged postings bytes — compare against segment_build_x2)
    run(
        "segment_compact_tiered",
        lambda: seg.compact_tiered(min_merge=2),
        reps=1,
    )

    # ---- operator queries over the sf tables --------------------------------
    from parser_indexer_py_spark import entry_queries as Q
    from parser_indexer_py_spark import entry_text_queries as TQ

    for name, fn in [
        ("pricing_summary", Q.q_pricing_summary),
        ("sessionize", Q.q_sessionize),
        ("block_join_rollup", Q.q_block_join_rollup),
        ("dedup_minhash_lsh", TQ.q_dedup_minhash_lsh),
        ("ann_cosine_topk", TQ.q_ann_cosine_topk),
        ("embedding_near_dup_lsh", TQ.q_embedding_near_dup_lsh),
        ("bm25_docs_topk", TQ.q_bm25_docs_topk),
        ("more_like_this", TQ.q_more_like_this),
    ]:
        run(name, lambda fn=fn: fn(spark, SF_DIR).collect())

    total = time.time() - t_all
    print(
        json.dumps(
            {
                "metric": "index_build_plus_query_suite",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": sf,
                "cores": CORES,
                "index_docs": idx.n_docs,
                "index_turns_per_sec": round(turns_per_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
