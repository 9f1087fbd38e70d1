"""Optimization-round measurement harness (guide §1): re-runs SELECTED
bench entries in isolation with more repetitions than the frozen bench.py,
so before/after deltas are readable on a noisy host. bench.py itself is
FROZEN for measurement; this file only produces evidence cited in
OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py <entry> [<entry> ...]      # default reps=3
  BENCH_EXTRA_REPS=5 python bench_extra.py builds  # groups: builds, queries,
                                                   # searches, segments, all

Entries mirror bench.py's names and methodology (same corpus, same
functions, .collect() termination) so numbers are directly comparable;
query entries additionally get a `<name>__noop` variant that writes to the
noop sink (computes every column, avoids driver collect cost — guide §1.4).
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
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
CONVS_PER_SF = 40_000


def infer_sf(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.1


def main() -> None:
    sf = infer_sf(SF_DIR)
    spark = get_spark("bench_extra", cores=CORES)
    sc = spark.sparkContext
    want = set(sys.argv[1:]) or {"queries"}
    timings: dict[str, list[float]] = {}

    def run(name: str, fn, reps: int = REPS) -> None:
        samples = []
        for _ in range(reps):
            sc.setJobDescription(name)
            t = time.time()
            fn()
            samples.append(round(time.time() - t, 3))
            sc.setJobDescription(None)
        timings[name] = samples

    from parser_indexer_py_spark.datagen import generate_transcripts
    from parser_indexer_py_spark.index.build import build_index
    from parser_indexer_py_spark.index.search import load_index, search

    n_convs = max(50, int(CONVS_PER_SF * sf))
    n_parts = max(CORES // 2, min(2 * CORES, int(n_convs * 33 / 8000)))
    idx_dir = os.path.join(
        os.environ.get("BENCH_TMP", "/tmp"), f"benchx_idx_sf{sf}_c{CORES}"
    )
    df = generate_transcripts(spark, n_convs)

    def sel(group: str, *names: str) -> bool:
        return bool(want & ({group, "all"} | set(names)))

    # ---- builds -----------------------------------------------------------
    if sel("builds", "index_build"):
        def one_build():
            shutil.rmtree(idx_dir, ignore_errors=True)
            build_index(
                spark, df, idx_dir, n_partitions=n_parts, n_chunks=1,
                checkpoint_input=True,
            )
        run("index_build", one_build)

    if sel("builds", "index_build_positional"):
        def one_build_pos():
            shutil.rmtree(idx_dir + "_pos", ignore_errors=True)
            build_index(
                spark, df, idx_dir + "_pos", n_partitions=n_parts,
                n_chunks=1, checkpoint_input=True, positions=True,
            )
        run("index_build_positional", one_build_pos)

    # ---- searches over the main index ------------------------------------
    if sel("searches", "search_hot", "search_phrase", "segments"):
        if not os.path.exists(os.path.join(idx_dir, "globals.json")):
            shutil.rmtree(idx_dir, ignore_errors=True)
            build_index(
                spark, df, idx_dir, n_partitions=n_parts, n_chunks=1,
                checkpoint_input=True,
            )
        idx = load_index(spark, idx_dir).cache()
        if sel("searches"):
            run("search_hot", lambda: search(idx, "bace", k=10).collect())
            run(
                "search_multi_or",
                lambda: search(idx, "bace cedi wedi rikizudi", k=10).collect(),
            )
            run(
                "search_pruned",
                lambda: search(
                    idx, "bace cedi wedi rikizudi", k=10, mode="pruned"
                ).collect(),
            )
        if sel("searches", "search_phrase"):
            pdir = idx_dir + "_pos"
            if not os.path.exists(os.path.join(pdir, "globals.json")):
                shutil.rmtree(pdir, ignore_errors=True)
                build_index(
                    spark, df, pdir, n_partitions=n_parts, n_chunks=1,
                    checkpoint_input=True, positions=True,
                )
            pidx = load_index(spark, pdir).cache()
            run(
                "search_phrase",
                lambda: search(pidx, "bace cedi", k=10, phrase=True).collect(),
            )
            pidx.uncache()
        if sel("segments"):
            from pyspark.sql import functions as F

            from parser_indexer_py_spark.streaming.incremental import (
                SegmentedIndex,
                search_segments_df,
            )

            seg_root = os.path.join(
                os.environ.get("BENCH_TMP", "/tmp"), f"benchx_seg_sf{sf}"
            )
            seg_src = generate_transcripts(spark, max(30, n_convs // 8))

            def build_segments():
                shutil.rmtree(seg_root, ignore_errors=True)
                s = SegmentedIndex(spark, seg_root)
                for i in range(2):
                    s.append_batch(
                        seg_src.filter(
                            F.pmod(F.crc32(F.col("conv_id")), F.lit(2)) == i
                        ),
                        i,
                    )
                return s

            run("segment_build_x2", build_segments)
            seg = SegmentedIndex(spark, seg_root)
            run(
                "segment_search",
                lambda: search_segments_df(
                    seg, "bace cedi wedi rikizudi", k=10
                ).collect(),
            )
            run(
                "segment_search_pruned",
                lambda: search_segments_df(
                    seg, "bace cedi wedi rikizudi", k=10, mode="pruned",
                    full_cutover=0,
                ).collect(),
            )

            def compact():
                shutil.rmtree(seg_root, ignore_errors=True)
                s = SegmentedIndex(spark, seg_root)
                for i in range(2):
                    s.append_batch(
                        seg_src.filter(
                            F.pmod(F.crc32(F.col("conv_id")), F.lit(2)) == i
                        ),
                        i,
                    )
                t = time.time()
                s.compact_tiered(min_merge=2)
                return time.time() - t

            samples = [round(compact(), 3) for _ in range(REPS)]
            timings["segment_compact_tiered"] = samples
        idx.uncache() if sel("searches", "segments") else None

    # ---- operator queries over the sf tables ------------------------------
    from parser_indexer_py_spark import entry_queries as Q
    from parser_indexer_py_spark import entry_text_queries as TQ

    qmap = {
        "pricing_summary": Q.q_pricing_summary,
        "sessionize": Q.q_sessionize,
        "block_join_rollup": Q.q_block_join_rollup,
        "dedup_minhash_lsh": TQ.q_dedup_minhash_lsh,
        "ann_cosine_topk": TQ.q_ann_cosine_topk,
        "embedding_near_dup_lsh": TQ.q_embedding_near_dup_lsh,
        "bm25_docs_topk": TQ.q_bm25_docs_topk,
        "more_like_this": TQ.q_more_like_this,
        "parent_rollup": TQ.q_parent_rollup,
        "facet_range_date": TQ.q_facet_range_date,
        "decontaminate": TQ.q_decontaminate,
        "gopher_repetition": TQ.q_gopher_repetition,
        "pii_scrub": TQ.q_pii_scrub,
        "cluster_kmeans": TQ.q_cluster_kmeans,
        "ann_ivf_kmeans": TQ.q_ann_ivf_kmeans,
        "dedup_components": TQ.q_dedup_components,
        "quality_unigram_xent": TQ.q_quality_unigram_xent,
        "dedup_keep_canonical": TQ.q_dedup_keep_canonical,
        "mix_temperature": TQ.q_mix_temperature,
        "mix_by_cluster": TQ.q_mix_by_cluster,
        "dedup_substring_signal": TQ.q_dedup_substring_signal,
        "dedup_substring_spans": TQ.q_dedup_substring_spans,
    }
    for name, fn in qmap.items():
        if sel("queries", name):
            run(name, lambda fn=fn: fn(spark, SF_DIR).collect())
        if f"{name}__noop" in want:
            run(
                f"{name}__noop",
                lambda fn=fn: fn(spark, SF_DIR)
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )

    out = {
        "metric": "bench_extra",
        "sf": sf,
        "cores": CORES,
        "reps": REPS,
        "queries_min": {k: min(v) for k, v in timings.items()},
        "samples": timings,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
