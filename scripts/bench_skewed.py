"""Skewed-corpus pruning evidence at 6.5M docs (round-5, verdict task 2).

The flat generator's iid zipf draws give every hot-term block the same
saturated bound, so round-4's MLT / grouped-AND delegations measured
parity (the completeness check correctly fell back — BENCH/BASELINE.md
round 4). This script builds the TOPICAL corpus (datagen topical=0.5:
bursty per-doc tf, per-conversation docID clustering) at the same scale
and measures the round-4/5 delegations pruned-vs-full, with
wand.PRUNE_STATS certifying which path answered (the "zero fallback
calls" instrumentation the round-4 verdict asked for).

Queries:
- more_like_this on a topical doc (term selection now finds genuinely
  distinctive mid-band terms) vs full evaluation of the same terms;
- (band1 OR band2) AND hot — the grouped-AND shape at realistic mixed
  document frequencies — pruned vs full;
- (bace OR cedi) AND wedi — the all-hot round-4 shape, kept for the
  honest negative: saturated BM25 bounds mean no block structure, the
  volume guard routes it to full (same regime as Lucene on stopword
  disjunctions);
- edismax_qf (text + title) pruned vs full (verdict task 1's number).

Appends a dated section to BENCH/BASELINE.md. Refuses to run beside
another Spark JVM (same provenance rule as bench_scaling).

Usage: python scripts/bench_skewed.py [n_convs] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_scaling import _refuse_if_spark_running  # noqa: E402


def main() -> None:
    _refuse_if_spark_running()
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from parser_indexer_py_spark.datagen import generate_transcripts
    from parser_indexer_py_spark.index.boolean import (
        boolean_search, edismax_qf,
    )
    from parser_indexer_py_spark.index.build import build_index
    from parser_indexer_py_spark.index.mlt import interesting_terms, more_like_this
    from parser_indexer_py_spark.index.search import load_index, search
    from parser_indexer_py_spark.index.wand import (
        PRUNE_STATS, reset_prune_stats,
    )
    from parser_indexer_py_spark.session import get_spark

    spark = get_spark("bench-skewed", cores=cores)
    corpus = f"/tmp/skew_corpus_{n_convs}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        generate_transcripts(
            spark, n_convs, partitions=32, topical=0.5, min_tokens=16
        ).write.mode("overwrite").parquet(corpus)
    df = spark.read.parquet(corpus)

    idx_dir = f"/tmp/skew_idx_{n_convs}"
    build_index(spark, df, idx_dir, n_partitions=32, n_chunks=2)
    idx = load_index(spark, idx_dir)

    tidx_dir = f"/tmp/skew_tidx_{n_convs}"
    title = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 3), " ")
    build_index(
        spark, df.withColumn("text", title), tidx_dir, n_partitions=32,
        n_chunks=2,
    )
    tidx = load_index(spark, tidx_dir)
    print(f"CORPUS n_docs={idx.n_docs} avgdl={idx.avgdl:.2f}", flush=True)

    # two mid-band topic-class terms with the largest df (bursty + enough
    # postings volume to matter), deterministic pick
    band = [
        r["term"]
        for r in idx.termstats.filter(
            (F.col("df") > idx.n_docs // 200) & (F.col("df") < idx.n_docs // 20)
        )
        .orderBy(F.desc("df"), "term")
        .limit(2)
        .collect()
    ]
    b1, b2 = band
    results: dict = {}

    def run(name, fn, reps=2, pruned=False):
        best, stats = None, None
        for _ in range(reps):
            if pruned:
                reset_prune_stats()
            t0 = time.time()
            n = len(fn().collect())
            dt = time.time() - t0
            if best is None or dt < best:
                best, stats = dt, (dict(PRUNE_STATS) if pruned else None)
        results[name] = {
            "sec": round(best, 2), "rows": n,
            **({"prune_stats": stats} if pruned else {}),
        }
        print(f"{name}: {best:.2f}s rows={n} {stats or ''}", flush=True)

    # --- MLT on a topical doc ------------------------------------------------
    # a doc containing band term b1 with high tf => its interesting terms
    # are its conversation's topics
    src_doc = int(
        search(idx, b1, k=1, with_meta=False).collect()[0]["doc_id"]
    )
    terms = [t for t, _ in interesting_terms(idx, src_doc)]
    tdfs = {
        r["term"]: r["df"]
        for r in idx.termstats.filter(F.col("term").isin(terms)).collect()
    }
    print(f"MLT doc={src_doc} terms={[(t, tdfs.get(t)) for t in terms]}",
          flush=True)
    run("mlt_pruned", lambda: more_like_this(idx, src_doc, with_meta=False),
        pruned=True)
    run(
        "mlt_full_eval_same_terms",
        lambda: search(
            idx, " ".join(sorted(terms)), k=4, with_meta=False
        ),
    )

    # --- single bursty band term: clustered candidates, block pruning -------
    run(
        f"band_term_pruned [{b1}]",
        lambda: search(
            idx, b1, k=10, mode="pruned", full_cutover=0, with_meta=False
        ),
        pruned=True,
    )
    run(
        f"band_term_full [{b1}]",
        lambda: search(idx, b1, k=10, with_meta=False),
    )
    run(
        f"band_pair_pruned [{b1} {b2}]",
        lambda: search(
            idx, f"{b1} {b2}", k=10, mode="pruned", full_cutover=0,
            with_meta=False,
        ),
        pruned=True,
    )
    run(
        f"band_pair_full [{b1} {b2}]",
        lambda: search(idx, f"{b1} {b2}", k=10, with_meta=False),
    )

    # --- grouped-AND at realistic mixed df ----------------------------------
    gq = f"({b1} OR {b2}) AND bace"
    run(
        f"grouped_and_mixed_pruned [{gq}]",
        lambda: boolean_search(
            idx, gq, k=10, mode="pruned", with_meta=False
        ),
        pruned=True,
    )
    run(
        f"grouped_and_mixed_full [{gq}]",
        lambda: boolean_search(idx, gq, k=10, with_meta=False),
    )

    # --- the all-hot round-4 shape (honest negative) ------------------------
    hq = "(bace OR cedi) AND wedi"
    run(
        f"grouped_and_allhot_pruned [{hq}]",
        lambda: boolean_search(
            idx, hq, k=10, mode="pruned", with_meta=False
        ),
        pruned=True,
    )
    run(
        f"grouped_and_allhot_full [{hq}]",
        lambda: boolean_search(idx, hq, k=10, with_meta=False),
    )

    # --- edismax_qf pruned vs full (task 1) ---------------------------------
    qf_idx = {"text": idx, "title": tidx}
    qf_w = {"text": 0.5, "title": 10.0}
    for q in ["bace cedi", f"{b1} bace"]:
        run(
            f"edismax_qf_full [{q}]",
            lambda q=q: edismax_qf(
                qf_idx, q, qf_w, k=10, tie=0.1, mode="full",
                with_meta=False,
            ),
        )
        run(
            f"edismax_qf_pruned [{q}]",
            lambda q=q: edismax_qf(
                qf_idx, q, qf_w, k=10, tie=0.1, mode="pruned",
                with_meta=False,
            ),
            pruned=True,
        )

    # --- rank-identity spot check on the skewed corpus ----------------------
    for q, kw in [
        (gq, {}), (hq, {}),
    ]:
        a = [
            (r["doc_id"], r["score"])
            for r in boolean_search(
                idx, q, k=10, mode="pruned", with_meta=False
            ).collect()
        ]
        b = [
            (r["doc_id"], r["score"])
            for r in boolean_search(idx, q, k=10, with_meta=False).collect()
        ]
        assert a == b, (q, a, b)
    print("RANK-IDENTITY OK", flush=True)

    print("RESULT " + json.dumps({"n_docs": idx.n_docs, "cores": cores,
                                  "queries": results}), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    main()
