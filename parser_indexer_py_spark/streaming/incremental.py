"""Incremental / streaming index maintenance.

The reference is strictly batch (SURVEY.md §2.10); its closest analogs are
Solr atomic updates + soft commits (src/parserindexer/brat_ann_indexer.py:
186-194, src/parserindexer/solr.py:32-35). This module provides the
Spark-native generalization: **micro-batch segment appends** —

- ``index_stream``: Structured Streaming over a transcripts source; each
  micro-batch becomes an immutable index *segment* (its own docmap /
  postings / stats, built with the same batch builder) via ``foreachBatch``.
  A segment commit ≙ a Solr soft-commit: searchable immediately after.
- ``search_segments``: BM25 over the union of segments. Per-segment stored
  idf is ignored; df/N/avgdl are re-merged across segments at query time so
  scores equal a from-scratch batch build over the concatenated corpus
  (verified by tests/test_streaming.py).

DocIDs: each segment gets a base offset = running doc total at commit time;
within a segment docIDs follow the stable (conv_id, turn_idx) order. Global
docIDs therefore depend on arrival order across segments (unavoidable for
streaming); scores do not.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analyzer import analyze_text
from ..functions.varint import decode_deltas, decode_varint
from ..index.build import build_index
from ..index.scoring import bm25_contrib, bm25_idf
from ..index.search import Index, load_index


class SegmentedIndex:
    """A directory of micro-batch segments + a tiny commit log."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def commits_path(self) -> str:
        return os.path.join(self.root, "commits.json")

    def commits(self) -> list[dict]:
        if os.path.exists(self.commits_path):
            with open(self.commits_path) as f:
                return json.load(f)
        return []

    def _write_commits(self, commits: list[dict]) -> None:
        tmp = self.commits_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(commits, f, indent=1)
        os.replace(tmp, self.commits_path)

    def append_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body: build one segment from a micro-batch."""
        commits = self.commits()
        if any(c["epoch"] == epoch_id for c in commits):
            return  # exactly-once: epoch replayed after a failure
        seg_dir = os.path.join(self.root, f"seg-{epoch_id:08d}")
        build_index(self.spark, batch_df, seg_dir, n_chunks=1)
        idx = load_index(self.spark, seg_dir)
        base = commits[-1]["base"] + commits[-1]["n_docs"] if commits else 0
        commits.append(
            {
                "epoch": int(epoch_id),
                "dir": seg_dir,
                "base": int(base),
                "n_docs": int(idx.n_docs),
                "sum_dl": int(round(idx.avgdl * idx.n_docs)),
                "ts": time.time(),
            }
        )
        self._write_commits(commits)

    def segments(self) -> list[tuple[dict, Index]]:
        return [(c, load_index(self.spark, c["dir"])) for c in self.commits()]


def index_stream(
    spark: SparkSession,
    source_dir: str,
    index_root: str,
    checkpoint_dir: str,
    schema,
    max_files_per_trigger: int = 1,
):
    """Structured Streaming: parquet-directory source -> segment-per-batch
    sink. Returns the StreamingQuery (caller drives with
    processAllAvailable/stop in tests, or leaves running in production)."""
    seg = SegmentedIndex(spark, index_root)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda df, epoch: seg.append_batch(df, epoch)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def search_segments(
    seg: SegmentedIndex, query: str, k: int = 10
) -> list[tuple[int, float]]:
    """BM25 top-k across all committed segments with query-time-merged
    global statistics (returns (global_doc_id, score), driver-side —
    result size is k)."""
    terms = sorted(set(analyze_text(query)))
    if not terms:
        return []
    segs = seg.segments()
    if not segs:
        return []
    n_docs = sum(c["n_docs"] for c, _ in segs)
    avgdl = float(sum(c["sum_dl"] for c, _ in segs)) / float(n_docs)
    # merged df per term
    dfs: dict[str, int] = {}
    rows_per_seg = []
    for c, idx in segs:
        rows = (
            idx.postings.filter(F.col("term").isin(terms))
            .select("term", "n", "docs_bin", "tfs_bin", "dls_bin")
            .collect()
        )
        rows_per_seg.append((c, rows))
        for r in rows:
            dfs[r["term"]] = dfs.get(r["term"], 0) + r["n"]
    idf = {t: bm25_idf(df, n_docs) for t, df in dfs.items()}
    # score: fold per doc in ascending term order (same canonical order)
    scores: dict[int, float] = {}
    for t in terms:
        if t not in idf:
            continue
        for c, rows in rows_per_seg:
            for r in rows:
                if r["term"] != t:
                    continue
                docs = decode_deltas(bytes(r["docs_bin"]), r["n"]).astype(np.int64)
                tfs = decode_varint(bytes(r["tfs_bin"]), r["n"]).astype(np.float64)
                dls = decode_varint(bytes(r["dls_bin"]), r["n"]).astype(np.float64)
                contribs = bm25_contrib(tfs, dls, idf[t], avgdl)
                for d, s in zip(docs + c["base"], contribs):
                    scores[int(d)] = scores.get(int(d), 0.0) + float(s)
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
