"""Inverted-index build: the Lucene half the reference delegates to Solr.

The reference streams JSON docs into Solr (`src/parserindexer/indexer.py:199-231`,
`src/parserindexer/solr.py:47-84`) and Lucene builds postings/norms/segments
invisibly. Here that machinery is explicit, as Spark dataflow:

  transcripts
    -> stage "docmap":  range-partition by (conv_id, turn_idx), sort within
       partitions (ONE DISK_ONLY persist materializes this order), then
       stable dense docIDs via a shuffle-free per-partition counter +
       broadcast prefix-sum offsets (NO global sort, NO window re-shuffle;
       docIDs are the true global rank regardless of partition boundaries —
       see note below)
    -> stage "tf":      tokenize (Catalyst exprs) -> explode ->
       groupBy(term, doc_id).count() (partial+final hash agg), bucketed by
       crc32(term) % n_buckets for query-time partition pruning
    -> stage "postings": two-level salted aggregation —
       groupBy(term, salt=doc_id % S).applyInPandas(encode partial run)
       then groupBy(term).applyInPandas(merge runs -> fixed-size blocks with
       exact per-block BM25 upper bounds). Salting bounds the memory of the
       hottest term's group at 1/S of its postings (SURVEY.md §4.2 skew note);
       the merge sees S *compressed* runs, not raw rows.
    -> termstats / docstats / manifest

Stable-docID correctness argument (SURVEY.md §7.2): for ANY disjoint ordered
range partitioning, within-partition rank + prefix-sum of partition sizes
equals the global rank of the row under (conv_id, turn_idx) — which is a
unique key — so docIDs are identical at every partition count. This is what
makes "rank-identical top-k between cluster sizes" hold.

Resume: each stage (and each postings chunk) is recorded in
``manifest.json`` with per-partition lineage rows; a restarted build skips
completed entries (north_rule checkpoint requirement; the reference's analog
is Solr commits — `src/parserindexer/solr.py:97-104`).

BM25 constants: k1=1.2, b=0.75 — Lucene 6 defaults pinned by
``luceneMatchVersion 6.1.0`` (/root/reference/conf/solr/docs/conf/
solrconfig.xml:38), idf = ln(1 + (N - df + 0.5)/(df + 0.5)).

idf is computed with *Python* ``math.log`` inside the merge encoder (not a
JVM expression) so the pure-Python oracle reproduces it bit-for-bit — JVM
``Math.log`` may differ from C libm by 1 ulp, which would break exact
score-identity (SURVEY.md §7.0 decision 2).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark import StorageLevel
from pyspark.sql import Observation

from ..functions.varint import (
    decode_varint,
    decode_deltas_resets,
    encode_deltas_grouped,
    encode_deltas_grouped_resets,
    encode_varint_grouped,
)
from ..operators.grouped import grouped_map_batched
from .scoring import BM25_B, BM25_K1, bm25_contrib, bm25_idf

BLOCK_SIZE = 128
DEFAULT_BUCKETS = 32
DEFAULT_SALT = 8
# docmap is hash-partitioned by conv_id so metadata updates rewrite only
# touched partitions (index/update.py), not the whole table
DOCMAP_PARTS = 16
# target rows per docmap writer task (~a few MB of text each): the write
# width is ceil(n_rows / this), capped at the input partition count — see
# the coalesce in build_index (measured sf0.1: 4.6s/1024 files at width
# 64 vs 1.8s/272 files at width 17; an 8k-doc micro-batch 2.9s -> 0.5s)
DOCMAP_WRITE_ROWS = 8_000


def docmap_dkey(col) -> "F.Column":
    """Partition key for the docmap: crc32(conv_id) % DOCMAP_PARTS (same
    JVM/Python twin property as term_bucket)."""
    return F.pmod(F.crc32(col.cast("string")), F.lit(DOCMAP_PARTS)).cast("int")

PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("cf", T.LongType(), False),
        T.StructField("docs_bin", T.BinaryType(), False),
        T.StructField("tfs_bin", T.BinaryType(), False),
        T.StructField("dls_bin", T.BinaryType(), False),
        # positional payload (empty when the build has positions=False):
        # per-entry delta-encoded token positions, concatenated per run
        T.StructField("pos_bin", T.BinaryType(), False),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("doc_min", T.LongType(), False),
        T.StructField("doc_max", T.LongType(), False),
        T.StructField("docs_bin", T.BinaryType(), False),
        T.StructField("tfs_bin", T.BinaryType(), False),
        T.StructField("dls_bin", T.BinaryType(), False),
        T.StructField("pos_bin", T.BinaryType(), False),
        T.StructField("block_cf", T.LongType(), False),
        T.StructField("block_max_score", T.DoubleType(), False),
        # stats-independent per-block extremes: a valid BM25 bound can be
        # recomputed under ANY (idf, avgdl) as
        # idf * contrib(block_tf_max, block_dl_min) — what makes block-max
        # pruning sound across SEGMENTS, whose global stats are merged at
        # query time (streaming/incremental.py)
        T.StructField("block_tf_max", T.IntegerType(), False),
        T.StructField("block_dl_min", T.LongType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
        T.StructField("idf", T.DoubleType(), False),
    ]
)


def term_bucket(term: str, n_buckets: int) -> int:
    """Python twin of the JVM bucket expression (F.crc32 == zlib.crc32)."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


@dataclass
class IndexPaths:
    root: str

    @property
    def raw(self) -> str:
        return os.path.join(self.root, "_stage", "raw")

    @property
    def tf(self) -> str:
        return os.path.join(self.root, "_stage", "tf")

    @property
    def docmap(self) -> str:
        return os.path.join(self.root, "docmap")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def termstats(self) -> str:
        return os.path.join(self.root, "termstats")

    @property
    def globals_json(self) -> str:
        return os.path.join(self.root, "globals.json")

    @property
    def tombstones(self) -> str:
        # Lucene .del / liveDocs analog: parquet files of deleted doc_ids
        # (index/update.py delete_docs); absent dir = no deletes
        return os.path.join(self.root, "tombstones")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "manifest.json")


class Manifest:
    """Tiny atomic JSON manifest: stage/chunk completion + per-partition
    lineage rows (the Parquet-local stand-in for Iceberg snapshot metadata)."""

    def __init__(self, path: str):
        self.path = path
        self.records: list[dict] = []
        if os.path.exists(path):
            with open(path) as f:
                self.records = json.load(f)

    def done(self, stage: str) -> bool:
        return any(r["stage"] == stage and r["status"] == "ok" for r in self.records)

    def add(self, stage: str, **kw) -> None:
        self.records.append({"stage": stage, "status": "ok", "ts": time.time(), **kw})
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.records, f, indent=1)
        os.replace(tmp, self.path)


def _encode_partials_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized multi-group partial-run encoder. Input: many complete
    (term, salt) groups, sorted by (term, salt, doc_id). One numpy pass for
    group detection, delta/varint packing, and per-group cf — no per-group
    Python/Arrow fixed costs (see operators/grouped.py)."""
    terms = pdf["term"].to_numpy()
    salts = pdf["salt"].to_numpy()
    docs = pdf["doc_id"].to_numpy().astype(np.uint64)
    tfs = pdf["tf"].to_numpy().astype(np.uint64)
    dls = pdf["dl"].to_numpy().astype(np.uint64)
    change = np.ones(len(pdf), dtype=bool)
    change[1:] = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(pdf))
    csum = np.concatenate([[0], np.cumsum(tfs.astype(np.int64))])
    return pd.DataFrame(
        {
            "term": terms[starts],
            "n": (ends - starts).astype(np.int32),
            "cf": csum[ends] - csum[starts],
            "docs_bin": encode_deltas_grouped(docs, starts),
            "tfs_bin": encode_varint_grouped(tfs, starts),
            "dls_bin": encode_varint_grouped(dls, starts),
            "pos_bin": [b""] * len(starts),
        }
    )


def _make_local_combiner(
    n_buckets: int, salt: int, chunk: list[int] | None, positions: bool = False
):
    """Map-side local combine (DESIGN.md 'shuffle budget' option 1): each
    input partition tokenizes its docs in-python (vectorized twin of the
    JVM analyzer — golden-tested identical), accumulates ALL its token
    occurrences, and emits compressed partial runs. The shuffle then
    carries only encoded runs (~index-sized, ~30x smaller than raw token
    rows) instead of one row per token occurrence — the MapReduce-combiner
    shape Lucene gets for free by building segments locally.

    All hot-path array work is on INTEGER term codes (pd.factorize is
    hash-based — no string sort anywhere; runs only need equal terms
    adjacent, and the merge re-sorts per term anyway).

    ``chunk`` (bucket subset) filters terms map-side for resumable chunked
    builds. Memory bound: one partition's token arrays (~24B/occurrence) —
    size partitions accordingly (DESIGN.md)."""
    import zlib

    from ..functions.analyzer import analyze_series

    def run(batches):
        term_parts, doc_parts, dl_parts, pos_parts = [], [], [], []
        for pdf in batches:
            if not len(pdf):
                continue
            token_lists = analyze_series(pdf["text"])
            counts = token_lists.str.len().to_numpy(dtype=np.int64)
            if not counts.sum():
                continue
            term_parts.append(
                np.concatenate([np.asarray(t, dtype=object) for t in token_lists if t])
            )
            doc_parts.append(np.repeat(pdf["doc_id"].to_numpy(), counts))
            dl_parts.append(np.repeat(pdf["dl"].to_numpy(), counts))
            if positions:
                # token index within its doc (0-based analyzer position;
                # increments of 1 — the index analyzer chain has no
                # stopword removal, managed-schema:539-547)
                tot = int(counts.sum())
                offs = np.repeat(
                    np.concatenate([[0], np.cumsum(counts[:-1])]), counts
                )
                pos_parts.append(np.arange(tot, dtype=np.int64) - offs)
        if not term_parts:
            return
        terms = np.concatenate(term_parts)
        docs = np.concatenate(doc_parts).astype(np.int64)
        dls = np.concatenate(dl_parts).astype(np.int64)
        poss = np.concatenate(pos_parts) if positions else None
        codes, uniq = pd.factorize(pd.Series(terms))
        uniq = np.asarray(uniq, dtype=object)
        if chunk is not None:
            keep_u = np.fromiter(
                (zlib.crc32(t.encode("utf-8")) % n_buckets in chunk for t in uniq),
                dtype=bool,
                count=len(uniq),
            )
            mask = keep_u[codes]
            codes, docs, dls = codes[mask], docs[mask], dls[mask]
            if positions:
                poss = poss[mask]
            if not len(codes):
                return
        salts = (docs % salt).astype(np.int64)
        if positions:
            # positions as the most-minor key: each entry's occurrence
            # positions come out ascending, ready for delta encoding
            order = np.lexsort((poss, docs, salts, codes))
            poss = poss[order].astype(np.uint64)
        else:
            order = np.lexsort((docs, salts, codes))
        codes, salts, docs, dls = codes[order], salts[order], docs[order], dls[order]
        docs_u = docs.astype(np.uint64)
        n = len(codes)
        gchange = np.ones(n, dtype=bool)
        gchange[1:] = (codes[1:] != codes[:-1]) | (salts[1:] != salts[:-1])
        echange = gchange.copy()
        echange[1:] |= docs[1:] != docs[:-1]
        estarts = np.flatnonzero(echange)
        eends = np.append(estarts[1:], n)
        tf = (eends - estarts).astype(np.uint64)
        edocs = docs_u[estarts]
        edls = dls[estarts].astype(np.uint64)
        gstarts = np.flatnonzero(gchange[estarts])
        gends = np.append(gstarts[1:], len(estarts))
        csum = np.concatenate([[0], np.cumsum(tf.astype(np.int64))])
        if positions:
            # per-entry position lists, deltas resetting at each entry,
            # one payload per (term, salt) run: payload boundaries are
            # estarts[gstarts] in occurrence space
            pos_bin = encode_deltas_grouped_resets(
                poss, estarts, estarts[gstarts]
            )
        else:
            pos_bin = [b""] * len(gstarts)
        yield pd.DataFrame(
            {
                "term": uniq[codes[estarts][gstarts]],
                "n": (gends - gstarts).astype(np.int32),
                "cf": csum[gends] - csum[gstarts],
                "docs_bin": encode_deltas_grouped(edocs, gstarts),
                "tfs_bin": encode_varint_grouped(tf, gstarts),
                "dls_bin": encode_varint_grouped(edls, gstarts),
                "pos_bin": pos_bin,
            }
        )

    return run


def _make_merge(n_docs: int, avgdl: float, n_buckets: int, positions: bool = False):
    """Closure building the batched run-merger with global stats baked in.

    Input: many complete term-groups (each group = that term's partial
    runs), sorted by term. Fully vectorized: decode all runs in one pass,
    segment-cumsum the deltas, lexsort (term, doc), slice fixed-size blocks,
    and reduceat per-block cf / max-score. idf per term is a scalar
    ``math.log`` loop — np.log is SIMD-vectorized and NOT bit-identical to
    libm, which would break oracle score-identity (verified in-sandbox).

    Runs may be PARTIAL RUNS from the local combiner *or already-built
    postings blocks from other segments* — an optional per-run ``base``
    column is added to that run's decoded docIDs, which is what lets the
    tiered segment compaction (streaming/incremental.py) merge at the
    postings level with this same encoder instead of re-tokenizing.

    ``positions=True`` decodes/reorders/re-encodes the per-entry position
    payloads alongside (the Lucene .prx analog feeding PhraseQuery)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        run_terms = pdf["term"].to_numpy()
        run_n = pdf["n"].to_numpy().astype(np.int64)
        total = int(run_n.sum())
        # decode every run in one pass per payload kind
        deltas = decode_varint(b"".join(pdf["docs_bin"]), total)
        tfs = decode_varint(b"".join(pdf["tfs_bin"]), total)
        dls = decode_varint(b"".join(pdf["dls_bin"]), total)
        run_starts = np.zeros(len(pdf), dtype=np.int64)
        np.cumsum(run_n[:-1], out=run_starts[1:])
        # segment cumsum: absolutize docIDs within each run
        # global cumsum then subtract, per run, the cumsum value just
        # before the run start (propagated with maximum.accumulate — valid
        # because the global cumsum of unsigned deltas is nondecreasing)
        docs = np.cumsum(deltas, dtype=np.uint64)
        prev = np.zeros(total, dtype=np.uint64)
        prev[run_starts[1:]] = docs[run_starts[1:] - 1]
        docs = docs - np.maximum.accumulate(prev)
        if "base" in pdf.columns:
            docs = docs + np.repeat(
                pdf["base"].to_numpy().astype(np.uint64), run_n
            )
        if positions:
            tfs_i = tfs.astype(np.int64)
            total_pos = int(tfs_i.sum())
            # entry start offsets in occurrence (position) space
            occ_starts = np.zeros(total, dtype=np.int64)
            np.cumsum(tfs_i[:-1], out=occ_starts[1:])
            pos_abs = decode_deltas_resets(
                b"".join(pdf["pos_bin"]), total_pos, occ_starts
            )
        # per-entry term ids (runs of the same term are adjacent)
        term_change = np.ones(len(pdf), dtype=bool)
        term_change[1:] = run_terms[1:] != run_terms[:-1]
        term_ids_per_run = np.cumsum(term_change) - 1
        entry_term = np.repeat(term_ids_per_run, run_n)
        uniq_terms = run_terms[term_change]
        # global sort by (term, doc) merges the salt runs
        order = np.lexsort((docs, entry_term))
        if positions:
            # ragged gather: carry each entry's position list with it
            lens = tfs_i[order]
            out_off = np.zeros(total, dtype=np.int64)
            np.cumsum(lens[:-1], out=out_off[1:])
            gather = np.repeat(occ_starts[order] - out_off, lens) + np.arange(
                total_pos, dtype=np.int64
            )
            pos_abs = pos_abs[gather]
        docs, tfs, dls, entry_term = (
            docs[order], tfs[order], dls[order], entry_term[order]
        )
        # df/cf/idf per term
        tstarts = np.flatnonzero(
            np.concatenate([[True], entry_term[1:] != entry_term[:-1]])
        )
        tends = np.append(tstarts[1:], total)
        dfs = tends - tstarts
        tf_csum = np.concatenate([[0], np.cumsum(tfs.astype(np.int64))])
        cfs = tf_csum[tends] - tf_csum[tstarts]
        idfs = np.array([bm25_idf(int(d), n_docs) for d in dfs])
        # exact per-entry contribution (canonical op order) -> block bounds.
        # Recomputed AFTER the merge so bounds are valid post-salting
        # (SURVEY.md §7.2 WAND-correctness note).
        entry_idf = np.repeat(idfs, dfs)
        contrib = bm25_contrib(tfs, dls, 1.0, avgdl) * entry_idf
        # fixed-size blocks within each term
        offs = np.arange(total, dtype=np.int64) - np.repeat(tstarts, dfs)
        block_of = offs // BLOCK_SIZE
        bchange = np.ones(total, dtype=bool)
        bchange[1:] = (entry_term[1:] != entry_term[:-1]) | (
            block_of[1:] != block_of[:-1]
        )
        bstarts = np.flatnonzero(bchange)
        bends = np.append(bstarts[1:], total)
        bterm = entry_term[bstarts]
        buckets = np.array(
            [term_bucket(t, n_buckets) for t in uniq_terms], dtype=np.int32
        )
        if positions:
            pos_bin = encode_deltas_grouped_resets(
                pos_abs, out_off, out_off[bstarts]
            )
        else:
            pos_bin = [b""] * len(bstarts)
        return pd.DataFrame(
            {
                "term": uniq_terms[bterm],
                "bucket": buckets[bterm],
                "block_id": block_of[bstarts].astype(np.int32),
                "n": (bends - bstarts).astype(np.int32),
                "doc_min": docs[bstarts].astype(np.int64),
                "doc_max": docs[bends - 1].astype(np.int64),
                "docs_bin": encode_deltas_grouped(docs, bstarts),
                "tfs_bin": encode_varint_grouped(tfs, bstarts),
                "dls_bin": encode_varint_grouped(dls, bstarts),
                "pos_bin": pos_bin,
                "block_cf": tf_csum[bends] - tf_csum[bstarts],
                "block_max_score": np.maximum.reduceat(contrib, bstarts),
                "block_tf_max": np.maximum.reduceat(tfs, bstarts).astype(
                    np.int32
                ),
                "block_dl_min": np.minimum.reduceat(dls, bstarts).astype(
                    np.int64
                ),
                "df": dfs[bterm].astype(np.int64),
                "cf": cfs[bterm].astype(np.int64),
                "idf": idfs[bterm],
            }
        )

    return merge


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    *,
    n_partitions: int | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    salt: int = DEFAULT_SALT,
    n_chunks: int = 4,
    resume: bool = True,
    checkpoint_input: bool = False,
    positions: bool = False,
) -> IndexPaths:
    """Build the full index under ``out_dir``. Idempotent + resumable.

    ``positions=True`` stores per-occurrence token positions in the
    postings payload (delta+varint per entry — the Lucene proximity data;
    managed-schema:539-554's analyzed fields carry positions by default),
    enabling ``search(..., phrase=...)``. Costs ~cf varints of extra
    payload; leave off when phrase queries aren't needed.

    ``resume=False`` means REBUILD: all index artifacts under ``out_dir``
    are deleted first and the manifest starts empty (a leftover manifest or
    postings dir would otherwise no-op the build or duplicate blocks via
    the chunk appends — ADVICE r1 build.py:414)."""
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    if not resume:
        for d in (
            paths.postings, paths.termstats, paths.docmap,
            os.path.join(out_dir, "_stage"),
        ):
            shutil.rmtree(d, ignore_errors=True)
        for f in (paths.manifest, paths.manifest + ".tmp", paths.globals_json):
            if os.path.exists(f):
                os.remove(f)
    man = Manifest(paths.manifest)
    # a resumed build MUST use the parameters of the interrupted one:
    # chunk stages are keyed by bucket range and postings are bucketed by
    # term % n_buckets, so resuming with different n_buckets/n_chunks/salt
    # would silently skip buckets or bucket new blocks under a different
    # modulus than globals.json records (round-2 review finding)
    params = {
        "n_buckets": n_buckets,
        "salt": salt,
        "n_chunks": n_chunks,
        "positions": positions,
    }
    prior = next((r for r in man.records if r["stage"] == "params"), None)
    if prior is not None:
        # absent keys in older manifests mean the then-default (positions
        # was introduced later, default False)
        defaults = {"positions": False}
        mismatch = {
            k: (prior.get(k, defaults.get(k)), v)
            for k, v in params.items()
            if prior.get(k, defaults.get(k)) != v
        }
        if mismatch:
            raise ValueError(
                f"resume with different build parameters {mismatch}; pass "
                "resume=False (CLI: --no-resume) to rebuild from scratch"
            )
    else:
        man.add("params", **params)
    P = n_partitions or spark.sparkContext.defaultParallelism * 2

    # ---- stage 1+2 fused: docmap (stable docIDs, tokens, dl) ---------------
    # One DISK_ONLY persist materializes the range-partitioned, sorted input
    # exactly once; docIDs are then assigned with a SHUFFLE-FREE mapInPandas
    # (per-partition running counter + broadcast prefix-sum offsets) instead
    # of a Window (which would re-shuffle the full corpus by pid). Measured
    # at sf0.1: staged+docmap 97s -> ~1/3 of that.
    if not man.done("docmap"):
        t0 = time.time()
        src = transcripts
        if checkpoint_input:
            # for expensive/non-reusable inputs (e.g. generators): compute
            # once to parquet so the range-sampling pass reads cheap columns
            if not man.done("raw"):
                t0r = time.time()
                transcripts.write.mode("overwrite").parquet(paths.raw)
                man.add("raw", seconds=time.time() - t0r)
            src = spark.read.parquet(paths.raw)
        staged = (
            src.repartitionByRange(P, "conv_id", "turn_idx")
            .sortWithinPartitions("conv_id", "turn_idx")
            .withColumn("pid", F.spark_partition_id())
            .persist(StorageLevel.DISK_ONLY)
        )
        try:
            counts = {
                r["pid"]: r["cnt"]
                for r in staged.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
            }
            if not counts:
                raise ValueError(
                    "build_index: input transcripts table is empty"
                )
            offsets, acc = {}, 0
            for pid in sorted(counts):
                offsets[pid] = acc
                acc += counts[pid]

            def assign(batches, offsets=offsets):
                # dl is counted HERE with the Python analyzer twin (same
                # regex the postings combiner tokenizes with — golden-tested
                # identical to the JVM tokens_expr chain) because the rows
                # already cross into Python for the docID counter: the JVM
                # \p{L}\p{N} regex chain was ~10s/130k docs at sf0.1 vs
                # ~0.3s for the vectorized str.count on a scan that is
                # otherwise free (guide §4.2). Null text keeps the JVM
                # F.size(tokens_expr(null)) == NULL convention
                # (tests/test_hash_twins_r6.py asserts the equality).
                from ..functions.analyzer import _TOKEN_RE_PY, _fold_series

                pos: dict[int, int] = {}
                for pdf in batches:
                    if not len(pdf):
                        continue
                    pids = pdf["pid"].to_numpy()
                    out = np.empty(len(pdf), dtype=np.int64)
                    # a partition's batches arrive in order; a batch can in
                    # principle span pids only under coalesce — handle both
                    for pid_val in np.unique(pids):
                        m = pids == pid_val
                        start = pos.get(pid_val, offsets[int(pid_val)])
                        cnt = int(m.sum())
                        out[m] = np.arange(start, start + cnt)
                        pos[pid_val] = start + cnt
                    counts = (
                        _fold_series(pdf["text"])
                        .str.count(_TOKEN_RE_PY)
                        .to_numpy()
                        .astype(np.int32)
                    )
                    dl = pd.array(counts, dtype="Int32")
                    dl[pdf["text"].isna().to_numpy()] = pd.NA
                    yield pdf.assign(doc_id=out, dl=dl).drop(columns=["pid"])

            assigned = staged.mapInPandas(
                assign,
                "conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp, doc_id long, dl int",
            )
            # store text (not the token array): ~40% smaller parquet, and
            # tokens are recomputed by the codegen'd expression wherever
            # needed (tf stage, facet oracle) — cheaper than the extra IO
            docmap = (
                assigned
                .select(
                    "doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
                    "dl", "text",
                )
                # hash-partitioned so metadata updates touch only their
                # partitions (index/update.py); doc order inside files is
                # irrelevant (doc_id is explicit)
                .withColumn("dkey", docmap_dkey(F.col("conv_id")))
            )
            # scale-adaptive write width: this write is NARROW (the
            # shuffle-free docID assignment means no exchange precedes
            # it), so AQE can never coalesce its tasks and every writer
            # fans out up to |dkey| dynamic-partition files — P tasks of
            # a micro-batch emit P*16 tiny files (a 2-segment streaming
            # append measured 290 files for 8k docs; the sf0.1 build
            # 1024). Width derives from the measured row count (`acc` is
            # already on the driver for the docID offsets): at scale
            # ceil(acc/8k) >= P leaves the plan untouched, small inputs
            # collapse to few writers (coalesce keeps per-pid row order,
            # and `assign` handles multi-pid tasks, so docIDs are
            # unchanged — partition-count stability is already tested).
            # Floor at ~cores/4: width 1 measured pathological (a single
            # assign+write task, 2.6s -> 9-13s on an 8k-doc micro-batch)
            # while 8..64 are indistinguishable there, and 17 beats 64 by
            # ~9s on the 130k-doc build (same-process A/B, min-of-2).
            floor_w = max(2, spark.sparkContext.defaultParallelism // 4)
            width = min(P, max(floor_w, -(-acc // DOCMAP_WRITE_ROWS)))
            if width < P:
                docmap = docmap.coalesce(width)
            # piggyback the global stats on the write job (observe costs
            # nothing; saves a full docmap re-scan for the globals stage)
            obs = Observation("globals")
            docmap = docmap.observe(
                obs, F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
            )
            docmap.write.mode("overwrite").partitionBy("dkey").parquet(paths.docmap)
            if not man.done("globals"):
                og = obs.get
                with open(paths.globals_json, "w") as f:
                    json.dump(
                        {
                            "n_docs": og["n_docs"],
                            # exact int sum / count: deterministic at any
                            # partitioning, oracle-reproducible
                            "avgdl": float(og["sum_dl"]) / float(og["n_docs"]),
                            "k1": BM25_K1,
                            "b": BM25_B,
                            "n_buckets": n_buckets,
                            "block_size": BLOCK_SIZE,
                            "positions": positions,
                        },
                        f,
                    )
                man.add("globals", seconds=0.0)
            try:
                input_files = [f.split("/")[-1] for f in src.inputFiles()][:8]
            except Exception:  # noqa: BLE001 — non-file-based inputs
                input_files = []
            man.add(
                "docmap",
                seconds=time.time() - t0,
                rows=acc,
                input_snapshot={
                    "n_files": len(src.inputFiles()) if input_files else None,
                    "sample": input_files,
                },
                partition_lineage=[
                    {"pid": int(p), "rows": int(c), "offset": int(offsets[p])}
                    for p, c in sorted(counts.items())
                ],
            )
        finally:
            staged.unpersist()

    docmap = spark.read.parquet(paths.docmap)

    # ---- global stats -------------------------------------------------------
    if not man.done("globals"):
        t0 = time.time()
        g = docmap.agg(
            F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
        ).collect()[0]
        with open(paths.globals_json, "w") as f:
            json.dump(
                {
                    "n_docs": g["n_docs"],
                    # exact: integer sum / count — deterministic at any
                    # partitioning, reproducible by the pure-Python oracle
                    "avgdl": float(g["sum_dl"]) / float(g["n_docs"]),
                    "k1": BM25_K1,
                    "b": BM25_B,
                    "n_buckets": n_buckets,
                    "block_size": BLOCK_SIZE,
                    "positions": positions,
                },
                f,
            )
        man.add("globals", seconds=time.time() - t0)
    with open(paths.globals_json) as f:
        gstats = json.load(f)
    n_docs, avgdl = gstats["n_docs"], gstats["avgdl"]


    # ---- stage 4: postings, chunked over buckets (resume granularity) ------
    merge = _make_merge(n_docs, avgdl, n_buckets, positions=positions)
    chunk_sz = max(1, n_buckets // n_chunks)
    for chunk_start in range(0, n_buckets, chunk_sz):
        chunk = list(range(chunk_start, min(chunk_start + chunk_sz, n_buckets)))
        stage = f"postings_chunk_{chunk_start}"
        if man.done(stage):
            continue
        t0 = time.time()
        combiner = _make_local_combiner(
            n_buckets, salt, chunk if len(chunk) < n_buckets else None,
            positions=positions,
        )
        partials = docmap.select("doc_id", "dl", "text").mapInPandas(
            combiner, PARTIAL_SCHEMA
        )
        # run order within a term is irrelevant: merge re-sorts by doc_id,
        # which is unique per (term, doc) and disjoint across salt runs
        blocks = grouped_map_batched(partials, ["term"], merge, POSTINGS_SCHEMA)
        observed = blocks.observe(
            f"postings_{chunk_start}",
            F.count("*").alias("blocks"),
            F.sum("n").alias("postings"),
        )
        # IDEMPOTENT chunk commit (ADVICE r1 build.py:584): chunks own
        # disjoint bucket sets, so dynamic partition-overwrite replaces
        # exactly this chunk's bucket partitions — a chunk replayed after
        # a crash between the write job and the manifest entry overwrites
        # its own output instead of appending duplicate blocks.
        prev_mode = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                observed.repartition(len(chunk), "bucket")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(paths.postings)
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )
        man.add(stage, seconds=time.time() - t0, buckets=chunk)

    # ---- stage 5: termstats -------------------------------------------------
    if not man.done("termstats"):
        t0 = time.time()
        _write_termstats(spark, paths)
        man.add("termstats", seconds=time.time() - t0)

    return paths


def build_fielded_indexes(
    spark: SparkSession,
    transcripts: DataFrame,
    out_root: str,
    fields: dict,
    **build_kw,
) -> dict:
    """One index per searchable FIELD for multi-field edismax qf
    (index.boolean.edismax_qf): ``fields`` maps field name -> the column
    (name or Column expression) holding that field's text. Every field
    index is built from the SAME rows, so the shuffle-free stable docID
    assignment — a pure function of the (conv_id, turn_idx) order —
    gives each row the same doc_id in every index (asserted by
    tests/test_boolean.py::test_edismax_qf_multifield_vs_oracle).
    Returns {field: index_dir}; load each with ``load_index``."""
    out = {}
    for name, expr in fields.items():
        col = F.col(expr) if isinstance(expr, str) else expr
        path = os.path.join(out_root, f"field={name}")
        build_index(
            spark, transcripts.withColumn("text", col), path, **build_kw
        )
        out[name] = path
    return out


def _write_termstats(spark: SparkSession, paths: IndexPaths) -> None:
    ts = (
        spark.read.parquet(paths.postings)
        .groupBy("term")
        .agg(
            F.first("df").alias("df"),
            F.first("cf").alias("cf"),
            F.first("idf").alias("idf"),
            F.max("block_max_score").alias("max_score"),
            F.first("bucket").alias("bucket"),
        )
    )
    ts.write.mode("overwrite").parquet(paths.termstats)


def merge_indexes(
    spark: SparkSession,
    sources: list[tuple[str, int]],
    out_dir: str,
) -> IndexPaths:
    """POSTINGS-LEVEL merge of already-built indexes — the Lucene tiered
    segment merge (round-2 verdict "What's wrong #1": compaction was a full
    from-scratch rebuild, O(total corpus) per call). No re-tokenization:
    each source's postings blocks are fed as pre-encoded runs (with a
    ``base`` docID offset) straight into the SAME run-merger the batch
    build uses (:func:`_make_merge` decodes, re-bases, re-sorts by
    (term, doc), re-encodes fixed-size blocks, and recomputes
    df/cf/idf/bounds under the MERGED global stats). Cost is proportional
    to the merged indexes' postings bytes, not the corpus.

    ``sources`` is a list of (index_root, docID_offset); the shifted doc
    ranges must be disjoint (callers pass commit-log bases, which are).
    DocIDs are preserved modulo the per-source shift, so a merged segment
    scores AND ranks exactly like searching the sources side by side.

    All sources must agree on n_buckets and the positions flag."""
    gl = []
    for root, _ in sources:
        with open(IndexPaths(root).globals_json) as f:
            gl.append(json.load(f))
    n_buckets = {g["n_buckets"] for g in gl}
    if len(n_buckets) != 1:
        raise ValueError(f"sources disagree on n_buckets: {sorted(n_buckets)}")
    n_buckets = n_buckets.pop()
    positions = {bool(g.get("positions", False)) for g in gl}
    if len(positions) != 1:
        raise ValueError(
            "cannot postings-merge indexes with mixed positions flags"
        )
    positions = positions.pop()
    n_docs = int(sum(g["n_docs"] for g in gl))
    # avgdl*n_docs round-trips the exact integer dl sum (dl sums are far
    # below 2^52), matching the commit log's sum_dl bookkeeping
    sum_dl = int(sum(round(g["avgdl"] * g["n_docs"]) for g in gl))
    avgdl = float(sum_dl) / float(n_docs)

    paths = IndexPaths(out_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    man = Manifest(paths.manifest)

    t0 = time.time()
    # docmap: union with shifted docIDs (metadata-only rewrite; no analyzer)
    dms = [
        spark.read.parquet(IndexPaths(root).docmap).withColumn(
            "doc_id", F.col("doc_id") + F.lit(int(off))
        )
        for root, off in sources
    ]
    dm = dms[0]
    for d in dms[1:]:
        dm = dm.unionByName(d)
    dm.write.mode("overwrite").partitionBy("dkey").parquet(paths.docmap)

    with open(paths.globals_json, "w") as f:
        json.dump(
            {
                "n_docs": n_docs,
                "avgdl": avgdl,
                "k1": BM25_K1,
                "b": BM25_B,
                "n_buckets": n_buckets,
                "block_size": BLOCK_SIZE,
                "positions": positions,
            },
            f,
        )

    # postings: per-source blocks are the pre-encoded runs
    run_cols = ["term", "n", "docs_bin", "tfs_bin", "dls_bin", "pos_bin"]
    runs = None
    for root, off in sources:
        r = (
            spark.read.parquet(IndexPaths(root).postings)
            .select(*run_cols)
            .withColumn("base", F.lit(int(off)).cast("long"))
        )
        runs = r if runs is None else runs.unionByName(r)
    merge = _make_merge(n_docs, avgdl, n_buckets, positions=positions)
    blocks = grouped_map_batched(runs, ["term"], merge, POSTINGS_SCHEMA)
    blocks.repartition(n_buckets, "bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(paths.postings)

    _write_termstats(spark, paths)
    man.add(
        "merged",
        seconds=time.time() - t0,
        sources=[{"root": r, "offset": int(o)} for r, o in sources],
        n_docs=n_docs,
    )
    man.add("params", n_buckets=n_buckets, positions=positions)
    return paths
