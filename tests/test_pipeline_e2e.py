"""End-to-end training-data pipeline composition: the beyond-reference
operators (dedup, hash-gate sampling, split assignment, sequence
packing) feeding the engine's index build and query path in one flow —
each stage's invariants asserted on the way through.

The shape mirrors what a 100 TB corpus job would run: exact-dedup by
content hash, deterministic downsampling, leakage-safe split
assignment, concat-and-chunk packing offsets for the training writer,
and an inverted index over the SAME surviving rows for retrieval QA.
Every stage is a pure function of row identity/content, so the whole
pipeline is retry- and partitioning-invariant by construction."""

import pytest
from pyspark.sql import functions as F

from parser_indexer_py_spark.datagen import generate_transcripts
from parser_indexer_py_spark.index.boolean import boolean_search
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.search import load_index
from parser_indexer_py_spark.operators.packing import pack_offsets
from parser_indexer_py_spark.operators.sampling import (
    assign_splits,
    sample_hash_gate,
)


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    src = generate_transcripts(spark, 30, partitions=3)
    # duplicate a slice of the corpus to give dedup real work
    dupes = src.filter(F.pmod(F.crc32("conv_id"), F.lit(5)) == 0).select(
        F.concat(F.lit("dup-"), "conv_id").alias("conv_id"),
        "turn_idx", "role", "text", "tool", "ts",
    )
    corpus = src.unionByName(dupes)

    # 1. exact dedup by content hash, first-id-wins (A4 family)
    keyed = corpus.withColumn("ck", F.md5(F.lower("text")))
    keep = keyed.groupBy("ck").agg(
        F.min(F.struct("conv_id", "turn_idx")).alias("w")
    )
    deduped = keyed.join(
        keep.select("ck", "w.conv_id", "w.turn_idx"),
        ["ck", "conv_id", "turn_idx"],
    ).drop("ck")

    # 2. deterministic 80% downsample by row identity
    deduped = deduped.withColumn(
        "rid", F.concat_ws("#", "conv_id", "turn_idx")
    )
    sampled = sample_hash_gate(deduped, "rid", 0.8)

    # 3. leakage-safe split assignment
    split = assign_splits(
        sampled, "rid", {"train": 0.9, "val": 0.05, "test": 0.05}
    )

    # 4. packing offsets for the training writer (train split only)
    train = split.filter(F.col("split") == "train").withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    packed = pack_offsets(train, "rid", "n_tokens", 512)

    # 5. index the surviving train rows for retrieval QA
    out = str(tmp_path_factory.mktemp("pipe_idx"))
    build_index(
        spark,
        train.select("conv_id", "turn_idx", "role", "text", "tool", "ts"),
        out,
        n_partitions=3,
        n_chunks=1,
    )
    return {
        "corpus": corpus,
        "deduped": deduped,
        "sampled": sampled,
        "split": split,
        "packed": packed,
        "train": train,
        "idx": load_index(spark, out),
    }


def test_dedup_removed_exact_copies(pipeline):
    n_corpus = pipeline["corpus"].count()
    n_dedup = pipeline["deduped"].count()
    distinct_texts = (
        pipeline["corpus"].select(F.lower("text")).distinct().count()
    )
    assert n_dedup == distinct_texts < n_corpus


def test_sample_and_splits_partition_the_survivors(pipeline):
    n_s = pipeline["sampled"].count()
    n_d = pipeline["deduped"].count()
    assert 0.7 < n_s / n_d < 0.9
    per = {
        r["split"]: r["n"]
        for r in pipeline["split"].groupBy("split").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert sum(per.values()) == n_s  # exhaustive, disjoint
    assert per.get("train", 0) > per.get("val", 0) + per.get("test", 0)


def test_packing_tiles_the_train_stream(pipeline):
    rows = pipeline["packed"].orderBy("offset").collect()
    total = sum(r["len"] for r in rows)
    last = rows[-1]
    assert last["offset"] + last["len"] == total  # no gaps, no overlap
    # boundary-crossing flags are consistent with the spans
    for r in rows:
        assert r["crosses"] == (r["seq_first"] != r["seq_last"])


def test_index_serves_only_surviving_rows(pipeline):
    idx = pipeline["idx"]
    assert idx.n_docs == pipeline["train"].count()
    hits = boolean_search(idx, "bace", k=50, with_meta=True).collect()
    assert hits
    allowed = {
        (r["conv_id"], r["turn_idx"])
        for r in pipeline["train"].select("conv_id", "turn_idx").collect()
    }
    assert {(h["conv_id"], h["turn_idx"]) for h in hits} <= allowed
