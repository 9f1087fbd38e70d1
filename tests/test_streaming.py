"""Streaming segment maintenance: micro-batch appends must score exactly
like a from-scratch batch build over the concatenated corpus."""

import pytest

from parser_indexer_py_spark.datagen import TRANSCRIPT_SCHEMA, generate_transcripts
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.search import load_index, search
from parser_indexer_py_spark.streaming.incremental import (
    SegmentedIndex,
    index_stream,
    search_segments,
)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    return {
        "src": str(tmp_path_factory.mktemp("stream_src")),
        "idx": str(tmp_path_factory.mktemp("stream_idx")),
        "ckpt": str(tmp_path_factory.mktemp("stream_ckpt")),
        "batch": str(tmp_path_factory.mktemp("batch_idx")),
    }


def test_stream_equals_batch(spark, dirs):
    full = generate_transcripts(spark, 60, partitions=3)
    # three arrival chunks (conv ranges), one parquet file each
    from parser_indexer_py_spark.datagen import generate_transcripts_pandas

    pdf = generate_transcripts_pandas(60)
    conv_num = pdf["conv_id"].str[5:].astype(int)
    for i, (lo, hi) in enumerate([(0, 20), (20, 40), (40, 60)]):
        chunk = pdf[(conv_num >= lo) & (conv_num < hi)]
        spark.createDataFrame(chunk, schema=TRANSCRIPT_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{dirs['src']}/chunk{i}")

    import glob
    import shutil

    # flatten chunk files into one source dir (one file per micro-batch)
    for i, f in enumerate(
        sorted(glob.glob(f"{dirs['src']}/chunk*/part-*.parquet"))
    ):
        shutil.copy(f, f"{dirs['src']}/data{i}.parquet")

    q = index_stream(
        spark, f"{dirs['src']}/data*.parquet", dirs["idx"], dirs["ckpt"],
        TRANSCRIPT_SCHEMA,
    )
    q.awaitTermination(300)
    seg = SegmentedIndex(spark, dirs["idx"])
    assert len(seg.commits()) >= 2, "expected multiple micro-batch segments"
    total = sum(c["n_docs"] for c in seg.commits())

    build_index(spark, full, dirs["batch"], n_chunks=1)
    batch_idx = load_index(spark, dirs["batch"])
    assert total == batch_idx.n_docs

    for query in ["bace", "bace cedi wedi", "rikizudi"]:
        got = search_segments(seg, query, k=10)
        want = [
            (r["doc_id"], r["score"])
            for r in search(batch_idx, query, k=10, with_meta=False).collect()
        ]
        # docIDs differ between arrival order and global order; compare the
        # identity of hits via (conv_id, turn_idx) + exact scores
        got_scores = sorted(s for _, s in got)
        want_scores = sorted(s for _, s in want)
        assert got_scores == want_scores, query
        # map segment docids back to keys
        key_by_batch = {
            r["doc_id"]: (r["conv_id"], r["turn_idx"])
            for r in batch_idx.docmap.collect()
        }
        seg_keys = {}
        for c in seg.commits():
            sidx = load_index(spark, c["dir"])
            for r in sidx.docmap.collect():
                seg_keys[c["base"] + r["doc_id"]] = (r["conv_id"], r["turn_idx"])
        assert {seg_keys[d] for d, _ in got} == {key_by_batch[d] for d, _ in want}


def test_replayed_epoch_is_noop(spark, dirs):
    seg = SegmentedIndex(spark, dirs["idx"])
    before = seg.commits()
    df = generate_transcripts(spark, 5)
    seg.append_batch(df, epoch_id=before[0]["epoch"])  # replay first epoch
    assert seg.commits() == before
