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


def test_segment_search_is_distributed(spark, dirs):
    """VERDICT r1 #1: segment search must score inside Spark (Arrow block
    decode + distributed fold + TakeOrderedAndProject), not by collecting
    postings to the driver. Plan facts: a MapInPandas decode node and a
    TakeOrderedAndProject top-k are present in the physical plan."""
    from pyspark.sql import DataFrame

    from parser_indexer_py_spark.streaming.incremental import search_segments_df

    seg = SegmentedIndex(spark, dirs["idx"])
    df = search_segments_df(seg, "bace cedi", k=10)
    assert isinstance(df, DataFrame)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_replayed_epoch_is_noop(spark, dirs):
    seg = SegmentedIndex(spark, dirs["idx"])
    before = seg.commits()
    df = generate_transcripts(spark, 5)
    seg.append_batch(df, epoch_id=before[0]["epoch"])  # replay first epoch
    assert seg.commits() == before


def test_compaction_preserves_results(spark, dirs):
    """Segment compaction (Lucene merge/optimize analog): one segment
    replaces many; scores and hit identities are unchanged; absorbed
    epochs stay exactly-once. Runs LAST against the shared segment dir."""
    seg = SegmentedIndex(spark, dirs["idx"])
    before_commits = seg.commits()
    assert len(before_commits) >= 2

    def keyed_results(query):
        hits = search_segments(seg, query, k=10)
        keys = {}
        for c in seg.commits():
            sidx = load_index(spark, c["dir"])
            for r in sidx.docmap.select("doc_id", "conv_id", "turn_idx").collect():
                keys[c["base"] + r["doc_id"]] = (r["conv_id"], r["turn_idx"])
        return sorted(
            ((keys[d], round(s, 12)) for d, s in hits), key=lambda x: x[0]
        )

    queries = ["bace", "bace cedi wedi"]
    before = {q: keyed_results(q) for q in queries}
    covered_before = seg.covered_epochs()

    rec = seg.compact()
    assert rec is not None and len(seg.commits()) == 1
    assert seg.covered_epochs() >= covered_before
    for q in queries:
        assert keyed_results(q) == before[q], q
    # pre-compaction epoch replay is still a no-op
    replay_epoch = sorted(covered_before)[0]
    df = generate_transcripts(spark, 5)
    seg.append_batch(df, epoch_id=replay_epoch)
    assert len(seg.commits()) == 1
    # idempotent: compacting a single segment is a no-op returning it
    assert seg.compact()["dir"] == rec["dir"]


def test_stateful_update_handles_null_turn_idx():
    """Round-2 review: a NULL turn_idx (pandas: NaN in a widened float
    column) must not kill the stateful query via int(NaN)."""
    import numpy as np
    import pandas as pd

    from parser_indexer_py_spark.streaming.stateful import _update

    class StubState:
        exists = False

        def update(self, v):
            self.value = v

    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 3,
            "turn_idx": [0.0, np.nan, 2.0],
            "role": ["user", "tool", "assistant"],
            "text": ["a b", "c", "d e f"],
        }
    )
    st = StubState()
    out = list(_update(("c",), iter([pdf]), st))
    assert st.value == (3, 6, "assistant", 2)
    assert out[0]["n_turns"].iloc[0] == 3


def test_new_checkpoint_epoch_collision_raises(spark, dirs):
    """Round-2 review: epoch ids are checkpoint-scoped — a DIFFERENT
    writer replaying an already-covered epoch must fail loudly (silent
    skip would drop new data forever); the SAME writer stays a no-op."""
    seg = SegmentedIndex(spark, dirs["idx"])
    covered = sorted(seg.covered_epochs())[0]
    df = generate_transcripts(spark, 5)
    before = seg.commits()
    # writerless + same-writer replays: no-ops (crash-replay idempotence)
    seg.append_batch(df, epoch_id=covered)
    assert seg.commits() == before
    with pytest.raises(ValueError, match="different stream"):
        seg.append_batch(df, epoch_id=covered, writer_id="some-new-ckpt")
    # empty micro-batches are skipped, not indexed and not fatal
    empty = spark.createDataFrame([], TRANSCRIPT_SCHEMA)
    seg.append_batch(empty, epoch_id=10_001, writer_id="w")
    assert seg.commits() == before


def test_stateful_conversation_state(spark, tmp_path_factory):
    """applyInPandasWithState: final per-conversation state across
    micro-batches equals the batch groundtruth."""
    import pandas as pd
    from pyspark.sql import functions as F

    from parser_indexer_py_spark.datagen import generate_transcripts_pandas
    from parser_indexer_py_spark.functions.analyzer import tokens_expr
    from parser_indexer_py_spark.streaming.stateful import (
        conversation_state_stream,
    )

    src = str(tmp_path_factory.mktemp("state_src"))
    ckpt = str(tmp_path_factory.mktemp("state_ckpt"))
    pdf = generate_transcripts_pandas(25)
    # split each conversation's turns across two files (state must carry)
    first = pdf[pdf.turn_idx % 2 == 0]
    second = pdf[pdf.turn_idx % 2 == 1]
    spark.createDataFrame(first, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/a")
    spark.createDataFrame(second, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b")
    import glob
    import shutil

    for i, f in enumerate(sorted(glob.glob(f"{src}/*/part-*.parquet"))):
        shutil.copy(f, f"{src}/f{i}.parquet")

    q = conversation_state_stream(
        spark, f"{src}/f*.parquet", ckpt, TRANSCRIPT_SCHEMA, queryName="cs_test"
    )
    q.awaitTermination(300)
    updates = spark.sql("SELECT * FROM cs_test").toPandas()
    # last update per conversation = final state
    final = (
        updates.sort_values(["conv_id", "n_turns"]).groupby("conv_id").last()
    )
    truth = (
        spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
        .withColumn("n_tok", F.size(tokens_expr(F.col("text"))))
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum("n_tok").alias("n_tokens"),
            F.max("turn_idx").alias("last_turn_idx"),
        )
        .toPandas()
        .set_index("conv_id")
    )
    assert len(final) == len(truth)
    for cid, row in truth.iterrows():
        f = final.loc[cid]
        assert f["n_turns"] == row["n_turns"], cid
        assert f["n_tokens"] == row["n_tokens"], cid
        assert f["last_turn_idx"] == row["last_turn_idx"], cid


def test_index_stream_infers_positions(spark, tmp_path_factory):
    """Resuming a stream into a root whose segments are positional keeps
    appending positional segments: index_stream infers the flag from the
    first commit's globals.json (round-3 ADVICE — mixed flags would
    disable phrase search on the merged view and break tiered merges)."""
    import glob
    import json
    import os

    from parser_indexer_py_spark.datagen import generate_transcripts_pandas
    from parser_indexer_py_spark.streaming.incremental import search_segments_df

    src = str(tmp_path_factory.mktemp("pos_src"))
    idx = str(tmp_path_factory.mktemp("pos_idx"))
    ckpt = str(tmp_path_factory.mktemp("pos_ckpt"))

    pdf = generate_transcripts_pandas(30)
    conv_num = pdf["conv_id"].str[5:].astype(int)
    first, second = pdf[conv_num < 15], pdf[conv_num >= 15]

    # seed the root with one POSITIONAL segment (a prior run)
    seg = SegmentedIndex(spark, idx, positions=True)
    seg.append_batch(
        spark.createDataFrame(first, schema=TRANSCRIPT_SCHEMA), 999,
        writer_id="seed",  # high epoch: the new stream's epoch 0 is fresh
    )

    spark.createDataFrame(second, schema=TRANSCRIPT_SCHEMA).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{src}/chunk")
    for i, f in enumerate(sorted(glob.glob(f"{src}/chunk/part-*.parquet"))):
        os.rename(f, f"{src}/data{i}.parquet")

    # no positions argument: must infer True from the existing commit
    q = index_stream(
        spark, f"{src}/data*.parquet", idx, ckpt, TRANSCRIPT_SCHEMA
    )
    q.awaitTermination(300)
    seg = SegmentedIndex(spark, idx)
    commits = seg.commits()
    assert len(commits) >= 2
    for c in commits:
        with open(os.path.join(c["dir"], "globals.json")) as f:
            assert json.load(f)["positions"] is True, c["dir"]
    # phrase search works across the mixed-origin segments
    row = seg.commits()[0]
    txt = spark.read.parquet(os.path.join(row["dir"], "docmap")).limit(1)
    from parser_indexer_py_spark.functions.analyzer import analyze_text

    toks = analyze_text(txt.collect()[0]["text"])[:2]
    if len(toks) == 2:
        res = search_segments_df(seg, f"{toks[0]} {toks[1]}", 5, phrase=True)
        res.collect()  # must not raise (positions available everywhere)


def test_components_over_merged_view(spark, dirs):
    """Round-5b: the searchComponent twins (index/components.py) work
    unchanged over the duck-typed MergedSegmentsView and agree with the
    monolithic batch index on the same corpus."""
    from pyspark.sql import functions as F

    from parser_indexer_py_spark.index.components import (
        term_vectors,
        terms_enum,
    )
    from parser_indexer_py_spark.streaming.merged import MergedSegmentsView

    seg = SegmentedIndex(spark, dirs["idx"])
    view = MergedSegmentsView(seg)
    batch_idx = load_index(spark, dirs["batch"])

    a = terms_enum(view, "", mincount=2, limit=30, sort="index").toPandas()
    b = terms_enum(
        batch_idx, "", mincount=2, limit=30, sort="index"
    ).toPandas()
    assert list(a["term"]) == list(b["term"])
    assert list(a["df"]) == list(b["df"])

    # same doc (by conversation key) -> identical term vector, despite
    # the segment-local vs global docID difference
    key = (
        batch_idx.docmap.select("conv_id", "turn_idx", "doc_id")
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    vid = (
        view.docmap.filter(
            (F.col("conv_id") == key["conv_id"])
            & (F.col("turn_idx") == key["turn_idx"])
        )
        .select("doc_id")
        .collect()[0]["doc_id"]
    )
    tv_b = term_vectors(batch_idx, [key["doc_id"]]).toPandas()
    tv_v = term_vectors(view, [int(vid)]).toPandas()

    def canon(df):
        return sorted(
            (t, int(tf), tuple(p), int(d))
            for t, tf, p, d in zip(
                df["term"], df["tf"], df["positions"], df["df"]
            )
        )

    assert canon(tv_b) == canon(tv_v) and len(tv_b) > 0


def test_suggest_over_merged_view(spark, dirs):
    """/suggest over the segments view's unioned docmap equals the
    monolithic batch index's dictionary (same surfaces, same weights)."""
    from parser_indexer_py_spark.functions.analyzer import analyze_text
    from parser_indexer_py_spark.index.components import suggest
    from parser_indexer_py_spark.streaming.merged import MergedSegmentsView

    seg = SegmentedIndex(spark, dirs["idx"])
    view = MergedSegmentsView(seg)
    batch_idx = load_index(spark, dirs["batch"])

    first = batch_idx.docmap.orderBy("doc_id").limit(1).collect()[0]["text"]
    tok = analyze_text(first)[0]
    if len(tok) >= 4:
        q = tok[:-1] + ("x" if tok[-1] != "x" else "y")  # 1-edit typo
    else:
        q = tok  # too short for a safe typo: exact-prefix path
    a = suggest(view.docmap, q, field="text", count=15).toPandas()
    b = suggest(batch_idx.docmap, q, field="text", count=15).toPandas()
    assert list(a["suggestion"]) == list(b["suggestion"]) and len(a) > 0


def test_parent_search_over_merged_view(spark, dirs):
    """Round-5: the block-join parent query (index/blockjoin.py) over
    the segments view equals the monolithic batch index — the parent
    rollup keys on conv_id, so it is docID-layout-independent and the
    merged-at-query-time global stats must reproduce the same scores."""
    from parser_indexer_py_spark.index.blockjoin import parent_search
    from parser_indexer_py_spark.streaming.merged import MergedSegmentsView

    seg = SegmentedIndex(spark, dirs["idx"])
    view = MergedSegmentsView(seg)
    batch_idx = load_index(spark, dirs["batch"])

    def rows(ix):
        return [
            (r["parent"], r["score"], r["n_matched"])
            for r in parent_search(
                ix, "bace cedi", k=10, score_mode="max"
            ).collect()
        ]

    a, b = rows(view), rows(batch_idx)
    assert a == b and len(a) == 10


def test_searcher_caches_over_merged_view(spark, dirs):
    """Round-5: SearcherCaches pages over the segments view equal the
    uncached engine page on the same view, and the cached window serves
    the follow-up page without re-searching."""
    from parser_indexer_py_spark.index.boolean import boolean_search
    from parser_indexer_py_spark.index.caches import SearcherCaches
    from parser_indexer_py_spark.streaming.merged import MergedSegmentsView

    seg = SegmentedIndex(spark, dirs["idx"])
    view = MergedSegmentsView(seg)
    caches = SearcherCaches()
    got = [
        (r["doc_id"], r["score"])
        for r in caches.search(
            view, "bace cedi", rows=10, fq="role:assistant"
        ).collect()
    ]
    exp = [
        (r["doc_id"], r["score"])
        for r in boolean_search(
            view, "bace cedi", k=10, fq="role:assistant"
        ).collect()
    ]
    assert got == exp and len(got) == 10
    inserts = caches.query_result_cache.stats["inserts"]
    caches.search(view, "bace cedi", rows=10, start=10, fq="role:assistant")
    assert caches.query_result_cache.stats["inserts"] == inserts
    caches.invalidate()


def test_federated_roots_equals_monolithic(spark, tmp_path_factory):
    """Round-5d: MergedSegmentsView.from_roots — two INDEPENDENTLY built
    indexes over disjoint conv ranges federate into one view whose
    search results are rank- AND score-identical to a monolithic build
    over the union corpus (query-time df/cf/avgdl merging — the
    SolrCloud distributed-IDF semantics)."""
    from parser_indexer_py_spark.datagen import generate_transcripts_pandas
    from parser_indexer_py_spark.index.boolean import boolean_search
    from parser_indexer_py_spark.streaming.merged import MergedSegmentsView

    pdf = generate_transcripts_pandas(40)
    conv_num = pdf["conv_id"].str[5:].astype(int)
    roots = []
    for i, (lo, hi) in enumerate([(0, 25), (25, 40)]):
        chunk = spark.createDataFrame(
            pdf[(conv_num >= lo) & (conv_num < hi)],
            schema=TRANSCRIPT_SCHEMA,
        )
        out = str(tmp_path_factory.mktemp(f"fed{i}"))
        build_index(spark, chunk, out, n_partitions=3, n_chunks=1)
        roots.append(out)
    mono_dir = str(tmp_path_factory.mktemp("fedmono"))
    build_index(
        spark,
        spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA),
        mono_dir,
        n_partitions=3,
        n_chunks=1,
    )
    mono = load_index(spark, mono_dir)
    fed = MergedSegmentsView.from_roots(spark, roots)
    assert fed.n_docs == mono.n_docs and fed.avgdl == mono.avgdl

    def keyed(ix, **kw):
        return [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in boolean_search(
                ix, "bace cedi", k=10, with_meta=True, **kw
            ).collect()
        ]

    assert keyed(fed) == keyed(mono)
    assert keyed(fed, mode="pruned") == keyed(mono)
    with pytest.raises(ValueError, match="no index roots"):
        MergedSegmentsView.from_roots(spark, [])
