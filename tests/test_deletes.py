"""Delete-by-id / delete-by-query tombstones (Lucene liveDocs) + the
/update/json atomic-command layer.

Semantics under test (index/update.py delete_docs docstring):
- a deleted doc vanishes from EVERY query surface (term full/pruned,
  boolean clause evaluator, phrase, select facets, MergedSegmentsView)
  WITHOUT changing any surviving doc's score — the exact Lucene liveDocs
  contract, checked as topk(after) == topk-minus-deleted(before);
- df/cf statistics stay stale until compaction;
- compact() (forceMerge(1)) reclaims: rebuilt stats reflect live docs
  only, tombstones gone; compact_tiered() carries tombstones forward
  rebased (docID-preserving merge);
- deletes are idempotent; delete_by_query returns newly-deleted counts;
- apply_update_commands parses the reference's atomic {'set': ...} docs
  (brat_ann_indexer.py:186-194) and delete shapes, with loud errors on
  unsupported ops.
"""

import os

import pytest

from parser_indexer_py_spark.datagen import generate_transcripts
from parser_indexer_py_spark.index.boolean import boolean_search, select
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.search import load_index, search
from parser_indexer_py_spark.index.update import (
    apply_update_commands,
    delete_by_query,
    delete_docs,
)

N_CONVS = 60


@pytest.fixture()
def didx(spark, tmp_path):
    """Function-scoped: delete tests mutate the index."""
    out = str(tmp_path / "delidx")
    df = generate_transcripts(spark, N_CONVS, partitions=2)
    build_index(
        spark, df, out, n_partitions=4, n_buckets=8, salt=4, n_chunks=1,
        positions=True,
    )
    return load_index(spark, out)


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _top_term(idx):
    r = idx.termstats.orderBy("df", ascending=False).limit(1).collect()[0]
    return r["term"]


def test_deleted_docs_vanish_scores_unchanged(spark, didx):
    t = _top_term(didx)
    before = _rows(search(didx, t, k=50, with_meta=False))
    victims = [before[0][0], before[2][0]]
    n = delete_docs(spark, didx.paths.root, victims)
    assert n == 2
    want = [(d, s) for d, s in before if d not in victims][:10]
    for mode in ("full", "pruned"):
        after = _rows(search(didx, t, k=10, with_meta=False, mode=mode))
        assert after == want, mode  # same scores, survivors promoted


def test_deleted_docs_vanish_boolean_and_phrase(spark, didx):
    # a phrase clause forces the clause evaluator (no WAND delegation)
    from parser_indexer_py_spark.index.search import phrase_scores

    t = _top_term(didx)
    pair = (
        phrase_scores(didx, [t], slop=0)  # any doc with t; grab a bigram
        .limit(1)
        .collect()
    )
    assert pair
    bq = f'{t} "{t}"'
    before = _rows(boolean_search(didx, bq, k=50, with_meta=False))
    victim = before[0][0]
    delete_docs(spark, didx.paths.root, [victim])
    want = [(d, s) for d, s in before if d != victim][:10]
    assert _rows(boolean_search(didx, bq, k=10, with_meta=False)) == want
    # pure phrase path
    pbefore = _rows(search(didx, t, k=50, with_meta=False, phrase=True))
    if pbefore:
        pvictim = pbefore[0][0]
        delete_docs(spark, didx.paths.root, [pvictim])
        pwant = [(d, s) for d, s in pbefore if d not in (victim, pvictim)][:10]
        pafter = _rows(
            search(didx, t, k=10, with_meta=False, phrase=True)
        )
        assert pafter == pwant


def test_statistics_stay_stale_until_compaction(spark, didx):
    t = _top_term(didx)
    df_before = didx.termstats.filter(f"term = '{t}'").collect()[0]["df"]
    victims = [r["doc_id"] for r in
               search(didx, t, k=5, with_meta=False).collect()]
    delete_docs(spark, didx.paths.root, victims)
    df_after = didx.termstats.filter(f"term = '{t}'").collect()[0]["df"]
    assert df_after == df_before  # Lucene: docFreq ignores deletions


def test_select_facets_drop_deleted(spark, didx):
    t = _top_term(didx)
    fb = {
        r["role"]: r["n"]
        for r in select(didx, q=t, rows=0, facet_field="role")[
            "facets"
        ].collect()
    }
    victims = [
        r["doc_id"]
        for r in search(didx, t, k=5, with_meta=True).collect()
        if r["role"] == "user"
    ]
    assert victims
    delete_docs(spark, didx.paths.root, victims)
    fa = {
        r["role"]: r["n"]
        for r in select(didx, q=t, rows=0, facet_field="role")[
            "facets"
        ].collect()
    }
    assert fa.get("user", 0) == fb["user"] - len(victims)


def test_delete_by_query_idempotent(spark, didx):
    n_user = didx.docmap.filter("role = 'user'").count()
    n1 = delete_by_query(spark, didx.paths.root, "role:user")
    assert n1 == n_user
    # match set already excludes tombstones -> second delete finds none
    assert delete_by_query(spark, didx.paths.root, "role:user") == 0
    t = _top_term(didx)
    got = search(didx, t, k=10**6, with_meta=True).collect()
    assert got and all(r["role"] != "user" for r in got)


def test_delete_all_star(spark, didx):
    n = delete_by_query(spark, didx.paths.root, "*:*")
    assert n == didx.n_docs
    assert search(didx, _top_term(didx), k=10, with_meta=False).count() == 0


def test_apply_update_commands_atomic_set_and_delete(spark, didx):
    row = didx.docmap.limit(1).collect()[0]
    key = (row["conv_id"], int(row["turn_idx"]))
    out = apply_update_commands(
        spark, didx.paths.root,
        [{"conv_id": key[0], "turn_idx": key[1], "role": {"set": "tool"}}],
    )
    assert out == {"updated": 1, "deleted": 0}
    dm = didx.docmap
    got = dm.filter(
        (dm.conv_id == key[0]) & (dm.turn_idx == key[1])
    ).collect()[0]
    assert got["role"] == "tool"
    # delete by composite uniqueKey
    out = apply_update_commands(
        spark, didx.paths.root, {"delete": {"id": [key[0], key[1]]}}
    )
    assert out == {"updated": 0, "deleted": 1}
    assert _rows(
        boolean_search(
            didx, f'conv_id:"{key[0]}" turn_idx:[{key[1]} TO {key[1]}]',
            k=10, with_meta=False,
        )
    ) == []
    # delete by query through the command body
    out = apply_update_commands(
        spark, didx.paths.root, {"delete": {"query": "role:assistant"}}
    )
    assert out["deleted"] > 0


def test_apply_update_commands_loud_errors(spark, didx):
    root = didx.paths.root
    with pytest.raises(ValueError, match="only the 'set' atomic op"):
        apply_update_commands(
            spark, root,
            [{"conv_id": "c", "turn_idx": 0, "ts": {"inc": 5}}],
        )
    with pytest.raises(ValueError, match="only the 'set' atomic op"):
        apply_update_commands(
            spark, root, [{"conv_id": "c", "turn_idx": 0, "role": "user"}]
        )
    with pytest.raises(ValueError, match="uniqueKey"):
        apply_update_commands(spark, root, [{"role": {"set": "x"}}])
    with pytest.raises(ValueError, match="unsupported update command"):
        apply_update_commands(spark, root, {"optimize": {}})


def test_compact_reclaims_tiered_carries(spark, tmp_path):
    from parser_indexer_py_spark.streaming.incremental import SegmentedIndex
    from parser_indexer_py_spark.streaming.merged import MergedSegmentsView
    from pyspark.sql import functions as F

    root = str(tmp_path / "segdel")
    s = SegmentedIndex(spark, root, positions=True)
    df = generate_transcripts(spark, 24, partitions=2)
    num = F.substring("conv_id", 6, 8).cast("int")
    s.append_batch(df.filter(num < 12), epoch_id=0, writer_id="w0")
    s.append_batch(df.filter(num >= 12), epoch_id=1, writer_id="w0")
    c0 = s.commits()[0]
    idx0 = load_index(spark, c0["dir"])
    t = _top_term(idx0)
    local = [
        r["doc_id"]
        for r in search(idx0, t, k=3, with_meta=False).collect()
    ]
    delete_docs(spark, c0["dir"], local)

    # the merged view honors segment-local tombstones, rebased
    view = MergedSegmentsView(s)
    vbefore = {
        r["doc_id"]
        for r in search(view, t, k=10**6, with_meta=False).collect()
    }
    rebased = {d + int(c0["base"]) for d in local}
    assert not (vbefore & rebased)

    # tiered merge: docIDs preserved, deletions carried forward
    rec = s.compact_tiered(min_merge=2)
    assert rec is not None
    merged_idx = load_index(spark, rec["dir"])
    assert merged_idx.tombstones is not None
    mdocs = {
        r["doc_id"]
        for r in search(merged_idx, t, k=10**6, with_meta=False).collect()
    }
    assert not (mdocs & rebased)

    # forceMerge(1): reclaim — fresh stats over live docs, no tombstones.
    # compact() is a no-op on a single segment, so append another first.
    df2 = generate_transcripts(spark, 30, partitions=2).filter(num >= 24)
    s.append_batch(df2, epoch_id=2, writer_id="w0")
    rec2 = s.compact()
    cidx = load_index(spark, rec2["dir"])
    assert cidx.tombstones is None
    assert cidx.n_docs == view.n_docs + df2.count() - len(local)
    # equals a from-scratch build over the surviving documents
    live = df.unionByName(df2).join(
        idx0.docmap.filter(F.col("doc_id").isin(local))
        .select("conv_id", "turn_idx"),
        ["conv_id", "turn_idx"],
        "left_anti",
    )
    out2 = str(tmp_path / "liveidx")
    build_index(spark, live, out2, n_chunks=1, positions=True)
    ref = load_index(spark, out2)
    got = _rows(search(cidx, t, k=10, with_meta=False))
    want = _rows(search(ref, t, k=10, with_meta=False))
    assert [s_ for _, s_ in got] == [s_ for _, s_ in want]
