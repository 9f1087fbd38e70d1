"""Engine query-API extras: facets, suggest, pagination — each against a
driver-side oracle computed from the same index tables."""

import pytest
from pyspark.sql import functions as F

from parser_indexer_py_spark.datagen import generate_transcripts
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.search import (
    facet_counts,
    load_index,
    paged_search,
    search,
    suggest,
)


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_extras"))
    build_index(spark, generate_transcripts(spark, 80), out, n_chunks=1)
    return load_index(spark, out)


def test_facet_counts_matches_manual(spark, index):
    got = [
        (r["role"], r["n"]) for r in facet_counts(index, "bace", "role", 10).collect()
    ]
    # oracle: docs whose token list contains 'bace', counted by role
    from parser_indexer_py_spark.functions.analyzer import tokens_expr

    dm = index.docmap
    manual = (
        dm.filter(F.array_contains(tokens_expr(F.col("text")), "bace"))
        .groupBy("role")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("role"))
        .collect()
    )
    assert got == [(r["role"], r["n"]) for r in manual]


def test_suggest(index):
    rows = suggest(index, "ba", count=5).collect()
    assert 0 < len(rows) <= 5
    assert all(r["term"].startswith("ba") for r in rows)
    cfs = [r["cf"] for r in rows]
    assert cfs == sorted(cfs, reverse=True)
    # analyzed prefix: unicode quotes fold away
    rows2 = suggest(index, "“ba", count=5).collect()
    assert [r["term"] for r in rows2] == [r["term"] for r in rows]


def test_paged_search_consistent_with_topk(index):
    full = [
        (r["doc_id"], r["score"])
        for r in search(index, "bace cedi", k=20).collect()
    ]
    p1 = [
        (r["doc_id"], r["score"])
        for r in paged_search(index, "bace cedi", 0, 10).collect()
    ]
    p2 = [
        (r["doc_id"], r["score"])
        for r in paged_search(index, "bace cedi", 10, 10).collect()
    ]
    assert p1 + p2 == full


def test_search_with_synonyms_equals_expanded_query(spark, index):
    """Query-time synonym expansion must equal querying the expanded term
    set directly (scores included — Solr expand=true OR semantics)."""
    ts = index.termstats.orderBy(F.desc("df")).limit(2).collect()
    hot, second = ts[0]["term"], ts[1]["term"]
    syn = {hot: [hot, second]}
    got = [
        (r["doc_id"], r["score"])
        for r in search(index, hot, k=10, synonyms=syn).collect()
    ]
    want = [
        (r["doc_id"], r["score"])
        for r in search(index, f"{hot} {second}", k=10).collect()
    ]
    assert got == want


def test_search_generalized_fq_filters(spark, index):
    """Solr fq generalization (P10): arbitrary docmap-field filters —
    equality, IN-list, and inclusive range — restrict results without
    changing scores, on both full and pruned paths. Oracle: the unfiltered
    score list intersected with the manually-filtered docID set."""
    full = {
        r["doc_id"]: r["score"]
        for r in search(index, "bace cedi", k=10_000, with_meta=False).collect()
    }
    dm = index.docmap.select("doc_id", "role", "tool", "ts").collect()

    cases = [
        ({"role": "tool"}, lambda r: r["role"] == "tool"),
        (
            {"role": ["user", "assistant"]},
            lambda r: r["role"] in ("user", "assistant"),
        ),
    ]
    from parser_indexer_py_spark.index.search import Between

    ts_vals = sorted(r["ts"] for r in dm)
    lo, hi = ts_vals[len(ts_vals) // 4], ts_vals[3 * len(ts_vals) // 4]
    cases.append(({"ts": Between(lo, hi)}, lambda r: lo <= r["ts"] <= hi))
    # round-5e: exclusive brackets and open (*) endpoints — Lucene
    # TermRangeQuery's {lo TO hi} / [* TO hi] forms
    cases.append(
        (
            {"ts": Between(lo, hi, lo_inc=False, hi_inc=False)},
            lambda r: lo < r["ts"] < hi,
        )
    )
    cases.append(({"ts": Between(None, hi)}, lambda r: r["ts"] <= hi))
    cases.append(
        (
            {"ts": Between(lo, None, lo_inc=False)},
            lambda r: r["ts"] > lo,
        )
    )
    cases.append(({"ts": Between(None, None)}, lambda r: True))
    # bare tuples are ambiguous (IN vs BETWEEN) and must fail loudly
    # rather than silently BETWEEN over string ordering (round-2 ADVICE)
    with pytest.raises(ValueError, match="ambiguous"):
        search(
            index, "bace", k=5, filters={"role": ("user", "assistant")},
            with_meta=False,
        ).collect()

    for filt, pred in cases:
        allowed = {r["doc_id"] for r in dm if pred(r)}
        want = sorted(
            ((d, s) for d, s in full.items() if d in allowed),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        for mode_kw in ({"mode": "full"}, {"mode": "pruned", "full_cutover": 0}):
            got = [
                (r["doc_id"], r["score"])
                for r in search(
                    index, "bace cedi", k=10, filters=filt,
                    with_meta=False, **mode_kw
                ).collect()
            ]
            assert got == want, (filt, mode_kw)


def test_conjunctive_synonyms_group_semantics(spark, tmp_path_factory):
    """Solr SynonymQuery AND semantics: with expand=true synonyms, a
    conjunctive query requires >= 1 variant of EVERY original token — not
    every expanded term. Also: synonym targets are analyzed, so a
    'flat-screen' target matches the index terms {flat, screen}."""
    import pandas as pd

    out = str(tmp_path_factory.mktemp("syn_idx"))
    rows = [
        ("c0", 0, "user", "tv in the corner", None),          # tv only
        ("c1", 0, "user", "television on the wall", None),    # television only
        ("c2", 0, "user", "tv and television both", None),
        ("c3", 0, "user", "nothing relevant here", None),
        ("c4", 0, "user", "flat screen panel", None),         # via analyzed target
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    pdf["ts"] = pd.Timestamp("2025-01-01")
    build_index(spark, spark.createDataFrame(pdf), out, n_buckets=4, salt=2, n_chunks=1)
    idx = load_index(spark, out)
    syn = {"tv": ["tv", "television", "flat-screen"]}
    # disjunctive: all four tv-ish docs match
    got_or = {
        r["doc_id"] for r in search(idx, "tv", k=10, synonyms=syn).collect()
    }
    assert got_or == {0, 1, 2, 4}
    # conjunctive single-token query: one group -> same four docs (round 1
    # demanded EVERY expanded term and would return only doc 2... or none)
    got_and = {
        r["doc_id"]
        for r in search(idx, "tv", k=10, conjunctive=True, synonyms=syn).collect()
    }
    assert got_and == {0, 1, 2, 4}
    # two-group AND: every doc with (tv-variant) AND 'corner'
    got_two = {
        r["doc_id"]
        for r in search(
            idx, "tv corner", k=10, conjunctive=True, synonyms=syn
        ).collect()
    }
    assert got_two == {0}
    # pruned mode with expanded conjunctive routes group-aware (same answer)
    got_pruned = {
        r["doc_id"]
        for r in search(
            idx, "tv corner", k=10, conjunctive=True, synonyms=syn,
            mode="pruned", full_cutover=0,
        ).collect()
    }
    assert got_pruned == {0}


def test_search_with_excerpt_column(spark, index):
    """F11 on search results: excerpt equals the Python twin applied to the
    stored text at the first query-term occurrence; ranking unchanged."""
    from parser_indexer_py_spark.functions.excerpt import extract_excerpt

    plain = search(index, "bace cedi", k=5).collect()
    rows = search(index, "bace cedi", k=5, with_excerpt=True).collect()
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (r["doc_id"], r["score"]) for r in plain
    ]
    texts = {
        r["doc_id"]: r["text"]
        for r in index.docmap.select("doc_id", "text").collect()
    }
    for r in rows:
        text = texts[r["doc_id"]]
        lc = text.lower()
        pos, ln = -1, 0
        for t in ["bace", "cedi"]:
            p = lc.find(t)
            if p != -1 and (pos == -1 or p < pos):
                pos, ln = p, len(t)
        want = extract_excerpt(text, pos, pos + ln) if pos != -1 else ""
        assert r["excerpt"] == want, r["doc_id"]
        if pos != -1:
            assert ("bace" in r["excerpt"].lower()) or (
                "cedi" in r["excerpt"].lower()
            )


def test_atomic_docmap_update(spark, index):
    """S11/§2.10 analog: partial metadata update rewrites only docmap,
    atomically; postings untouched; filters see the new values."""
    import pytest as _pytest

    from parser_indexer_py_spark.index.update import update_docmap

    before = index.docmap.filter("doc_id = 0").head()
    updates = spark.createDataFrame(
        [(before["conv_id"], before["turn_idx"], "auditor")],
        "conv_id string, turn_idx int, role string",
    )
    n = update_docmap(spark, index.paths.root, updates)
    assert n == 1
    after = index.docmap.filter("doc_id = 0").head()
    assert after["role"] == "auditor"
    assert after["dl"] == before["dl"] and after["text"] == before["text"]
    # role filter sees the change; scoring unchanged
    hit = search(index, after["text"].split()[0], k=50, role="auditor").collect()
    assert any(r["doc_id"] == 0 for r in hit)
    # content columns are rejected
    bad = spark.createDataFrame(
        [(before["conv_id"], before["turn_idx"], "xx")],
        "conv_id string, turn_idx int, text string",
    )
    with _pytest.raises(ValueError, match="non-updatable"):
        update_docmap(spark, index.paths.root, bad)
    # key-only updates are rejected with a clear error (ADVICE r1
    # update.py:57: flags[0] used to IndexError)
    keys_only = spark.createDataFrame(
        [(before["conv_id"], before["turn_idx"])], "conv_id string, turn_idx int"
    )
    with _pytest.raises(ValueError, match="key columns"):
        update_docmap(spark, index.paths.root, keys_only)


def test_docmap_update_rejects_duplicate_keys(spark, index):
    """Duplicate update keys would fan out the merge join and persist
    duplicated docmap rows — rejected with a clear error."""
    import pytest as _pytest

    from parser_indexer_py_spark.index.update import update_docmap

    row = index.docmap.filter("doc_id = 3").head()
    dup = spark.createDataFrame(
        [
            (row["conv_id"], row["turn_idx"], "a"),
            (row["conv_id"], row["turn_idx"], "b"),
        ],
        "conv_id string, turn_idx int, role string",
    )
    with _pytest.raises(ValueError, match="duplicate"):
        update_docmap(spark, index.paths.root, dup)


def test_docmap_update_migrates_legacy_layout(spark, index, tmp_path_factory):
    """An index whose docmap predates dkey partitioning still updates:
    the first update migrates it in place to the partitioned layout."""
    import shutil as _shutil

    from pyspark.sql import functions as F

    from parser_indexer_py_spark.index.build import IndexPaths
    from parser_indexer_py_spark.index.update import update_docmap

    root = str(tmp_path_factory.mktemp("legacy_idx"))
    _shutil.copytree(index.paths.root, root, dirs_exist_ok=True)
    paths = IndexPaths(root)
    # strip the partitioning: rewrite the docmap flat, without dkey
    flat = spark.read.parquet(paths.docmap).drop("dkey")
    row = flat.filter("doc_id = 5").head()       # materialize BEFORE the
    n_docs = flat.count()                        # source files are replaced
    tmp = paths.docmap + ".flat"
    flat.write.mode("overwrite").parquet(tmp)
    _shutil.rmtree(paths.docmap)
    import os as _os

    _os.replace(tmp, paths.docmap)
    assert "dkey" not in spark.read.parquet(paths.docmap).columns
    n = update_docmap(
        spark,
        root,
        spark.createDataFrame(
            [(row["conv_id"], row["turn_idx"], "migrator")],
            "conv_id string, turn_idx int, role string",
        ),
    )
    assert n == 1
    dm = spark.read.parquet(paths.docmap)
    assert "dkey" in dm.columns  # migrated to the partitioned layout
    assert dm.filter("doc_id = 5").head()["role"] == "migrator"
    assert dm.count() == n_docs


def test_docmap_update_is_partition_scoped(spark, index):
    """VERDICT r1 #8: an update rewrites ONLY the dkey partitions holding
    updated keys — untouched partition files stay byte-identical."""
    import glob
    import hashlib
    import os

    from parser_indexer_py_spark.index.build import docmap_dkey
    from parser_indexer_py_spark.index.update import update_docmap
    from pyspark.sql import functions as F

    row = index.docmap.filter("doc_id = 7").head()
    touched_dkey = (
        spark.createDataFrame([(row["conv_id"],)], "conv_id string")
        .select(docmap_dkey(F.col("conv_id")).alias("d"))
        .head()["d"]
    )

    def digest():
        out = {}
        for f in glob.glob(os.path.join(index.paths.docmap, "dkey=*", "*.parquet")):
            with open(f, "rb") as fh:
                out[f] = hashlib.md5(fh.read()).hexdigest()
        return out

    before = digest()
    assert any(f"dkey={touched_dkey}/" in f for f in before), "partitioned layout"
    n = update_docmap(
        spark,
        index.paths.root,
        spark.createDataFrame(
            [(row["conv_id"], row["turn_idx"], "editor")],
            "conv_id string, turn_idx int, role string",
        ),
    )
    assert n == 1
    after = digest()
    untouched_before = {f: h for f, h in before.items() if f"dkey={touched_dkey}/" not in f}
    untouched_after = {f: h for f, h in after.items() if f"dkey={touched_dkey}/" not in f}
    assert untouched_before == untouched_after, "untouched partitions rewritten"
    assert index.docmap.filter("doc_id = 7").head()["role"] == "editor"


def test_docmap_update_crash_recovery(spark, index, tmp_path_factory):
    """ADVICE r2 (medium): the partition-swap commit must be recoverable
    from every crash window — a missing dkey partition with its .bak
    beside it is restored; a completed swap's leftover .bak and any
    uncommitted .staging dirs are discarded."""
    import os as _os
    import shutil as _shutil

    from parser_indexer_py_spark.index.build import IndexPaths
    from parser_indexer_py_spark.index.update import (
        _recover_partition_swaps,
        update_docmap,
    )

    root = str(tmp_path_factory.mktemp("crash_idx"))
    _shutil.copytree(index.paths.root, root, dirs_exist_ok=True)
    paths = IndexPaths(root)
    dm_dir = paths.docmap
    parts = sorted(
        p for p in _os.listdir(dm_dir) if p.startswith("dkey=")
    )
    victim = _os.path.join(dm_dir, parts[0])
    n_docs = spark.read.parquet(dm_dir).count()

    # window 1: crash between the two renames — partition moved to .bak,
    # staged file never moved in
    bak = _os.path.join(dm_dir, ".bak-" + parts[0])
    _os.replace(victim, bak)
    stale = dm_dir + ".staging-123"
    _os.makedirs(stale, exist_ok=True)
    _recover_partition_swaps(dm_dir)
    assert _os.path.exists(victim) and not _os.path.exists(bak)
    assert not _os.path.exists(stale)
    assert spark.read.parquet(dm_dir).count() == n_docs

    # window 2: crash after the swap completed but before .bak cleanup —
    # recovery discards the stale backup, keeping the NEW data
    _shutil.copytree(victim, bak)
    _recover_partition_swaps(dm_dir)
    assert _os.path.exists(victim) and not _os.path.exists(bak)

    # and a real update still lands after recovery (runs recovery itself)
    row = spark.read.parquet(dm_dir).filter("doc_id = 3").head()
    n = update_docmap(
        spark,
        root,
        spark.createDataFrame(
            [(row["conv_id"], row["turn_idx"], "survivor")],
            "conv_id string, turn_idx int, role string",
        ),
    )
    assert n == 1
    assert (
        spark.read.parquet(dm_dir).filter("doc_id = 3").head()["role"]
        == "survivor"
    )
