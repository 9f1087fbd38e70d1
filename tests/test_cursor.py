"""cursorMark deep paging: a cursor walk must enumerate EXACTLY the
offset-paginated order (no dups, no gaps, same page boundaries), end with
Solr's next==current contract, and compile each page to a constant-size
TakeOrderedAndProject regardless of depth."""

import pytest

from parser_indexer_py_spark.datagen import generate_transcripts
from parser_indexer_py_spark.index.boolean import (
    cursor_page,
    decode_cursor,
    encode_cursor,
    select,
)
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.search import load_index
from parser_indexer_py_spark.plans.explain_audit import assert_take_ordered


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_cursor"))
    build_index(spark, generate_transcripts(spark, 80), out, n_chunks=1)
    return load_index(spark, out)


def _walk(index, q, rows, sort=None, **kw):
    """Full cursor walk; returns (pages of doc_ids, page count)."""
    mark, pages = "*", []
    for _ in range(1000):  # safety bound
        out = cursor_page(
            index, q, rows=rows, sort=sort, cursor_mark=mark, **kw
        )
        ids = [r.doc_id for r in out["response"].collect()]
        nxt = out["next_cursor_mark"]()
        if not ids:
            assert nxt == mark  # Solr end-of-results contract
            return pages
        pages.append(ids)
        mark = nxt
    raise AssertionError("cursor walk did not terminate")


def _offset_ids(index, q, rows, start, sort=None, fq=None):
    out = select(index, q, rows=rows, start=start, sort=sort, fq=fq)
    return [r.doc_id for r in out["response"].collect()]


@pytest.mark.parametrize("sort", [None, "ts desc", "turn_idx asc, role desc"])
def test_cursor_walk_equals_offset_pagination(index, sort):
    # fq bounds the match set (one doc per conv) so the FULL walk stays
    # a handful of pages; the cursor semantics under test are identical
    q, rows, fq = "bace cedi", 13, "turn_idx:1"
    pages = _walk(index, q, rows, sort=sort, fq=fq)
    flat = [d for p in pages for d in p]
    assert flat and len(flat) == len(set(flat))  # no duplicates across pages
    for i, page in enumerate(pages):
        assert page == _offset_ids(index, q, rows, i * rows, sort=sort, fq=fq)
    # exhaustive: one past the walk is empty in the offset view too
    assert _offset_ids(index, q, rows, len(flat), sort=sort, fq=fq) == []


def test_cursor_page_is_constant_size_topk(index):
    first = cursor_page(index, "bace cedi", rows=5)
    mark = first["next_cursor_mark"]()
    deep = cursor_page(index, "bace cedi", rows=5, cursor_mark=mark)
    # each page is a rows-bounded distributed heap, not a global sort
    assert_take_ordered(deep["response"])
    assert deep["response"].count() == 5


def test_cursor_fq_and_fl(index):
    out = cursor_page(
        index, "bace", rows=4, fq="role:user", fl=["doc_id", "role"]
    )
    rows = out["response"].collect()
    assert rows and all(r.role == "user" for r in rows)
    assert out["response"].columns == ["doc_id", "role"]


def test_cursor_contracts(index):
    with pytest.raises(ValueError):
        cursor_page(index, "bace", rows=0)
    with pytest.raises(ValueError):
        cursor_page(index, "bace", rows=5, cursor_mark="!!notb64!!")
    # a mark from a different sort shape is rejected loudly
    bad = encode_cursor([1.0, 2, 3])
    with pytest.raises(ValueError):
        cursor_page(index, "bace", rows=5, cursor_mark=bad)
    assert decode_cursor(encode_cursor([1.5, "x", 7])) == [1.5, "x", 7]
