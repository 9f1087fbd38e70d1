"""Round-6 gate for the scale-adaptive docmap write width (build.py):

1. the write width follows ceil(rows / DOCMAP_WRITE_ROWS) with the
   ~cores/4 floor and the input-partition cap — checked through the
   docmap FILE COUNT (files <= width * DOCMAP_PARTS, and far below the
   ungated P * DOCMAP_PARTS fan-out);
2. the coalesce is metadata-only for the build's CONTENT: docmap rows
   (doc_id, dl, every column) are identical to a build forced to full
   width — the docID assignment is a pure function of the
   (conv_id, turn_idx) order, so the writer layout must not leak into it.
"""

import shutil

import pytest

import parser_indexer_py_spark.index.build as B
from parser_indexer_py_spark.datagen import generate_transcripts
from parser_indexer_py_spark.index.build import DOCMAP_PARTS, build_index

COLS = ["doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "dl", "text"]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """One micro-batch corpus built twice: adaptive width vs forced-full
    width (DOCMAP_WRITE_ROWS monkeypatched so every input partition
    writes)."""
    root = tmp_path_factory.mktemp("docmap_width")
    src = generate_transcripts(spark, 60)
    adaptive, full = str(root / "adaptive"), str(root / "full")
    shutil.rmtree(adaptive, ignore_errors=True)
    build_index(spark, src, adaptive, n_chunks=1)
    old = B.DOCMAP_WRITE_ROWS
    B.DOCMAP_WRITE_ROWS = 1  # width -> P: the pre-round-6 fan-out
    try:
        shutil.rmtree(full, ignore_errors=True)
        build_index(spark, src, full, n_chunks=1)
    finally:
        B.DOCMAP_WRITE_ROWS = old
    return adaptive, full


def test_width_bounds_file_count(spark, built):
    adaptive, full = built
    P = spark.sparkContext.defaultParallelism * 2
    floor_w = max(2, spark.sparkContext.defaultParallelism // 4)
    n_rows = spark.read.parquet(f"{adaptive}/docmap").count()
    width = min(P, max(floor_w, -(-n_rows // B.DOCMAP_WRITE_ROWS)))
    n_files = len(spark.read.parquet(f"{adaptive}/docmap").inputFiles())
    assert n_files <= width * DOCMAP_PARTS
    n_full = len(spark.read.parquet(f"{full}/docmap").inputFiles())
    # the point of the policy: strictly fewer files than the ungated
    # every-partition fan-out on a small input
    assert n_files < n_full


def test_rows_identical_across_widths(spark, built):
    adaptive, full = built
    a = spark.read.parquet(f"{adaptive}/docmap").select(COLS)
    b = spark.read.parquet(f"{full}/docmap").select(COLS)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_globals_identical_across_widths(built):
    import json

    adaptive, full = built
    ga = json.load(open(f"{adaptive}/globals.json"))
    gb = json.load(open(f"{full}/globals.json"))
    assert ga == gb
