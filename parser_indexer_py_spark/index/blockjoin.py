"""ToParentBlockJoinQuery twin: rank PARENTS by their matching
children's scores.

The reference stores parent documents with nested annotation children
(Solr block-join layout — docs/mte-samplequeries.md's ``[child ...]``
transformer, parser-indexer's ``_childDocuments_`` writes), and Lucene's
``ToParentBlockJoinQuery`` is the query-side of that layout: a child
query runs, and each parent scores by an aggregate of its matching
children under a ``ScoreMode`` (None, Avg, Max, Total, Min). For this
engine's transcript corpus the natural block is the CONVERSATION: rank
conversations by the BM25 scores of their matching turns — the classic
"find the conversations that contain relevant turns" retrieval shape.

Spark-first evaluation: the child query's FULL match set comes from the
same clause evaluator every other path uses (``_scored_docs`` — no
top-k truncation: a parent's aggregate needs every matching child, which
is also why Lucene gives BlockJoin no WAND bounds), the parent key joins
in from the docmap, and the rollup is ONE partial-aggregating groupBy on
the parent key — max/min/sum/count combine map-side, so the shuffle
carries one row per (partition, parent), not per child. The final top-k
is a rows-bounded TakeOrderedAndProject.

Determinism note: ``max``/``min``/``none`` aggregate by order-independent
extremes of EXACT per-child scores — reproducible at any partitioning.
``total``/``avg`` are floating-point folds whose addition order Spark
does not fix; they match a serial oracle only to float tolerance (the
same caveat DESIGN.md records for any float sum — the engine's own
per-child scores stay exact)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parent_search", "SCORE_MODES"]

SCORE_MODES = ("max", "total", "avg", "min", "none")


def parent_search(
    index,
    q: str,
    *,
    k: int = 10,
    score_mode: str = "max",
    parent_field="conv_id",
    fq=None,
    default_op: str = "OR",
    min_children: int = 1,
) -> DataFrame:
    """Top-``k`` parents for child query ``q``. Returns
    ``(parent, score, n_matched)`` ordered score desc, parent asc.

    ``score_mode`` is Lucene's ScoreMode over the parent's matching
    children: ``max`` (default — Solr's ``{!parent}`` default is none,
    Lucene's BlockJoin examples use Max for best-child ranking),
    ``total`` (sum), ``avg``, ``min``, ``none`` (constant 1.0 — pure
    containment). ``parent_field`` is a docmap column name or any Column
    expression over the docmap (e.g. a bucketing expression when the
    corpus has no natural block key). ``min_children`` keeps only
    parents with at least that many matching children (the
    ``{!parent}``-with-``fq``-on-child-count idiom). ``fq`` restricts
    the CHILD match set, exactly like fq restricts ``q`` everywhere
    else."""
    from ..functions.queryparser import parse_query
    from .boolean import _apply_fq, _scored_docs

    if score_mode not in SCORE_MODES:
        raise ValueError(
            f"score_mode {score_mode!r} not in {SCORE_MODES}"
        )
    scored = _scored_docs(index, parse_query(q, default_op=default_op))
    if scored is None:
        raise ValueError(f"q {q!r} parses to an empty query")
    if fq:
        scored = _apply_fq(index, scored, fq, default_op)
    parent = (
        F.col(parent_field) if isinstance(parent_field, str) else parent_field
    ).alias("parent")
    agg = {
        "max": F.max("score"),
        "total": F.sum("score"),
        "avg": F.avg("score"),
        "min": F.min("score"),
        "none": F.max(F.lit(1.0)),
    }[score_mode]
    rolled = (
        scored.join(
            index.docmap.select("doc_id", parent), "doc_id"
        )
        .groupBy("parent")
        .agg(
            agg.cast("double").alias("score"),
            F.count("*").alias("n_matched"),
        )
    )
    if min_children > 1:
        rolled = rolled.filter(F.col("n_matched") >= int(min_children))
    return rolled.orderBy(F.desc("score"), F.asc("parent")).limit(int(k))
