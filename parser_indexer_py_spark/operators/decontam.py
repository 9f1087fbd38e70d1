"""Benchmark decontamination — n-gram overlap removal for training data.

The standard pre-training hygiene step (beyond the reference — part of
this engine's training-pipeline surface, like operators/sampling.py and
packing.py): a training document is CONTAMINATED when it shares at least
``min_hits`` word n-grams with any document of a benchmark/eval set, and
must be dropped before training so the eval stays held out. The n-gram
rule (n around 8-13 in published pipelines; the default here is 8) is
the same shingle construction the dedup family uses, applied across two
tables instead of within one.

Scale shape (the 100-TB story):

- shingling is a ZERO-SHUFFLE array slide over one ``split()`` per side
  (transform(sequence) — same construction as the dedup shingles);
- the benchmark side is eval-set-sized (thousands of docs, not
  billions), so its distinct gram set is explicitly ``broadcast()`` —
  the contamination probe is a map-side semi-join against the corpus
  gram stream, no corpus-wide shuffle at any point;
- ``min_hits=1`` keeps even the aggregation map-side (semi-join +
  distinct doc_id); ``min_hits>1`` adds one partial-aggregating count
  over (doc_id) — rows ∝ contaminated-candidate grams, not corpus
  grams;
- grams stay RAW STRINGS here for oracle-exact driver queries; at
  100 TB you would hash each gram to 64 bits first (``F.xxhash64``)
  to cut the probe's width — the collision risk is ~n_grams^2 / 2^64,
  acceptable for a drop-filter (false-contamination ~0, never
  false-clean... a collision only ever drops an extra doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["doc_ngrams", "ngram_contamination", "decontaminate"]


def doc_ngrams(
    df: DataFrame, n: int, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id_col, g). Lowercased,
    single-space tokenization (the engine analyzer's convention); docs
    shorter than n tokens contribute no grams (they cannot contaminate
    under an n-gram rule)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda w: F.length(w) > 0
    )
    # explicit short-doc guard: sequence(1, 0) would run DESCENDING in
    # Spark, not empty
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(id_col, F.explode(grams).alias("g"))
        .distinct()
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag contaminated training docs: (id_col, n_hits) for every doc of
    ``docs`` sharing >= ``min_hits`` DISTINCT n-grams with the benchmark
    table. ``n_hits`` counts the doc's distinct grams that appear
    anywhere in the benchmark (the usual reporting number)."""
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")
    bench_grams = (
        doc_ngrams(benchmark, n, text_col=text_col, id_col=id_col)
        .select("g")
        .distinct()
    )
    # ORDER MATTERS at scale: the broadcast semi-join filters FIRST
    # (map-side, un-deduped gram stream — no corpus-wide shuffle), and
    # only the surviving contaminated-candidate grams pay the distinct
    # aggregation. doc_ngrams' own .distinct() would shuffle every gram
    # of the corpus before the probe, which is exactly the cost this
    # operator exists to avoid.
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda w: F.length(w) > 0
    )
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    raw = docs.select(id_col, F.explode(grams).alias("g"))
    hits = raw.join(F.broadcast(bench_grams), "g", "left_semi")
    return (
        hits.groupBy(id_col)
        .agg(F.countDistinct("g").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The drop-filter: ``docs`` minus the contaminated set (broadcast
    anti-join against the flagged ids — contaminated sets are small
    relative to the corpus, like tombstones)."""
    flagged = ngram_contamination(
        docs, benchmark, n=n, min_hits=min_hits,
        text_col=text_col, id_col=id_col,
    ).select(id_col)
    return docs.join(F.broadcast(flagged), id_col, "left_anti")
