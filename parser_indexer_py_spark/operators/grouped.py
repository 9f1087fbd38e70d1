"""Batched grouped-map: the scalable replacement for per-group applyInPandas.

``DataFrame.groupBy(...).applyInPandas(fn)`` invokes the Python UDF once per
group, paying fixed Arrow/serialization costs per group. With millions of
tiny groups (e.g. one per (term, salt) in a posting build) those fixed costs
dominate by orders of magnitude — measured in this sandbox: a 12k-doc index
build dropped from ~230s to seconds after switching to this operator.

``grouped_map_batched`` instead:
  1. repartitions by the group columns (same co-location guarantee a
     groupBy gives: every row of a group lands in exactly one partition),
  2. sorts within partitions so groups are contiguous,
  3. streams Arrow batches through ``mapInPandas``, carrying the (possibly
     incomplete) trailing group of each batch into the next, so ``fn``
     always sees complete groups — MANY of them per call — and can
     vectorize across groups.

``fn(pdf)`` receives a pandas DataFrame holding one or more complete groups
(sorted by group cols then sort cols) and returns a DataFrame of results.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _carry_split(pdf: pd.DataFrame, group_cols: list[str]) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Split off the trailing rows belonging to the last (possibly
    incomplete) group. Requires pdf sorted by group_cols. Null-safe: a
    null group key equals itself here (plain == is all-False against
    NaN/None, which would emit a null-keyed group as 'complete' and split
    it across fn calls — round-2 review finding)."""
    last = pdf.iloc[-1]
    mask = np.ones(len(pdf), dtype=bool)
    for c in group_cols:
        col = pdf[c]
        if pd.isna(last[c]):
            mask &= col.isna().to_numpy()
        else:
            mask &= (col == last[c]).to_numpy()
    # sorted => rows of the last group are the contiguous True tail
    cut = int(len(pdf) - mask[::-1].argmin()) if not mask.all() else 0
    return pdf.iloc[:cut], pdf.iloc[cut:]


def grouped_map_batched(
    df: DataFrame,
    group_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
    *,
    sort_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    rep = df.repartition(parts, *group_cols).sortWithinPartitions(
        *(group_cols + (sort_cols or []))
    )

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            head, carry = _carry_split(pdf, group_cols)
            if len(head):
                yield fn(head)
        if carry is not None and len(carry):
            yield fn(carry)

    return rep.mapInPandas(runner, schema)
