"""Sequence packing — concat-and-chunk offsets for fixed-budget training
sequences.

The standard large-scale packing strategy (concatenate documents in a
stable order, slice the stream into fixed-size sequences) reduces to ONE
exclusive prefix sum over the length column: a document's global offset
determines its first/last sequence and whether it crosses a boundary.
Greedy no-split bin packing was considered and rejected: its running
"reset when full" total is a sequential fold with no prefix-sum form, so
it cannot be computed without a serial pass — while concat-and-chunk is
what production LM pipelines actually run (no padding waste, documents
split at boundaries with the attention mask handling the seam).

Scale shape: a GLOBAL ordered prefix sum via a plain window
(``Window.orderBy(id)``) would collapse onto one partition. This module
reuses the index build's shuffle-free pattern (index/build.py stage 1 —
the W4 stable-docID assignment): range-partition by the order key, one
small job collects per-partition length sums, their exclusive prefix sum
broadcasts back, and a ``mapInPandas`` adds partition-local cumsums to
the broadcast base — total cost one range shuffle + one tiny collect,
fully parallel at any partition count, and provably equal to the serial
cumsum (partition ranges are disjoint and ordered)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pack_offsets"]


def pack_offsets(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
    *,
    n_partitions: int | None = None,
) -> DataFrame:
    """Packing metadata for every row: ``(id, len, offset, seq_first,
    seq_last, crosses)`` where ``offset`` is the exclusive prefix sum of
    ``len_col`` in ascending ``id_col`` order, ``seq_first/seq_last`` =
    the fixed-``budget`` sequence indices covering the row, and
    ``crosses`` marks boundary-spanning rows."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    P = (
        n_partitions
        or df.sparkSession.sparkContext.defaultParallelism
    )
    # the persist pins ONE range-partitioning: the counts job and the
    # offsets job must see identical pid assignments (range sampling is
    # not replay-stable). It stays pinned until the caller's plan is
    # done — same lifecycle as build_index's staged persist.
    staged = (
        df.select(F.col(id_col).alias("id"), F.col(len_col).alias("len"))
        .repartitionByRange(P, "id")
        .sortWithinPartitions("id")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    sums = {
        r["pid"]: int(r["s"])
        for r in staged.groupBy("pid")
        .agg(F.sum("len").alias("s"))
        .collect()
    }
    base, acc = {}, 0
    for pid in sorted(sums):
        base[pid] = acc
        acc += sums[pid]

    def add_offsets(batches, base=base):
        run: dict[int, int] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            pids = pdf["pid"].to_numpy()
            lens = pdf["len"].to_numpy(dtype=np.int64)
            out = np.empty(len(pdf), dtype=np.int64)
            for pid_val in np.unique(pids):
                m = pids == pid_val
                start = run.get(pid_val, base[int(pid_val)])
                c = np.concatenate(([0], np.cumsum(lens[m])[:-1]))
                out[m] = start + c
                run[pid_val] = start + int(lens[m].sum())
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "len": lens,
                    "offset": out,
                }
            )

    # the order key keeps its own type (numeric id, string key, ...)
    id_type = staged.schema["id"].dataType.simpleString()
    packed = staged.mapInPandas(
        add_offsets, f"id {id_type}, len long, offset long"
    )
    # integer DIV, not float division: offsets at the 10^12-turn
    # scale exceed double's 2^53 exact-integer range
    first = F.expr(f"offset DIV {int(budget)}")
    last = F.expr(f"(offset + len - 1) DIV {int(budget)}")
    return packed.select(
        "id",
        "len",
        "offset",
        first.alias("seq_first"),
        last.alias("seq_last"),
        (first != last).alias("crosses"),
    )
