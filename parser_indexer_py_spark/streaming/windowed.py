"""Watermarked windowed aggregation over the live turn stream.

The third leg of the streaming surface (incremental.py = index appends,
stateful.py = keyed state machines): event-time tumbling-window rollups
with a late-data watermark — Structured Streaming's built-in windowed
aggregation used the way the engine's brief prescribes, not a custom
operator. Per (window, role): turn count and character volume — the
live ingest-rate dashboard a transcript pipeline watches.

Semantics (the part worth a test, since they're subtle):

- ``withWatermark(ts, delay)`` tracks ``max(event time seen) - delay``
  ACROSS micro-batches (persisted in the checkpoint, so a restarted
  ``availableNow`` run continues the same watermark);
- output mode ``append`` emits a window only once the watermark passes
  its end — each emitted row is FINAL, which is what makes the sink
  idempotent (a dashboard upsert or parquet append needs no merge);
- a row older than the watermark at batch start is DROPPED, never
  retro-applied — bounded state is bought with explicit, observable
  late-data loss.

Scale shape: the aggregation state is one row per (window, role) per
partial — map-side combined, shuffled on the group key; state store
size is bounded by (active windows x roles), independent of stream
length, BECAUSE of the watermark eviction. Without the watermark this
exact query would be unbounded-state and Spark rejects it in append
mode — the API forces the right design.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def windowed_turn_counts(
    spark: SparkSession,
    source_glob: str,
    checkpoint_dir: str,
    schema,
    queryName: str = "turn_windows",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    output_path: str | None = None,
):
    """Start (availableNow) the watermarked tumbling-window rollup over a
    parquet-directory stream. Sink: parquet at ``output_path`` when given
    (append-mode rows are final, so a file sink needs no merge — and
    unlike the memory sink it supports checkpoint RECOVERY, which the
    restart test exercises); memory table otherwise (single-run smoke
    only). Output: (win_start, win_end, role, n_turns, n_chars)."""
    stream = spark.readStream.schema(schema).parquet(source_glob)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "role",
            "n_turns",
            "n_chars",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if output_path is not None:
        return writer.format("parquet").option("path", output_path).start()
    return writer.format("memory").start()
