"""Custom stateful streaming operator: per-conversation running state.

The reference has no streaming (SURVEY.md §2.10); this is the
beyond-reference operator a live transcript pipeline needs — a per-key
state machine over the turn stream (running turn count, token total, last
role/timestamp), implemented with ``applyInPandasWithState`` (Arrow-batched
per-group state, no per-row Python).

Used for: conversation progress tracking, incremental per-conversation
quality rollups, and as the pattern template for any keyed stateful
enrichment over the stream. Checkpointable + watermark-compatible like any
Structured Streaming stateful operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.analyzer import analyze_series

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("last_role", T.StringType(), True),
        T.StructField("last_turn_idx", T.IntegerType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("last_role", T.StringType(), True),
        T.StructField("last_turn_idx", T.IntegerType(), True),
    ]
)


def _update(key, pdfs, state: GroupState):
    (conv_id,) = key
    n_turns, n_tokens, last_role, last_idx = (
        state.get if state.exists else (0, 0, None, -1)
    )
    for pdf in pdfs:
        if not len(pdf):
            continue
        n_turns += len(pdf)
        n_tokens += int(analyze_series(pdf["text"]).str.len().sum())
        # null turn_idx rows count toward totals but cannot be "last"
        # (pandas widens the column to float with NaN; int(NaN) would kill
        # the streaming query). idxmax also avoids a full sort.
        valid = pdf.dropna(subset=["turn_idx"])
        if len(valid):
            top = valid.loc[valid["turn_idx"].idxmax()]
            if int(top["turn_idx"]) > last_idx:
                last_idx = int(top["turn_idx"])
                last_role = top["role"]
    state.update((n_turns, n_tokens, last_role, last_idx))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "n_tokens": [n_tokens],
            "last_role": [last_role],
            "last_turn_idx": [last_idx],
        }
    )


def conversation_state_stream(
    spark: SparkSession,
    source_glob: str,
    checkpoint_dir: str,
    schema,
    queryName: str = "conv_state",
    max_files_per_trigger: int = 1,
):
    """Start the stateful query over a parquet-directory stream; emits one
    updated state row per conversation per micro-batch (output mode
    'update', memory sink for tests — swap the sink for production)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_glob)
    )
    states = stream.groupBy("conv_id").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        states.writeStream.outputMode("update")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
