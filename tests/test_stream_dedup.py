"""Streaming watermark-bounded dedup (streaming/stream_dedup.py).

Pins the full semantics across three availableNow restarts of one
checkpoint: same-batch duplicate dropped, cross-RESTART duplicate
within the watermark dropped (state persisted), and — the documented
bounded-state trade — a duplicate arriving after state eviction is
emitted AGAIN.
"""

from __future__ import annotations

import datetime as dt

from parser_indexer_py_spark.datagen import TRANSCRIPT_SCHEMA


def _rows(*specs):
    out = []
    for (minute, text) in specs:
        out.append(
            (
                "conv-d",
                len(out),
                "user",
                text,
                None,
                dt.datetime(2026, 1, 1, 10, 0) + dt.timedelta(minutes=minute),
            )
        )
    return out


def _write(spark, path, rows):
    spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, src, ckpt, out):
    from parser_indexer_py_spark.streaming.stream_dedup import dedup_stream

    q = dedup_stream(spark, src, ckpt, TRANSCRIPT_SCHEMA, out)
    q.awaitTermination(120)
    try:
        return sorted(
            (r["ts"].minute + 60 * r["ts"].hour, r["text"])
            for r in spark.read.parquet(out).collect()
        )
    except Exception:  # noqa: BLE001 — nothing emitted yet
        return []


def test_stream_dedup_watermark_semantics(spark, tmp_path):
    src = str(tmp_path / "turns")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "kept")

    # run 1: "aaaa" at 10:00 kept, same-batch dup at 10:02 dropped
    _write(spark, src, _rows((0, "aaaa"), (1, "bb"), (2, "aaaa")))
    got1 = _run(spark, src, ckpt, out)
    assert got1 == [(600, "aaaa"), (601, "bb")]

    # run 2: dup at 10:05 — within the watermark of the 10:00 original,
    # dropped ACROSS the restart (state came from the checkpoint);
    # advancer at 10:30 pushes the watermark to 10:20 > 10:00 + 10min,
    # evicting the "aaaa" state
    _write(spark, src, _rows((5, "aaaa"), (30, "cc")))
    got2 = _run(spark, src, ckpt, out)
    assert got2 == [(600, "aaaa"), (601, "bb"), (630, "cc")]

    # run 3: "aaaa" again at 10:25 — AFTER eviction, so it is emitted
    # again: the documented bounded-state trade
    _write(spark, src, _rows((25, "aaaa")))
    got3 = _run(spark, src, ckpt, out)
    assert got3 == [
        (600, "aaaa"),
        (601, "bb"),
        (625, "aaaa"),
        (630, "cc"),
    ]
