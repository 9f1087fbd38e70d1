"""Watermark + windowed-agg semantics (streaming/windowed.py).

Three availableNow runs over a growing parquet dir, one checkpoint. The
watermark persists across restarts; a late row whose window end is at or
below the restored watermark is dropped (Spark's late-data rule — rows
are only dropped once their WINDOW is below the watermark, not merely
their timestamp); append-mode rows are final (each window emitted
exactly once across all runs, with the late row excluded).

The finalizing no-data micro-batch may run either at the tail of the
run that advanced the watermark or at the head of the next run, so the
assertions use the union of emissions and separately assert no window
was emitted twice.
"""

from __future__ import annotations

import datetime as dt
import uuid

from parser_indexer_py_spark.datagen import TRANSCRIPT_SCHEMA


def _rows(*specs):
    out = []
    for (minute, role, text) in specs:
        out.append(
            (
                "conv-w",
                len(out),
                role,
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


def _run(spark, src, ckpt, name, out):
    from parser_indexer_py_spark.streaming.windowed import windowed_turn_counts

    q = windowed_turn_counts(
        spark, src, ckpt, TRANSCRIPT_SCHEMA, queryName=name, output_path=out
    )
    q.awaitTermination(120)
    rows = []
    try:
        rows = spark.read.parquet(out).collect()
    except Exception:  # noqa: BLE001 — nothing emitted yet, dir empty
        pass
    out_rows = [
        (
            (r["win_start"].minute + 60 * r["win_start"].hour, r["role"]),
            (r["n_turns"], r["n_chars"]),
        )
        for r in rows
    ]
    return out_rows


def test_watermark_drops_late_and_finalizes_windows(spark, tmp_path):
    src = str(tmp_path / "turns")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    name = f"tw_{uuid.uuid4().hex[:8]}"

    # run 1: [10:00,10:05) gets 2 user turns (6 chars); advancer at 10:20
    # -> watermark 10:10 >= that window's end, so it is closeable
    _write(
        spark,
        src,
        _rows((0, "user", "aaaa"), (3, "user", "bb"), (20, "assistant", "c")),
    )
    _run(spark, src, ckpt, name, out)

    # run 2: LATE user row at 10:01 — its window end (10:05) <= restored
    # watermark (10:10) -> dropped; advancer at 11:00 -> watermark 10:50
    # closes [10:20,10:25)
    _write(spark, src, _rows((1, "user", "LATE"), (60, "user", "adv")))
    cum2 = _run(spark, src, ckpt, name, out)
    # the 11:00 window is still open after run 2
    assert (660, "user") not in dict(cum2)
    # the first window has closed by now, late row NOT retro-applied
    assert dict(cum2)[(600, "user")] == (2, 6)

    # run 3: advancer at 12:00 closes the 11:00 window
    _write(spark, src, _rows((120, "user", "adv2")))
    cum3 = _run(spark, src, ckpt, name, out)

    # append-mode finality: each window emitted exactly once overall
    keys = [k for k, _ in cum3]
    assert len(keys) == len(set(keys)), "window re-emitted"

    merged = dict(cum3)
    assert merged[(600, "user")] == (2, 6)
    assert merged[(620, "assistant")] == (1, 1)
    assert merged[(660, "user")] == (1, 3)
    # the 12:00 advancer's own window is still open -> never emitted
    assert (720, "user") not in merged
