"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with Arrow-batched decode / feature-extract / resize /
frame-sample operators.

The reference's analog is Tika parsing of opaque files into
(content, metadata) (src/parserindexer/tika_parser.py:26-46) — a byte-blob →
structured-columns projection. Here the Spark-side plumbing (schemas,
mapInPandas batch shape, partitioning by size) is real and tested; the
actual codec work is STUBBED (this container ships no PIL/ffmpeg): by
default a clearly-marked ``NotImplementedError``, or a deterministic fake
(``fake_decoder``) so pipelines and tests can run end-to-end. Swapping in a
real decoder is a one-argument change.

Scale notes baked into the design:
- media rows are *heavy*: ``repartition_for_media`` targets a fixed number
  of BYTES per partition (not rows) so one task never holds too many blobs;
- decode is ``mapInPandas`` (streaming batches, no per-group collect);
- outputs are fixed-width feature vectors / thumbnails, so downstream joins
  and ANN run on narrow columns, never on the blobs.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("data", T.BinaryType(), True),  # the opaque payload
    ]
)

FEATURE_DIM = 32

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes int, feature array<float>, "
    "thumb binary, n_frames int"
)


def stub_decoder(kind: str, data: bytes) -> dict:
    """The honest stub: real decoding needs PIL/libav, absent here."""
    raise NotImplementedError(
        "media decode requires an image/audio codec library (PIL/ffmpeg), "
        "not available in this environment; pass decoder=fake_decoder for "
        "a deterministic stand-in"
    )


def fake_decoder(kind: str, data: bytes) -> dict:
    """Deterministic stand-in decoder: derives a feature vector / thumbnail
    / frame count purely from the bytes, so the pipeline is testable."""
    arr = np.frombuffer(data or b"\0", dtype=np.uint8)
    # fixed-width "embedding": bucketed byte histogram, L2-normalized
    hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(
        np.float32
    )
    norm = float(np.sqrt((hist.astype(np.float64) ** 2).sum())) or 1.0
    return {
        "feature": (hist / norm).astype(np.float32),
        "thumb": bytes(arr[:16].tobytes()),
        "n_frames": 1 if kind == "image" else 1 + int(arr.sum()) % 32,
    }


def decode_media(
    df: DataFrame, decoder: Callable[[str, bytes], dict] = stub_decoder
) -> DataFrame:
    """blob -> (feature, thumb, n_frames) via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats, thumbs, frames, nbytes = [], [], [], []
            for kind, data in zip(pdf["kind"], pdf["data"]):
                data = bytes(data) if data is not None else b""
                out = decoder(kind, data)
                feats.append(out["feature"])
                thumbs.append(out["thumb"])
                frames.append(out["n_frames"])
                nbytes.append(len(data))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": np.array(nbytes, dtype=np.int32),
                    "feature": feats,
                    "thumb": thumbs,
                    "n_frames": np.array(frames, dtype=np.int32),
                }
            )

    cols = ["media_id", "kind", "data"]
    return df.select(*cols).mapInPandas(run, DECODED_SCHEMA)


def repartition_for_media(
    df: DataFrame,
    size_col: str | None = None,
    target_bytes: int = 256 << 20,
    blob_col: str = "data",
) -> DataFrame:
    """Partition heavy blob rows by cumulative byte size, not row count —
    one driver-side agg to size the partition count, then a hash spread.
    By default sizes from ``length(data)`` on the raw media table (the
    round-1 default named a column only the DECODED output carries);
    pass ``size_col`` when a precomputed byte count exists."""
    size_expr = F.col(size_col) if size_col else F.length(F.col(blob_col))
    total = df.agg(F.sum(size_expr).alias("s")).head()["s"] or 0
    parts = max(1, int(total // target_bytes) + 1)
    return df.repartition(parts)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: expand each media row to its sampled
    frame indexes (decode of the frames themselves is the stubbed part)."""
    return df.withColumn(
        "frame_idx",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ),
    )


def generate_fake_media(spark, n: int) -> DataFrame:
    """Deterministic opaque-blob table for tests (no external data)."""
    rng = np.random.default_rng(7)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        data = rng.integers(0, 256, size=64 + (i * 37) % 512, dtype=np.uint8)
        rows.append(
            (
                i,
                kind,
                f"{kind}/x-fake",
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                None if kind == "image" else 1000 + i,
                bytes(data.tobytes()),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
