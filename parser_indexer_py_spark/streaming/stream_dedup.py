"""Streaming exact-dedup with bounded state — the live-ingest gate.

Batch exact dedup (`dedup_exact`) assumes the corpus is at rest; a live
transcript feed needs the duplicate gate ON the stream. This is Spark's
own stateful operator used the intended way:
``withWatermark(ts, delay).dropDuplicatesWithinWatermark([fingerprint])``
— first occurrence of a fingerprint passes, duplicates arriving within
``delay`` of it are dropped, and the fingerprint's state is EVICTED once
the watermark passes its event time. Bounded state is bought with an
explicit, documented trade: a duplicate arriving after eviction is
emitted again (the test pins this rather than hiding it — a downstream
batch `dedup_exact` over the sink remains the exactness backstop, which
is exactly how production pipelines layer it).

Why not plain ``dropDuplicates``: correct forever, but its state grows
with DISTINCT KEYS SEEN — unbounded on an infinite stream. The
watermarked variant keeps state at O(keys per delay window), the only
shape that survives at ingest scale.

Scale shape: fingerprint = md5(lower(text)) computed scan-side (JVM
codegen); the stateful operator shuffles on the fingerprint hash — the
same narrow-key layout as the batch dedup; sink is append-mode parquet
(each kept row emitted exactly once, no merge).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def dedup_stream(
    spark: SparkSession,
    source_glob: str,
    checkpoint_dir: str,
    schema,
    output_path: str,
    queryName: str = "stream_dedup",
    watermark: str = "10 minutes",
):
    """Start (availableNow) the watermark-bounded streaming dedup over a
    parquet-directory stream; kept rows append to ``output_path``.
    Output: source columns + ``fingerprint``."""
    stream = spark.readStream.schema(schema).parquet(source_glob)
    deduped = (
        stream.withColumn("fingerprint", F.md5(F.lower(F.col("text"))))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
