"""Atomic metadata updates — the Solr partial-document update analog.

The reference uses Solr atomic updates (``{'set': ...}``,
src/parserindexer/brat_ann_indexer.py:186-194; ``-u`` update flag,
docs/mte-solr-index-construction.md:108-136) to patch fields on already-
indexed docs without reindexing content. Here: a coalesce-merge rewrite of
the docmap (filter metadata lives only there; postings are content-derived
and untouched), committed by atomic directory swap + manifest entry —
the parquet-local equivalent of an Iceberg MERGE INTO + snapshot commit.

Content (``text``) changes are intentionally NOT handled here: they require
re-indexing, which is the streaming segment-append path
(streaming/incremental.py) or a rebuild.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import IndexPaths, Manifest

UPDATABLE = ("role", "tool", "ts")


def update_docmap(
    spark: SparkSession,
    index_root: str,
    updates: DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> int:
    """Apply partial updates: for rows matching ``key_cols``, non-null
    update columns replace the stored values. Returns #rows updated.
    Restricted to filter-metadata columns (UPDATABLE)."""
    bad = set(updates.columns) - set(key_cols) - set(UPDATABLE)
    if bad:
        raise ValueError(
            f"non-updatable columns {sorted(bad)}; content changes need "
            "reindexing (streaming append or rebuild)"
        )
    paths = IndexPaths(index_root)
    docmap = spark.read.parquet(paths.docmap)
    up = updates
    for c in up.columns:
        if c not in key_cols:
            up = up.withColumnRenamed(c, f"_new_{c}")
    merged = docmap.join(F.broadcast(up), list(key_cols), "left")
    flags = [
        F.col(f"_new_{c}").isNotNull()
        for c in UPDATABLE
        if f"_new_{c}" in merged.columns
    ]
    any_update = flags[0]
    for f_ in flags[1:]:
        any_update = any_update | f_
    n_updated = merged.filter(any_update).count()
    for c in UPDATABLE:
        if f"_new_{c}" in merged.columns:
            merged = merged.withColumn(
                c, F.coalesce(F.col(f"_new_{c}"), F.col(c))
            ).drop(f"_new_{c}")

    tmp = paths.docmap + ".updating"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(tmp)
    # atomic commit: swap directories, then record the manifest entry
    old = paths.docmap + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(paths.docmap, old)
    os.replace(tmp, paths.docmap)
    shutil.rmtree(old, ignore_errors=True)
    man = Manifest(paths.manifest)
    man.add(
        f"docmap_update_{int(time.time() * 1000)}",
        rows_updated=int(n_updated),
        columns=[c for c in updates.columns if c not in key_cols],
    )
    return int(n_updated)
