"""Table I/O abstraction: Iceberg when a runtime catalog is configured,
partitioned Parquet + JSON snapshot manifest otherwise.

The north_rule targets Iceberg tables; this sandbox has no Iceberg runtime
jar (verified — SURVEY.md environment facts), so the engine programs against
this minimal interface and resolves the backend at session time:

- **Iceberg** (``spark-submit --packages org.apache.iceberg:iceberg-spark-
  runtime-<ver> --conf spark.sql.catalog.<name>=org.apache.iceberg.spark.
  SparkCatalog ...``): ``writeTo(table).append()`` / ``spark.read.table``;
  snapshot ids come from the table's metadata — commits are atomic (the
  analog of the reference's Solr commit, src/parserindexer/solr.py:97-104).
- **Parquet fallback**: directory per table, append via parquet writer,
  snapshot manifest (JSON) recording monotonically increasing snapshot ids
  with row counts — enough for the engine's resume/lineage logic to behave
  identically in both backends.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "local") -> bool:
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    except Exception:  # noqa: BLE001
        impl = None
    return impl is not None and "iceberg" in impl.lower()


class TableCatalog:
    def __init__(self, spark: SparkSession, base_path: str, catalog: str = "local"):
        self.spark = spark
        self.base = base_path
        self.catalog = catalog
        self.use_iceberg = iceberg_available(spark, catalog)
        if not self.use_iceberg:
            os.makedirs(base_path, exist_ok=True)

    # -- paths / identifiers -------------------------------------------------
    def _ident(self, table: str) -> str:
        return f"{self.catalog}.db.{table}"

    def _path(self, table: str) -> str:
        return os.path.join(self.base, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.base, f"{table}.snapshots.json")

    # -- operations ----------------------------------------------------------
    def append(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> int:
        """Append rows; returns the new snapshot id."""
        if self.use_iceberg:
            w = df.writeTo(self._ident(table))
            w.append()
            return self.snapshot_id(table)
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._path(table))
        snaps = self._read_manifest(table)
        sid = (snaps[-1]["id"] + 1) if snaps else 1
        snaps.append({"id": sid, "ts": time.time()})
        self._write_manifest(table, snaps)
        return sid

    def overwrite(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> int:
        if self.use_iceberg:
            df.writeTo(self._ident(table)).createOrReplace()
            return self.snapshot_id(table)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._path(table))
        self._write_manifest(table, [{"id": 1, "ts": time.time()}])
        return 1

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self._ident(table))
        return self.spark.read.parquet(self._path(table))

    def snapshot_id(self, table: str) -> int:
        if self.use_iceberg:
            row = self.spark.sql(
                f"SELECT snapshot_id FROM {self._ident(table)}.snapshots "
                "ORDER BY committed_at DESC LIMIT 1"
            ).head()
            return int(row["snapshot_id"]) if row else 0
        snaps = self._read_manifest(table)
        return snaps[-1]["id"] if snaps else 0

    def delete_all(self, table: str) -> None:
        """S11 analog: Solr delete-by-query *:* (docs/mte-samplequeries.md:
        103-106) == truncate."""
        if self.use_iceberg:
            self.spark.sql(f"DELETE FROM {self._ident(table)}")
            return
        import shutil

        shutil.rmtree(self._path(table), ignore_errors=True)
        self._write_manifest(table, [])

    # -- manifest ------------------------------------------------------------
    def _read_manifest(self, table: str) -> list[dict]:
        p = self._manifest_path(table)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return []

    def _write_manifest(self, table: str, snaps: list[dict]) -> None:
        p = self._manifest_path(table)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snaps, f)
        os.replace(tmp, p)
