"""Source/sink operators (SURVEY.md §2.1 S1-S13), Spark-native.

The reference streams everything through JSON-lines files and a Solr HTTP
client; here each source is a declarative scan so Catalyst gets pushdown and
pruning. HTTP side-services (Tika S4, ADS S5, Solr S8-S11) have no in-engine
analog by design — their *shapes* become projections/joins (documented per
function).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_list_file(spark: SparkSession, path: str) -> DataFrame:
    """S1+P4: read a path-list file, skipping blanks and '#' comments
    (src/parserindexer/ioutils.py:4-19)."""
    return (
        spark.read.text(path)
        .select(F.trim("value").alias("path"))
        .filter((F.length("path") > 0) & ~F.col("path").startswith("#"))
    )


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S2: JSON-lines source (src/parserindexer/ioutils.py:22-30).
    Always pass a schema in production — inference scans the data twice."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S3: JSON-lines sink (src/parserindexer/ioutils.py:33-48)."""
    df.write.mode(mode).json(path)


def read_csv_docs(
    spark: SparkSession, path: str, id_field: str | None = None, doc_type: str = "doc"
) -> DataFrame:
    """S6: CSV source with id autogen + type column
    (src/parserindexer/csvindexer.py:26-39: DictReader + uuid4 — here the
    id is a deterministic content hash instead of uuid4, so re-runs are
    idempotent)."""
    df = spark.read.csv(path, header=True)
    if id_field and id_field in df.columns:
        df = df.withColumn("id", F.col(id_field).cast("string"))
    else:
        df = df.withColumn(
            "id", F.md5(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
        )
    return df.withColumn("type", F.lit(doc_type))


BRAT_COLS = "ann_id string, kind string, label string, span_start int, span_end int, text string"


def read_brat_ann(spark: SparkSession, path: str) -> DataFrame:
    """S7: brat standoff .ann source — typed records from T/E/R/A lines
    (src/parserindexer/brat_ann_indexer.py:49-102). Fixture-grade: text-bound
    annotations (T) are fully parsed; other kinds keep raw payload in
    ``text``."""
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parts = F.split(F.col("value"), "\t")
    ann_id = parts.getItem(0)
    kind = F.substring(ann_id, 1, 1)
    mid = parts.getItem(1)
    is_t = kind == F.lit("T")
    mid_parts = F.split(mid, " ")
    return raw.select(
        ann_id.alias("ann_id"),
        kind.alias("kind"),
        F.when(is_t, mid_parts.getItem(0)).otherwise(mid).alias("label"),
        F.when(is_t, mid_parts.getItem(1).cast("int")).alias("span_start"),
        F.when(is_t, mid_parts.getItem(2).cast("int")).alias("span_end"),
        F.when(is_t, parts.getItem(2)).otherwise(parts.getItem(1)).alias("text"),
    )


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S12: CSV sink with header (the reference's csv output shape)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_brat(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S13: brat standoff .ann sink — inverse of :func:`read_brat_ann`.
    T records serialize as ``Tn<TAB>label start end<TAB>text``; other
    kinds as ``id<TAB>payload`` (the payload round-trips through the
    ``label`` column the reader parked it in)."""
    is_t = F.col("kind") == "T"
    line = F.when(
        is_t,
        F.concat_ws(
            "\t",
            F.col("ann_id"),
            F.concat_ws(
                " ",
                F.col("label"),
                F.col("span_start").cast("string"),
                F.col("span_end").cast("string"),
            ),
            F.col("text"),
        ),
    ).otherwise(F.concat_ws("\t", F.col("ann_id"), F.col("label")))
    df.select(line.alias("value")).write.mode(mode).text(path)


def point_lookup(df: DataFrame, key_col: str, key) -> DataFrame:
    """S9: Solr point-lookup q=id:"..." rows=1 (src/parserindexer/solr.py:
    86-95) — a filter+limit the optimizer turns into a pruned scan."""
    return df.filter(F.col(key_col) == key).limit(1)


def paged_scan(df: DataFrame, order_cols: list[str], start: int, rows: int) -> DataFrame:
    """S10: deterministic pagination (src/parserindexer/solr.py:106-127's
    start/rows iterator). offset+limit over a total order."""
    return df.orderBy(*order_cols).offset(start).limit(rows)
