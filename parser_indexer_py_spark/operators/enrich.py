"""Projection/enrichment operators: the reference's schema mappers (P1/P2)
and the adjacent-span merge (J7), Spark-native.

P1 ``map_basic`` (src/parserindexer/indexer.py:12-21,50-86): rename known
metadata keys, suffix-type unknown ones (Solr dynamic-field convention),
lift id/content, split contentType. P2 ``flatmap_journal`` (indexer.py:
88-164): one doc -> parent row + child annotation rows with derived ids and
``_path``/``_depth`` (Solr block-join layout). J7 adjacent merge
(corenlp_parser.py:82-101, json2brat.py:22-92): fuse annotation spans whose
character ranges touch, via lag + island cumsum — no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

# csvindexer.py:17-23 suffix rules: python type -> Solr dynamic suffix
_SUFFIX = {
    T.StringType(): "_t",
    T.LongType(): "_l",
    T.IntegerType(): "_l",
    T.DoubleType(): "_d",
    T.FloatType(): "_d",
    T.BooleanType(): "_b",
    T.TimestampType(): "_dt",
}


def enrich_turn_metadata(df: DataFrame) -> DataFrame:
    """P1 for transcript turns: Tika-style metadata enrichment mirroring
    map_basic — stable ``id`` from the unique key, ``content`` lift,
    suffix-typed metadata twins for role/tool (string metadata -> `_s_md`,
    the indexer.py:66-79 convention), and ``indexedAt`` (managed-schema:150
    default=NOW)."""
    return (
        df.withColumn(
            "id", F.concat_ws("_", F.col("conv_id"), F.col("turn_idx"))
        )
        .withColumn("content", F.col("text"))
        .withColumn("role_s_md", F.col("role"))
        .withColumn("tool_s_md", F.col("tool"))
        .withColumn("type", F.lit("turn"))
        .withColumn("p_id", F.col("conv_id"))
        .withColumn("indexedAt", F.current_timestamp())
    )


def suffix_type_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """P1/csvindexer suffixing: rename ``cols`` to carry their type suffix
    (+ 's' for multivalued arrays), leaving other columns untouched."""
    renames = {}
    for f in df.schema.fields:
        if f.name not in cols:
            continue
        if isinstance(f.dataType, T.ArrayType):
            suffix = _SUFFIX.get(f.dataType.elementType, "_t") + "s"
        else:
            suffix = _SUFFIX.get(f.dataType, "_t")
        renames[f.name] = f.name + suffix + "_md"
    return df.withColumnsRenamed(renames)


def explode_parent_child(
    df: DataFrame, ann_col: str, parent_id_col: str = "id"
) -> DataFrame:
    """P2: docs with an array<struct<label,begin,end,text>> column ->
    unioned parent rows (_depth=0, _path=/) and child rows (_depth=1,
    _path=/<label>, id={p_id}_{label}_{begin}_{end}) — the denormalized
    form of Solr's block-join tree (indexer.py:106-133)."""
    pid = F.col(parent_id_col)
    parents = df.select(
        pid.alias("id"),
        F.lit(None).cast("string").alias("p_id"),
        F.lit("doc").alias("type"),
        F.lit("/").alias("_path"),
        F.lit(0).alias("_depth"),
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("int").alias("span_start"),
        F.lit(None).cast("int").alias("span_end"),
    )
    a = df.select(pid.alias("p_id_v"), F.explode(ann_col).alias("a"))
    children = a.select(
        F.concat_ws(
            "_",
            F.col("p_id_v"),
            F.col("a.label"),
            F.col("a.begin").cast("string"),
            F.col("a.end").cast("string"),
        ).alias("id"),
        F.col("p_id_v").alias("p_id"),
        F.col("a.label").alias("type"),
        F.concat(F.lit("/"), F.col("a.label")).alias("_path"),
        F.lit(1).alias("_depth"),
        F.col("a.text").alias("name"),
        F.col("a.begin").alias("span_start"),
        F.col("a.end").alias("span_end"),
    )
    return parents.unionByName(children)


def merge_adjacent_spans(
    df: DataFrame,
    part_cols: list[str],
    begin_col: str = "begin",
    end_col: str = "end",
    text_col: str | None = "text",
    max_gap: int = 1,
) -> DataFrame:
    """J7/W1: merge spans whose begin is within ``max_gap`` of the previous
    span's end (adjacent NER tokens -> multi-word span,
    corenlp_parser.py:82-101). Window gap-flag cumulative sum ->
    island ids -> one aggregate; linear, no self-join.

    The gap compares begin against the RUNNING MAX of previous ends, not
    lag(end): with nested/overlapping spans (e.g. (0,100) then (5,10) then
    (20,30)) lag(end)=10 would wrongly start a new island inside the
    still-open (0,100) span (round-2 review finding)."""
    w = W.partitionBy(*part_cols).orderBy(begin_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    gap = F.col(begin_col) - prev_max_end
    flagged = df.withColumn(
        "_new_island", F.when(gap.isNull() | (gap > max_gap), 1).otherwise(0)
    ).withColumn(
        "_island",
        F.sum("_new_island").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    aggs = [
        F.min(begin_col).alias(begin_col),
        F.max(end_col).alias(end_col),
        F.count("*").alias("n_merged"),
    ]
    if text_col:
        aggs.append(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(begin_col, text_col))
                    ),
                    lambda s: s[text_col],
                ),
                " ",
            ).alias(text_col)
        )
    return flagged.groupBy(*part_cols, "_island").agg(*aggs).drop("_island")
