"""/export handler twin — full sorted result-set export.

Solr ships an IMPLICIT ``/export`` handler (since 5.x, the version family
the reference's solrconfig targets — conf/solr/docs/conf/solrconfig.xml
declares luceneMatchVersion 6.1): it streams the ENTIRE sorted match set,
requires an explicit ``sort`` over docValues fields (the reference schema
marks its Trie fields docValues=true, managed-schema:434+), and forbids
score sorting. It exists because deep offset paging cannot walk a full
result set (see cursor_page's module note).

The Spark-native analog of "one sorted stream" is a GLOBALLY RANGE-SORTED
file set: ``orderBy`` range-partitions the match set so file ``part-N``
holds keys strictly before ``part-N+1`` and each file is internally
sorted — reading the files in name order IS the /export stream, and every
executor writes its span in parallel instead of funneling 100 TB through
one streaming socket. Row count comes from an ``Observation`` attached to
the write (no second job over the data).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .boolean import _apply_fq, _parse_sort, _scored_docs, flatten_query
from ..functions.queryparser import parse_query


def export_results(
    index,
    q: str,
    out: str,
    *,
    sort: str,
    fq=None,
    fl: list[str] | None = None,
    fmt: str = "parquet",
    q_op: str = "OR",
    field_indexes: dict | None = None,
) -> dict:
    """Write the FULL sorted match set of ``q`` to ``out`` and return
    ``{"path", "rows", "format"}``.

    Solr /export fidelity: ``sort`` is REQUIRED and may not reference
    ``score`` (the handler streams docValues, it never ranks); every
    docmap field is exportable; ``fl`` picks the exported columns
    (default: doc_id + conv_id + turn_idx + role + the sort fields).
    ``fmt`` is ``parquet`` or ``jsonl``.
    """
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"unsupported export format {fmt!r}")
    if any(part.split()[0] == "score" for part in sort.split(",")):
        raise ValueError("/export cannot sort by score (Solr: docValues only)")
    order, sort_fields = _parse_sort(index, sort)
    pq = flatten_query(parse_query(q, default_op=q_op))
    scored = _scored_docs(index, pq, field_indexes=field_indexes)
    if scored is None:
        raise ValueError(f"q {q!r} parses to an empty query")
    if fq:
        scored = _apply_fq(index, scored, fq, q_op, field_indexes)
    meta_cols = ["doc_id", "conv_id", "turn_idx", "role"]
    for f in sort_fields:
        if f not in meta_cols:
            meta_cols.append(f)
    rows = scored.select("doc_id").join(
        index.docmap.select(*meta_cols), "doc_id", "left"
    )
    if fl:
        avail = set(rows.columns)
        bad = [c for c in fl if c not in avail]
        if bad:
            raise ValueError(f"fl columns {bad} not in {sorted(avail)}")
        keep = list(dict.fromkeys(fl))
        rows = rows.select(*keep)
    from pyspark.sql import Observation

    obs = Observation("export")
    # orderBy = range partitioner: part-N's keys all precede part-N+1's
    # and each file is internally sorted, so name-ordered reads replay
    # the /export stream; the observation counts rows inside the write
    # job itself (no second pass)
    sorted_rows = rows.orderBy(*order).observe(
        obs, F.count(F.lit(1)).alias("rows")
    )
    writer = sorted_rows.write.mode("errorifexists")
    if fmt == "parquet":
        writer.parquet(out)
    else:
        writer.json(out)
    return {"path": out, "rows": int(obs.get["rows"]), "format": fmt}
