"""Solr ``/browse`` handler twin — the reference's OTHER user-facing
endpoint (conf/solr/docs/conf/solrconfig.xml:859-925): one request =
``defType=edismax`` + multi-field ``qf`` ranking (mm=100%, tie absent =
0.0), ``q.alt=*:*`` when no query is given, faceting over the full match
set, highlighting, per-result MoreLikeThis (mlt.count=3 at :885), and the
spellcheck component appended to every response (:930-944).

This facade COMPOSES the engine's existing parts — ``edismax_qf`` (with
its block-max DisMax pruned path), the docmap facet aggregations,
``spellcheck``, ``more_like_this``, and the excerpt attacher — into the
handler's response shape. Like ``select()``, every section is a lazy
DataFrame (or plain dict for spellcheck); nothing executes until the
caller consumes it, and the match set is evaluated ONCE and shared by
the facet sections.

Cost notes for scale: the response page is top-(start+rows) through the
pruned-capable ranking; facets are one groupBy per facet field over the
match set (inherently match-set-proportional, same regime as Solr);
``mlt_docs`` > 0 issues that many MoreLikeThis queries (Solr computes
per-result MLT from term vectors server-side; here each is a real query
— the parameter defaults to 0 and the reference's mlt.count=3 applies
per returned neighbor list, not per page)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .boolean import _parse_mm, _qf_score, _qf_union, edismax_qf

__all__ = ["browse"]


def browse(
    indexes: dict,
    query: str | None,
    qf: dict[str, float],
    *,
    rows: int = 10,
    start: int = 0,
    tie: float = 0.0,
    mm="100%",
    mode: str = "auto",
    facet_field: str | list[str] | None = None,
    facet_range: tuple | None = None,
    spell: bool = True,
    hl: bool = False,
    mlt_docs: int = 0,
    mlt_count: int = 3,
) -> dict:
    """One /browse request. Returns::

        {"response":     DataFrame (the ranked page, metadata attached),
         "facets":       {field: DataFrame(value, n)} over the MATCH SET,
         "range_facets": DataFrame(lo, n) or None,
         "spellcheck":   spellcheck() dict for the query terms or None,
         "mlt":          {doc_id: DataFrame} for the top mlt_docs results,
         "highlighting": DataFrame(doc_id, snippets) with the /browse
                         highlight defaults (hl=True + a query), or None}

    ``query=None`` (or empty/whitespace) is ``q.alt=*:*``: a constant
    score-1.0 page over the corpus with facets — the handler's landing
    state. ``indexes``/``qf``/``tie``/``mm`` are edismax_qf's; ``mode``
    rides its pruned path for the page."""
    from .search import Index  # noqa: F401  (type anchor)
    from .spell import spellcheck

    fields = sorted(qf)
    meta_index = indexes["text"] if "text" in qf else indexes[fields[0]]
    facet_fields = (
        [facet_field] if isinstance(facet_field, str) else list(facet_field or [])
    )
    for f in facet_fields:
        if f not in meta_index.docmap.columns:
            raise ValueError(f"unknown facet field {f!r}")

    match_all = query is None or not str(query).strip()
    hl_section = None
    if match_all:
        # q.alt=*:* — MatchAllDocsQuery at constant score
        match_set = meta_index.docmap.select(
            "doc_id", F.lit(1.0).alias("score")
        )
        page = (
            match_set.orderBy(F.asc("doc_id"))
            .limit(start + rows)
            .offset(start)
            .join(
                meta_index.docmap.select(
                    "doc_id", "conv_id", "turn_idx", "role"
                ),
                "doc_id",
                "left",
            )
            .orderBy(F.asc("doc_id"))
        )
        sp = None
    else:
        page = edismax_qf(
            indexes, query, qf, k=start + rows, tie=tie, mm=mm, mode=mode,
            with_meta=True,
        ).offset(start)
        if hl:
            # the handler's highlighting section (solrconfig.xml:916-928):
            # the excerpt column on the page rows (k-row join) PLUS the
            # real HighlightComponent section with the /browse defaults —
            # hl.simple.pre=<b>, f.content.hl.snippets=3 / fragsize=200,
            # hl.alternateField + maxAlternateFieldLength=750
            from ..functions.queryparser import parse_query
            from .boolean import _attach_excerpts, _hl_phrases, _hl_terms
            from .highlight import highlighting as _highlighting

            # hl.usePhraseHighlighter=true (Solr default the handler
            # inherits): exact quoted phrases tag span-wise
            _pq = parse_query(str(query))
            terms = _hl_terms(_pq, phrase_aware=True)
            hl_phr = _hl_phrases(_pq)
            if terms or hl_phr:
                page = _attach_excerpts(
                    meta_index, page,
                    terms or sorted({t for p in hl_phr for t in p}),
                )
                hl_section = _highlighting(
                    meta_index, page, terms, phrases=hl_phr or None,
                    fragsize=200, snippets=3,
                    pre="<b>", post="</b>", alternate=True,
                    max_alternate=750,
                )
        # the handler's spellcheck defaults (solrconfig.xml:930-944):
        # count=5, alternativeTermCount=2, maxResultsForSuggest=5,
        # collate + collateExtendedResults, maxCollations=3, tries=5,
        # extendedResults=false
        sp = (
            spellcheck(
                meta_index, str(query),
                alternative_term_count=2, max_results_for_suggest=5,
                max_collations=3, max_collation_tries=5,
                collate_extended=True,
            )
            if spell
            else None
        )
        match_set = None

    facets: dict[str, DataFrame] = {}
    range_facets = None
    if facet_fields or facet_range is not None:
        if match_set is None:
            # the facet sections need the FULL match set (facet.field
            # counts over every matching doc, not the page) — evaluate it
            # once through the same deterministic fold the page used
            from ..functions.queryparser import parse_query

            pq = parse_query(str(query))
            terms = sorted(set(pq.should_terms))
            mm_n = _parse_mm(mm, len(terms))
            scored = _qf_score(
                _qf_union(indexes, fields, terms, qf), tie
            )
            if mm_n > 0:
                scored = scored.filter(F.col("n_terms") >= mm_n)
            match_set = scored.select("doc_id", "score")
        for f in facet_fields:
            facets[f] = (
                match_set.select("doc_id")
                .join(meta_index.docmap.select("doc_id", f), "doc_id")
                .groupBy(f)
                .agg(F.count("*").alias("n"))
                .orderBy(F.desc("n"), F.asc(f))
            )
        if facet_range is not None:
            fld, lo, hi, gap = facet_range
            if fld not in meta_index.docmap.columns:
                raise ValueError(f"unknown facet.range field {fld!r}")
            bucket = (
                F.floor((F.col(fld) - F.lit(lo)) / F.lit(gap)) * F.lit(gap)
                + F.lit(lo)
            ).alias("lo")
            range_facets = (
                match_set.select("doc_id")
                .join(meta_index.docmap.select("doc_id", fld), "doc_id")
                .filter((F.col(fld) >= lo) & (F.col(fld) < hi))
                .groupBy(bucket)
                .agg(F.count("*").alias("n"))
                .orderBy("lo")
            )

    mlt: dict[int, DataFrame] = {}
    if mlt_docs > 0 and not match_all:
        from .mlt import more_like_this, more_like_this_qf

        top_ids = [
            int(r["doc_id"])
            for r in page.select("doc_id").limit(mlt_docs).collect()
        ]
        for d in top_ids:
            # the handler's mlt.qf lists the same fields as qf
            # (solrconfig.xml:880-885): multi-field requests run the
            # qf-weighted multi-field MLT, single-field stays as before
            if len(indexes) > 1:
                mlt[d] = more_like_this_qf(
                    indexes, d, qf, count=mlt_count,
                    meta_field="text" if "text" in indexes else None,
                )
            else:
                mlt[d] = more_like_this(meta_index, d, count=mlt_count)

    return {
        "response": page,
        "facets": facets or None,
        "range_facets": range_facets,
        "spellcheck": sp,
        "mlt": mlt,
        "highlighting": hl_section,
    }
