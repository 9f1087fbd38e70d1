"""Solr HighlightComponent twin — REAL query-term tag highlighting.

The reference wires ``solr.HighlightComponent`` into every SearchHandler
(conf/solr/docs/conf/solrconfig.xml:1075) and configures it extensively at
:1427-1530: a default GapFragmenter with ``hl.fragsize=100``, an
HtmlFormatter with ``hl.simple.pre=<em>`` / ``hl.simple.post=</em>``, and
a WeightedFragListBuilder picking the best-scoring fragments. The /browse
handler turns it on (:916-928) with ``hl.simple.pre=<b>``,
``f.content.hl.snippets=3``, ``f.content.hl.fragsize=200``, and the
``hl.alternateField`` / ``hl.maxAlternateFieldLength=750`` fallback for
results whose highlighted field has no query-term match.

This module is that component re-expressed as ONE Catalyst plan (no UDF,
whole-stage-codegen'd string ops):

- **Fragmentation** (GapFragmenter analog, documented determinism): the
  text is split on single spaces; each token's start offset is the
  exclusive prefix sum of ``len(token)+1``; a token belongs to fragment
  ``floor(start_offset / fragsize)``. ``fragsize=0`` = the whole field as
  one fragment (Solr's ``f.title.hl.fragsize=0`` semantics). Lucene's
  GapFragmenter opens a new fragment when the accumulated length crosses
  ``fragsize`` — offset-bucketing is the same boundary rule expressed
  shuffle-free, and never splits mid-token.
- **Match rule**: a token matches when its lowercase form equals a query
  term. (Lucene highlights analyzed tokens via stored offsets; on this
  engine's corpora the analyzer is the identity on single-space lowercase
  text, so whole-token equality IS the analyzed match — documented
  simplification, same convention as the component twins' oracles.)
- **Fragment scoring** (WeightedFragListBuilder analog): fragments are
  ranked by (distinct matched terms DESC, total matches DESC, fragment
  position ASC) and the top ``snippets`` fragments with >= 1 match are
  returned, matched tokens wrapped in ``pre``/``post``.
- **alternateField**: page rows with NO matching fragment fall back to
  the raw untagged field value truncated to ``max_alternate`` chars
  (``hl.alternateField`` + ``hl.maxAlternateFieldLength``).

Scale note: highlighting is a PAGE operation — ``highlighting()`` joins
the k result rows back to their stored text and fragments only those, so
cost is O(k * doc_len) regardless of corpus size (same regime as Solr,
which highlights only the returned page).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["highlight_fragments", "highlighting", "highlight_text"]


def _sloppy_span_positions(
    low: list[str], words: list[str], slop: int
) -> set[int]:
    """Token indexes covered by ordered-proximity matches of ``words``
    in ``low`` — the SPAN version of search.sloppy_phrase_freq's greedy
    earliest-completion walk (identical window criterion:
    q_last - p - (m-1) <= slop), shared verbatim by the engine's Arrow
    UDF and the pure-Python twin so the gate is exact equality."""
    pls = []
    for w in words:
        pl = [i for i, t in enumerate(low) if t == w]
        if not pl:
            return set()
        pls.append(pl)
    m = len(words)
    out: set[int] = set()
    import bisect

    for p in pls[0]:
        q = p
        hit = [p]
        ok = True
        for pl in pls[1:]:
            i = bisect.bisect_right(pl, q)
            if i == len(pl):
                ok = False
                break
            q = pl[i]
            hit.append(q)
        if ok and (q - p - (m - 1)) <= slop:
            out.update(hit)
    return out


def highlight_fragments(
    df: DataFrame,
    terms: list[str],
    *,
    phrases: list[tuple[str, ...]] | None = None,
    sloppy_phrases: list[tuple[tuple[str, ...], int]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    fragsize: int = 100,
    snippets: int = 1,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """Best-fragment highlighting over ``df[text_col]`` → one row per
    (id, snippet_rank) with the tagged snippet. Rows whose text contains
    no query term produce NO output rows (Solr returns an empty snippet
    list for them; see :func:`highlighting` for the alternateField
    fallback). Pure Catalyst — split/posexplode/window/groupBy, no UDF.

    ``phrases`` (round-5f, Solr ``hl.usePhraseHighlighter=true`` — the
    default the reference inherits): each entry is a token tuple that is
    highlighted ONLY where the exact adjacent sequence occurs — a doc
    mentioning ``window`` alone gets no tag from the phrase query
    ``"window merge"``. Span detection is a higher-order-function pass
    over the lowercased token array (``filter(sequence(...))`` with a
    ``forall`` adjacency check — still no UDF, still O(page)); matched
    spans' token indexes union with the bare-term rule.

    ``sloppy_phrases`` (round-5h): ``[(tokens, slop), ...]`` — ordered-
    proximity phrases highlight ONLY their actual window occurrences
    (every token index of a matching window), using the SAME greedy
    earliest-completion matcher the scorer uses
    (:func:`_sloppy_span_positions`, the span twin of
    search.sloppy_phrase_freq). Evaluated by one Arrow-batched UDF over
    the page rows — highlighting is a page operation, so the Python
    matcher runs on k documents, never the corpus."""
    if not terms and not phrases and not sloppy_phrases:
        raise ValueError("highlight_fragments needs at least one term")
    if fragsize < 0 or snippets < 1:
        raise ValueError("fragsize must be >= 0 and snippets >= 1")
    lterms = sorted({t.lower() for t in terms})

    low = F.transform(
        F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0),
        F.lower,
    )
    hl_pos = F.array().cast("array<int>")
    for p in phrases or []:
        words = [w.lower() for w in p]
        n = len(words)
        if n == 0:
            continue
        lit = F.array(*[F.lit(w) for w in words])
        starts = F.filter(
            F.sequence(F.lit(0), F.greatest(F.size(low) - n, F.lit(-1))),
            lambda s: F.forall(
                F.sequence(F.lit(0), F.lit(n - 1)),
                lambda j: F.element_at(low, (s + j + 1).cast("int"))
                == F.element_at(lit, (j + 1).cast("int")),
            ),
        )
        spans = F.flatten(
            F.transform(starts, lambda s: F.sequence(s, s + n - 1))
        ).cast("array<int>")
        hl_pos = F.array_union(hl_pos, spans)
    if sloppy_phrases:
        sp = [(list(w), int(sl)) for w, sl in sloppy_phrases]

        @F.pandas_udf("array<int>")
        def _sloppy_pos(lows: pd.Series) -> pd.Series:
            def one(lw):
                out: set[int] = set()
                for words, sl in sp:
                    out |= _sloppy_span_positions(list(lw), words, sl)
                return sorted(out)

            return lows.map(one)

        hl_pos = F.array_union(hl_pos, _sloppy_pos(low))

    toks = (
        df.select(
            id_col,
            hl_pos.alias("_hlpos"),
            F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
        )
        .filter(F.length("w") > 0)
    )
    win = Window.partitionBy(id_col).orderBy("pos")
    prev = win.rowsBetween(Window.unboundedPreceding, -1)
    start = F.coalesce(F.sum(F.length("w") + F.lit(1)).over(prev), F.lit(0))
    frag = (
        F.floor(start / F.lit(fragsize)) if fragsize > 0 else F.lit(0)
    ).cast("long")
    # token index over the NONEMPTY sequence — the coordinate space the
    # phrase spans were computed in (`low` filters empties first)
    tix = (F.row_number().over(win) - 1).cast("int")
    toks = toks.select(
        id_col,
        "pos",
        "w",
        frag.alias("frag"),
        (
            (F.lower(F.col("w")).isin(lterms) if lterms else F.lit(False))
            | F.array_contains(F.col("_hlpos"), tix)
        ).alias("m"),
    )
    frags = toks.groupBy(id_col, "frag").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w", "m"))),
                lambda s: F.when(
                    s["m"], F.concat(F.lit(pre), s["w"], F.lit(post))
                ).otherwise(s["w"]),
            ),
            " ",
        ).alias("snippet"),
        F.size(
            F.array_distinct(
                F.collect_list(F.when(F.col("m"), F.lower(F.col("w"))))
            )
        ).alias("n_terms"),
        F.sum(F.col("m").cast("long")).alias("n_matches"),
    )
    rank = F.row_number().over(
        Window.partitionBy(id_col).orderBy(
            F.desc("n_terms"), F.desc("n_matches"), F.asc("frag")
        )
    )
    return (
        frags.filter(F.col("n_terms") > 0)
        .withColumn("snippet_rank", rank)
        .filter(F.col("snippet_rank") <= snippets)
        .select(id_col, "snippet_rank", "snippet")
    )


def highlighting(
    index,
    page: DataFrame,
    terms: list[str],
    *,
    phrases: list[tuple[str, ...]] | None = None,
    sloppy_phrases: list[tuple[tuple[str, ...], int]] | None = None,
    fragsize: int = 100,
    snippets: int = 1,
    pre: str = "<em>",
    post: str = "</em>",
    alternate: bool = False,
    max_alternate: int = 750,
) -> DataFrame:
    """The response's ``highlighting`` section for a result page: join the
    page's doc_ids back to their stored text (k-row join against the
    docmap — text never flows through scoring) and return one row per
    page doc: ``(doc_id, snippets array<string>)``. With
    ``alternate=True``, docs with no matching fragment get a single
    untagged snippet = the raw text truncated to ``max_alternate`` chars
    (hl.alternateField on the highlighted field itself +
    hl.maxAlternateFieldLength, solrconfig.xml:920-928); otherwise they
    get an empty array, like Solr's empty per-doc highlight entry."""
    ids = page.select("doc_id")
    texts = ids.join(index.docmap.select("doc_id", "text"), "doc_id", "left")
    frag_rows = highlight_fragments(
        texts, terms, phrases=phrases, sloppy_phrases=sloppy_phrases,
        fragsize=fragsize, snippets=snippets, pre=pre, post=post,
    )
    per_doc = frag_rows.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("snippet_rank", "snippet"))),
            lambda s: s["snippet"],
        ).alias("snippets")
    )
    out = texts.join(per_doc, "doc_id", "left")
    if alternate:
        fallback = F.array(F.substring(F.col("text"), 1, int(max_alternate)))
    else:
        fallback = F.array().cast("array<string>")
    return out.select(
        "doc_id", F.coalesce(F.col("snippets"), fallback).alias("snippets")
    )


def highlight_text(
    text: str,
    terms: list[str],
    *,
    phrases: list[tuple[str, ...]] | None = None,
    sloppy_phrases: list[tuple[tuple[str, ...], int]] | None = None,
    fragsize: int = 100,
    snippets: int = 1,
    pre: str = "<em>",
    post: str = "</em>",
) -> list[str]:
    """Pure-Python twin of :func:`highlight_fragments` for one document —
    the pytest oracle (same fragmentation, scoring, tie-breaks, and
    phrase-span rule)."""
    lterms = {t.lower() for t in terms}
    toks = [w for w in text.split(" ") if w]
    low = [w.lower() for w in toks]
    hl_pos: set[int] = set()
    for p in phrases or []:
        words = [w.lower() for w in p]
        n = len(words)
        for st in range(len(low) - n + 1):
            if low[st:st + n] == words:
                hl_pos.update(range(st, st + n))
    for p, sl in sloppy_phrases or []:
        hl_pos |= _sloppy_span_positions(
            low, [w.lower() for w in p], int(sl)
        )
    frags: dict[int, list[tuple[str, bool]]] = {}
    off = 0
    for i, w in enumerate(toks):
        fid = off // fragsize if fragsize > 0 else 0
        frags.setdefault(fid, []).append(
            (w, w.lower() in lterms or i in hl_pos)
        )
        off += len(w) + 1
    scored = []
    for fid in sorted(frags):
        words = frags[fid]
        n_terms = len({w.lower() for w, m in words if m})
        n_matches = sum(1 for _, m in words if m)
        if n_terms == 0:
            continue
        snippet = " ".join(
            (pre + w + post) if m else w for w, m in words
        )
        scored.append((-n_terms, -n_matches, fid, snippet))
    scored.sort()
    return [s for *_, s in scored[:snippets]]
