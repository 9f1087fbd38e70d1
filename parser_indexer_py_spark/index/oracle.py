"""Pure-Python scalar BM25 oracle — the rank-identity reference.

This is the "golden" implementation SURVEY.md §7.0 designates as the
reference semantics for the engine (the reference repo's actual scorer is
inside Lucene and unavailable; its behavior is specified by
solrconfig.xml:38 => Lucene 6 BM25, k1=1.2 b=0.75, rows=10 top-k at
solrconfig.xml:770). The engine must match this oracle's top-k docIDs AND
scores bit-for-bit:

- same analyzer (``analyze_text``, the tokenizer twin),
- same idf/contrib arithmetic (``scoring`` module, canonical op order),
- same fold order (ascending term per doc),
- same tie-break (ascending docID).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from ..functions.analyzer import analyze_text
from .scoring import bm25_contrib, bm25_idf


class BM25Oracle:
    """Single-process inverted index + scorer over a small corpus."""

    def __init__(self, docs: dict[int, list[str]], roles: dict[int, str] | None = None):
        if not docs:
            # same contract as build_index's explicit empty-input error
            raise ValueError("BM25Oracle: corpus is empty")
        self.docs = docs
        self.dl = {d: len(toks) for d, toks in docs.items()}
        self.n_docs = len(docs)
        # exact: integer token total / doc count (matches the engine's
        # sum(dl)/count avgdl computation)
        self.avgdl = float(sum(self.dl.values())) / float(self.n_docs)
        self.postings: dict[str, dict[int, int]] = {}
        self.positions: dict[str, dict[int, list[int]]] = {}
        for d, toks in docs.items():
            for t, tf in Counter(toks).items():
                self.postings.setdefault(t, {})[d] = tf
            for i, t in enumerate(toks):
                self.positions.setdefault(t, {}).setdefault(d, []).append(i)
        self.roles = roles or {}

    @classmethod
    def from_pandas(cls, pdf: pd.DataFrame) -> "BM25Oracle":
        """Build from a transcripts DataFrame with an assigned ``doc_id``
        column (docs must already carry engine docIDs)."""
        docs = {
            int(r.doc_id): analyze_text(r.text) for r in pdf.itertuples(index=False)
        }
        roles = {int(r.doc_id): r.role for r in pdf.itertuples(index=False)}
        return cls(docs, roles)

    def term_stats(self) -> dict[str, tuple[int, int]]:
        """term -> (df, cf)."""
        return {
            t: (len(pl), sum(pl.values())) for t, pl in self.postings.items()
        }

    def search(
        self,
        query: str,
        k: int = 10,
        *,
        conjunctive: bool = False,
        role: str | None = None,
    ) -> list[tuple[int, float]]:
        terms = sorted(set(analyze_text(query)))
        scores: dict[int, float] = {}
        hits: dict[int, int] = {}
        for t in terms:  # ascending term order == engine's fold order
            pl = self.postings.get(t)
            if not pl:
                continue
            idf = bm25_idf(len(pl), self.n_docs)
            for d, tf in pl.items():
                c = bm25_contrib(float(tf), float(self.dl[d]), idf, self.avgdl)
                scores[d] = scores.get(d, 0.0) + c
                hits[d] = hits.get(d, 0) + 1
        cands = scores.items()
        if conjunctive:
            cands = [(d, s) for d, s in cands if hits[d] == len(terms)]
        if role is not None:
            cands = [(d, s) for d, s in cands if self.roles.get(d) == role]
        return sorted(cands, key=lambda x: (-x[1], x[0]))[:k]

    def phrase_search(
        self, query: str, k: int = 10, *, slop: int = 0, role: str | None = None
    ) -> list[tuple[int, float, int]]:
        """Phrase twin of index.search.phrase_eval. slop=0: exact phrase
        (Lucene PhraseQuery slop=0; freq = start positions where every
        token of the ordered sequence appears at its offset, computed here
        with INDEPENDENT set algebra as a cross-check of the engine's
        intersect chain). slop>0: ordered proximity — freq delegated to
        the SHARED sloppy_phrase_freq definition (search.py documents the
        semantics; sharing the function makes the slop gate a
        decode/plumbing check, while slop=0 stays a dual-implementation
        check). score = bm25_contrib(freq, dl, idf_sum, avgdl) with
        idf_sum folded one addend per token INSTANCE in query order — the
        same float order the engine uses. Returns
        (doc_id, score, phrase_freq)."""
        out = [
            (d, s, f)
            for d, (s, f) in self._phrase_scores(
                analyze_text(query), slop
            ).items()
            if role is None or self.roles.get(d) == role
        ]
        return sorted(out, key=lambda x: (-x[1], x[0]))[:k]

    def _phrase_scores(
        self, toks: list[str], slop: int
    ) -> dict[int, tuple[float, int]]:
        """doc_id -> (score, phrase_freq) for every matching doc — the
        composable core behind phrase_search and boolean_search (the twin
        of index.search.phrase_scores)."""
        if not toks:
            return {}
        if any(t not in self.postings for t in set(toks)):
            return {}
        idf_sum = 0.0
        for t in toks:
            idf_sum += bm25_idf(len(self.postings[t]), self.n_docs)
        cand_docs = set(self.positions[toks[0]])
        for t in toks[1:]:
            cand_docs &= set(self.positions[t])
        out: dict[int, tuple[float, int]] = {}
        for d in cand_docs:
            if slop == 0:
                starts = set(self.positions[toks[0]][d])
                for i, t in enumerate(toks[1:], 1):
                    starts &= {p - i for p in self.positions[t][d]}
                    if not starts:
                        break
                freq = len(starts)
            else:
                from .search import sloppy_phrase_freq

                freq = sloppy_phrase_freq(
                    [self.positions[t][d] for t in toks], slop
                )
            if not freq:
                continue
            s = bm25_contrib(float(freq), float(self.dl[d]), idf_sum, self.avgdl)
            out[d] = (s, freq)
        return out

    def _prefix_terms(self, prefix: str) -> list[str]:
        from ..functions.queryparser import MAX_PREFIX_EXPANSIONS

        terms = sorted(t for t in self.postings if t.startswith(prefix))
        if len(terms) > MAX_PREFIX_EXPANSIONS:
            raise ValueError(
                f"prefix {prefix!r}* expands past {MAX_PREFIX_EXPANSIONS} "
                "terms (Lucene maxClauseCount); narrow the prefix"
            )
        return terms

    def _fuzzy_terms(
        self, term: str, max_edits: int, transpositions: bool = False
    ) -> list[str]:
        """Twin of index.boolean._expand_fuzzy (prefixLength=0 dictionary
        scan, length-window + Levenshtein, maxClauseCount cap);
        ``transpositions=True`` switches to true Damerau-Levenshtein
        (``_damerau``), the twin of the engine's pandas-UDF DP."""
        from ..functions.queryparser import MAX_PREFIX_EXPANSIONS

        if max_edits == 0:
            return [term]
        dist = _damerau if transpositions else _levenshtein
        out = sorted(
            t
            for t in self.postings
            if abs(len(t) - len(term)) <= max_edits
            and dist(t, term) <= max_edits
        )
        if len(out) > MAX_PREFIX_EXPANSIONS:
            raise ValueError(
                f"fuzzy {term!r}~{max_edits} expands past "
                f"{MAX_PREFIX_EXPANSIONS} terms (Lucene maxClauseCount)"
            )
        return out

    def boolean_search(
        self,
        query: str,
        k: int = 10,
        *,
        role: str | None = None,
        min_should_match: int = 0,
        match_all_score: float = 1.0,
        fuzzy_transpositions: bool = False,
    ) -> list[tuple[int, float]]:
        """Twin of index.boolean.boolean_search — same parser
        (functions.queryparser, shared on purpose: the parse is plumbing,
        the EVALUATION is the dual implementation), independent set
        algebra, and the identical float fold order: the term piece sums
        contribs in ascending term order, then each positive phrase /
        prefix / fuzzy / group clause's score adds in clause order —
        exactly the engine's ``coalesce(s0)+coalesce(s1)+...``
        expression. Parenthesized groups recurse through
        :meth:`_pq_scores` like the engine's ``_scored_docs`` recursion.

        Field clauses: the oracle's only metadata field is ``role``;
        other fields raise (engine-only surface)."""
        from ..functions.queryparser import (
            flatten_query,
            parse_query,
            with_fuzzy_transpositions,
        )

        pq = parse_query(query)
        if fuzzy_transpositions:
            pq = with_fuzzy_transpositions(pq)
        if min_should_match == 0:
            # the same Lucene-rewrite flattening the engine applies
            pq = flatten_query(pq)
        scores = self._pq_scores(
            pq,
            min_should_match=min_should_match,
            match_all_score=match_all_score,
        )
        if scores is None:
            if role is None:
                return []
            # a role filter makes an otherwise-empty query the filtered
            # match-all rewrite — same rule as the engine, where the
            # role/filters params feed allowed_docs and _scored_docs then
            # takes the constant-score branch
            scores = {d: float(match_all_score) for d in self.dl}
        cands = [
            (d, s)
            for d, s in scores.items()
            if role is None or self.roles.get(d) == role
        ]
        return sorted(cands, key=lambda x: (-x[1], x[0]))[:k]

    def _wildcard_terms(self, pattern: str) -> list[str]:
        """Twin of index.boolean._expand_wildcard (anchored fnmatch over
        the term dictionary, maxClauseCount cap)."""
        import fnmatch

        from ..functions.queryparser import MAX_PREFIX_EXPANSIONS

        out = sorted(fnmatch.filter(self.postings.keys(), pattern))
        if len(out) > MAX_PREFIX_EXPANSIONS:
            raise ValueError(
                f"wildcard {pattern!r} expands past "
                f"{MAX_PREFIX_EXPANSIONS} terms (Lucene maxClauseCount)"
            )
        return out

    def _pq_scores(
        self,
        pq,
        *,
        min_should_match: int = 0,
        match_all_score: float = 1.0,
    ) -> dict[int, float] | None:
        """doc -> score for every doc matching ``pq`` (the recursive core
        behind boolean_search; None == matches nothing by construction)."""
        from ..functions.queryparser import MUST, MUST_NOT, parse_query  # noqa: F401

        for f in set(pq.filters) | set(pq.not_filters):
            if f != "role":
                raise ValueError(f"oracle supports only role filters, got {f!r}")
        role_f = pq.filters.get("role")
        not_role = pq.not_filters.get("role")

        should_set = sorted(set(pq.should_terms))
        n_should_clauses = (
            len(should_set)
            + sum(1 for p in pq.phrases if p.occur == "SHOULD")
            + sum(1 for p in pq.prefixes if p.occur == "SHOULD")
            + sum(1 for p in pq.fuzzies if p.occur == "SHOULD")
            + sum(1 for w in pq.wildcards if w.occur == "SHOULD")
            + sum(1 for g in pq.subs if g.occur == "SHOULD")
        )
        if min_should_match > n_should_clauses:
            return {}

        # pieces in ENGINE clause order (terms, phrases, prefixes,
        # fuzzies, groups); each: (required, doc->score, counts_toward_mm)
        pieces: list[tuple[bool, dict[int, float], bool]] = []
        pos_terms = sorted(set(pq.should_terms) | set(pq.must_terms))
        boosted = any(pq.boost_of(t) != 1.0 for t in pos_terms)
        if pos_terms:
            sc: dict[int, float] = {}
            for t in pos_terms:  # ascending order == engine's cs fold
                pl = self.postings.get(t)
                if not pl:
                    continue
                idf = bm25_idf(len(pl), self.n_docs)
                for d, tf in pl.items():
                    c = bm25_contrib(
                        float(tf), float(self.dl[d]), idf, self.avgdl
                    )
                    if boosted:  # same guard as the engine: no-boost
                        c = c * pq.boost_of(t)  # queries skip the multiply
                    sc[d] = sc.get(d, 0.0) + c
            if pq.must_terms:
                need = sorted(set(pq.must_terms))
                sc = {
                    d: s
                    for d, s in sc.items()
                    if all(d in self.postings.get(t, {}) for t in need)
                }
            pieces.append((bool(pq.must_terms), sc, False))
        for pc in pq.phrases:
            if pc.occur == MUST_NOT:
                continue
            ps = self._phrase_scores(list(pc.tokens), pc.slop)
            pieces.append(
                (
                    pc.occur == MUST,
                    {d: s * float(pc.boost) for d, (s, _) in ps.items()},
                    pc.occur == "SHOULD",
                )
            )
        for pc in pq.prefixes:
            if pc.occur == MUST_NOT:
                continue
            docs_p: set[int] = set()
            for t in self._prefix_terms(pc.prefix):
                docs_p |= set(self.postings[t])
            pieces.append(
                (
                    pc.occur == MUST,
                    {d: 1.0 * pc.boost for d in docs_p},
                    pc.occur == "SHOULD",
                )
            )
        for fc in pq.fuzzies:
            if fc.occur == MUST_NOT:
                continue
            docs_f: set[int] = set()
            for t in self._fuzzy_terms(
                fc.term, fc.max_edits, fc.transpositions
            ):
                docs_f |= set(self.postings.get(t, {}))
            pieces.append(
                (
                    fc.occur == MUST,
                    {d: 1.0 * fc.boost for d in docs_f},
                    fc.occur == "SHOULD",
                )
            )
        for wc in pq.wildcards:
            if wc.occur == MUST_NOT:
                continue
            docs_w: set[int] = set()
            for t in self._wildcard_terms(wc.pattern):
                docs_w |= set(self.postings.get(t, {}))
            pieces.append(
                (
                    wc.occur == MUST,
                    {d: 1.0 * wc.boost for d in docs_w},
                    wc.occur == "SHOULD",
                )
            )
        for gc in pq.subs:
            if gc.occur == MUST_NOT:
                continue
            sub = self._pq_scores(gc.sub)
            if sub is None:
                continue
            if gc.boost != 1.0:  # engine guard: unboosted groups skip
                sub = {d: s * float(gc.boost) for d, s in sub.items()}
            pieces.append((gc.occur == MUST, sub, gc.occur == "SHOULD"))

        if not pieces:
            has_neg = bool(pq.must_not_terms or not_role) or any(
                p.occur == MUST_NOT
                for p in list(pq.phrases) + list(pq.prefixes)
                + list(pq.fuzzies) + list(pq.wildcards) + list(pq.subs)
            )
            if role_f is None and not (pq.match_all or has_neg):
                return None
            scores = {d: float(match_all_score) for d in self.dl}
        else:
            req = [p for r, p, _ in pieces if r]
            if req:
                docs = set(req[0])
                for p in req[1:]:
                    docs &= set(p)
            else:
                docs = set()
                for _, p, _ in pieces:
                    docs |= set(p)
            for grp in pq.must_any:
                grp_docs: set[int] = set()
                for t in set(grp):
                    grp_docs |= set(self.postings.get(t, {}))
                docs &= grp_docs
            scores = {}
            for d in docs:
                s = 0.0
                for _, p, _ in pieces:  # clause-order fold, 0.0 when absent
                    s += p.get(d, 0.0)
                scores[d] = s
            if min_should_match > 0:
                def n_sat(d: int) -> int:
                    n = sum(
                        1
                        for t in should_set
                        if d in self.postings.get(t, {})
                    )
                    n += sum(
                        1
                        for _, p, counts in pieces
                        if counts and d in p
                    )
                    return n

                scores = {
                    d: s
                    for d, s in scores.items()
                    if n_sat(d) >= min_should_match
                }

        # exclusion sets computed ONCE (not per candidate — a per-doc
        # _phrase_scores recompute would be quadratic), mirroring the
        # engine's single anti-join per MUST_NOT clause
        excluded: set[int] = set()
        for t in set(pq.must_not_terms):
            excluded |= set(self.postings.get(t, {}))
        for pc in pq.phrases:
            if pc.occur == MUST_NOT:
                excluded |= set(
                    self._phrase_scores(list(pc.tokens), pc.slop)
                )
        for pc in pq.prefixes:
            if pc.occur == MUST_NOT:
                for t in self._prefix_terms(pc.prefix):
                    excluded |= set(self.postings[t])
        for fc in pq.fuzzies:
            if fc.occur == MUST_NOT:
                for t in self._fuzzy_terms(
                fc.term, fc.max_edits, fc.transpositions
            ):
                    excluded |= set(self.postings.get(t, {}))
        for wc in pq.wildcards:
            if wc.occur == MUST_NOT:
                for t in self._wildcard_terms(wc.pattern):
                    excluded |= set(self.postings.get(t, {}))
        for gc in pq.subs:
            if gc.occur == MUST_NOT:
                sub = self._pq_scores(gc.sub)
                if sub is not None:
                    excluded |= set(sub)

        def keep(d: int) -> bool:
            if d in excluded:
                return False
            if role_f is not None:
                rf = role_f if isinstance(role_f, list) else [role_f]
                if self.roles.get(d) not in rf:
                    return False
            if not_role is not None:
                nr = not_role if isinstance(not_role, list) else [not_role]
                if self.roles.get(d) in nr:
                    return False
            return True

        return {d: s for d, s in scores.items() if keep(d)}

    def spell_suggest(
        self,
        term: str,
        *,
        accuracy: float = 0.5,
        max_edits: int = 2,
        min_prefix: int = 1,
        count: int = 5,
        transpositions: bool = False,
        only_more_popular: bool = False,
        own_df: int = 0,
    ) -> list[tuple[str, int, float]]:
        """DirectSolrSpellChecker twin of index.spell._suggest_term:
        (suggestion, df, similarity) ranked sim desc, df desc, term asc.
        ``transpositions=True`` swaps in the independent ``_damerau``
        (round-5f spell flag parity)."""
        dist = _damerau if transpositions else _levenshtein
        out = []
        for t, pl in self.postings.items():
            if t == term or not t.startswith(term[:min_prefix]):
                continue
            if only_more_popular and len(pl) <= own_df:
                continue
            if abs(len(t) - len(term)) > max_edits:
                continue
            d = dist(t, term)
            if d > max_edits:
                continue
            sim = 1.0 - float(d) / float(min(len(t), len(term)))
            if sim < accuracy:
                continue
            out.append((t, len(pl), round(sim, 6)))
        out.sort(key=lambda x: (-x[2], -x[1], x[0]))
        return out[:count]

    def wordbreak(
        self, query: str, *, min_part_len: int = 2
    ) -> dict:
        """Independent twin of index.spell.wordbreak (dict lookups over
        this oracle's postings)."""
        toks = analyze_text(query)
        dfs = lambda t: len(self.postings.get(t, {}))  # noqa: E731
        breaks: dict = {}
        for t in toks:
            if dfs(t):
                continue
            found = [
                (t[:i], t[i:], min(dfs(t[:i]), dfs(t[i:])))
                for i in range(min_part_len, len(t) - min_part_len + 1)
                if dfs(t[:i]) and dfs(t[i:])
            ]
            if found:
                found.sort(key=lambda x: (-x[2], x[0]))
                breaks[t] = found
        combines = [
            ((a, b), a + b, dfs(a + b))
            for a, b in zip(toks, toks[1:])
            if dfs(a + b)
        ]
        return {"breaks": breaks, "combines": combines}

    def more_like_this(
        self,
        doc_id: int,
        *,
        count: int = 3,
        max_query_terms: int = 25,
        min_term_freq: int = 2,
        min_doc_freq: int = 5,
        max_doc_freq_pct: float | None = None,
    ) -> list[tuple[int, float]]:
        """MLT twin: SHARED term selection (mlt.select_interesting — pure
        plumbing), INDEPENDENT BM25 scoring via this oracle's search."""
        from .mlt import select_interesting

        sel = select_interesting(
            self.docs[doc_id],
            lambda t: len(self.postings.get(t, {})),
            self.n_docs,
            max_query_terms=max_query_terms,
            min_term_freq=min_term_freq,
            min_doc_freq=min_doc_freq,
            max_doc_freq_pct=max_doc_freq_pct,
        )
        if not sel:
            return []
        res = self.search(" ".join(t for t, _ in sel), k=count + 1)
        return [(d, s) for d, s in res if d != doc_id][:count]


def dismax_search(
    oracles: dict[str, "BM25Oracle"],
    query: str,
    qf: dict[str, float],
    k: int = 10,
    *,
    tie: float = 0.0,
    mm_n: int = 0,
) -> list[tuple[int, float]]:
    """Pure-Python twin of index.boolean.edismax_qf: per-term
    DisjunctionMax across field oracles (each field keeps its own
    df/avgdl/dl), tie-broken sum in FIELD order, per-doc fold in
    ascending TERM order — the engine's exact float op sequence."""
    terms = sorted(set(analyze_text(query)))
    fields = sorted(qf)
    per_doc: dict[int, float] = {}
    n_match: dict[int, int] = {}
    for t in terms:  # ascending == engine's per-doc ts fold
        td: dict[int, list[float]] = {}
        for f in fields:  # sorted == engine's fs field-order fold
            o = oracles[f]
            pl = o.postings.get(t)
            if not pl:
                continue
            idf = bm25_idf(len(pl), o.n_docs)
            for d, tf in pl.items():
                c = bm25_contrib(
                    float(tf), float(o.dl[d]), idf, o.avgdl
                ) * float(qf[f])
                td.setdefault(d, []).append(c)
        for d, cs in td.items():
            mx = max(cs)
            if tie == 0.0:
                s = mx
            else:
                sm = 0.0
                for c in cs:
                    sm += c
                s = mx + float(tie) * (sm - mx)
            per_doc[d] = per_doc.get(d, 0.0) + s
            n_match[d] = n_match.get(d, 0) + 1
    cands = [
        (d, s) for d, s in per_doc.items() if n_match[d] >= mm_n
    ]
    return sorted(cands, key=lambda x: (-x[1], x[0]))[:k]


def _levenshtein(a: str, b: str) -> int:
    """Plain DP Levenshtein (the 'internal' distance both Lucene's
    DirectSpellChecker and Spark's/DuckDB's levenshtein() compute)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _damerau(a: str, b: str) -> int:
    """TRUE Damerau-Levenshtein (adjacent transposition = one edit, and —
    unlike the optimal-string-alignment restriction — later edits may
    land inside a transposed pair: d('ca','abc') == 2). This is the
    distance DuckDB's ``damerau_levenshtein`` computes and the semantics
    of Lucene FuzzyQuery's ``transpositions=true``; the engine's twin is
    the pandas-UDF DP in index.boolean._damerau_filter_udf, written
    independently (this one keeps the full matrix keyed by string index
    and a per-character last-seen map over ``b``). Gated against DuckDB
    on exhaustive small-alphabet pairs in tests/test_fuzzy_damerau.py."""
    la, lb = len(a), len(b)
    big = la + lb
    # rows 0..la+1 / cols 0..lb+1; row/col 0 is the "minus one" sentinel
    d = [[big] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    seen_in_b: dict[str, int] = {}
    for i in range(1, la + 1):
        match_col = 0
        for j in range(1, lb + 1):
            prev_row = seen_in_b.get(b[j - 1], 0)
            prev_col = match_col
            if a[i - 1] == b[j - 1]:
                cost = 0
                match_col = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[prev_row][prev_col]
                + (i - prev_row - 1) + 1 + (j - prev_col - 1),
            )
        seen_in_b[a[i - 1]] = i
    return d[la + 1][lb + 1]
