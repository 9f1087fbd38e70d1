"""Lucene classic-syntax query parser.

The reference fronts Solr's default ``lucene`` query parser
(conf/solr/docs/conf/solrconfig.xml:841-848). Every sample query in
docs/mte-samplequeries.md is a flat clause list in that syntax —
``q=type:doc``, ``q=_depth:1 AND source:corenlp``, ``fq=id:1249``,
quoted sub-queries like ``"source:corenlp AND type:target"`` — but the
parser Solr wires accepts the full classic grammar, so this module
implements the grammar a power user actually types: flat clause lists
PLUS parenthesized boolean groups and fuzzy terms. It produces a
:class:`ParsedQuery` the engine (index/boolean.py) and the pure-Python
oracle share, so both sides interpret a query string identically.

Supported grammar (documented subset of the Lucene classic parser):

- bare terms — optional (SHOULD) clauses, default operator OR (Solr's
  ``q.op`` default). A term that analyzes to several tokens contributes
  one clause per token with the same occur flag.
- ``+term`` / ``-term`` / ``NOT term`` / ``!term`` — required / prohibited.
- ``a AND b`` — promotes BOTH neighbors to required (classic-parser
  behavior); ``OR``/``||`` is a no-op under default-OR. ``&&`` == AND.
- ``"a phrase"`` — positional phrase clause; ``"a phrase"~N`` sets slop
  (ordered proximity, see index.search.sloppy_phrase_freq). A quoted
  string that analyzes to ONE token degrades to a term clause (Lucene
  does the same). Phrases accept the +/-/NOT prefixes.
- ``(a b)`` / ``-(a AND b)`` / ``(a (b OR c))^2`` — parenthesized
  groups: a nested BooleanQuery with its own clause list (recursion is
  unbounded), its own occur flag, and an optional boost that multiplies
  the whole group's score. Scoring is Lucene's coord-free BooleanQuery:
  a matching group contributes the sum of its matching subclauses'
  scores x boost, and a MUST_NOT group excludes every doc the group
  matches.
- ``field:(a b)`` / ``field:(a OR b)`` — field-grouping sugar (round 5):
  Lucene's (field:a OR field:b) rewrite; the values fold into the
  field's IN-semantics constraint list (scored match-any when the field
  has an index). Only bare OR'd values — AND/NOT/phrases/nesting inside
  the group raise.
- ``field:value`` / ``field:"two words"`` / ``field:[lo TO hi]`` (plus
  ``{exclusive}`` / mixed brackets / ``*`` open endpoints) — fielded
  clauses. The parser stores them as field constraints; EVALUATION
  decides (index/boolean.py): a docmap metadata field is a SCORE-NEUTRAL
  filter (Solr ``fq`` semantics — in every reference sample query field
  clauses select, ``type:doc``, rather than rank), while a field with
  its own index in ``boolean_search(field_indexes=...)`` SCORES as a
  Lucene TermQuery with that field's BM25 statistics (round 5; the
  remaining collapse is occur — positive fielded clauses are required).
  The same field repeated with positive occur folds to IN semantics
  (``role:user role:tool`` means either). ``-field:value`` excludes. A
  trailing boost (``type:doc^2``, legal Lucene) is accepted and
  DISCARDED — stripping beats a silent misread.
- ``*:*`` — match-all (used by the reference for facet-only queries,
  mte-samplequeries.md:54 with ``rows=0``).
- ``term^2`` / ``"a phrase"^1.5`` / ``pre*^3`` — per-clause boosts
  (multiply the clause's score, Lucene semantics). The same bare term
  appearing twice with different boosts keeps the LAST boost (documented
  simplification of the flat clause list).
- ``pre*`` — trailing-wildcard prefix query, evaluated with Lucene's
  constant-score rewrite (every doc containing ANY term with the prefix
  scores boost × 1.0; term frequencies don't rank constant-score
  multi-term queries) and Lucene's safety valve: expansion beyond
  ``MAX_PREFIX_EXPANSIONS`` (1024, = BooleanQuery.maxClauseCount) raises.
- ``term~`` / ``term~1`` / ``term~2`` — fuzzy terms (Lucene FuzzyQuery,
  maxEdits defaults to 2 = LevenshteinAutomata's maximum; ``~0`` matches
  the exact term only). Evaluated like prefixes with the CONSTANT_SCORE
  multi-term rewrite (a legal Lucene rewrite; the classic parser's
  default blended-frequency rewrite is a documented deviation), with
  the same ``MAX_PREFIX_EXPANSIONS`` cap. Legacy fractional similarity
  (``term~0.8``) raises — it has been removed from Lucene itself.
  Distance defaults to PLAIN Levenshtein (Spark's ``levenshtein`` in
  ``_expand_fuzzy``, the DP twin in ``oracle._levenshtein``);
  ``boolean_search(fuzzy_transpositions=True)`` switches BOTH twins to
  true Damerau-Levenshtein (adjacent transposition = one edit, the
  Lowrance-Wagner distance DuckDB's ``damerau_levenshtein`` computes),
  closing the round-4 documented deviation: Lucene FuzzyQuery defaults
  to ``transpositions=true``, so a transposed typo like ``wnidow~1``
  matches ``window`` there — and here, with the flag on. The flag
  rides the clause structs (``with_fuzzy_transpositions``), not the
  syntax, exactly like Lucene's construction-time parameter. The
  remaining (default-off) difference is documented rather than silently
  approximated.
- ``te?t`` / ``t*st`` — wildcard terms (round 5): Lucene WildcardQuery
  with the constant-score multi-term rewrite, expanded by anchored
  pattern match over the term dictionary (a literal prefix is pushed to
  the parquet term column), same ``MAX_PREFIX_EXPANSIONS`` cap.
  Patterns are lowercased, not analyzed (Lucene skips analysis for
  wildcard terms), and restricted to ``[a-z0-9*?]``.

NOT supported (raises ValueError, so silent misreads are impossible):
leading-* wildcards (``*te`` — an unanchored dictionary scan), wildcard
patterns outside ``[a-z0-9*?]``, field-grouping with AND/NOT or nesting
inside, fractional fuzzy similarity, maxEdits > 2, and child-doc
transformers — the engine exposes block joins through its own operators
instead.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .analyzer import analyze_text

__all__ = [
    "PhraseClause",
    "PrefixClause",
    "FuzzyClause",
    "WildcardClause",
    "GroupClause",
    "ParsedQuery",
    "parse_query",
    "flatten_query",
    "with_fuzzy_transpositions",
]

SHOULD, MUST, MUST_NOT = "SHOULD", "MUST", "MUST_NOT"


MAX_PREFIX_EXPANSIONS = 1024  # Lucene BooleanQuery.maxClauseCount
MAX_FUZZY_EDITS = 2  # Lucene LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE


@dataclass(frozen=True)
class PhraseClause:
    tokens: tuple[str, ...]
    slop: int
    occur: str
    boost: float = 1.0


@dataclass(frozen=True)
class PrefixClause:
    prefix: str
    occur: str
    boost: float = 1.0


@dataclass(frozen=True)
class FuzzyClause:
    """``term~N`` — constant-score edit-distance expansion.

    ``transpositions`` is Lucene FuzzyQuery's construction-time flag (not
    part of the query syntax): True counts an adjacent transposition as
    ONE edit (Damerau-Levenshtein), Lucene's own default. The parser
    always emits False; ``with_fuzzy_transpositions`` rewrites a parsed
    query to turn it on (boolean_search exposes it as
    ``fuzzy_transpositions=True`` on both the engine and the oracle)."""

    term: str
    max_edits: int
    occur: str
    boost: float = 1.0
    transpositions: bool = False


@dataclass(frozen=True)
class WildcardClause:
    """``te?t`` / ``t*st`` / ``?at`` — Lucene WildcardQuery: constant-score
    multi-term rewrite over the term dictionary (anchored pattern match,
    ``MAX_PREFIX_EXPANSIONS`` cap). Patterns are lowercased, NOT analyzed
    (Lucene skips analysis for wildcard terms) and restricted to
    ``[a-z0-9*?]`` — the term dictionary is analyzed lowercase
    alphanumerics, so anything else cannot match and raises instead.
    Leading ``*`` raises (an unanchored dictionary scan; Solr deployments
    gate it for the same reason)."""

    pattern: str
    occur: str
    boost: float = 1.0


@dataclass(frozen=True)
class RangeValue:
    """``[lo TO hi]`` / ``{lo TO hi}`` / mixed brackets — converted to
    search.Between by the engine. ``[`` / ``]`` are inclusive, ``{`` /
    ``}`` exclusive (Lucene TermRangeQuery); a ``*`` endpoint is the open
    bound and parses to None (Solr's ``price:[* TO 500]``,
    conf/solr/docs/conf/solrconfig.xml:824-825)."""

    lo: object
    hi: object
    lo_inc: bool = True
    hi_inc: bool = True


@dataclass
class ParsedQuery:
    should_terms: tuple[str, ...] = ()
    must_terms: tuple[str, ...] = ()
    must_not_terms: tuple[str, ...] = ()
    phrases: tuple[PhraseClause, ...] = ()
    prefixes: tuple[PrefixClause, ...] = ()
    fuzzies: tuple[FuzzyClause, ...] = ()
    wildcards: tuple[WildcardClause, ...] = ()
    subs: tuple["GroupClause", ...] = ()
    filters: dict = field(default_factory=dict)
    not_filters: dict = field(default_factory=dict)
    # term -> boost for term clauses (absent == 1.0); phrase/prefix/fuzzy/
    # group boosts live on their clause objects
    boosts: dict = field(default_factory=dict)
    match_all: bool = False
    # disjunctive containment constraints produced by flatten_query: each
    # entry is the term set of a flattened MUST group — a doc must contain
    # >= 1 term of EVERY entry (score-neutral; the terms themselves score
    # as ordinary SHOULD clauses). parse_query never sets this directly.
    must_any: tuple[tuple[str, ...], ...] = ()

    def boost_of(self, term: str) -> float:
        return float(self.boosts.get(term, 1.0))


@dataclass
class GroupClause:
    """``( ... )`` — a nested BooleanQuery clause. ``sub`` is the group's
    own :class:`ParsedQuery` (recursion is unbounded)."""

    sub: ParsedQuery
    occur: str
    boost: float = 1.0


_FIELD = r"[A-Za-z_][A-Za-z0-9_.]*"
_LEX = re.compile(
    rf"""
    (?P<ws>\s+)
  | (?P<matchall>\*:\*)
  | (?P<lparen>\() | (?P<rparen>\))
  | (?P<range>(?P<rfield>{_FIELD}):(?P<lbr>[\[{{])(?P<lo>[^\]}}\s]+)\s+TO\s+(?P<hi>[^\]}}\s]+)(?P<rbr>[\]}}])(?:\^\d+(?:\.\d+)?)?)
  | (?P<fphrase>(?P<pfield>{_FIELD}):"(?P<fpv>[^"]*)"(?:\^\d+(?:\.\d+)?)?)
  | (?P<fielded>(?P<field>{_FIELD}):(?P<fval>[^\s()]+))
  | (?P<phrase>"(?P<ph>[^"]*)"(?:~(?P<slop>\d+))?(?:\^(?P<qboost>\d+(?:\.\d+)?))?)
  | (?P<plus>\+) | (?P<minus>-(?=\S)) | (?P<bang>!)
  | (?P<prefixq>(?P<pfx>[^\s()*^]+)\*(?:\^(?P<pfxboost>\d+(?:\.\d+)?))?(?=\s|\)|$))
  | (?P<fuzzy>(?P<fterm>[^\s()~^]+)~(?P<edits>[\d.]+)?(?:\^(?P<fzboost>\d+(?:\.\d+)?))?(?=\s|\)|$))
  | (?P<term>[^\s()]+)
    """,
    re.X,
)

_TERM_BOOST = re.compile(r"^(.+?)\^(\d+(?:\.\d+)?)$")
# wildcard anywhere / stray fuzzy suffix that the fuzzy rule didn't take
_UNSUPPORTED = re.compile(r"[*?]|~[\d.]*$")
_GROUP_BOOST = re.compile(r"^\^(\d+(?:\.\d+)?)$")


def _coerce(v: str):
    """Field values: ints stay ints (turn_idx etc.); all else string."""
    try:
        return int(v)
    except ValueError:
        return v


def _add_filter(filters: dict, fld: str, value) -> None:
    """Same field repeated with positive occur -> IN list (Lucene
    default-OR over same-field clauses)."""
    if fld not in filters:
        filters[fld] = value
        return
    cur = filters[fld]
    if isinstance(cur, RangeValue) or isinstance(value, RangeValue):
        raise ValueError(
            f"field {fld!r} given both a range and another constraint — "
            "not representable in the flat fq subset"
        )
    cur = cur if isinstance(cur, list) else [cur]
    filters[fld] = cur + [value]


def _tokenize(q: str) -> list:
    """Lex ``q`` into contiguous match objects (whitespace dropped);
    raises on any unlexable span, so nothing is silently skipped."""
    toks, pos = [], 0
    for m in _LEX.finditer(q):
        if m.start() != pos:
            raise ValueError(f"unparseable query near {q[pos:]!r}")
        pos = m.end()
        if m.lastgroup != "ws":
            toks.append(m)
    if pos != len(q):
        raise ValueError(f"unparseable query near {q[pos:]!r}")
    return toks


def parse_query(q: str, *, default_op: str = "OR", now=None) -> ParsedQuery:
    """Parse a Lucene classic-syntax string into a :class:`ParsedQuery`.

    ``default_op`` is Solr's ``q.op``: with ``"AND"``, clauses without an
    explicit occur are required instead of optional (solrconfig's
    defaultOperator surface; it applies inside parenthesized groups too,
    like Solr's). ``now`` is Solr's ``NOW=`` request parameter: the
    instant date-math range endpoints resolve against (None = wall
    clock, read once per parse — see :func:`_resolve_dates`). Raises
    ValueError on the unsupported constructs listed in the module
    docstring rather than guessing."""
    if default_op not in ("OR", "AND"):
        raise ValueError(f"default_op must be OR or AND, got {default_op!r}")
    toks = _tokenize(q)
    pq, i = _parse_level(toks, 0, default_op, depth=0)
    assert i == len(toks)  # _parse_level consumes everything at depth 0
    return _resolve_dates(pq, now)


def _resolve_dates(pq: "ParsedQuery", now) -> "ParsedQuery":
    """Resolve Solr date math in range endpoints (``ts:[NOW-7DAYS TO
    NOW]``, the solrconfig.xml:908-909 facet shapes) to concrete UTC
    datetimes, at parse time — Solr's own model, where ``NOW`` is fixed
    per request (the ``NOW=millis`` parameter exists so every shard of
    a distributed query resolves the same instant; pass ``now=`` for
    the same reason in tests). One instant is shared by every endpoint
    of the query. Non-date ranges pass through untouched."""
    from .datemath import is_date_math, parse_date_math

    cache = [now]

    def _ep(v):
        if not is_date_math(v):
            return v
        if cache[0] is None:
            from datetime import datetime, timezone

            cache[0] = datetime.now(timezone.utc)
        return parse_date_math(v, cache[0])

    def _walk(d: dict) -> dict:
        out = {}
        for f, v in d.items():
            if isinstance(v, RangeValue):
                lo, hi = _ep(v.lo), _ep(v.hi)
                if (lo, hi) != (v.lo, v.hi):
                    v = RangeValue(lo, hi, v.lo_inc, v.hi_inc)
            out[f] = v
        return out

    def _pq(p: "ParsedQuery") -> "ParsedQuery":
        p.filters = _walk(p.filters)
        p.not_filters = _walk(p.not_filters)
        for g in p.subs:
            _pq(g.sub)
        return p

    return _pq(pq)


def _parse_level(
    toks: list, i: int, default_op: str, depth: int
) -> tuple[ParsedQuery, int]:
    """Parse one nesting level starting at token ``i``. Returns the
    level's ParsedQuery and the index JUST PAST the level's final token
    (past the closing rparen for depth > 0)."""
    should, must, must_not = [], [], []
    phrases: list[PhraseClause] = []
    prefixes: list[PrefixClause] = []
    fuzzies: list[FuzzyClause] = []
    wildcards: list[WildcardClause] = []
    subs: list[GroupClause] = []
    filters: dict = {}
    not_filters: dict = {}
    boosts: dict = {}
    match_all = False

    pending: str | None = None  # occur forced by +/-/NOT for next clause
    next_must = False  # set when the previous connective was AND
    next_should = False  # set when the previous connective was OR
    # AND promotes (OR demotes) its immediate LEFT NEIGHBOR. These track
    # the neighbor; any non-adjustable clause (explicit MUST / MUST_NOT /
    # fielded / match-all) RESETS them, so 'a -b AND c' does not reach
    # past '-b' and promote 'a'. ``last_default`` records whether the
    # neighbor's occur came from default_op — OR only demotes
    # default-assigned MUST (an explicit '+' always wins, Lucene rule).
    last_positive: list | None = None  # clause list holding the neighbor
    last_positive_val = None  # ... the item itself
    last_default = False

    base_occur = MUST if default_op == "AND" else SHOULD

    def occur_for_next() -> tuple[str, bool]:
        """(occur, came_from_default_op) for the next clause."""
        nonlocal pending, next_must, next_should
        if pending is not None:
            occ, dflt = pending, False
        elif next_must:
            occ, dflt = MUST, False
        elif next_should:
            occ, dflt = SHOULD, False
        else:
            occ, dflt = base_occur, True
        pending, next_must, next_should = None, False, False
        return occ, dflt

    def _flip_last(promote: bool) -> None:
        """AND promotes (OR demotes) the immediate LEFT neighbor. One
        parameterized implementation so the explicit-wins rule lives in
        one place: OR never demotes an explicitly-required clause, and a
        clause AND just promoted becomes explicit (a following OR cannot
        undo it). Term clauses track ALL analyzed tokens of the source
        word, so a multi-token word ('foo-bar') flips as one clause."""
        nonlocal last_positive, last_positive_val, last_default
        if not promote and not last_default:
            return
        src, dst = (should, must) if promote else (must, should)
        src_occ, dst_occ = (SHOULD, MUST) if promote else (MUST, SHOULD)
        if last_positive is src and isinstance(last_positive_val, tuple):
            if all(t in src for t in last_positive_val):
                for t in last_positive_val:
                    src.remove(t)
                    dst.append(t)
                last_positive = dst
        elif last_positive is phrases and last_positive_val in phrases:
            idx = phrases.index(last_positive_val)
            if phrases[idx].occur == src_occ:
                phrases[idx] = PhraseClause(
                    phrases[idx].tokens, phrases[idx].slop, dst_occ,
                    phrases[idx].boost,
                )
                last_positive_val = phrases[idx]
        elif last_positive is prefixes and last_positive_val in prefixes:
            idx = prefixes.index(last_positive_val)
            if prefixes[idx].occur == src_occ:
                prefixes[idx] = PrefixClause(
                    prefixes[idx].prefix, dst_occ, prefixes[idx].boost
                )
                last_positive_val = prefixes[idx]
        elif last_positive is fuzzies and last_positive_val in fuzzies:
            idx = fuzzies.index(last_positive_val)
            if fuzzies[idx].occur == src_occ:
                fuzzies[idx] = FuzzyClause(
                    fuzzies[idx].term, fuzzies[idx].max_edits, dst_occ,
                    fuzzies[idx].boost,
                )
                last_positive_val = fuzzies[idx]
        elif last_positive is wildcards and last_positive_val in wildcards:
            idx = wildcards.index(last_positive_val)
            if wildcards[idx].occur == src_occ:
                wildcards[idx] = WildcardClause(
                    wildcards[idx].pattern, dst_occ, wildcards[idx].boost
                )
                last_positive_val = wildcards[idx]
        elif last_positive is subs and last_positive_val in subs:
            idx = subs.index(last_positive_val)
            if subs[idx].occur == src_occ:
                subs[idx].occur = dst_occ
                last_positive_val = subs[idx]
        if promote:
            last_default = False

    while i < len(toks):
        m = toks[i]
        i += 1
        if m.group("rparen"):
            if depth == 0:
                raise ValueError("unbalanced ')' in query")
            return _finish(
                should, must, must_not, phrases, prefixes, fuzzies,
                wildcards, subs, filters, not_filters, boosts, match_all,
            ), i
        if m.group("lparen"):
            occ, dflt = occur_for_next()
            sub, i = _parse_level(toks, i, default_op, depth + 1)
            # toks[i-1] is the rparen; an ADJACENT ^boost token follows it
            boost = 1.0
            if i < len(toks) and toks[i].lastgroup == "term":
                gb = _GROUP_BOOST.match(toks[i].group("term"))
                if gb and toks[i].start() == toks[i - 1].end():
                    boost = float(gb.group(1))
                    i += 1
            if _is_empty(sub):
                continue  # Lucene drops empty groups; occur consumed
            gc = GroupClause(sub, occ, boost)
            subs.append(gc)
            if occ != MUST_NOT:
                last_positive, last_positive_val = subs, gc
                last_default = dflt
            else:
                last_positive = last_positive_val = None
            continue
        if m.group("matchall"):
            match_all = True
            occur_for_next()  # consume a stray +/-/NOT aimed at *:* so it
            last_positive = last_positive_val = None  # can't leak onward
            continue
        if m.group("plus"):
            pending = MUST
            continue
        if m.group("minus") or m.group("bang"):
            pending = MUST_NOT
            continue
        if m.group("range"):
            fld = m.group("rfield")
            lo, hi = m.group("lo"), m.group("hi")
            rv = RangeValue(
                None if lo == "*" else _coerce(lo),
                None if hi == "*" else _coerce(hi),
                lo_inc=m.group("lbr") == "[",
                hi_inc=m.group("rbr") == "]",
            )
            occ, _ = occur_for_next()
            if occ == MUST_NOT:
                _add_filter(not_filters, fld, rv)
            else:
                _add_filter(filters, fld, rv)
            last_positive = last_positive_val = None
            continue
        if m.group("fphrase") or m.group("fielded"):
            fld = m.group("pfield") or m.group("field")
            raw = m.group("fpv") if m.group("fphrase") else m.group("fval")
            if m.group("fielded"):
                # `field:value^2` is legal Lucene; our field clauses are
                # score-neutral filters (module docstring), so the boost
                # is accepted and DISCARDED — stripping beats the old
                # silent misread where '^2' stayed inside the filter value
                bm = _TERM_BOOST.match(raw)
                if bm:
                    raw = bm.group(1)
            if raw == "*":
                # Lucene FieldExistsQuery — same semantics as the
                # open-ended range, so it rides the [* TO *] machinery
                # (Between(None, None) -> col.isNotNull())
                occ, _ = occur_for_next()
                tgt = not_filters if occ == MUST_NOT else filters
                _add_filter(tgt, fld, RangeValue(None, None))
                last_positive = last_positive_val = None
                continue
            if raw[0] in "[{":
                # a range the range rule didn't take can only be malformed
                # (unbalanced bracket / missing TO) — raise, never misread
                raise ValueError(
                    f"malformed range in {fld}:{raw} — expected "
                    f"{fld}:[lo TO hi] (or {{...}} exclusive, * open)"
                )
            if m.group("fielded") and re.search(r"~[\d.]*$", raw):
                raise ValueError(
                    f"fielded fuzzy {fld}:{raw} unsupported — field "
                    "clauses are literal filters here (drop the ~ or "
                    "query the term unfielded)"
                )
            occ, _ = occur_for_next()
            tgt = not_filters if occ == MUST_NOT else filters
            _add_filter(tgt, fld, _coerce(raw))
            last_positive = last_positive_val = None
            continue
        if m.group("phrase"):
            ptoks = tuple(analyze_text(m.group("ph")))
            slop = int(m.group("slop") or 0)
            boost = float(m.group("qboost") or 1.0)
            occ, dflt = occur_for_next()
            if not ptoks:
                continue
            if len(ptoks) == 1:  # single-token "phrase" degrades to a term
                {SHOULD: should, MUST: must, MUST_NOT: must_not}[occ].append(
                    ptoks[0]
                )
                if boost != 1.0:
                    boosts[ptoks[0]] = boost
                if occ == SHOULD:
                    last_positive, last_positive_val = should, (ptoks[0],)
                    last_default = dflt
                elif occ == MUST and dflt:
                    last_positive, last_positive_val = must, (ptoks[0],)
                    last_default = True
                else:
                    last_positive = last_positive_val = None
                continue
            pc = PhraseClause(ptoks, slop, occ, boost)
            phrases.append(pc)
            if occ != MUST_NOT:
                last_positive, last_positive_val = phrases, pc
                last_default = dflt
            else:
                last_positive = last_positive_val = None
            continue
        if m.group("prefixq"):
            pfx_toks = analyze_text(m.group("pfx"))
            boost = float(m.group("pfxboost") or 1.0)
            occ, dflt = occur_for_next()
            if len(pfx_toks) != 1:
                raise ValueError(
                    f"prefix {m.group('pfx')!r}* must analyze to one token"
                )
            pc = PrefixClause(pfx_toks[0], occ, boost)
            prefixes.append(pc)
            if occ != MUST_NOT:
                last_positive, last_positive_val = prefixes, pc
                last_default = dflt
            else:
                last_positive = last_positive_val = None
            continue
        if m.group("fuzzy"):
            raw_edits = m.group("edits")
            if raw_edits is None:
                edits = MAX_FUZZY_EDITS  # Lucene FuzzyQuery default
            else:
                if "." in raw_edits:
                    raise ValueError(
                        f"fractional fuzzy similarity ~{raw_edits} was "
                        "removed from Lucene; use ~0, ~1 or ~2 edits"
                    )
                edits = int(raw_edits)
                if edits > MAX_FUZZY_EDITS:
                    raise ValueError(
                        f"fuzzy ~{edits} exceeds Lucene's maximum "
                        f"supported edit distance ({MAX_FUZZY_EDITS})"
                    )
            if "*" in m.group("fterm") or "?" in m.group("fterm"):
                raise ValueError(
                    f"wildcard inside fuzzy term {m.group('fterm')!r}~ "
                    "unsupported (wildcards and fuzziness don't compose)"
                )
            f_toks = analyze_text(m.group("fterm"))
            boost = float(m.group("fzboost") or 1.0)
            occ, dflt = occur_for_next()
            if len(f_toks) != 1:
                raise ValueError(
                    f"fuzzy term {m.group('fterm')!r}~ must analyze to "
                    "one token"
                )
            fc = FuzzyClause(f_toks[0], edits, occ, boost)
            fuzzies.append(fc)
            if occ != MUST_NOT:
                last_positive, last_positive_val = fuzzies, fc
                last_default = dflt
            else:
                last_positive = last_positive_val = None
            continue
        # bare term (may be a connective keyword)
        word = m.group("term")
        if word in ("AND", "&&"):
            _flip_last(promote=True)
            next_must = True
            continue
        if word in ("OR", "||"):
            _flip_last(promote=False)
            next_should = True
            continue
        if word == "NOT":
            pending = MUST_NOT
            continue
        if word.endswith(":"):
            # field-grouping sugar (round-5): ``field:(a b)`` /
            # ``field:(a OR b)`` — Lucene rewrites it to (field:a OR
            # field:b), and our same-field positive fold is already IN
            # semantics, so the values join the field's filter list
            # (scored match-any when the field has an index —
            # boolean_search(field_indexes=...)).
            fld = word[:-1]
            if (
                i < len(toks)
                and toks[i].lastgroup == "lparen"
                and toks[i].start() == m.end()
                and re.fullmatch(_FIELD, fld)
            ):
                i += 1
                vals: list = []
                closed = False
                while i < len(toks):
                    t = toks[i]
                    i += 1
                    if t.lastgroup == "rparen":
                        closed = True
                        break
                    if t.lastgroup != "term":
                        raise ValueError(
                            f"field-grouping {fld}:(...) supports only "
                            "bare OR'd values (no phrases, ranges, "
                            "occur flags, or nesting)"
                        )
                    v = t.group("term")
                    if v in ("OR", "||"):
                        continue
                    if v in ("AND", "&&", "NOT"):
                        raise ValueError(
                            f"field-grouping {fld}:(...) supports only "
                            "OR'd values (AND/NOT inside is not IN "
                            "semantics)"
                        )
                    bv = _TERM_BOOST.match(v)
                    if bv:
                        v = bv.group(1)  # boost discarded like field:v^2
                    vals.append(v)
                if not closed:
                    raise ValueError(f"unbalanced '(' in {fld}:(...)")
                if not vals:
                    raise ValueError(f"empty field-grouping {fld}:()")
                occ, _ = occur_for_next()
                tgt = not_filters if occ == MUST_NOT else filters
                for v in vals:
                    _add_filter(tgt, fld, _coerce(v))
                last_positive = last_positive_val = None
                continue
            raise ValueError(
                f"dangling field label {word!r} (write field:value, or "
                "field:(a b) with the group immediately adjacent)"
            )
        if word.startswith("^"):
            # a term token can never begin with '^': it is a detached or
            # malformed boost ('(a b) ^2' -> '^2', '(a b)^2x' -> '^2x').
            # Raising preserves the module contract that silent misreads
            # are impossible — the analyzer would otherwise strip the '^'
            # and score a phantom term (round-4 ADVICE).
            raise ValueError(
                f"misplaced boost {word!r} — attach '^N' directly to a "
                "term, phrase, prefix, fuzzy term, or group"
            )
        boost = 1.0
        bm = _TERM_BOOST.match(word)
        if bm:
            word, boost = bm.group(1), float(bm.group(2))
        if "*" in word or "?" in word:
            # Lucene WildcardQuery (round-5): ``te?t`` / ``t*st`` —
            # constant-score expansion over the term dictionary
            # (index/boolean.py _expand_wildcard). Trailing-* forms were
            # already PrefixClause via the lexer; what reaches here is
            # the ?-and-mid-* tail.
            wl = word.lower()
            if wl.startswith("*"):
                raise ValueError(
                    f"leading-* wildcard {word!r} unsupported (an "
                    "unanchored term-dictionary scan; anchor the "
                    "pattern or use a prefix query)"
                )
            if not re.fullmatch(r"[a-z0-9*?]+", wl):
                raise ValueError(
                    f"wildcard pattern {word!r} unsupported — patterns "
                    "are lowercase [a-z0-9*?] (the term dictionary "
                    "holds analyzed lowercase alphanumerics; anything "
                    "else cannot match)"
                )
            occ, dflt = occur_for_next()
            wc = WildcardClause(wl, occ, boost)
            wildcards.append(wc)
            if occ != MUST_NOT:
                last_positive, last_positive_val = wildcards, wc
                last_default = dflt
            else:
                last_positive = last_positive_val = None
            continue
        if _UNSUPPORTED.search(word):
            raise ValueError(
                f"term {word!r} unsupported (stray '~' suffix — fuzzy "
                "terms are 'term~N' with N in 0..2)"
            )
        occ, dflt = occur_for_next()
        wtoks = analyze_text(word)
        if not wtoks:
            continue
        bucket = {SHOULD: should, MUST: must, MUST_NOT: must_not}[occ]
        bucket.extend(wtoks)
        if boost != 1.0:
            for t in wtoks:  # last occurrence wins (module docstring)
                boosts[t] = boost
        if occ == SHOULD:
            last_positive, last_positive_val = should, tuple(wtoks)
            last_default = dflt
        elif occ == MUST and dflt:
            last_positive, last_positive_val = must, tuple(wtoks)
            last_default = True
        else:
            last_positive = last_positive_val = None
    if depth > 0:
        raise ValueError("unbalanced '(' in query")
    return _finish(
        should, must, must_not, phrases, prefixes, fuzzies, wildcards,
        subs, filters, not_filters, boosts, match_all,
    ), i


def flatten_query(pq: ParsedQuery) -> ParsedQuery:
    """Lucene's BooleanQuery rewrite stage, as a shared pure function:
    SIMPLE nested groups — groups that (after recursively flattening
    their own subqueries) contain ONLY optional term clauses — fold into
    the enclosing level, because coord-free scoring makes the nesting
    semantically transparent:

    - a SHOULD group's terms become top-level SHOULD terms (a matching
      group contributed the sum of its matching terms' scores — exactly
      what the flat terms contribute), with per-term boost =
      group boost x inner boost;
    - a MUST group additionally records its term set in ``must_any``
      (the doc must match >= 1 of them — score-neutral containment, the
      doc-set form of the group's matching requirement);
    - a MUST_NOT group's terms become top-level MUST_NOT terms (the
      group excluded its match set = docs containing any of them).

    A group whose terms collide with terms already present at the parent
    level (or in another flattened group) under a DIFFERENT effective
    boost is left intact — folding it would have to merge boosts. Both
    the engine (index/boolean.py) and the pure-Python oracle flatten
    with this same function before evaluating, so the documented float
    fold (one ascending-term sum) applies identically on both sides.
    Callers only flatten when min_should_match == 0: flattening changes
    the SHOULD-clause count that mm is measured against."""
    subs = []
    should = list(pq.should_terms)
    must_not = list(pq.must_not_terms)
    boosts = dict(pq.boosts)
    must_any = [tuple(g) for g in pq.must_any]
    for gc in pq.subs:
        sub = flatten_query(gc.sub)
        simple = (
            sub.should_terms
            and not (
                sub.must_terms or sub.must_not_terms or sub.phrases
                or sub.prefixes or sub.fuzzies or sub.wildcards
                or sub.subs or sub.filters
                or sub.not_filters or sub.match_all or sub.must_any
            )
        )
        if not simple:
            subs.append(GroupClause(sub, gc.occur, gc.boost))
            continue
        if gc.occur == MUST_NOT:
            must_not.extend(sub.should_terms)
            continue
        eff = {
            t: float(gc.boost) * sub.boost_of(t)
            for t in set(sub.should_terms)
        }
        # a duplicate term would change scoring under the flat set-dedup
        # (`alpha (alpha beta)` scores alpha twice today); a pre-existing
        # different boost can't be merged — keep such groups nested
        conflict = any(
            t in should
            or t in pq.must_terms
            or (t in boosts and boosts[t] != eff[t])
            for t in eff
        )
        if conflict:
            subs.append(GroupClause(sub, gc.occur, gc.boost))
            continue
        should.extend(sub.should_terms)
        for t, b in eff.items():
            if b != 1.0:
                boosts[t] = b
        if gc.occur == MUST:
            must_any.append(tuple(sorted(set(sub.should_terms))))
    return ParsedQuery(
        should_terms=tuple(should),
        must_terms=pq.must_terms,
        must_not_terms=tuple(must_not),
        phrases=pq.phrases,
        prefixes=pq.prefixes,
        fuzzies=pq.fuzzies,
        wildcards=pq.wildcards,
        subs=tuple(subs),
        filters=pq.filters,
        not_filters=pq.not_filters,
        boosts=boosts,
        match_all=pq.match_all,
        must_any=tuple(must_any),
    )


def with_fuzzy_transpositions(pq: ParsedQuery) -> ParsedQuery:
    """Rewrite every FuzzyClause (recursively through groups) with
    ``transpositions=True`` — the query-construction analog of Lucene
    FuzzyQuery's default ``transpositions`` flag, which the classic
    syntax cannot express. Shared plumbing like the parser itself: the
    engine and the oracle both apply this rewrite and then EVALUATE the
    Damerau expansion independently (boolean._expand_fuzzy's pandas-UDF
    DP vs oracle._damerau's last-occurrence DP)."""
    import dataclasses

    out = dataclasses.replace(
        pq,
        fuzzies=tuple(
            dataclasses.replace(fc, transpositions=True)
            for fc in pq.fuzzies
        ),
        subs=tuple(
            dataclasses.replace(gc, sub=with_fuzzy_transpositions(gc.sub))
            for gc in pq.subs
        ),
    )
    return out


def _is_empty(pq: ParsedQuery) -> bool:
    """No clauses at all (e.g. '()' or an all-stopword group) — Lucene
    drops such groups from the enclosing query."""
    return not (
        pq.should_terms or pq.must_terms or pq.must_not_terms
        or pq.phrases or pq.prefixes or pq.fuzzies or pq.wildcards
        or pq.subs or pq.filters or pq.not_filters or pq.match_all
    )


def _finish(
    should, must, must_not, phrases, prefixes, fuzzies, wildcards, subs,
    filters, not_filters, boosts, match_all,
) -> ParsedQuery:
    return ParsedQuery(
        should_terms=tuple(should),
        must_terms=tuple(must),
        must_not_terms=tuple(must_not),
        phrases=tuple(phrases),
        prefixes=tuple(prefixes),
        fuzzies=tuple(fuzzies),
        wildcards=tuple(wildcards),
        subs=tuple(subs),
        filters=filters,
        not_filters=not_filters,
        boosts=boosts,
        match_all=match_all,
    )
