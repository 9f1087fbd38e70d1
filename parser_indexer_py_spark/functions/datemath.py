"""Solr DateMathParser twin — the range/facet date grammar.

The reference wires date math into its own /browse facet defaults
(conf/solr/docs/conf/solrconfig.xml:908-909: ``facet.range.start =
NOW/YEAR-10YEARS``, ``facet.range.end = NOW``), and every Solr range
query over a date field speaks it (``ts:[NOW-7DAYS TO NOW]``). Grammar
(Solr's DateMathParser, public Solr reference docs):

- anchor: ``NOW`` or an ISO-8601 instant ``2024-03-01T00:00:00Z``
  (fractional seconds accepted; the trailing ``Z`` is required, like
  Solr — dates are UTC-only).
- operations, any number, left to right: ``+N<UNIT>`` / ``-N<UNIT>``
  (calendar add) and ``/<UNIT>`` (round DOWN to the unit's floor).
- units: YEAR MONTH DAY DATE HOUR MINUTE SECOND MILLI MILLISECOND,
  each with the plural (and MILLIS) accepted, case-insensitive.

``NOW`` is resolved from the ``now`` argument — the analog of Solr's
``NOW=<millis>`` request parameter, which exists precisely so every
shard of a distributed request (and every test) scores against the
same instant. ``now=None`` takes the wall clock (UTC) like a Solr
request without the parameter.

Calendar adds clamp the day-of-month the way java.util.Calendar does
(Jan 31 + 1MONTH = Feb 28/29); rounding truncates (NOW/DAY = today's
midnight UTC). Pure Python datetimes in and out — evaluation happens
once at parse time, so the resolved instant reaches the parquet scan
as an ordinary pushed timestamp predicate.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta, timezone

__all__ = ["apply_date_math", "is_date_math", "parse_date_math"]

_ISO = re.compile(
    r"^(?P<date>\d{4}-\d{2}-\d{2})T(?P<time>\d{2}:\d{2}:\d{2}(?:\.\d+)?)Z"
)
_OP = re.compile(r"(?P<round>/)|(?P<sign>[+\-])(?P<n>\d+)", re.A)
_UNIT = re.compile(r"[A-Za-z]+")

# canonical unit names; plurals (and MILLIS) normalize by stripping a
# trailing S when the remainder is canonical
_UNITS = frozenset(
    ["YEAR", "MONTH", "DAY", "DATE", "HOUR", "MINUTE", "SECOND",
     "MILLI", "MILLISECOND"]
)


def is_date_math(v) -> bool:
    """True when ``v`` is a string the date-math grammar should claim:
    a NOW anchor or an ISO instant (either with an optional math tail).
    Plain field values ('user', '42', 'c-1') never match — the anchor
    shapes are unambiguous."""
    return isinstance(v, str) and (
        v.startswith("NOW") or bool(_ISO.match(v))
    )


def _unit(tok: str) -> str:
    u = tok.upper()
    if u not in _UNITS and u.endswith("S") and u[:-1] in _UNITS:
        u = u[:-1]
    if u not in _UNITS:
        raise ValueError(f"unknown date math unit {tok!r}")
    return "DAY" if u == "DATE" else ("MILLI" if u == "MILLISECOND" else u)


def _add_months(dt: datetime, n: int) -> datetime:
    m = dt.year * 12 + (dt.month - 1) + n
    y, mo = divmod(m, 12)
    day = min(dt.day, calendar.monthrange(y, mo + 1)[1])
    return dt.replace(year=y, month=mo + 1, day=day)


def _add(dt: datetime, unit: str, n: int) -> datetime:
    if unit == "YEAR":
        return _add_months(dt, 12 * n)
    if unit == "MONTH":
        return _add_months(dt, n)
    delta = {
        "DAY": timedelta(days=n),
        "HOUR": timedelta(hours=n),
        "MINUTE": timedelta(minutes=n),
        "SECOND": timedelta(seconds=n),
        "MILLI": timedelta(milliseconds=n),
    }[unit]
    return dt + delta


def _round(dt: datetime, unit: str) -> datetime:
    if unit == "YEAR":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "MONTH":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "DAY":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "HOUR":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "MINUTE":
        return dt.replace(second=0, microsecond=0)
    if unit == "SECOND":
        return dt.replace(microsecond=0)
    # MILLI: truncate to millisecond precision
    return dt.replace(microsecond=dt.microsecond // 1000 * 1000)


def parse_date_math(expr: str, now: datetime | None = None) -> datetime:
    """Resolve a date-math expression to a tz-aware UTC datetime.

    Raises ValueError on anything outside the grammar — a malformed
    date expression must never degrade into a string comparison against
    a timestamp column (the same loud-error contract as the query
    parser)."""
    if now is None:
        now = datetime.now(timezone.utc)
    elif now.tzinfo is None:
        now = now.replace(tzinfo=timezone.utc)
    if expr.startswith("NOW"):
        dt, pos = now, 3
    else:
        m = _ISO.match(expr)
        if not m:
            raise ValueError(
                f"bad date math anchor in {expr!r} — expected NOW or an "
                "ISO-8601 instant ending in Z"
            )
        dt = datetime.fromisoformat(
            f"{m.group('date')}T{m.group('time')}+00:00"
        )
        pos = m.end()
    return apply_date_math(dt, expr[pos:])


def apply_date_math(dt: datetime, ops: str) -> datetime:
    """Apply a bare operation chain (``+1YEAR``, ``-3MONTHS/MONTH``) to
    an anchor — also the facet.range.gap evaluator (Solr applies the gap
    string to each bucket's lower bound to get the next edge, which is
    why month/year gaps produce irregular bucket widths)."""
    pos = 0
    while pos < len(ops):
        op = _OP.match(ops, pos)
        if not op:
            raise ValueError(f"bad date math operation at {ops[pos:]!r}")
        pos = op.end()
        um = _UNIT.match(ops, pos)
        if not um:
            raise ValueError(f"date math unit missing at {ops[pos:]!r}")
        unit = _unit(um.group())
        pos = um.end()
        if op.group("round"):
            dt = _round(dt, unit)
        else:
            n = int(op.group("n"))
            dt = _add(dt, unit, n if op.group("sign") == "+" else -n)
    return dt
