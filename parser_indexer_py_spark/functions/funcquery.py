"""Solr function-query parser — the ``bf``/``boost`` expression grammar.

Solr's edismax takes additive boost functions (``bf=log(sum(len,1))``)
built from the FunctionQuery grammar (public Solr reference docs). This
module parses the practical subset into a Catalyst Column so the boost
is ordinary JVM arithmetic over docmap fields — no UDF, no Python in
the scoring loop, and the identical expression is SQL for the DuckDB
oracle:

- numeric literals (``1``, ``0.5``, ``-2``);
- bare field references (validated against the caller's column set —
  an unknown name raises instead of becoming a null column);
- functions, nested freely: ``log`` (base 10, Solr's log), ``ln``,
  ``sqrt``, ``abs``, ``sum``, ``sub``, ``product``, ``div``, ``min``,
  ``max``, ``pow``, ``recip(x,m,a,b)`` = a/(m*x+b) (Solr's recency/
  length damping shape), ``linear(x,m,c)`` = m*x+c;
- ``ms(a,b)`` — milliseconds between two dates (Solr's date function;
  ``ms(NOW,ts)`` with ``recip`` is THE canonical Solr recency boost).
  Each argument is a timestamp field, a date-math string (``NOW/DAY``,
  ``2024-01-01T00:00:00Z-1MONTH`` — resolved against the ``now``
  passed to :func:`parse_func_query`, the same ``NOW=`` request-param
  model the range parser uses), or a 1-arg form ``ms(a)`` = ms since
  epoch.

Everything unsupported raises ValueError with the offending token —
the loud-error contract shared with the query parser (``ord``/
``query()`` need index internals and are named in the error when
seen).

Citation: the reference's /browse handler is defType=edismax
(conf/solr/docs/conf/solrconfig.xml:870-876); bf/boost are that
parser's documented parameters even though the shipped config leaves
them unset — a /browse user tuning relevance reaches for bf first.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["parse_func_query", "func_query_fields"]

_NUM = re.compile(r"-?\d+(?:\.\d+)?")
_NAME = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*")
_KNOWN_UNSUPPORTED = {"ord", "rord", "query", "exists", "if", "def",
                      "field", "termfreq", "norm", "docfreq", "idf", "tf"}

_NARY = {
    "sum": lambda args: _fold(args, lambda a, b: a + b),
    "sub": lambda args: _need(args, 2) or args[0] - args[1],
    "product": lambda args: _fold(args, lambda a, b: a * b),
    "div": lambda args: _need(args, 2) or args[0] / args[1],
    "min": lambda args: F.least(*_need2(args)),
    "max": lambda args: F.greatest(*_need2(args)),
    "log": lambda args: _need(args, 1) or F.log10(args[0]),
    "ln": lambda args: _need(args, 1) or F.log(args[0]),
    "sqrt": lambda args: _need(args, 1) or F.sqrt(args[0]),
    "abs": lambda args: _need(args, 1) or F.abs(args[0]),
    "pow": lambda args: _need(args, 2) or F.pow(args[0], args[1]),
    "recip": lambda args: _need(args, 4)
    or args[2] / (args[1] * args[0] + args[3]),
    "linear": lambda args: _need(args, 3) or args[1] * args[0] + args[2],
}


def _fold(args, op):
    if len(args) < 2:
        raise ValueError("sum/product need >= 2 arguments")
    out = args[0]
    for a in args[1:]:
        out = op(out, a)
    return out


def _need(args, n):
    if len(args) != n:
        raise ValueError(f"expected {n} arguments, got {len(args)}")
    return None


def _need2(args):
    if len(args) < 2:
        raise ValueError("min/max need >= 2 arguments")
    return args


class _P:
    def __init__(self, s: str, columns, now=None):
        self.s = s
        self.i = 0
        self.cols = columns
        self.now = now
        self.fields: set[str] = set()

    def _ms_arg(self):
        """One ms() argument -> epoch-milliseconds Column: a timestamp
        field, or a date-math string resolved at parse time."""
        from .datemath import is_date_math, parse_date_math

        self.ws()
        m = _NAME.match(self.s, self.i)
        # greedy date-math token: NAME chars plus the math charset
        dm = re.match(r"[A-Za-z0-9_.:+\-/]+", self.s[self.i:])
        if dm and is_date_math(dm.group()):
            if self.now is None:
                from datetime import datetime, timezone

                self.now = datetime.now(timezone.utc)
            dt = parse_date_math(dm.group(), self.now)
            self.i += dm.end()
            return F.lit(int(dt.timestamp() * 1000)).cast("double")
        if m and m.group() in self.cols:
            self.i = m.end()
            self.fields.add(m.group())
            return (
                F.unix_millis(F.col(m.group()).cast("timestamp"))
                .cast("double")
            )
        raise ValueError(
            f"ms() argument at {self.s[self.i:]!r} is neither a "
            "timestamp field nor a date-math expression"
        )

    def _ms(self):
        a = self._ms_arg()
        self.ws()
        b = None
        if self.i < len(self.s) and self.s[self.i] == ",":
            self.i += 1
            b = self._ms_arg()
            self.ws()
        if self.i >= len(self.s) or self.s[self.i] != ")":
            raise ValueError(f"missing ')' in {self.s!r}")
        self.i += 1
        return a - b if b is not None else a

    def ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t":
            self.i += 1

    def expr(self) -> Column:
        self.ws()
        m = _NAME.match(self.s, self.i)
        if m:
            name = m.group()
            j = m.end()
            while j < len(self.s) and self.s[j] in " \t":
                j += 1
            if j < len(self.s) and self.s[j] == "(":
                self.i = j + 1
                return self.func(name)
            self.i = m.end()
            if name not in self.cols:
                hint = (
                    " (a known Solr function needing index internals — "
                    "unsupported here)"
                    if name in _KNOWN_UNSUPPORTED
                    else ""
                )
                raise ValueError(
                    f"unknown field {name!r} in function query{hint}"
                )
            self.fields.add(name)
            return F.col(name).cast("double")
        m = _NUM.match(self.s, self.i)
        if m:
            self.i = m.end()
            return F.lit(float(m.group()))
        raise ValueError(
            f"bad function-query syntax at {self.s[self.i:]!r}"
        )

    def func(self, name: str) -> Column:
        if name == "ms":
            return self._ms()
        if name in _KNOWN_UNSUPPORTED:
            raise ValueError(
                f"function {name!r} needs index internals/dates — "
                "unsupported in this subset"
            )
        if name not in _NARY:
            raise ValueError(f"unknown function {name!r}")
        args = [self.expr()]
        self.ws()
        while self.i < len(self.s) and self.s[self.i] == ",":
            self.i += 1
            args.append(self.expr())
            self.ws()
        if self.i >= len(self.s) or self.s[self.i] != ")":
            raise ValueError(f"missing ')' in {self.s!r}")
        self.i += 1
        return _NARY[name](args)


def parse_func_query(
    expr: str, columns, now=None
) -> tuple[Column, list[str]]:
    """Parse one function-query expression against the available column
    names. Returns (Column, referenced field names). ``now`` anchors
    ms() date math (None = wall clock, read once per expression)."""
    p = _P(expr, set(columns), now=now)
    col = p.expr()
    p.ws()
    if p.i != len(p.s):
        raise ValueError(
            f"trailing input in function query: {p.s[p.i:]!r}"
        )
    return col, sorted(p.fields)


def func_query_fields(expr: str, columns) -> list[str]:
    return parse_func_query(expr, columns)[1]
