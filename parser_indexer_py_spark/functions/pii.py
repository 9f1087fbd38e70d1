"""PII scrubbing — regex redaction for training-data pipelines.

Beyond the reference (training-pipeline surface, like
operators/decontam.py): replace personally-identifying spans with typed
placeholder tokens before a corpus ships to training. Everything is
JVM-side ``regexp_replace`` / ``regexp_count`` — whole-stage-codegen'd,
no UDF, and the patterns are deliberately RE2-compatible so the DuckDB
oracle evaluates the identical expressions (no backrefs, no lookaround;
the same portability rule as the md5 hash twins).

The pattern set is the conservative high-precision core (emails, NANP-
style phone numbers, IPv4): recall-heavy PII detection (names,
addresses) needs an NER model and belongs in a Pandas-UDF stage beside
the multimodal decoders — out of scope for the regex layer by design.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "scrub_pii", "count_pii"]

# (placeholder, RE2-compatible pattern) — order matters: emails first so
# a phone-like digit run inside a local-part is already gone when the
# phone rule looks
PII_PATTERNS: list[tuple[str, str]] = [
    ("<EMAIL>", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"),
    ("<PHONE>", r"\d{3}[- ]\d{3}[- ]\d{4}"),
    ("<IP>", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"),
]


def scrub_pii(col: Column | str) -> Column:
    """Redact every PII pattern in a string column (all occurrences,
    left-to-right, patterns applied in PII_PATTERNS order)."""
    out = F.col(col) if isinstance(col, str) else col
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def count_pii(col: Column | str, kind: str) -> Column:
    """Occurrence count of one pattern (``kind`` is the placeholder name
    without brackets, e.g. ``"EMAIL"``) — the audit number a scrub job
    reports per batch."""
    want = f"<{kind}>"
    for tag, pat in PII_PATTERNS:
        if tag == want:
            src = F.col(col) if isinstance(col, str) else col
            return F.regexp_count(src, F.lit(pat))
    raise ValueError(
        f"unknown PII kind {kind!r} — one of "
        f"{[t[0][1:-1] for t in PII_PATTERNS]}"
    )
