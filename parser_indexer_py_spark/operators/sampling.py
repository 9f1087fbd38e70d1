"""Deterministic hash-gate sampling — the training-data-pipeline
sampling operators (corpus mixing / per-language throttling).

Why not ``df.sample``/``sampleBy``: Spark's samplers draw from a
per-partition seeded RNG, so the kept set CHANGES with partitioning,
cluster size, and task retries — at 10^12 rows that breaks resumability
(a re-run after a lost executor keeps different rows) and
reproducibility across the N- and 4N-executor runs the north rule
compares. A hash gate is a PURE FILTER: keep a row iff
``md5(salt + id) % M < fraction * M``. No RNG state, no shuffle, no
driver coordination; the decision is a property of the row, identical on
any cluster at any parallelism, and Catalyst pushes the surviving
columns straight to the scan. The md5 gate is the same portable
hash-twin idiom the dedup family uses (entry_queries._md5_long) so a
DuckDB oracle reproduces the exact kept set.

Statistical note: md5 is uniform on the gate range, so the kept fraction
converges to ``fraction`` with the usual binomial concentration; unlike
RNG sampling the same id is kept at every fraction above its gate value
— nested samples are MONOTONE (a 10% sample is a subset of the 20%
sample with the same salt), which is exactly what staged training-data
ablations want. Different ``salt`` values give independent gates."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "GATE_MOD",
    "assign_splits",
    "sample_by_column",
    "sample_hash_gate",
    "sample_stratified",
]

GATE_MOD = 1_000_000  # gate resolution: fractions quantize to 1e-6


def _gate(id_col, salt: str):
    """md5-derived gate value in [0, GATE_MOD) — _md5_long's 60-bit
    positive hash of ``salt || '#' || id``, reduced mod GATE_MOD."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}#"), id_col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(GATE_MOD))


def sample_hash_gate(
    df: DataFrame, id_col: str, fraction: float, *, salt: str = "s1"
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by ``id_col``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    thr = int(round(fraction * GATE_MOD))
    return df.filter(_gate(F.col(id_col), salt) < F.lit(thr))


def sample_stratified(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict,
    *,
    default: float = 0.0,
    salt: str = "s1",
) -> DataFrame:
    """Per-stratum hash-gate sampling: row kept iff its gate value falls
    under its stratum's fraction (``default`` for unlisted strata) — the
    corpus-mixing operator (e.g. keep 50% of en, 20% of de, 10% of the
    rest). One whole-stage-codegen'd filter; zero shuffles."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction {v} for stratum {k!r} outside [0, 1]")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default fraction {default} outside [0, 1]")
    thr = F.lit(int(round(default * GATE_MOD)))
    for k, v in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(k), F.lit(int(round(v * GATE_MOD)))
        ).otherwise(thr)
    return df.filter(_gate(F.col(id_col), salt) < thr)


def assign_splits(
    df: DataFrame,
    id_col: str,
    splits: dict,
    *,
    salt: str = "s1",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: one ``out_col`` label per
    row, carved from DISJOINT ranges of the same md5 gate (fractions in
    iteration-stable sorted-key order; they must sum to 1 within gate
    resolution). Disjointness and exhaustiveness hold by construction —
    a row is in exactly one split, on any cluster, forever; changing
    ``salt`` reshuffles the assignment. The standard leakage guard:
    membership is a pure function of the row id, so re-runs, retries,
    and later incremental appends can never move a row across splits."""
    total = sum(splits.values())
    if abs(total - 1.0) * GATE_MOD > 1:
        raise ValueError(f"split fractions sum to {total}, need 1.0")
    if not splits:
        raise ValueError("no splits given")
    g = _gate(F.col(id_col), salt)
    expr = None
    hi = 0
    names = sorted(splits)
    for name in names[:-1]:
        hi += int(round(splits[name] * GATE_MOD))
        cond = g < F.lit(hi)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def sample_by_column(
    df: DataFrame, id_col: str, fraction_col, *, salt: str = "s1"
) -> DataFrame:
    """Per-ROW keep probability from a column or expression (values in
    [0, 1] — e.g. a quality score driving quality-weighted downsampling):
    keep iff ``gate(id) < fraction * GATE_MOD``. Same gate as the flat
    sampler, so determinism, partitioning-invariance, and monotonicity
    in the fraction all carry over; out-of-range fractions clamp."""
    frac = (
        F.col(fraction_col) if isinstance(fraction_col, str) else fraction_col
    )
    thr = F.least(
        F.lit(GATE_MOD),
        F.greatest(F.lit(0), (frac * GATE_MOD).cast("bigint")),
    )
    return df.filter(_gate(F.col(id_col), salt) < thr)
