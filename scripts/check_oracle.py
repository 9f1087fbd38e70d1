"""Local replica of the driver's correctness harness: run every
``queries()`` entry at sf0.01 and diff it against ``oracle_sql()`` through
DuckDB (row count + column names + order-insensitive value comparison).

Usage: python scripts/check_oracle.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from parser_indexer_py_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if sorted(a.columns) != sorted(b.columns):
        return f"columns differ: {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"row count differs: {len(a)} vs {len(b)}"
    a, b = normalize(a), normalize(b)

    def feq(x, y) -> bool:
        # numpy float32/float64 scalars are NOT Python-float subclasses in
        # every code path; coerce instead of isinstance-gating, and treat
        # an uncoercible side (dtype skew) as a mismatch
        try:
            fx, fy = float(x), float(y)
        except (TypeError, ValueError):
            return False
        return fx == fy or (math.isnan(fx) and math.isnan(fy))

    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if str(a[c].dtype).startswith("float") or str(b[c].dtype).startswith("float"):
            bad = [i for i, (x, y) in enumerate(zip(av, bv)) if not feq(x, y)]
        else:
            bad = [i for i, (x, y) in enumerate(zip(av, bv)) if x != y]
        if bad:
            i = bad[0]
            return f"col {c}: {len(bad)} mismatches, first@{i}: {av[i]!r} vs {bv[i]!r}"
    return None


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = get_spark("check-oracle", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, sqls = entry_mod.queries(), entry_mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL unknown query names: {sorted(unknown)}")
        return 1
    failures = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
            want = con.sql(sqls[name]).fetchdf() if name in sqls else None
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            failures += 1
            continue
        if want is None:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            continue
        err = compare(got, want)
        dt = time.time() - t0
        if err:
            print(f"FAIL {name} ({dt:.1f}s): {err}")
            failures += 1
        else:
            print(f"OK   {name} ({dt:.1f}s, rows={len(got)})")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
