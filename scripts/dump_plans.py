"""Dump .explain('formatted') for named queries() entries to
plans/r06/<name>_<tag>.txt (optimization-round evidence; judge-checkable).

Usage: python scripts/dump_plans.py <before|after> <name> [<name> ...]
"""

from __future__ import annotations

import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spec = importlib.util.spec_from_file_location(
        "entry_mod_plans", os.path.join(ROOT, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs = m.queries()
    from parser_indexer_py_spark.session import get_spark

    spark = get_spark("dump_plans", cores=8)
    out_dir = os.path.join(ROOT, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(p)
        print("wrote", path)


if __name__ == "__main__":
    main()
