"""N-vs-4N scaling evidence (BASELINE.md §2): run the identical index-build
job at local[8] and local[32] in fresh JVMs on the same deterministic input,
report throughput at both and the scaling efficiency, and append the table
to BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [n_convs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from parser_indexer_py_spark.session import get_spark
from parser_indexer_py_spark.datagen import generate_transcripts
from parser_indexer_py_spark.index.build import build_index
from parser_indexer_py_spark.index.search import load_index, search

cores = int(sys.argv[1]); n_convs = int(sys.argv[2]); out = sys.argv[3]
shutil.rmtree(out, ignore_errors=True)
spark = get_spark(f"scaling-{{cores}}", cores=cores)
t0 = time.time()
df = generate_transcripts(spark, n_convs)
build_index(spark, df, out, n_chunks=1, checkpoint_input=True)
build_s = time.time() - t0
idx = load_index(spark, out)
t0 = time.time()
top = [(r["doc_id"], round(r["score"], 10)) for r in
       search(idx, "bace cedi wedi rikizudi", k=10, with_meta=False).collect()]
search_s = time.time() - t0
print("RESULT " + json.dumps({{"cores": cores, "n_docs": idx.n_docs,
      "build_s": build_s, "tps": idx.n_docs / build_s,
      "search_s": search_s, "top10": top}}))
"""


def run_at(cores: int, n_convs: int) -> dict:
    job = JOB.format(repo=REPO)
    out = f"/tmp/scaling_idx_{cores}"
    p = subprocess.run(
        [sys.executable, "-c", job, str(cores), str(n_convs), out],
        capture_output=True, text=True, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail:\n{p.stderr[-2000:]}")


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    r8 = run_at(8, n_convs)
    r32 = run_at(32, n_convs)
    assert r8["n_docs"] == r32["n_docs"], "corpora differ between runs!"
    assert r8["top10"] == r32["top10"], (
        "top-10 NOT rank-identical between parallelism levels:\n"
        f"{r8['top10']}\nvs\n{r32['top10']}"
    )
    eff = (r32["tps"] / r8["tps"]) / (32 / 8)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(path, "a") as f:
        f.write(
            f"""
## Scaling run {stamp} (n_convs={n_convs}, docs={r8['n_docs']})

Same deterministic input, same job, fresh JVM per run (sandbox stand-in for
N vs 4N executors per BASELINE.md §2).

| parallelism | build s | turns/sec | search s |
|---|---|---|---|
| local[8]  | {r8['build_s']:.1f} | {r8['tps']:.0f} | {r8['search_s']:.2f} |
| local[32] | {r32['build_s']:.1f} | {r32['tps']:.0f} | {r32['search_s']:.2f} |

**Scaling efficiency (8 -> 32 cores): {eff:.2f}** (target >= 0.8)

Top-10 docIDs AND scores verified rank-identical between the two runs.
"""
        )
    print(json.dumps({"eff": eff, "tps8": r8["tps"], "tps32": r32["tps"]}))


if __name__ == "__main__":
    main()
