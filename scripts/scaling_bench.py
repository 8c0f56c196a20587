"""Two-cluster-size scaling evidence (BASELINE.json north rule).

Runs the identical KG-pipeline job on the identical input at two parallelism
levels — local[N] and local[4N] as the in-sandbox stand-in for N vs 4N
executors — and reports pages/sec at both plus scaling efficiency
(eff = throughput_4N / (4 x throughput_N) x 4 ... i.e. speedup/4).

Each level runs in its own subprocess so the JVM/session is cold-started
identically.  Results are appended to BENCH/BASELINE.md.

Usage: python3 scripts/scaling_bench.py [n_pages] [N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from ontologybasedkgcreation_spark.session import get_spark
from ontologybasedkgcreation_spark import fixtures, pipeline

cores = int(sys.argv[1]); n_pages = int(sys.argv[2])
# partitioning is FIXED across legs: the only variable is task slots
# (the in-sandbox analog of executor count); per-stage scheduling cost
# then stays constant and the measurement isolates compute scaling
spark = get_spark('scaling', master=f'local[{{cores}}]', shuffle_partitions=16)
spark.sparkContext.setLogLevel('ERROR')
target_chars = int(sys.argv[3]) if len(sys.argv) > 3 else 20000
pages = fixtures.pages_df_distributed(spark, n_pages, partitions=32,
                                      target_chars=target_chars)
pages = pages.cache(); n = pages.count()
t0 = time.time()
out = pipeline.run_pipeline(spark, pages, with_paragraphs=True)
edges = out['edges'].count(); nodes = out['nodes'].count()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "pages": n, "sec": round(dt, 2),
                   "pages_per_sec": round(n / dt, 2),
                   "nodes": nodes, "edges": edges}}))
"""


def run_level(cores: int, n_pages: int, target_chars: int = 20000) -> dict:
    script = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_pages), str(target_chars)],
        capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    target_chars = int(sys.argv[3]) if len(sys.argv) > 3 else 20000
    lo = run_level(n, n_pages, target_chars)
    print(json.dumps(lo))
    hi = run_level(4 * n, n_pages, target_chars)
    print(json.dumps(hi))
    speedup = hi["pages_per_sec"] / lo["pages_per_sec"]
    eff = speedup / 4.0
    summary = {
        "n_cores": n, "4n_cores": 4 * n, "pages": n_pages, "page_chars": target_chars,
        "throughput_n": lo["pages_per_sec"],
        "throughput_4n": hi["pages_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    header_needed = not os.path.exists(path)
    with open(path, "a") as fh:
        if header_needed:
            fh.write(
                "# BENCH baseline — measured numbers for this engine\n\n"
                "## Scaling evidence (same job, same input, two parallelism "
                "levels — the in-sandbox stand-in for N vs 4N executors)\n\n"
                "| pages | local[N] | pages/s @N | local[4N] | pages/s @4N | "
                "speedup | efficiency |\n|---|---|---|---|---|---|---|\n"
            )
        fh.write(
            f"| {n_pages} | local[{n}] | {lo['pages_per_sec']} | "
            f"local[{4*n}] | {hi['pages_per_sec']} | {summary['speedup']} | "
            f"{summary['scaling_efficiency']} |\n"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
