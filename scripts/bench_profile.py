"""Per-stage task-time decomposition of the bench kg_pipeline shape.

Replicates bench.py's kg_pipeline run (N pages, 20k chars, local[CPUS],
semantic auto) with the Spark event log on, then attributes per-stage
TASK time (executorRunTime — immune to queue-wait misattribution, see
BENCH/BASELINE.md round-6 fixed-cost hunt) to operators via stage
callsites.

Usage: python3 scripts/bench_profile.py [n_pages] [cpus] [runs]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from pyspark.sql import functions as F

    from ontologybasedkgcreation_spark import fixtures, pipeline
    from ontologybasedkgcreation_spark.session import get_spark

    evdir = tempfile.mkdtemp(prefix="evlog_", dir="/dev/shm")
    spark = get_spark(
        "bench-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = fixtures.pages_df_distributed(
        spark, n_pages, partitions=int(cpus) * 2, target_chars=20000
    ).cache()
    pages.count()
    # warm-up pass, same as bench.py
    warm = pages.filter(F.pmod(F.xxhash64("url"), F.lit(10)) == 0)
    pipeline.run_pipeline(spark, warm, with_paragraphs=True)["edges"].count()

    walls = []
    t_timed0 = time.time() * 1000  # ms epoch, to filter events to timed runs
    for _ in range(n_runs):
        t0 = time.time()
        out = pipeline.run_pipeline(spark, pages, with_paragraphs=True)
        out["edges"].count()
        out["nodes"].count()
        walls.append(round(time.time() - t0, 3))
    spark.stop()

    files = []
    for path in glob.glob(f"{evdir}/*"):
        if os.path.isdir(path):
            files.extend(p for p in glob.glob(f"{path}/*") if not os.path.isdir(p))
        else:
            files.append(path)

    # stage id -> info; per-stage summed task executorRunTime + python eval
    stage_info = {}
    task_time = defaultdict(float)   # stage id -> executorRunTime sec
    fetch_wait = defaultdict(float)
    gc_time = defaultdict(float)
    n_tasks_seen = defaultdict(int)
    jobs = []
    for path in files:
        with open(path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerStageSubmitted" or e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    if sid not in stage_info or e == "SparkListenerStageCompleted":
                        stage_info[sid] = {
                            "name": si.get("Stage Name", ""),
                            "n_tasks": si.get("Number of Tasks", 0),
                            "details": (si.get("Details") or "").split("\n")[0],
                            "sub": si.get("Submission Time", 0),
                        }
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    tm = ev.get("Task Metrics") or {}
                    task_time[sid] += tm.get("Executor Run Time", 0) / 1000.0
                    gc_time[sid] += tm.get("JVM GC Time", 0) / 1000.0
                    srm = tm.get("Shuffle Read Metrics") or {}
                    fetch_wait[sid] += srm.get("Fetch Wait Time", 0) / 1000.0
                    n_tasks_seen[sid] += 1
                elif e == "SparkListenerJobStart":
                    jobs.append(
                        {
                            "id": ev["Job ID"],
                            "start": ev["Submission Time"],
                            "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                            "desc": ((ev.get("Properties") or {}).get(
                                "callSite.short", ""))[:80],
                        }
                    )
                elif e == "SparkListenerJobEnd":
                    for j in jobs:
                        if j["id"] == ev["Job ID"]:
                            j["end"] = ev["Completion Time"]

    print(f"walls={walls} (timed runs, excl. warm-up)")

    # only stages submitted during the timed window
    timed_sids = [
        sid for sid, si in stage_info.items() if si["sub"] >= t_timed0
    ]
    total_task = sum(task_time[s] for s in timed_sids)
    print(f"total task time (timed window): {total_task:.1f}s over {len(timed_sids)} stages")
    rows = sorted(timed_sids, key=lambda s: -task_time[s])
    print(f"{'stage':>6} {'task_s':>8} {'gc_s':>6} {'fetchw':>7} {'ntask':>6}  name / callsite")
    for sid in rows[:40]:
        si = stage_info[sid]
        print(
            f"{sid:>6} {task_time[sid]:>8.1f} {gc_time[sid]:>6.1f} "
            f"{fetch_wait[sid]:>7.1f} {n_tasks_seen[sid]:>6}  "
            f"{si['name'][:40]} | {si['details'][:60]}"
        )

    # aggregate by stage-name prefix (operator-ish grouping)
    by_name = defaultdict(float)
    for sid in timed_sids:
        key = stage_info[sid]["name"].split(" at ")[-1][:60]
        by_name[key] += task_time[sid]
    print("\nby callsite:")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v:>8.1f}s  {k}")

    # driver gaps between jobs in the timed window
    jobs = [j for j in jobs if "end" in j and j["start"] >= t_timed0]
    jobs.sort(key=lambda j: j["start"])
    prev_end = None
    total_gap = 0.0
    for j in jobs:
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = max(prev_end or j["end"], j["end"])
        if gap > 0:
            total_gap += gap
    print(f"\njobs in timed window: {len(jobs)}, driver gap total: {total_gap:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
