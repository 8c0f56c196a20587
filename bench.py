"""Benchmark harness — prints ONE JSON line for the driver.

Headline load: the KG-construction pipeline (pages -> canonical graph) on
deterministic synthetic judgment pages, plus representative operator queries
over $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "pages_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _fast_tmp():
    """tmpfs scratch (matches __spark_entry__._fast_tmp): keeps the
    reconcile batch tables off virtio disk, like the shuffle dirs."""
    return "/dev/shm" if os.path.isdir("/dev/shm") else None
# 16 threads, not 32: one JVM's pandas-UDF stages anti-scale past ~16 task
# threads on this box (measured 2367 p/s @16 vs 1734 @32 on the identical
# 200k-page job) — the real-cluster analog is 4-8-core executors, which is
# the regime the scaling table in BENCH/BASELINE.md evidences
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "16")
# 200k pages x 20 KB = 4 GB of text: kg_pipeline wall time is dominated by
# parallel work, not the ~30-60 s fixed driver overhead, so pages_per_sec
# measures the engine (4k pages measured ~98% overhead; 200k is the
# empirical knee on this box)
N_PAGES = int(os.environ.get("BENCH_PAGES", "200000"))
PAGE_CHARS = int(os.environ.get("BENCH_PAGE_CHARS", "20000"))

BENCH_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "chunk_chain",
    "dedup_exact",
    "dedup_jaccard",
    "dedup_jaccard_lsh",
    "minhash_lsh",
    "simhash",
    "embedding_topk",
    "embedding_neardup",
    "embedding_neardup_lsh",
    "ivf_assign",
    "dedup_resolve",
    "stream_dedup",
    "stream_dedup_jvm",
    "lang_id",
    "token_stats",
]


def host_calibration(spark) -> tuple[float, list[float]]:
    """Fixed JVM-only probe timed FIRST, so the host's speed that day is
    recorded inside the artifact: a pinned 48M-row codegen aggregation
    (range -> xxhash64 -> arithmetic -> one agg) with no Python, no disk,
    no shuffle beyond the final reduce.  Identical work every round — the
    ratio of two rounds' ``host_calibration_sec`` is the host-speed ratio,
    which makes a cross-round headline swing attributable (engine vs host)
    from the JSON alone.  min-of-3 (the first run JIT-warms the JVM and
    routinely reads ~6x slower than warm, so the min needs two warm
    samples behind it)."""
    from pyspark.sql import functions as F

    runs = []
    for _ in range(3):
        t0 = time.time()
        (
            spark.range(0, 48_000_000, 1, int(CPUS))
            .select(
                F.xxhash64("id").alias("h"),
                (F.col("id") * 2654435761 % 1000003).alias("m"),
            )
            .agg(
                F.sum(F.col("h") % 1024).alias("s"),
                F.approx_count_distinct("m").alias("d"),
            )
            .collect()
        )
        runs.append(round(time.time() - t0, 3))
    return min(runs), runs


def main() -> int:
    import statistics

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from ontologybasedkgcreation_spark import fixtures, pipeline
    from ontologybasedkgcreation_spark.session import get_spark

    spark = get_spark(
        "ontokg-bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")

    cal_sec, cal_runs = host_calibration(spark)

    timings: dict[str, float] = {}

    # headline: KG pipeline pages/sec.  MEDIAN of three runs in one warm
    # JVM: this host's shared tenancy shows rare 2-3x slow modes on
    # identical code+data (73s / 104s / 237s observed for the same job);
    # the median tolerates one slow-mode sample without hiding a real
    # regression the way min-of-k can, and all raw timings are reported in
    # kg_pipeline_runs so the artifact is self-explaining.
    pages = fixtures.pages_df_distributed(spark, N_PAGES, partitions=int(CPUS) * 2,
                                      target_chars=PAGE_CHARS)
    pages = pages.cache()
    n_pages = pages.count()  # materialize input outside the timed region
    # SHORT UNTIMED WARM-UP of the exact pipeline shape (r5 verdict item 2:
    # the driver's three raws were still descending — JVM codegen, Python
    # workers, broadcast machinery and the semantic-trainer code paths all
    # warm on the first pass).  A 10%-subset run warms every stage at ~10%
    # of a timed run's cost; the 3 timed runs keep median-of-3 semantics.
    warm = pages.filter(F.pmod(F.xxhash64("url"), F.lit(10)) == 0)
    pipeline.run_pipeline(spark, warm, with_paragraphs=True)["edges"].count()
    kg_runs = []
    for _ in range(3):
        t0 = time.time()
        out = pipeline.run_pipeline(spark, pages, with_paragraphs=True)
        n_edges = out["edges"].count()
        n_nodes = out["nodes"].count()
        kg_runs.append(round(time.time() - t0, 3))
    kg_sec = statistics.median(kg_runs)
    timings["kg_pipeline"] = kg_sec

    qs = entry.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)

    # cross-batch reconcile (streaming maintenance's periodic global
    # reduce): 2-batch incremental build (untimed setup), timed reconcile —
    # the full N-batch vs single-shot comparison is scripts/reconcile_bench.py
    import shutil
    import tempfile

    from pyspark.sql import functions as SF

    from ontologybasedkgcreation_spark.operators.materialize import GraphWriter
    from ontologybasedkgcreation_spark.streaming import ingest

    rec_base = tempfile.mkdtemp(prefix="bench_reconcile_", dir=_fast_tmp())
    try:
        writer = GraphWriter(os.path.join(rec_base, "graph"), buckets=32)
        rec_pages = fixtures.pages_df_distributed(
            spark, 10_000, partitions=int(CPUS)
        )
        for b in range(2):
            part = rec_pages.filter(SF.pmod(SF.xxhash64("url"), SF.lit(2)) == b)
            rout = pipeline.run_pipeline(spark, part, with_paragraphs=False)
            writer.merge("nodes", rout["nodes"], key="node_key")
            writer.merge("edges", rout["edges"], key="url")
        t0 = time.time()
        ingest.reconcile_graph(spark, writer)
        timings["reconcile"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(rec_base, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "kg_pipeline+operator suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "kg_pipeline_runs": kg_runs,
                # headline is MEDIAN-OF-3 IN ONE WARM JVM; raw timings above
                # keep it apples-to-apples across rounds
                "headline_mode": "median_of_3_warm",
                # fixed JVM-only probe timed before everything else: compare
                # across rounds to separate host-speed swings from engine
                # changes (see host_calibration docstring + BENCH/BASELINE.md)
                "host_calibration_sec": cal_sec,
                "host_calibration_runs": cal_runs,
                "pages": n_pages,
                "pages_per_sec": round(n_pages / kg_sec, 2),
                "nodes": n_nodes,
                "edges": n_edges,
                "cpus": int(CPUS),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
