"""Capture .explain('formatted') output for every query/operator path the
round-7 optimization touched, into plans/r07/<name>_{before,after}.txt.

Run from the repo whose code should be captured:

    python scripts/capture_plans_r07.py after /root/repo/plans/r07
    (cd <worktree-at-round-start> && python scripts/capture_plans_r07.py \
        before /root/repo/plans/r07)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.getcwd())


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.getcwd(), "plans", "r07")
    )
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entry
    from ontologybasedkgcreation_spark import fixtures, pipeline
    from ontologybasedkgcreation_spark.session import get_spark

    spark = get_spark(
        "capture-plans-r07", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    SF_DIR = "/root/testdata/sf0.01"

    def cap(name, df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(buf.getvalue())
        print("wrote", path)

    qs = entry.queries()
    for q in (
        "dedup_exact",
        "dedup_jaccard",
        "dedup_jaccard_lsh",
        "minhash_lsh",
        "dedup_resolve",
        "simhash",
        "decontaminate",
        "duplicate_spans",
        "embedding_neardup",
        "embedding_neardup_lsh",
        "cooccur",
    ):
        if q in qs:
            try:
                cap(q, qs[q](spark, SF_DIR))
            except Exception as e:  # query may not exist at round start
                print(f"skip {q}: {e}")

    # pipeline-internal frames (the kg_pipeline headline path)
    pages, _ = fixtures.pages_df(spark, 24)
    out = pipeline.run_pipeline(spark, pages, with_paragraphs=False,
                                semantic="off")
    cap("kg_raw_triples", out["raw_triples"])
    # the checkpointed `assigned` plan is an ExistingRDD — capture the
    # pre-checkpoint assignment stage (where the Python boundary shape
    # changed) instead
    from ontologybasedkgcreation_spark.operators import properties

    cap("kg_assigned", properties.assign_and_titlecase(out["validated"]))
    cap("kg_edges", out["edges"])
    cap("kg_nodes", out["nodes"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
