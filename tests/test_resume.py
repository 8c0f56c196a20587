"""Kill-and-resume: a crash mid-run replays only unfinished partitions and the
final graph is byte-identical to a single-shot run (north rule)."""

import shutil

import pytest
from pyspark.sql import functions as F

from ontologybasedkgcreation_spark import fixtures
from ontologybasedkgcreation_spark.plans.resume import (
    ASSIGNED_STAGE,
    CheckpointedPipeline,
)


@pytest.fixture()
def pages(spark):
    p, _ = fixtures.pages_df(spark, 16, non_en_every=8)
    return p


def _edge_set(graph):
    return {
        (r["src_key"], r["relationship"], r["dst_key"])
        for r in graph["edges"].collect()
    }


def test_crash_and_resume_identical(spark, pages, tmp_path):
    single = str(tmp_path / "single")
    resumed = str(tmp_path / "resumed")

    # single shot
    cp1 = CheckpointedPipeline(spark, single, n_buckets=8)
    g1 = cp1.run(pages)

    # crash after 3 buckets, then resume
    cp2 = CheckpointedPipeline(spark, resumed, n_buckets=8)
    cp2.run_assigned_stage(pages, fail_after_buckets=3)
    done_after_crash = set(cp2.done_buckets(ASSIGNED_STAGE))
    assert 0 < len(done_after_crash) <= 3
    cp2.run_assigned_stage(pages)  # resume: only the remainder replays
    done_final = set(cp2.done_buckets(ASSIGNED_STAGE))
    assert done_after_crash < done_final
    g2 = cp2.build_graph()

    assert _edge_set(g1) == _edge_set(g2)
    n1 = {r["node_key"] for r in g1["nodes"].select("node_key").collect()}
    n2 = {r["node_key"] for r in g2["nodes"].select("node_key").collect()}
    assert n1 == n2


def test_resume_is_noop_when_done(spark, pages, tmp_path):
    base = str(tmp_path / "cp")
    cp = CheckpointedPipeline(spark, base, n_buckets=8)
    cp.run(pages)
    lineage_rows = spark.read.parquet(cp.lineage_path).count()
    # second invocation: nothing pending -> no new lineage rows
    cp.run_assigned_stage(pages)
    assert spark.read.parquet(cp.lineage_path).count() == lineage_rows


def test_lineage_metrics_present(spark, pages, tmp_path):
    base = str(tmp_path / "cp2")
    cp = CheckpointedPipeline(spark, base, n_buckets=8)
    cp.run_assigned_stage(pages)
    lin = spark.read.parquet(cp.lineage_path)
    assert lin.filter(F.col("stage") == ASSIGNED_STAGE).count() > 0
    assert set(lin.columns) == {"stage", "bucket", "rows", "finished_at", "n_buckets"}
