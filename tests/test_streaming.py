"""Structured Streaming ingestion: the streaming path must produce the same
assigned triples as the batch path, exactly once, and the watermarked window
metrics must aggregate by event time."""

import pytest
from pyspark.sql import functions as F

from ontologybasedkgcreation_spark import fixtures
from ontologybasedkgcreation_spark.operators import properties, validate
from ontologybasedkgcreation_spark.operators.extract import extract_triples
from ontologybasedkgcreation_spark.ontology import load_ontology
from ontologybasedkgcreation_spark.sources.pages import extract_pages
from ontologybasedkgcreation_spark.streaming import ingest


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    pages, _ = fixtures.pages_df(spark, 10, non_en_every=5)
    src = str(base / "pages_in")
    pages.write.parquet(src)
    return base, src, pages


def test_stream_matches_batch(spark, staged):
    base, src, pages = staged
    stream = ingest.read_page_stream(spark, src, max_files_per_trigger=2)
    assert stream.isStreaming
    assigned_stream = ingest.streaming_assigned_triples(spark, stream)
    out = str(base / "triples_out")
    ckpt = str(base / "ckpt")
    q = ingest.start_triples_sink(assigned_stream, out, ckpt, available_now=True)
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    # batch reference
    onto = load_ontology()
    batch = properties.assign_and_titlecase(
        validate.validate_triples(spark, extract_triples(extract_pages(pages)), onto)[
            "validated"
        ]
    )
    g = {r["triple_id"] for r in got.select("triple_id").collect()}
    b = {r["triple_id"] for r in batch.select("triple_id").collect()}
    assert g == b and len(g) > 0


def test_stream_restart_is_exactly_once(spark, staged):
    base, src, _ = staged
    out = str(base / "triples_out")
    ckpt = str(base / "ckpt")
    before = spark.read.parquet(out).count()
    # restarting over the same checkpoint with no new files appends nothing
    stream = ingest.read_page_stream(spark, src)
    assigned = ingest.streaming_assigned_triples(spark, stream)
    q = ingest.start_triples_sink(assigned, out, ckpt, available_now=True)
    q.awaitTermination(300)
    assert spark.read.parquet(out).count() == before


def test_page_rate_metrics_windows(spark, staged):
    base, src, pages = staged
    stream = ingest.read_page_stream(spark, src)
    metrics = ingest.page_rate_metrics(
        stream, window="10 minutes", slide="10 minutes", watermark="1 hour"
    )
    q = (
        metrics.writeStream.format("memory")
        .queryName("page_rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from page_rates").collect()
    assert len(rows) > 0
    total = sum(r["n_pages"] for r in rows)
    assert total == pages.count()
    langs = {r["lang"] for r in rows}
    assert "en" in langs and "hi" in langs


def test_streaming_graph_maintenance_two_batches(spark, tmp_path):
    """foreachBatch + GraphWriter.merge: two page drops arrive as separate
    micro-batches; the graph tables hold BOTH batches' urls, and replaying
    the stream over the same checkpoint adds nothing."""
    from ontologybasedkgcreation_spark.operators.materialize import GraphWriter

    src = str(tmp_path / "pages_in")
    pages, _ = fixtures.pages_df(spark, 6, non_en_every=0)
    # two physical files -> two micro-batches at maxFilesPerTrigger=1
    pages.filter(F.xxhash64("url") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    pages.filter(F.xxhash64("url") % 2 != 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    writer = GraphWriter(str(tmp_path / "graph"), buckets=8)
    stream = ingest.read_page_stream(spark, src, max_files_per_trigger=1)
    q = ingest.start_graph_maintenance(
        stream, writer, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(600)

    edges = spark.read.parquet(str(tmp_path / "graph/edges"))
    urls = {r["url"] for r in edges.select("url").distinct().collect()}
    expected = {r["url"] for r in pages.select("url").collect()}
    assert urls == expected
    n_edges = edges.count()
    n_nodes = spark.read.parquet(str(tmp_path / "graph/nodes")).count()
    assert n_edges > 0 and n_nodes > 0

    # replay: same checkpoint, no new files -> byte-idempotent tables
    q2 = ingest.start_graph_maintenance(
        ingest.read_page_stream(spark, src, max_files_per_trigger=1),
        writer,
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q2.awaitTermination(600)
    assert spark.read.parquet(str(tmp_path / "graph/edges")).count() == n_edges
    assert spark.read.parquet(str(tmp_path / "graph/nodes")).count() == n_nodes
