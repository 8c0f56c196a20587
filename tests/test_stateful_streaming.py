"""applyInPandasWithState online exact-dedup: each distinct text passes the
gate once — within a batch, across micro-batches, and across query restarts
(state rides the checkpoint)."""

import datetime

from pyspark.sql import functions as F

from ontologybasedkgcreation_spark.streaming import ingest, stateful

TS0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _pages(spark, rows):
    """rows: [(url, minutes_offset, text, lang)]"""
    return spark.createDataFrame(
        [
            (u, TS0 + datetime.timedelta(minutes=m), None, t, lang)
            for (u, m, t, lang) in rows
        ],
        ingest.PAGES_SCHEMA_DDL,
    )


def _run(spark, src, out, ckpt, ttl=None):
    stream = ingest.read_page_stream(spark, src, max_files_per_trigger=4)
    deduped = stateful.streaming_dedup_exact(stream, ttl=ttl)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _emitted(spark, out):
    return {
        (r["url"], r["text"], r["n_in_batch"])
        for r in spark.read.parquet(out).collect()
    }


def test_dedup_within_and_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: "alpha" twice (earliest url wins), "beta" once
    _pages(
        spark,
        [
            ("u2", 5, "alpha text", "en"),
            ("u1", 1, "alpha text", "en"),
            ("u3", 2, "beta text", "en"),
        ],
    ).write.parquet(src)
    _run(spark, src, out, ckpt)
    assert _emitted(spark, out) == {
        ("u1", "alpha text", 2),
        ("u3", "beta text", 1),
    }

    # batch 2 (same checkpoint -> state survives the restart): a re-crawl of
    # "alpha" is absorbed silently; "gamma" is new
    _pages(
        spark,
        [
            ("u4", 10, "alpha text", "en"),
            ("u5", 11, "gamma text", "hi"),
        ],
    ).write.mode("append").parquet(src)
    _run(spark, src, out, ckpt)
    assert _emitted(spark, out) == {
        ("u1", "alpha text", 2),
        ("u3", "beta text", 1),
        ("u5", "gamma text", 1),
    }

    # replay with no new files: exactly-once, nothing re-emitted
    _run(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == 3


def test_dedup_ttl_mode_runs_with_watermark(spark, tmp_path):
    """TTL mode wires EventTimeTimeout + watermark; the first batch must
    still dedup (timeout expiry needs watermark movement across batches,
    which the bounded availableNow replay only exercises for liveness)."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _pages(
        spark,
        [
            ("u1", 1, "alpha text", "en"),
            ("u2", 500, "alpha text", "en"),
            ("u3", 500, "beta text", "en"),
        ],
    ).write.parquet(src)
    _run(spark, src, out, ckpt, ttl="1 hour")
    got = _emitted(spark, out)
    assert {(u, t) for (u, t, _) in got} == {
        ("u1", "alpha text"),
        ("u3", "beta text"),
    }


def test_dedup_ttl_expiry_drops_state_and_reemits(spark, tmp_path):
    """The bounded-state contract of TTL'd streaming dedup, pinned end to
    end: once the event-time watermark passes a key's (first_ts + ttl), the
    key's state is DROPPED (the ``state.hasTimedOut -> state.remove`` branch
    fires), and the same content arriving afterwards RE-EMITS as a fresh
    first occurrence — while keys still inside their TTL keep absorbing
    duplicates.  ttl='1 hour', watermark delay 30 min (the operator
    default); the watermark available to batch N is computed from data up
    to batch N-1, hence the spacing below.

    batch 1 (t=0):    'alpha'       -> emit; timeout armed for t+60min
    batch 2 (t=200):  'filler one'  -> emit; watermark after batch = 170min
    batch 3 (t=400):  'filler two'  -> emit; runs WITH watermark 170 > 60
                                       => alpha's state is removed
    batch 4 (t=410):  'alpha' again -> RE-EMITS (state was dropped)
                      'filler two'  -> absorbed (armed to 460 > wm 370)
    """
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batches = [
        [("a1", 0, "alpha text", "en")],
        [("f1", 200, "filler one", "en")],
        [("f2", 400, "filler two", "en")],
        [("a2", 410, "alpha text", "en"), ("f3", 415, "filler two", "en")],
    ]
    mode = "overwrite"
    for rows in batches:
        _pages(spark, rows).write.mode(mode).parquet(src)
        mode = "append"
        _run(spark, src, out, ckpt, ttl="1 hour")

    got = _emitted(spark, out)
    alpha_urls = {u for (u, t, _) in got if t == "alpha text"}
    # expired key re-emitted: both occurrences of alpha passed the gate
    assert alpha_urls == {"a1", "a2"}
    # un-expired key still dedups: 'filler two' emitted exactly once
    assert {u for (u, t, _) in got if t == "filler two"} == {"f2"}
    assert {u for (u, t, _) in got if t == "filler one"} == {"f1"}
    assert len(got) == 4


def test_dedup_null_text_is_a_key(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _pages(
        spark,
        [("u1", 1, None, "en"), ("u2", 2, None, "en"), ("u3", 3, "x", "en")],
    ).write.parquet(src)
    _run(spark, src, out, ckpt)
    got = _emitted(spark, out)
    assert ("u1", None, 2) in got and ("u3", "x", 1) in got and len(got) == 2


def test_dedup_jvm_fast_path(spark, tmp_path):
    """streaming_dedup_exact_jvm (built-in dropDuplicates state, no
    Python): one row per distinct content within and across batches with
    checkpointed exactly-once, matching the pandas-state op on every
    content-pure column; within_watermark mode runs.  WHICH duplicate row
    survives is engine order — only content-pure projections are
    asserted."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _pages(
        spark,
        [
            ("u2", 5, "alpha text", "en"),
            ("u1", 1, "alpha text", "en"),
            ("u3", 2, "beta text", "en"),
        ],
    ).write.parquet(src)

    def run():
        stream = ingest.read_page_stream(spark, src, max_files_per_trigger=4)
        q = (
            stateful.streaming_dedup_exact_jvm(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()
    texts = sorted(r["text"] for r in spark.read.parquet(out).collect())
    assert texts == ["alpha text", "beta text"]
    # across batches via the same checkpoint: re-crawl absorbed, new text
    # passes
    _pages(
        spark,
        [("u4", 10, "alpha text", "en"), ("u5", 11, "gamma text", "hi")],
    ).write.mode("append").parquet(src)
    run()
    texts = sorted(r["text"] for r in spark.read.parquet(out).collect())
    assert texts == ["alpha text", "beta text", "gamma text"]
    # exactly-once on replay
    run()
    assert spark.read.parquet(out).count() == 3
    # the bounded-state variant also runs end-to-end
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    stream = ingest.read_page_stream(spark, src, max_files_per_trigger=10)
    q = (
        stateful.streaming_dedup_exact_jvm(stream, within_watermark=True)
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ckpt2)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert spark.read.parquet(out2).count() >= 3
