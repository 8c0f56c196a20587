"""Regression tests for the round-1 ADVICE findings.

- pages.extract_pages must survive rows that carry text but NULL html
  (Spark evaluates pandas-UDF arguments unconditionally inside F.when).
- chunking queries must emit NO rows for empty documents (DuckDB
  generate_series(0,-1) is empty; Spark sequence(0,-1) is descending).
- shingle tokenization must match the oracle on multi-whitespace text.
- connected_components must converge on long chains (pointer doubling)
  and raise loudly, not return silently, when the cap is hit.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ontologybasedkgcreation_spark.sources.pages import extract_pages


def test_text_only_rows_do_not_crash(spark):
    """A populated-text / NULL-html row flows through untouched."""
    df = spark.createDataFrame(
        [
            ("u1", None, None, "already extracted", "en"),
            ("u2", None, b"<html><body><pre>from html</pre></body></html>", None, "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = {r["url"]: r["text"] for r in extract_pages(df).collect()}
    assert out == {"u1": "already extracted", "u2": "from html"}


def test_rederive_handles_null_html(spark):
    """prefer_existing_text=False with NULL html decodes to ''."""
    df = spark.createDataFrame(
        [("u1", None, None, "ignored", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    rows = extract_pages(df, prefer_existing_text=False).collect()
    assert rows[0]["text"] == ""


def test_empty_doc_produces_no_chunks(spark, tmp_path):
    import __spark_entry__ as entry

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "", "en"), (2, "short doc", "en")],
        "doc_id long, text string, lang string",
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    rows = entry.q_chunk_fixed(spark, sf).collect()
    assert {r["doc_id"] for r in rows} == {2}
    assert all(r["chunk_index"] >= 0 for r in rows)


def test_shingles_multiwhitespace_matches_oracle(spark, tmp_path):
    """Newlines/tabs/double spaces tokenize identically Spark-vs-DuckDB."""
    duckdb = pytest.importorskip("duckdb")
    import __spark_entry__ as entry
    from ontologybasedkgcreation_spark.operators import dedup

    sf = str(tmp_path)
    text = "a  b\tc\nd e  f\n\ng h"
    spark.createDataFrame(
        [(1, text, "en"), (2, text.replace("\n", " "), "en")],
        "doc_id long, text string, lang string",
    ).write.parquet(os.path.join(sf, "documents.parquet"))

    spark_sh = {
        (r["doc"], r["shingle"])
        for r in dedup.shingles(
            spark.read.parquet(os.path.join(sf, "documents.parquet")),
            "doc_id",
            "text",
            n=3,
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'documents.parquet')}/*.parquet')"
    )
    oracle_sh = set(
        con.execute(entry._SHINGLE_CTE + "SELECT doc, shingle FROM sh").fetchall()
    )
    assert spark_sh == oracle_sh
    # identical token stream regardless of whitespace kind => same shingles
    assert {s for d, s in spark_sh if d == 1} == {s for d, s in spark_sh if d == 2}


def test_cc_converges_on_long_chain(spark):
    from ontologybasedkgcreation_spark.operators.linking import (
        connected_components,
    )

    n = 40  # diameter 40 chain: old linear propagation needed 40 rounds
    pairs = spark.createDataFrame(
        [(f"k{i:03d}", f"k{i + 1:03d}") for i in range(n)], "a string, b string"
    )
    comp = {r["pre_key"]: r["comp"] for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {"k000"}
    assert len(comp) == n + 1


def test_cc_raises_at_iteration_cap(spark):
    from ontologybasedkgcreation_spark.operators.linking import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(f"k{i:03d}", f"k{i + 1:03d}") for i in range(12)], "a string, b string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1)


def test_degenerate_pages_flow_through(spark):
    """Tag-soup html (no <pre>), empty text, duplicate urls, and non-en
    rows must flow through the whole pipeline without crash and without
    spurious triples."""
    from ontologybasedkgcreation_spark import pipeline

    rows = [
        ("d1", None, b"<div><p>no pre block <b>here", None, "en"),   # tag soup
        ("d2", None, b"", None, "en"),                                # empty html
        ("d3", None, None, "", "en"),                                 # empty text
        ("d4", None, b"<html><pre>plain words only</pre></html>", None, "hi"),
        ("dup", None, None, "same text", "en"),
        ("dup", None, None, "same text", "en"),                       # duplicate url
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = pipeline.run_pipeline(spark, pages, with_paragraphs=True)
    assert out["raw_triples"].count() == 0           # nothing judgment-shaped
    assert out["nodes"].count() == 0
    texts = {r["url"]: r["text"] for r in out["extracted"].collect()}
    assert texts["d1"] == "no pre block here"        # tag-strip fallback
    assert texts["d2"] == ""
    assert out["extracted"].count() == len(rows)     # duplicates pass through


def test_case_metadata_fallback_unnamed_header(spark):
    """A document whose extraction missed hasCaseName on every hasRulingOf
    triple still emits its CaseMetadata record (earliest triple wins) —
    the reference emits metadata per document unconditionally."""
    from ontologybasedkgcreation_spark.operators import materialize

    rows = [
        # named header doc: named triple wins over an earlier unnamed decoy
        ("u1", 0, "t0", "CourtCase", {"hasCaseID": "prior", "hasCaseName": ""},
         "hasRulingOf", {"courtName": "X Court"}),
        ("u1", 5, "t1", "CourtCase",
         {"hasCaseID": "c1", "hasCaseName": "A v B"},
         "hasRulingOf", {"courtName": "Y Court"}),
        # unnamed-only doc: fallback to the earliest triple
        ("u2", 7, "t2", "CourtCase", {"hasCaseID": "c2", "hasCaseName": ""},
         "hasRulingOf", {"courtName": "Z Court"}),
        ("u2", 9, "t3", "CourtCase", {"hasCaseID": "c3", "hasCaseName": ""},
         "hasRulingOf", {"courtName": "W Court"}),
    ]
    assigned = spark.createDataFrame(
        [
            (url, span, tid, t1, p1, rel, p2)
            for url, span, tid, t1, p1, rel, p2 in rows
        ],
        "url string, span_start long, triple_id string, node1_type string, "
        "node1_props map<string,string>, relationship string, "
        "node2_props map<string,string>",
    )
    recs = {
        r["url"]: (r["hasCaseID"], r["hasCourtName"], r["hasCaseName"])
        for r in materialize.case_metadata_records(assigned).collect()
    }
    assert recs == {
        "u1": ("c1", "Y Court", "A v B"),
        "u2": ("c2", "Z Court", ""),
    }
