"""Parity operators: E3 JSON triple parsing, S5 abbreviation tool, M5
format_triples, R1 node feature vectors."""

import json

import pytest
from pyspark.sql import functions as F

from ontologybasedkgcreation_spark.operators.extract import (
    VALUE,
    parse_triples_json,
)
from ontologybasedkgcreation_spark.operators.linking import (
    find_abbreviation,
    load_abbreviations,
)
from ontologybasedkgcreation_spark.operators.materialize import (
    format_triples,
    node_feature_vectors,
)

RESP = json.dumps(
    {
        "Data": [
            {
                "node1_type": "CourtCase",
                "node1_value": {"hasCaseID": "CR/1987/11"},
                "relationship": "hasJudge",
                "node2_type": "Judge",
                "node2_value": "Hrushikesh Roy",
            },
            {
                "node1_type": None,
                "node1_value": "x",
                "relationship": "bad",
                "node2_type": "Y",
                "node2_value": "",
            },
        ]
    }
)


def test_parse_triples_json_fenced(spark):
    df = spark.createDataFrame(
        [("u1", f"```json\n{RESP}\n```")], "url string, response string"
    )
    rows = parse_triples_json(df).collect()
    assert len(rows) == 1  # invalid (null-typed) item dropped, no retry loop
    r = rows[0]
    assert r["node1_value"] == {"hasCaseID": "CR/1987/11"}
    assert r["node2_value"] == {VALUE: "Hrushikesh Roy"}
    assert r["relationship"] == "hasJudge"


def test_parse_triples_json_golden_roundtrip(spark):
    with open("/root/reference/kg_creator/src/sample_response.json") as fh:
        chunks = json.load(fh)["Data"]
    payloads = [
        ("golden", json.dumps({"Data": chunk})) for chunk in chunks
    ]
    df = spark.createDataFrame(payloads, "url string, response string")
    n = parse_triples_json(df).count()
    assert n == 163  # all golden triples parse (they're all well-typed)


def test_find_abbreviation():
    assert find_abbreviation("M.P.") == "Madhya Pradesh"
    assert find_abbreviation("NOPE") == "NOPE"


def test_load_abbreviations(tmp_path):
    p = tmp_path / "abbr.txt"
    p.write_text("SC\tSupreme Court\nHC = High Court\n")
    t = load_abbreviations(str(p))
    assert t == {"SC": "Supreme Court", "HC": "High Court"}
    assert find_abbreviation("SC", t) == "Supreme Court"


def test_load_abbreviations_space_separated(tmp_path):
    """The reference file's plain 'KEY Expansion' rows: dotted / multi-
    uppercase / slashed key prefix; all-key-like rows back off to one key
    token; prose rows are skipped."""
    p = tmp_path / "abbr.txt"
    p.write_text(
        "dt. Date\n"
        "LS Lok Sabha\n"
        "Loc. cit. loco citato (at the place quoted)\n"
        "LS Bn. (I)/(II) Lok Sabha Bulletin Part I/II\n"
        "Nom. Nominated/Nomination\n"
        "Secretariat Rajya Sabha Secretariat\n"  # prose: no key-like prefix
    )
    t = load_abbreviations(str(p))
    assert t == {
        "dt.": "Date",
        "LS": "Lok Sabha",
        "Loc. cit.": "loco citato (at the place quoted)",
        "LS Bn. (I)/(II)": "Lok Sabha Bulletin Part I/II",
        "Nom.": "Nominated/Nomination",
    }


def test_reference_file_parse_count():
    """505 of the reference file's 616 non-empty rows parse (the remainder
    are duplicate keys within the file plus one prose glossary row), and the
    previously-dropped space-separated aliases are now present."""
    import os

    if not os.path.exists("/root/reference/Abbrevations"):
        import pytest

        pytest.skip("reference file absent")
    t = load_abbreviations("/root/reference/Abbrevations")
    assert len(t) == 505
    assert t["LS"] == "Lok Sabha" and t["MCI"] == "Medical Council of India"


def test_abbrev_path_resolved_at_call_time(tmp_path, monkeypatch):
    """ONTOKG_ABBREV_PATH repointed after import must take effect (and the
    per-path cache must not leak between paths)."""
    from ontologybasedkgcreation_spark.operators.linking import (
        default_abbreviations,
    )

    p = tmp_path / "tiny.txt"
    p.write_text("XYZQ - Xylophone Quartet\n")
    monkeypatch.setenv("ONTOKG_ABBREV_PATH", str(p))
    t = default_abbreviations()
    assert t["XYZQ"] == "Xylophone Quartet"
    monkeypatch.delenv("ONTOKG_ABBREV_PATH")
    assert "XYZQ" not in default_abbreviations()


def test_format_triples():
    s = format_triples(
        [
            {
                "subj_label": "CourtCase",
                "subj_props": {"hasCaseID": "X", "empty": ""},
                "pred": "hasJudge",
                "obj_label": "Judge",
                "obj_props": {"COLastName": "Roy"},
            }
        ]
    )
    assert "Triple 1:" in s and "hasCaseID: X" in s and "empty" not in s


def test_node_feature_vectors(spark):
    nodes = spark.createDataFrame(
        [
            ("k1", ["Judge", "Court_Official"], {"COLastName": "Roy"}),
            ("k2", ["Judge", "Court_Official"], {"COLastName": "Roy"}),
            ("k3", ["Judge", "Court_Official"], {"COLastName": "Banumathi"}),
        ],
        "node_key string, labels array<string>, props map<string,string>",
    )
    f = {r["node_key"]: r["features"] for r in node_feature_vectors(nodes).collect()}
    assert f["k1"] == f["k2"]          # identical nodes -> identical vectors
    assert f["k1"] != f["k3"]
    norm = sum(x * x for x in f["k1"]) ** 0.5
    assert abs(norm - 1.0) < 1e-5      # L2-normalized


def test_anchor_gate_is_conservative(spark):
    """The JVM anchor prefilter must never drop a triple-producing page:
    every fixture page (all of which produce triples) passes the gate, and
    anchor-free pages produce zero triples with or without the gate —
    extract_triples output is identical to running the raw grammar on
    every row."""
    from ontologybasedkgcreation_spark import fixtures
    from ontologybasedkgcreation_spark.operators import extract as ex

    pages, _ = fixtures.pages_df(spark, 8)
    noise = spark.createDataFrame(
        [
            (f"https://x.org/{i}", None, None,
             f"plain web text number {i} with nothing legal inside", "en")
            for i in range(5)
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    both = pages.select("url", "text", "lang").unionByName(
        noise.select("url", "text", "lang")
    )
    gated = ex.extract_triples(both)
    # reference behavior: the python grammar over every english row, no gate
    expected = []
    for r in both.collect():
        if r["lang"] != "en":
            continue
        for (span, t1, v1, rel, t2, v2) in ex.extract_from_text(r["text"] or ""):
            expected.append((r["url"], span, t1, rel, t2))
    got = [
        (r["url"], r["span_start"], r["node1_type"], r["relationship"],
         r["node2_type"])
        for r in gated.collect()
    ]
    assert sorted(got) == sorted(expected)
    assert len(got) > 0
    # and the gate really removes the noise rows before Python
    kept = both.filter(ex.anchor_gate_condition()).count()
    assert kept == pages.count()
