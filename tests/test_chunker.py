"""Chunker determinism + boundary behavior (FIXTURES.md §4; ref utils.py:910:
size 1200 / overlap 20)."""

from ontologybasedkgcreation_spark.operators.chunker import (
    CHUNK_SIZE,
    chunk_id_for,
    split_text,
    split_with_offsets,
)


def test_empty():
    assert split_text("") == []


def test_short_text_single_chunk():
    assert split_text("hello world") == ["hello world"]


def test_exact_size():
    t = "a" * 1200
    assert split_text(t) == [t]


def test_oversize_no_separator():
    # 1201 unsplittable chars -> char-level fallback, all content kept
    t = "a" * 1201
    chunks = split_text(t)
    assert all(len(c) <= CHUNK_SIZE for c in chunks)
    assert sum(len(c) for c in chunks) >= 1201  # overlap may duplicate


def test_word_boundaries_and_coverage():
    words = [f"w{i:04d}" for i in range(1000)]
    t = " ".join(words)
    chunks = split_text(t)
    assert all(len(c) <= CHUNK_SIZE for c in chunks)
    # every word must appear in some chunk (no loss)
    joined = " ".join(chunks)
    for w in words:
        assert w in joined


def test_paragraph_separator_preferred():
    t = ("para one. " * 110).strip() + "\n\n" + ("para two. " * 110).strip()
    chunks = split_text(t)
    # each paragraph ~1100 chars -> paragraph boundary must be preferred over
    # mid-paragraph splits: first chunk is pure para-one, next starts para-two
    assert len(chunks) >= 2
    assert chunks[0].startswith("para one") and "para two" not in chunks[0]
    assert any(c.startswith("para two") for c in chunks[1:])


def test_determinism():
    t = "x y z " * 2000
    assert split_text(t) == split_text(t)


def test_offsets_locate_chunks():
    t = "\n".join(f"line {i} with some content here" for i in range(300))
    for start, end, chunk in split_with_offsets(t):
        assert t[start:end] == chunk


def test_chunk_id_deterministic_no_uuid():
    # replaces uuid4 at agent_utils.py:205
    a = chunk_id_for("http://x", 0)
    assert a == chunk_id_for("http://x", 0)
    assert a != chunk_id_for("http://x", 1)
    assert len(a) == 64
