"""Pages source: scan + deterministic byte-identical html -> text extraction.

Replaces the reference's PDF loader (``kg_creator/src/utils.py:892-904``,
``read_document``: pages joined with "\\n").  Our input is the Common-Crawl
style table mandated by BASELINE.json.input_hint:

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Invariant kept from the reference: extracted text is a *deterministic pure
function of the source bytes* (``read_document`` has no randomness), so the
same url always yields byte-identical text — asserted by the pytest gate.

Extraction is fully Arrow-vectorized (pandas ``.str`` ops inside
``mapInPandas``); no per-row Python in the hot path.  Only ``url`` and
``html``/``lang`` columns are read — Catalyst prunes the rest at the scan.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTRACTED_SCHEMA = "url string, warc_ts timestamp, text string, lang string"

_PRE_RE = r"(?is)<pre[^>]*>(.*?)</pre>"
_TAG_RE = r"(?s)<[^>]+>"


def _unescape_series(s: pd.Series) -> pd.Series:
    """Inverse of html.escape(quote=True), vectorized.  &amp; must be last."""
    return (
        s.str.replace("&lt;", "<", regex=False)
        .str.replace("&gt;", ">", regex=False)
        .str.replace("&quot;", '"', regex=False)
        .str.replace("&#x27;", "'", regex=False)
        .str.replace("&#39;", "'", regex=False)
        .str.replace("&amp;", "&", regex=False)
    )


def extract_text_batch(html: pd.Series) -> pd.Series:
    """binary html -> text.  Prefers a single <pre> block (our fixture/WARC
    shape); falls back to tag-stripping.  Pure + vectorized."""
    raw = html.map(bytes.decode if html.dtype == object else str)  # utf-8 str
    pre = raw.str.extract(_PRE_RE, expand=False)
    stripped = raw.str.replace(_TAG_RE, "", regex=True).str.strip()
    chosen = pre.fillna(stripped)
    return _unescape_series(chosen)


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages -> (url, warc_ts, text, lang) with text re-derived from html.

    ``mapInPandas`` keeps this narrow (no shuffle): one Arrow batch in, one
    out, per input partition.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "text": extract_text_batch(pdf["html"]),
                    "lang": pdf["lang"],
                }
            )
            yield out

    return pages.select("url", "warc_ts", "html", "lang").mapInPandas(
        _extract, schema=EXTRACTED_SCHEMA
    )


def english_pages(extracted: DataFrame) -> DataFrame:
    """Language gate: only 'en' rows continue to extraction; others pass
    through untouched downstream (FIXTURES.md §1)."""
    return extracted.filter(F.col("lang") == F.lit("en"))
