"""Web-graph construction operators over crawled HTML.

The step between ingestion (``sources/warc.py``) and the graph
analytics (``graph_query.pagerank`` over host edges): pull outbound
links from page HTML.  Composes with ``text_analysis.canonicalize_urls``
(dedup keys + PSL registrable domains) and ``filter_urls`` (blocklists)
— extract here, canonicalize there, aggregate to (src_domain,
dst_domain) edges, rank with pagerank: the classic crawl-frontier /
host-authority pipeline.

Pure ``pyspark.sql.functions`` (regexp_extract_all + explode) — whole-
stage codegen, embarrassingly partition-parallel, RE2-safe regex (no
lookarounds — the oracle-engine invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: quoted href attribute values, case-insensitive attribute name.
#: Unquoted hrefs are not extracted (documented contract — generators
#: quote; an unquoted-attribute arm would need a different value
#: terminator and buys almost nothing on real crawls).
HREF_RE = "(?i)href\\s*=\\s*[\"']([^\"']+)[\"']"


def extract_links(
    df: DataFrame, id_col: str, html_col: str
) -> DataFrame:
    """Distinct absolute outbound links per page -> ``(id, link)``.

    Only absolute ``http(s)://`` targets survive (relative references
    need RFC 3986 base resolution — a downstream join against the
    page's own canonical URL, deliberately out of this operator);
    ``mailto:``/``javascript:``/fragment-only hrefs drop.  Pages with
    no links emit no rows (the keyword-extraction contract).

    Scale shape: one projection (regexp_extract_all) + explode + a
    distinct keyed by (id, link) — the only shuffle, map-side
    combinable; no Python, no joins."""
    links = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), 1)
        ).alias("link"),
    )
    return links.filter(F.col("link").rlike("^https?://")).distinct()
