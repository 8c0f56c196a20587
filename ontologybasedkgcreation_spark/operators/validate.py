"""Ontology validation — V1-V4 of SURVEY.md §2.4, as broadcast joins.

The reference validates each triple with Cypher round-trips per triple:
- ``check_valid_relationship`` (utils.py:243-257): (label1, rel, label2) must
  be an exact object-property domain/range row;
- ``some_func_v2`` (utils.py:541-569) tries the cross product of the two
  nodes' ancestor chains and takes the first combination that validates;
- ``refine_parent_child_relation`` (utils.py:260-290) handles ``is_a``:
  keep if (child, parent) is a direct subclass edge, swap if reversed, else
  drop.  Валid-or-not, ``is_a`` triples never reach the graph (both branches
  of utils.py:542-549 return None) — we keep them in a lineage output.

Spark design: the ontology is tiny (<200 rows/table) so every join below is a
broadcast hash join Catalyst executes map-side — zero shuffle for validation.
The "first combination in chain order" rule becomes a deterministic
``row_number`` pick ordered by (ancestor depth of node1, ancestor depth of
node2) — BFS chain order, ties broken lexicographically (the reference's tie
order is unspecified Cypher row order; ours is stable, documented divergence).

Triples whose node types are not ontology classes (the golden file has node
types like "Supreme Court of India", kg_creator/src/sample_response.json) fall
out naturally: no closure row -> no candidate -> rejected, exactly like the
reference's empty Cypher MATCH.
"""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..ontology import Ontology

TRIPLE_ID_COLS = (
    "url", "span_start", "node1_type", "relationship", "node2_type",
)


def _ontology_frames(spark, onto: Ontology):
    """Broadcastable helper frames derived from the parsed ontology."""
    closure_self = [
        (c, c, 0) for c in sorted(onto.classes)
    ] + onto.subclass_closure()
    closure_df = spark.createDataFrame(
        closure_self, "descendant string, ancestor string, depth int"
    )
    obj_df = spark.createDataFrame(
        [(d, r, g) for d, r, g, _ in onto.object_props],
        "domain string, rel string, range string",
    )
    sub_df = spark.createDataFrame(
        list(onto.subclass_edges), "child string, parent string"
    )
    label_info = spark.createDataFrame(
        [
            (c, onto.label_chain(c), list(onto.prop_schema(c).keys()))
            for c in sorted(onto.classes)
        ],
        "class string, labels array<string>, schema array<string>",
    )
    return closure_df, obj_df, sub_df, label_info


def with_triple_id(triples: DataFrame) -> DataFrame:
    """Deterministic triple id (no uuid4 / monotonically_increasing_id — both
    break resume idempotence)."""
    return triples.withColumn(
        "triple_id",
        F.sha2(
            F.concat_ws(
                "",
                *[F.col(c).cast("string") for c in TRIPLE_ID_COLS],
                F.to_json(F.col("node1_value")),
                F.to_json(F.col("node2_value")),
            ),
            256,
        ),
    )


def validate_triples(
    spark, triples: DataFrame, onto: Ontology
) -> Dict[str, DataFrame]:
    """raw triples -> {validated, isa, rejected}.

    validated: + node1_labels/schema, node2_labels/schema, resolved
               (domain_label, range_label), depth-ordered first match.
    isa:       valid is_a rows with swap applied (lineage only).
    rejected:  everything else, with a reject_reason column.
    """
    closure_df, obj_df, sub_df, label_info = _ontology_frames(spark, onto)
    t = with_triple_id(triples).cache()

    non_isa = t.filter(F.col("relationship") != "is_a")

    c1 = closure_df.select(
        F.col("descendant").alias("node1_type"),
        F.col("ancestor").alias("label1"),
        F.col("depth").alias("d1"),
    )
    c2 = closure_df.select(
        F.col("descendant").alias("node2_type"),
        F.col("ancestor").alias("label2"),
        F.col("depth").alias("d2"),
    )
    cand = (
        non_isa.join(F.broadcast(c1), "node1_type")
        .join(F.broadcast(c2), "node2_type")
        .join(
            F.broadcast(obj_df),
            (F.col("label1") == F.col("domain"))
            & (F.col("relationship") == F.col("rel"))
            & (F.col("label2") == F.col("range")),
            "inner",
        )
    )
    w = Window.partitionBy("triple_id").orderBy("d1", "d2", "label1", "label2")
    best = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "domain", "rel", "range")
    )

    li1 = label_info.select(
        F.col("class").alias("node1_type"),
        F.col("labels").alias("node1_labels"),
        F.col("schema").alias("node1_schema"),
    )
    li2 = label_info.select(
        F.col("class").alias("node2_type"),
        F.col("labels").alias("node2_labels"),
        F.col("schema").alias("node2_schema"),
    )
    validated = (
        best.join(F.broadcast(li1), "node1_type")
        .join(F.broadcast(li2), "node2_type")
    )

    rejected_non_isa = non_isa.join(
        best.select("triple_id"), "triple_id", "left_anti"
    ).withColumn("reject_reason", F.lit("no_valid_domain_range"))

    # ---- is_a (kept for lineage; never merged into the graph) -------------
    isa = t.filter(F.col("relationship") == "is_a")
    ok = isa.join(
        F.broadcast(sub_df),
        (isa["node1_type"] == sub_df["child"])
        & (isa["node2_type"] == sub_df["parent"]),
        "left_semi",
    ).withColumn("swapped", F.lit(False))
    swapped = (
        isa.join(
            F.broadcast(sub_df),
            (isa["node1_type"] == sub_df["parent"])
            & (isa["node2_type"] == sub_df["child"]),
            "left_semi",
        )
        # reversed pair -> interchange ends (utils.py:280-287)
        .select(
            "url",
            "span_start",
            "triple_id",
            F.col("node2_type").alias("node1_type"),
            F.col("node2_value").alias("node1_value"),
            "relationship",
            F.col("node1_type").alias("node2_type"),
            F.col("node1_value").alias("node2_value"),
        )
        .withColumn("swapped", F.lit(True))
    )
    isa_valid = ok.select(*swapped.columns).unionByName(swapped).dropDuplicates(
        ["triple_id"]
    )
    rejected_isa = isa.join(
        isa_valid.select("triple_id"), "triple_id", "left_anti"
    ).withColumn("reject_reason", F.lit("invalid_subclass_pair"))

    rejected = rejected_non_isa.unionByName(
        rejected_isa, allowMissingColumns=True
    )
    return {"validated": validated, "isa": isa_valid, "rejected": rejected}
