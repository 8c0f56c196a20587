"""Property assignment (E5) + title-casing (E6), Arrow-batched.

Replaces the reference's per-triple LLM property-extraction chain
(``kg_creator/src/prompts.py:322-446``, invoked at ``utils.py:561-565``) with
the deterministic rules its own prompt + examples fix:

1. empty property schema  -> ``{"text": value}``            (prompts.py:327)
   (a dict value with empty schema concatenates its values — example 4,
   prompts.py:423-445)
2. dict value             -> copy values whose keys match schema keys
                                                            (prompts.py:330-331)
3. plain-string value with a (first,last)-name key pair:
   - exactly two tokens   -> split on the whitespace ("Jagan Ram" ->
     first/last — example 1, prompts.py:347-372)
   - one token            -> goes to the *last*-name key (a body-line judge
     mention like "Deshmukh, J." is a surname; the reference's "best logic"
     clause, prompts.py:331)
   - three-plus tokens    -> everything in the FIRST key ("state of Haryana"
     -> firstName, prompts.py:332)
4. plain-string value otherwise -> first schema key.

Then every produced string is title-cased with Python ``str.title()``
semantics — byte-parity with ``make_title_case_all`` (utils.py:527-537;
NOT Spark ``initcap``, which would leave "m.p." uncapitalized).

Runs as one ``mapInPandas`` stage over validated triples; the ontology prop
schemas ride along as array columns from the validation join, so the UDF has
no external lookups.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence

import pandas as pd
from pyspark.sql import DataFrame

from .extract import VALUE

NAME_PAIRS = [
    ("firstName", "lastName"),
    ("COFirstName", "COLastName"),
    ("wFirstName", "wLastName"),
]

ASSIGNED_SCHEMA = (
    "url string, span_start long, triple_id string, "
    "node1_type string, node1_labels array<string>, "
    "node1_props map<string,string>, relationship string, "
    "node2_type string, node2_labels array<string>, "
    "node2_props map<string,string>"
)


def assign_props(value: Dict[str, str], schema: Sequence[str]) -> Dict[str, str]:
    """One node's raw value map -> property bag per the rules above."""
    value = value if value is not None else {}
    schema = list(schema) if schema is not None else []
    is_bare = set(value.keys()) == {VALUE}
    if not schema:
        if is_bare:
            return {"text": value.get(VALUE, "")}
        return {"text": " ".join(v for v in value.values() if v)}
    props = dict.fromkeys(schema, "")
    if not is_bare:
        for k, v in value.items():
            if k in props and v:
                props[k] = v
        return props
    s = (value.get(VALUE) or "").strip()
    if not s:
        return props
    for first_key, last_key in NAME_PAIRS:
        if first_key in props and last_key in props:
            tokens = s.split()
            if len(tokens) == 2:
                props[first_key], props[last_key] = tokens
            elif len(tokens) == 1:
                props[last_key] = s
            else:
                props[first_key] = s
            return props
    props[schema[0]] = s
    return props


def title_props(props: Dict[str, str]) -> Dict[str, str]:
    return {k: (v.title() if isinstance(v, str) else v) for k, v in props.items()}


def assign_and_titlecase(validated: DataFrame) -> DataFrame:
    """validated triples -> + node1_props / node2_props (title-cased)."""

    out_cols = [
        "url", "span_start", "triple_id",
        "node1_type", "node1_labels", "node1_props",
        "relationship",
        "node2_type", "node2_labels", "node2_props",
    ]

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n1: List[dict] = [
                title_props(assign_props(v, s))
                for v, s in zip(pdf["node1_value"], pdf["node1_schema"])
            ]
            n2: List[dict] = [
                title_props(assign_props(v, s))
                for v, s in zip(pdf["node2_value"], pdf["node2_schema"])
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "span_start": pdf["span_start"],
                    "triple_id": pdf["triple_id"],
                    "node1_type": pdf["node1_type"],
                    "node1_labels": pdf["node1_labels"],
                    "node1_props": n1,
                    "relationship": pdf["relationship"],
                    "node2_type": pdf["node2_type"],
                    "node2_labels": pdf["node2_labels"],
                    "node2_props": n2,
                },
                columns=out_cols,
            )

    cols = [
        "url", "span_start", "triple_id",
        "node1_type", "node1_labels", "node1_schema", "node1_value",
        "relationship",
        "node2_type", "node2_labels", "node2_schema", "node2_value",
    ]
    return validated.select(*cols).mapInPandas(_assign, schema=ASSIGNED_SCHEMA)
