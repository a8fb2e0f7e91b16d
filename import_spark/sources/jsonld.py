"""JSON-LD source (S5): JSON documents → long-form statements.

Re-expresses the reference's jsonld ingestion
(parser/jsonld/JsonLdParser.java:19-51 + Beam wrapper
PipelineUtils.java:196-220) for the constrained JSON-LD shape the
reference consumes: objects with ``@id``/``@type`` and property values
that are literals, ``{"@id": ...}`` references, or arrays thereof.
Namespace prefixes are stripped like every other reference path
(McfUtil.java:164-171).

``spark.read.json`` would impose a global schema; JSON-LD is
schema-dynamic (any node, any properties), so each line is parsed in a
vectorized UDF into long-form rows — the same dynamic-schema strategy
as the MCF reader.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from import_spark.functions.values import strip_namespace
from import_spark.sources.mcf import MCF_SCHEMA


def jsonld_node_to_rows(obj: dict, src_file: str = "") -> list[tuple]:
    """One JSON-LD node object → (node_id, prop, value_type, value) rows."""
    rows: list[tuple] = []
    node_id = strip_namespace(str(obj.get("@id", "")))
    if not node_id:
        return rows
    for prop, vals in obj.items():
        if prop == "@id":
            continue
        key = "typeOf" if prop == "@type" else strip_namespace(prop)
        if not isinstance(vals, list):
            vals = [vals]
        for v in vals:
            if isinstance(v, dict):
                if "@id" in v:
                    rows.append(
                        (node_id, key, "RESOLVED_REF", strip_namespace(str(v["@id"])), src_file)
                    )
                elif "@value" in v:
                    rows.append((node_id, key, "TEXT", str(v["@value"]), src_file))
            elif prop == "@type":
                rows.append((node_id, key, "RESOLVED_REF", strip_namespace(str(v)), src_file))
            elif isinstance(v, bool):
                rows.append((node_id, key, "NUMBER", str(v).lower(), src_file))
            elif isinstance(v, (int, float)):
                rows.append((node_id, key, "NUMBER", json.dumps(v), src_file))
            else:
                rows.append((node_id, key, "TEXT", str(v), src_file))
    return rows


def parse_jsonld_string(text: str, src_file: str = "") -> list[tuple]:
    doc = json.loads(text)
    nodes = doc.get("@graph", doc) if isinstance(doc, dict) else doc
    if isinstance(nodes, dict):
        nodes = [nodes]
    rows: list[tuple] = []
    for obj in nodes:
        if isinstance(obj, dict):
            rows.extend(jsonld_node_to_rows(obj, src_file))
    return rows


def read_jsonld(spark: SparkSession, path: str) -> DataFrame:
    """NDJSON-LD scan: one JSON-LD node object (or @graph document) per
    line; vectorized parse into long-form statements."""
    raw = (
        spark.read.text(path)
        .selectExpr("value", "_metadata.file_path as src_file")
        .filter("trim(value) != ''")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for line, src in zip(pdf["value"], pdf["src_file"]):
                try:
                    rows.extend(parse_jsonld_string(line, src))
                except (json.JSONDecodeError, TypeError):
                    continue  # malformed line → counter in a real run
            yield pd.DataFrame(
                rows, columns=["node_id", "prop", "value_type", "value", "src_file"]
            )

    return raw.mapInPandas(gen, schema=MCF_SCHEMA)


def write_jsonld(nodes: DataFrame, path: str, context: dict | None = None) -> None:
    """JSON-LD sink (jsonld_exporter.py:34-93,221-269 re-expressed):
    long-form statement rows → NDJSON-LD, one compacted node object per
    line ({"@id", "@type", prop: [literal | {"@id": ref}]}), sharded by
    partition like the reference's chunked write_shard loop.

    Shape: ONE hash aggregate groups each node's statements
    (collect_list on the already-key-partitioned rows), then a
    vectorized batch serializes each node with json.dumps — the
    formatting/escaping tool, used only on the already-aggregated
    output rows (the reference's rdflib serializer is the same
    driver-side Python, unsharded). Reads back via read_jsonld.
    """
    import os

    from pyspark.sql import functions as F

    ctx = {"dcid": "https://datacommons.org/browser/"}
    ctx.update(context or {})
    grouped = nodes.groupBy("node_id").agg(
        F.collect_list(F.struct("prop", "value_type", "value")).alias("_stmts")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ref_types = {"RESOLVED_REF", "UNRESOLVED_REF"}
        for pdf in batches:
            lines = []
            for node_id, stmts in zip(pdf["node_id"], pdf["_stmts"]):
                # context lives in one sidecar per dataset (the
                # reference's per-shard ns_map), NOT per line — the
                # reader treats unknown @-less keys as properties
                obj: dict = {"@id": str(node_id)}
                for s in sorted(stmts, key=lambda s: (s["prop"], s["value"])):
                    if s["prop"] == "typeOf":
                        obj.setdefault("@type", []).append(s["value"])
                    elif s["value_type"] in ref_types:
                        obj.setdefault(s["prop"], []).append({"@id": s["value"]})
                    else:
                        obj.setdefault(s["prop"], []).append(s["value"])
                lines.append(json.dumps(obj, sort_keys=True))
            yield pd.DataFrame({"value": lines})

    grouped.mapInPandas(gen, schema="value string").write.mode("overwrite").text(path)
    with open(os.path.join(path, "_context.jsonld"), "w") as f:
        json.dump({"@context": ctx}, f, sort_keys=True)
