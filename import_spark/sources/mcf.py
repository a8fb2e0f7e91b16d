"""MCF (Meta Content Framework) text source → long-form statements.

Re-expresses the reference's MCF parsing path:
- S1 node-blocked scan: the Beam pipeline reads MCF with record
  delimiter ``"\\n\\n"`` (PipelineUtils.java:150-171); we use
  ``spark.read.option("lineSep", "\\n\\n").text(path)`` so every row is
  one node block, parsed by a vectorized UDF — a streaming single-pass
  parse exactly like McfParser.parseNextNode (McfParser.java:86-179).
- typed values via parse_typed_value (P1, McfParser.java:336-437) and
  quote/escape-aware multi-value split (P2, StringUtil.java:182-218).
- ``Node: dcid:X`` auto-adds the dcid property (McfParser.java:261-274).
- T4 triple flattening: node → (subject_id, predicate, object_id |
  object_value, 'ID'|'VALUE') rows, matching the semantics of
  simple/kg_util/mcf_parser.py:169-240.
- S7 sink: serialize long-form statements back to sorted MCF text
  (McfUtil.java:26-59).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from import_spark.functions.values import parse_typed_value, split_and_strip

MCF_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.StringType(), False),
        T.StructField("prop", T.StringType(), False),
        T.StructField("value_type", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
        T.StructField("src_file", T.StringType(), True),
    ]
)

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("subject_id", T.StringType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("object", T.StringType(), False),
        T.StructField("object_kind", T.StringType(), False),  # ID | VALUE
    ]
)

_REF_TYPES = {"RESOLVED_REF", "UNRESOLVED_REF"}


def parse_mcf_block(block: str, src_file: str = "") -> list[tuple]:
    """One ``Node:`` block → long-form (node_id, prop, value_type, value) rows.

    Mirrors McfParser.parseLine semantics: comments (# / //) skipped,
    first ``Node:`` line names the node (a global ``dcid:X`` name also
    yields a dcid property), remaining ``prop: values`` lines are
    multi-value split then typed-value parsed.
    """
    rows: list[tuple] = []
    node_id: str | None = None
    for raw in block.split("\n"):
        line = raw.strip()
        if not line or line.startswith("#") or line.startswith("//"):
            continue
        if ":" not in line:
            continue  # malformed line; reference logs MCF_MalformedLine
        prop, _, rest = line.partition(":")
        prop = prop.strip()
        rest = rest.strip()
        if prop == "Node":
            node_id = rest
            # global-ref node name auto-adds dcid (McfParser.java:261-274)
            for pfx in ("dcid:", "dcs:", "schema:"):
                if rest.startswith(pfx):
                    node_id = rest[len(pfx) :]
                    rows.append((node_id, "dcid", "TEXT", node_id, src_file))
                    break
            continue
        if node_id is None or prop == "Context":
            continue
        vals = split_and_strip(rest, strip_enclosing_quotes=False)
        if vals is None:
            continue  # StrSplit error; reference logs and skips
        for v in vals:
            tv = parse_typed_value(prop, v)
            if tv is None:
                continue  # malformed complex value
            rows.append((node_id, prop, tv[0], tv[1], src_file))
    return rows


def parse_mcf_string(text: str, src_file: str = "") -> list[tuple]:
    """A whole MCF document → long-form rows (driver-side helper)."""
    rows: list[tuple] = []
    for block in text.split("\n\n"):
        if block.strip():
            rows.extend(parse_mcf_block(block, src_file))
    return rows


def read_mcf(spark: SparkSession, path: str) -> DataFrame:
    """Distributed MCF scan: one task per file split, one row per node
    block (record delimiter "\\n\\n"), vectorized block parse."""
    raw = (
        spark.read.option("lineSep", "\n\n")
        .text(path)
        .select("value", F.col("_metadata.file_path").alias("src_file"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for block, src in zip(pdf["value"], pdf["src_file"]):
                if isinstance(block, str) and block.strip():
                    out.extend(parse_mcf_block(block, src))
            yield pd.DataFrame(
                out, columns=["node_id", "prop", "value_type", "value", "src_file"]
            )

    return raw.mapInPandas(gen, schema=MCF_SCHEMA)


def mcf_to_triples(nodes: DataFrame) -> DataFrame:
    """T4: long-form node rows → (subject_id, predicate, object, object_kind),
    matching mcf_to_triples (simple/kg_util/mcf_parser.py:169-240):
    reference values → 'ID' rows (namespace-stripped already by P1),
    literals → 'VALUE' rows; the dcid property itself is kept as VALUE."""
    return nodes.select(
        F.col("node_id").alias("subject_id"),
        F.col("prop").alias("predicate"),
        F.col("value").alias("object"),
        F.when(
            F.col("value_type").isin(*_REF_TYPES) & (F.col("prop") != "dcid"), "ID"
        )
        .otherwise("VALUE")
        .alias("object_kind"),
    )


def write_mcf(nodes: DataFrame, path: str, sort_output: bool = True) -> None:
    """S7: serialize long-form rows back to MCF text (sorted for
    stability, McfUtil.java:29-54); one part-file per partition."""
    quoted = (
        F.when(
            F.col("value_type") == "TEXT",
            F.concat(F.lit('"'), F.col("value"), F.lit('"')),
        )
        # refs serialize with the dcid: prefix (McfUtil.java:184-190) —
        # without it a write→read roundtrip degrades refs to TEXT
        .when(
            F.col("value_type") == "RESOLVED_REF",
            F.concat(F.lit("dcid:"), F.col("value")),
        )
        .otherwise(F.col("value"))
    )
    lines = nodes.select(
        "node_id",
        "prop",
        F.col("value_type"),
        quoted.alias("v"),
    )
    grouped = (
        lines.groupBy("node_id", "prop")
        .agg(F.concat_ws(", ", F.sort_array(F.collect_list("v"))).alias("vals"))
        .groupBy("node_id")
        .agg(
            F.concat_ws(
                "\n",
                F.sort_array(F.collect_list(F.concat(F.col("prop"), F.lit(": "), F.col("vals")))),
            ).alias("body")
        )
        .select(
            F.concat(F.lit("Node: "), F.col("node_id"), F.lit("\n"), F.col("body"), F.lit("\n")).alias(
                "value"
            )
        )
    )
    if sort_output:
        grouped = grouped.orderBy("value")
    grouped.write.mode("overwrite").text(path)
