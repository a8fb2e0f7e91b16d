"""TMCF template × CSV table → instance statements (template expansion).

Re-expresses the reference's TmcfCsvParser (T1/T2,
TmcfCsvParser.java:125-375):

- A Template MCF names entities ``E:Table->En`` and columns
  ``C:Table->col`` (McfParser.java:339-357, Vocabulary.java:194-197);
  per CSV row each template entity is instantiated into an instance
  node named ``<Table>/<En>/<rowid>`` (TmcfCsvParser.java:359-374),
  with deterministic row ids (TEST-mode row numbers,
  TmcfCsvParser.java:41,137).
- dcid-first two-pass per row (T2, TmcfCsvParser.java:156-230):
  entities whose template carries an explicit ``dcid`` column get that
  dcid; other-entity references substitute the target's dcid when it
  has one, else a local ``l:`` ref for the resolver.
- Multi-value cells are split quote/escape-aware (P2,
  StringUtil.java:182-218) and each value typed-value parsed (P1).

The template is compiled once on the driver and **broadcast** via UDF
closure; expansion is a single vectorized ``mapInPandas`` pass — the
Spark analogue of the reference's thread-per-file RowProcessor.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from import_spark.functions.values import parse_typed_value, split_and_strip
from import_spark.sources.mcf import MCF_SCHEMA, parse_mcf_string

_ENTITY_RE = re.compile(r"^E:([^->]+)->(.+)$")
_COLUMN_RE = re.compile(r"^C:([^->]+)->(.+)$")


@dataclass
class TemplateNode:
    table: str
    entity: str  # e.g. E0
    # (prop, kind, payload): kind CONST keeps payload as the raw value,
    # COLUMN reads payload column, ENTITY references payload entity name
    terms: list[tuple[str, str, str]] = field(default_factory=list)


def parse_tmcf(text: str) -> list[TemplateNode]:
    """Template MCF → compiled template (driver-side; templates are tiny)."""
    nodes: dict[str, TemplateNode] = {}
    order: list[str] = []
    cur: TemplateNode | None = None
    for block in text.split("\n\n"):
        for raw in block.split("\n"):
            line = raw.strip()
            if not line or line.startswith("#") or line.startswith("//"):
                continue
            prop, _, rest = line.partition(":")
            prop, rest = prop.strip(), rest.strip()
            if prop == "Node":
                m = _ENTITY_RE.match(rest)
                if not m:
                    cur = None
                    continue
                cur = TemplateNode(table=m.group(1), entity=m.group(2))
                nodes[m.group(2)] = cur
                order.append(m.group(2))
                continue
            if cur is None:
                continue
            vals = split_and_strip(rest, strip_enclosing_quotes=False)
            for v in vals or []:
                em = _ENTITY_RE.match(v)
                cm = _COLUMN_RE.match(v)
                if em:
                    cur.terms.append((prop, "ENTITY", em.group(2)))
                elif cm:
                    cur.terms.append((prop, "COLUMN", cm.group(2)))
                else:
                    cur.terms.append((prop, "CONST", v))
    return [nodes[k] for k in order]


def _expand_batch(
    pdf: pd.DataFrame, template: list[TemplateNode], row_id_col: str
) -> pd.DataFrame:
    rows: list[tuple] = []
    # per-template-node dcid column, if the template assigns one (T2 pass 1)
    dcid_cols = {
        tn.entity: next((p for pr, k, p in tn.terms if pr == "dcid" and k == "COLUMN"), None)
        for tn in template
    }
    dcid_consts = {
        tn.entity: next((p for pr, k, p in tn.terms if pr == "dcid" and k == "CONST"), None)
        for tn in template
    }
    for _, row in pdf.iterrows():
        rowid = row[row_id_col]
        # pass 1: node ids (dcid-first, TmcfCsvParser.java:156-230)
        node_ids: dict[str, str] = {}
        is_dcid: dict[str, bool] = {}
        for tn in template:
            dc = None
            if dcid_cols[tn.entity] and pd.notna(row.get(dcid_cols[tn.entity])):
                dc = str(row[dcid_cols[tn.entity]])
                tv = parse_typed_value("dcid", dc)
                dc = tv[1] if tv else dc
            elif dcid_consts[tn.entity]:
                tv = parse_typed_value("dcid", dcid_consts[tn.entity])
                dc = tv[1] if tv else None
            if dc:
                node_ids[tn.entity] = dc
                is_dcid[tn.entity] = True
            else:
                node_ids[tn.entity] = f"{tn.table}/{tn.entity}/{rowid}"
                is_dcid[tn.entity] = False
        # pass 2: emit statements
        for tn in template:
            nid = node_ids[tn.entity]
            for prop, kind, payload in tn.terms:
                if prop == "dcid":
                    continue
                if kind == "CONST":
                    tv = parse_typed_value(prop, payload)
                    if tv:
                        rows.append((nid, prop, tv[0], tv[1], ""))
                elif kind == "ENTITY":
                    tgt = payload
                    if tgt in node_ids and is_dcid[tgt]:
                        rows.append((nid, prop, "RESOLVED_REF", node_ids[tgt], ""))
                    else:
                        rows.append(
                            (nid, prop, "UNRESOLVED_REF", f"l:{node_ids.get(tgt, tgt)}", "")
                        )
                else:  # COLUMN
                    cell = row.get(payload)
                    if cell is None or (isinstance(cell, float) and pd.isna(cell)) or cell == "":
                        continue  # missing value: skip prop (TmcfCsvParser semantics)
                    vals = split_and_strip(str(cell), strip_enclosing_quotes=False)
                    if vals is None:
                        continue  # bad quoting / embedded newline → dropped w/ counter
                    for v in vals:
                        tv = parse_typed_value(prop, v)
                        if tv:
                            rows.append((nid, prop, tv[0], tv[1], ""))
    return pd.DataFrame(
        rows, columns=["node_id", "prop", "value_type", "value", "src_file"]
    )


def expand_template(
    csv_df: DataFrame, tmcf_text: str, row_id_col: str | None = None
) -> DataFrame:
    """CSV rows × template → long-form instance statements.

    ``row_id_col``: column providing the deterministic per-row id
    (the reference's TEST-mode row number). If None, a row number is
    derived by a global sort over all columns — deterministic, but a
    full shuffle; at scale always supply a natural key column.
    """
    template = parse_tmcf(tmcf_text)
    if row_id_col is None:
        from pyspark.sql import Window

        csv_df = csv_df.withColumn(
            "_rowid", F.row_number().over(Window.orderBy(*csv_df.columns))
        )
        row_id_col = "_rowid"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _expand_batch(pdf, template, row_id_col)

    return csv_df.mapInPandas(gen, schema=MCF_SCHEMA)


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """S3: CSV scan with header + backslash escapes (TmcfCsvParser.java:55-112)."""
    return (
        spark.read.option("header", True)
        .option("escape", "\\")
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
        .csv(path)
    )
