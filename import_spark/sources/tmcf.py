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


def _typed_values_vec(prop: str, vals: pd.Series) -> pd.DataFrame:
    """Vectorized parse_typed_value for a FIXED prop over a value Series
    (McfParser.java:336-437 semantics, identical to the scalar P1
    function). Returns columns (value_type, value); malformed complex
    values get value_type None (callers drop them, mirroring the
    per-row ``tv is None`` skip)."""
    import numpy as np

    expect_ref = V_IS_REF(prop)
    v = vals.astype(str)
    quoted = v.str.startswith('"') & v.str.endswith('"') & (v.str.len() > 1)
    if expect_ref:
        # refs strip an enclosing quote pair then continue classification
        v = v.where(~quoted, v.str.slice(1, -1))
    is_quoted_text = (~expect_ref) & vals.astype(str).str.startswith('"')
    text_stripped = vals.astype(str).where(~quoted, vals.astype(str).str.slice(1, -1))

    bracket = v.str.startswith("[")
    closed = v.str.endswith("]")
    has_colon = v.str.contains(":", regex=False)
    is_global = v.str.match(r"^(dcid|dcs|schema):")
    is_local = v.str.startswith("l:")
    after_colon = v.str.replace(r"^[^:]*:", "", regex=True, n=1)
    numeric = v.str.match(
        r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$|^[+-]?Infinity$|^NaN$"
    ) | v.str.lower().isin(["true", "false", "1", "0"])

    vt = np.select(
        [
            is_quoted_text,
            bracket & closed,
            bracket & ~closed,
            has_colon & is_global,
            has_colon & is_local,
            pd.Series(expect_ref, index=v.index),
            numeric,
        ],
        ["TEXT", "COMPLEX_VALUE", None, "RESOLVED_REF", "UNRESOLVED_REF", "RESOLVED_REF", "NUMBER"],
        default="TEXT",
    )
    out_val = np.select(
        [is_quoted_text, bracket, has_colon & is_global],
        [text_stripped, v, after_colon],
        default=v,
    )
    return pd.DataFrame({"value_type": vt, "value": out_val}, index=vals.index)


def V_IS_REF(prop: str) -> bool:
    from import_spark import vocabulary as V

    return V.is_reference_property(prop)


def _expand_batch(
    pdf: pd.DataFrame, template: list[TemplateNode], row_id_col: str
) -> pd.DataFrame:
    """Vectorized template expansion (T1): per template term, ONE pandas
    column pass over the whole batch — no per-row Python. Multi-value
    cells (the quote/comma minority) route through the scalar
    split_and_strip on their distinct values only."""
    import numpy as np

    frames: list[pd.DataFrame] = []
    rowid = pdf[row_id_col].astype(str)

    # per-template-node dcid source, if the template assigns one (T2 pass 1)
    dcid_cols = {
        tn.entity: next((p for pr, k, p in tn.terms if pr == "dcid" and k == "COLUMN"), None)
        for tn in template
    }
    dcid_consts = {
        tn.entity: next((p for pr, k, p in tn.terms if pr == "dcid" and k == "CONST"), None)
        for tn in template
    }

    # pass 1: node ids (dcid-first, TmcfCsvParser.java:156-230).
    # An entity whose template maps ``dcid`` but whose cell is empty (or
    # whose column is missing) is SKIPPED for that row, and E: refs to
    # it are dropped — TmcfCsvParser.java:196-199 ("Case of
    # malformed/empty DCID. SKip this node") and :268-280
    # (CSV_EmptyDcidReferences drops the ref value). Verified against
    # the reference's McfResolverTest_TmcfCsv golden.
    node_ids: dict[str, pd.Series] = {}
    is_dcid: dict[str, pd.Series] = {}
    skip_rows: dict[str, pd.Series] = {}
    for tn in template:
        fallback = tn.table + "/" + tn.entity + "/" + rowid
        col = dcid_cols[tn.entity]
        has_dcid_prop = col is not None or dcid_consts[tn.entity] is not None
        if col and col in pdf.columns:
            raw = pdf[col]
            present = raw.notna() & (raw.astype(str) != "")
            parsed = _typed_values_vec("dcid", raw.fillna("").astype(str))
            dc = parsed["value"].where(present)
            node_ids[tn.entity] = dc.fillna(fallback)
            is_dcid[tn.entity] = present
            skip_rows[tn.entity] = ~present
        elif dcid_consts[tn.entity]:
            tv = parse_typed_value("dcid", dcid_consts[tn.entity])
            const = tv[1] if tv else None
            node_ids[tn.entity] = pd.Series(const or fallback, index=pdf.index)
            is_dcid[tn.entity] = pd.Series(const is not None, index=pdf.index)
            skip_rows[tn.entity] = pd.Series(const is None, index=pdf.index)
        else:
            node_ids[tn.entity] = fallback
            is_dcid[tn.entity] = pd.Series(False, index=pdf.index)
            # dcid column referenced but absent from the CSV: the
            # reference logs CSV_TmcfMissingColumn and skips the node
            skip_rows[tn.entity] = pd.Series(has_dcid_prop, index=pdf.index)

    def emit(idx, nid, prop, vt, val):
        frames.append(
            pd.DataFrame(
                {
                    "node_id": nid.loc[idx].values if hasattr(nid, "loc") else nid,
                    "prop": prop,
                    "value_type": vt.values if hasattr(vt, "values") else vt,
                    "value": val.values if hasattr(val, "values") else val,
                    "src_file": "",
                },
                index=idx,
            ).reset_index(drop=True)
        )

    # pass 2: emit statements — one vectorized pass per template term
    for tn in template:
        nid = node_ids[tn.entity]
        active = ~skip_rows[tn.entity]
        act_idx = pdf.index[active]
        if not len(act_idx):
            continue
        # template-assigned dcids stay as a PV on the node (the
        # reference's dcid-first pass keeps Vocabulary.DCID among the
        # node's PVs, which McfResolver.assignDcids checks —
        # TmcfCsvParser.java:156-230, McfResolver.java:190-193)
        if is_dcid[tn.entity].any():
            idx = pdf.index[is_dcid[tn.entity]]
            emit(idx, nid, "dcid", "TEXT", nid.loc[idx])
        for prop, kind, payload in tn.terms:
            if prop == "dcid":
                continue
            if kind == "CONST":
                tv = parse_typed_value(prop, payload)
                if tv:
                    emit(act_idx, nid, prop, tv[0], tv[1])
            elif kind == "ENTITY":
                tgt = payload
                if tgt in node_ids:
                    # refs to a dcid-skipped target row are DROPPED
                    # (CSV_EmptyDcidReferences, TmcfCsvParser.java:268-280)
                    keep = active & ~skip_rows[tgt]
                    kidx = pdf.index[keep]
                    if not len(kidx):
                        continue
                    resolved = is_dcid[tgt].loc[kidx]
                    val = np.where(resolved, node_ids[tgt].loc[kidx], "l:" + node_ids[tgt].loc[kidx])
                    vt = np.where(resolved, "RESOLVED_REF", "UNRESOLVED_REF")
                    emit(kidx, nid, prop, pd.Series(vt, index=kidx), pd.Series(val, index=kidx))
                else:
                    emit(act_idx, nid, prop, "UNRESOLVED_REF", f"l:{tgt}")
            else:  # COLUMN
                if payload not in pdf.columns:
                    continue
                cell = pdf[payload]
                present = cell.notna() & active
                cs = cell.astype(str).where(present, "")
                present &= cs != ""
                if not present.any():
                    continue
                # multi-value / quoted / escaped cells go through the
                # exact scalar splitter on DISTINCT values only
                hard = present & cs.str.contains(r'[,"\\\n]', regex=True)
                simple = present & ~hard
                if simple.any():
                    vals = cs[simple].str.strip()
                    keep = vals != ""
                    parsed = _typed_values_vec(prop, vals[keep])
                    ok = parsed["value_type"].notna()
                    idx = parsed.index[ok]
                    emit(idx, nid, prop, parsed.loc[idx, "value_type"], parsed.loc[idx, "value"])
                if hard.any():
                    lut = {
                        s: split_and_strip(s, strip_enclosing_quotes=False)
                        for s in cs[hard].unique()
                    }
                    split = cs[hard].map(lut)
                    split = split[split.notna()]
                    exploded = split.explode().dropna()
                    if len(exploded):
                        # exploded has duplicate row labels — go positional
                        labels = exploded.index
                        parsed = _typed_values_vec(
                            prop, exploded.reset_index(drop=True).astype(str)
                        )
                        ok = parsed["value_type"].notna().values
                        emit(
                            labels[ok],
                            nid,
                            prop,
                            parsed.loc[ok, "value_type"].values,
                            parsed.loc[ok, "value"].values,
                        )

    if not frames:
        return pd.DataFrame(columns=["node_id", "prop", "value_type", "value", "src_file"])
    return pd.concat(frames, ignore_index=True)


def expand_template(
    csv_df: DataFrame,
    tmcf_text: str,
    row_id_col: str | None = None,
    min_partitions: int | None = None,
) -> DataFrame:
    """CSV rows × template → long-form instance statements.

    ``row_id_col``: column providing the deterministic per-row id
    (the reference's TEST-mode row number). If None, a row number is
    derived by a global sort over all columns — deterministic, but a
    full shuffle; at scale always supply a natural key column.

    ``min_partitions``: repartition the scan up to this count before
    the Python stage — a single small CSV otherwise expands on one
    task (the reference parallelizes thread-per-FILE,
    Processor.java:272-293; we parallelize within the file too). At
    real scale the scan already has more partitions and this is a
    no-op (only ever raises the count).
    """
    template = parse_tmcf(tmcf_text)
    if min_partitions and csv_df.rdd.getNumPartitions() < min_partitions:
        csv_df = csv_df.repartition(min_partitions)
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
    """S3: CSV scan with header + backslash escapes (TmcfCsvParser.java:55-112).

    Commons-CSV (``withEscape('\\\\')``) honors backslash escapes ANYWHERE
    in a field; Spark's ``escape`` option only applies inside quoted
    fields — so ``\\"x\\"`` in an unquoted field keeps its backslashes.
    A post-scan ``\\<char> → <char>`` pass restores parity (verified
    against the reference's own McfResolverTest_TmcfCsv.csv fixture)."""
    df = (
        spark.read.option("header", True)
        .option("escape", "\\")
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
        .csv(path)
    )
    # NOTE: no widening here — downstream callers derive row ids from
    # FILE ORDER (the TmcfCsvParser contract; golden tests pin it), and
    # a round-robin repartition would scramble it. The 1-task unescape
    # is the price of the ordered single-file scan.
    def unescape(col):
        # commons-csv readEscape(): \n/\t/\r/\b/\f map to their control
        # chars; any other \<char> is the char itself; \\ is a backslash
        c = F.regexp_replace(col, r"\\\\", "\u0000")
        for esc, rep in (("n", "\n"), ("t", "\t"), ("r", "\r"), ("b", "\b"), ("f", "\f")):
            c = F.regexp_replace(c, r"\\" + esc, rep)
        c = F.regexp_replace(c, r"\\(.)", "$1")
        return F.regexp_replace(c, "\u0000", r"\\")
    unesc = [
        unescape(F.col(c)).alias(c) if t == "string" else F.col(c)
        for c, t in df.dtypes
    ]
    return df.select(*unesc)
