"""Optimized-graph TFRecord export / import — the reference pipeline's
space-efficient SVObs interchange format, Spark-first.

Reference behavior re-expressed (not ported):
- series assembly: ``convertMcfGraphToMcfStatVarObsSeries`` + key-grouped
  ``buildOptimizedMcfGraphFromSeries``
  (``util/.../GraphUtils.java:287-360,415-440``) — here one
  ``groupBy(key).applyInPandas`` that emits one ``McfOptimizedGraph``
  payload per series, so grouping is a single hash shuffle on the
  7-part series key with map-side partial grouping; no driver pass.
- oneof val: parse-as-double-else-text (``GraphUtils.java:332-337``,
  ``nodeDoubleValue`` = Java ``Double.parseDouble`` catching NFE) —
  vectorized via ``pd.to_numeric`` guarded by a Java-compatible float
  regex.
- local_node_id elided when it equals / prefixes the dcid or matches
  the generated-node pattern (``GraphUtils.java:94-98``).
- read path: ``parseToOptimizedGraph`` + series→long-form flatten
  (``pipeline/util/.../PipelineUtils.java:81-112``,
  ``GraphUtils.java:217-277``) as ``mapInPandas`` over TFRecord
  payloads — decode stays on executors, one narrow stage.

At 100 TB the shuffle key (place × variable × facet) is high-cardinality
and near-uniform (hot keys are bounded by dates-per-series), so the
single exchange here scales; payload encode/decode is pure per-row
Python-bytes work batched through Arrow.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from import_spark.functions import protowire as pw

# Series-key columns, in Key field order (Mcf.proto:119-127).
KEY_COLS = [
    "observation_about",
    "variable_measured",
    "measurement_method",
    "observation_period",
    "scaling_factor",
    "unit",
    "provenance_url",
]

# Java Double.parseDouble-compatible decimal/exponent forms (the hex and
# Infinity/NaN spellings never appear in obs values; they fall to text).
_FLOAT_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
_LOCAL_NODE_ID_RE = re.compile(r"^[A-Za-z0-9_@.#-]+/E[0-9]+/[A-Za-z0-9_-]+$")

_OUT_SCHEMA = "payload binary"
_OBS_SCHEMA = (
    "observation_about string, variable_measured string,"
    " measurement_method string, observation_period string,"
    " scaling_factor string, unit string, provenance_url string,"
    " date string, value string, value_number double, dcid string,"
    " local_node_id string, pvs map<string,string>"
)


def _elide_local_id(dcid: str, local_node_id) -> str | None:
    """GraphUtils.java:94-98 — drop ids equivalent to the dcid."""
    if not local_node_id:
        return None
    if (
        local_node_id == dcid
        or local_node_id == "dcid:" + dcid
        or _LOCAL_NODE_ID_RE.match(local_node_id)
    ):
        return None
    return local_node_id


def to_optimized_graph(obs: DataFrame) -> DataFrame:
    """Long-form SVObs rows → one ``payload: binary`` row per series.

    Required columns: ``observation_about variable_measured date value
    dcid`` (GraphUtils.java:50-57). Optional: the other four key parts,
    ``local_node_id``, and ``pvs: map<string,string>`` free PVs
    (keyString dropped, GraphUtils.java:343-346).
    """
    cols = set(obs.columns)
    for req in ("observation_about", "variable_measured", "date", "value", "dcid"):
        if req not in cols:
            raise ValueError(f"to_optimized_graph: missing column {req}")
    df = obs
    for c in KEY_COLS:
        if c not in cols:
            df = df.withColumn(c, F.lit(None).cast("string"))
    if "local_node_id" not in cols:
        df = df.withColumn("local_node_id", F.lit(None).cast("string"))
    has_pvs = "pvs" in cols

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        key = {c: (pdf[c].iloc[0] or None) for c in KEY_COLS}
        # Date-sorted, dcid-tiebroken for byte determinism (the
        # reference's series sort: PipelineUtils series assembly).
        pdf = pdf.sort_values(["date", "dcid"], kind="mergesort")
        values = pdf["value"].astype(str)
        is_num = values.str.match(_FLOAT_RE)
        nums = pd.to_numeric(values.where(is_num), errors="coerce")
        obs_bytes = []
        for i in range(len(pdf)):
            row_pvs = None
            if has_pvs and pdf["pvs"].iloc[i]:
                row_pvs = {
                    k: [(pw.VT_TEXT, v)]
                    for k, v in pdf["pvs"].iloc[i].items()
                    if k != "keyString"
                }
            obs_bytes.append(
                pw.encode_stat_var_obs(
                    date=pdf["date"].iloc[i],
                    dcid=pdf["dcid"].iloc[i],
                    number=nums.iloc[i] if is_num.iloc[i] else None,
                    text=None if is_num.iloc[i] else values.iloc[i],
                    local_node_id=_elide_local_id(
                        pdf["dcid"].iloc[i], pdf["local_node_id"].iloc[i]
                    ),
                    pvs=row_pvs,
                )
            )
        payload = pw.encode_optimized_graph(pw.encode_sv_obs_series(key, obs_bytes))
        return pd.DataFrame({"payload": [payload]})

    keyed = df.select(*KEY_COLS, "date", "value", "dcid", "local_node_id",
                      *(["pvs"] if has_pvs else []))
    return keyed.groupBy(*KEY_COLS).applyInPandas(_encode, _OUT_SCHEMA)


def from_optimized_graph(payloads: DataFrame, payload_col: str = "payload") -> DataFrame:
    """``payload: binary`` rows → long-form SVObs rows (flatten twin of
    GraphUtils.java:217-277; ``value`` carries Java's
    ``Double.toString`` rendering for numbers so MCF text output
    matches; ``value_number`` keeps the exact double)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                key, obs_list = pw.decode_optimized_graph(bytes(payload))
                base = {c: key.get(c) for c in KEY_COLS}
                for o in obs_list:
                    num = o["number"]
                    rows.append(
                        {
                            **base,
                            "date": o["date"],
                            "value": _java_double_str(num)
                            if num is not None
                            else o["text"],
                            "value_number": num,
                            "dcid": o["dcid"],
                            "local_node_id": o["local_node_id"] or o["dcid"],
                            "pvs": {k: v[0][1] for k, v in o["pvs"].items()}
                            or None,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    *KEY_COLS,
                    "date",
                    "value",
                    "value_number",
                    "dcid",
                    "local_node_id",
                    "pvs",
                ],
            )

    return payloads.mapInPandas(_decode, _OBS_SCHEMA)


def _java_double_str(v: float) -> str:
    """Java Double.toString: integral doubles render as '39.0', not
    '39' (GraphUtils.java:260 uses Double.toString for MCF text)."""
    if v == int(v) and abs(v) < 1e16:
        return f"{v:.1f}"
    return repr(v)


def export_optimized_graph(obs: DataFrame, path: str, compress: bool = True) -> None:
    """Series-group + proto-encode + GZIP TFRecord sink (the reference's
    ``writeOptimizedMcfGraph`` TFRecordIO shape)."""
    from import_spark.sources.tfrecord import write_tfrecords

    write_tfrecords(to_optimized_graph(obs), path, payload_col="payload",
                    compress=compress)


def read_optimized_graph(spark: SparkSession, path: str) -> DataFrame:
    """TFRecord scan + proto decode → long-form SVObs rows
    (``readMcfGraph`` twin, PipelineUtils.java:98-141)."""
    from import_spark.sources.tfrecord import read_tfrecords

    return from_optimized_graph(read_tfrecords(spark, path), payload_col="payload")
