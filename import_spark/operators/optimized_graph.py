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

    # Series assembly stays JVM-side: ONE hash aggregate (partial
    # combine on the mappers, ObjectHashAggregate) builds each series'
    # date-sorted obs array natively — sort_array on the (date, dcid,
    # ...) struct is the reference's series sort (date-major,
    # dcid-tiebroken; dcid is unique per obs so later fields never
    # decide). Python then encodes ONE series per input row through a
    # single mapInPandas — at high series cardinality (the 100-TB
    # shape: place x variable x facet) this avoids applyInPandas'
    # per-group pandas-DataFrame construction, which dominated when
    # groups average a handful of observations (measured 11.2s → the
    # aggregate shape at sf0.1; same payload bytes).
    obs_struct = F.struct(
        F.col("date"),
        F.col("dcid"),
        F.col("value"),
        F.col("local_node_id"),
        *([F.col("pvs")] if has_pvs else []),
    )
    def _by_date_dcid(left, right):
        # struct ordering can't include the pvs map; compare only the
        # (date, dcid) sort key — dcid is unique per obs, so later
        # fields never decide
        return (
            F.when(left["date"] < right["date"], F.lit(-1))
            .when(left["date"] > right["date"], F.lit(1))
            .when(left["dcid"] < right["dcid"], F.lit(-1))
            .when(left["dcid"] > right["dcid"], F.lit(1))
            .otherwise(F.lit(0))
        )

    from import_spark.operators.skew import widen_narrow_input

    # widen a narrow scan so the map-side partial grouping parallelizes,
    # and spread the series over every core for the Python encode stage
    # (AQE would coalesce the tiny post-shuffle partitions down to a
    # handful, under-parallelizing the per-series protowire work)
    par = df.sparkSession.sparkContext.defaultParallelism
    series = (
        widen_narrow_input(df)
        .groupBy(*KEY_COLS)
        .agg(F.collect_list(obs_struct).alias("_obs"))
        .repartition(par)
        .withColumn("_obs", F.array_sort("_obs", _by_date_dcid))
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in range(len(pdf)):
                key = {c: (pdf[c].iloc[i] or None) for c in KEY_COLS}
                obs_bytes = []
                for o in pdf["_obs"].iloc[i]:
                    # explicit errors beat silent corruption: a None
                    # value would stringify to the text 'None', and a
                    # None pv would AttributeError deep inside protowire
                    if o["value"] is None:
                        raise ValueError(
                            "null observation value for "
                            f"dcid={o['dcid']!r} date={o['date']!r}"
                        )
                    value = str(o["value"])
                    is_num = bool(_FLOAT_RE.match(value))
                    row_pvs = None
                    if has_pvs and o["pvs"]:
                        for k, v in o["pvs"].items():
                            if v is None:
                                raise ValueError(
                                    f"null pv value for property {k!r}, "
                                    f"dcid={o['dcid']!r}"
                                )
                        row_pvs = {
                            k: [(pw.VT_TEXT, v)]
                            for k, v in o["pvs"].items()
                            if k != "keyString"
                        }
                    obs_bytes.append(
                        pw.encode_stat_var_obs(
                            date=o["date"],
                            dcid=o["dcid"],
                            number=float(value) if is_num else None,
                            text=None if is_num else value,
                            local_node_id=_elide_local_id(
                                o["dcid"], o["local_node_id"]
                            ),
                            pvs=row_pvs,
                        )
                    )
                payloads.append(
                    pw.encode_optimized_graph(pw.encode_sv_obs_series(key, obs_bytes))
                )
            yield pd.DataFrame({"payload": pd.Series(payloads, dtype=object)})

    return series.mapInPandas(_encode, _OUT_SCHEMA)


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
    """Java Double.toString (GraphUtils.java:260 uses it for MCF text):
    NaN/Infinity by name; decimal form with a mandatory fraction digit
    for 1e-3 <= |v| < 1e7; otherwise computerized scientific notation
    'd.dddEx' (uppercase E, no '+', shortest round-trip digits — the
    same shortest-digits rule Python's repr uses)."""
    import math
    from decimal import Decimal

    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == 0.0:
        return "-0.0" if math.copysign(1.0, v) < 0 else "0.0"
    a = abs(v)
    if 1e-3 <= a < 1e7:
        s = repr(v)
        if "." not in s:
            s += ".0"
        return s
    sign, digits, exp = Decimal(repr(v)).normalize().as_tuple()
    digs = "".join(map(str, digits))
    e10 = len(digits) + exp - 1
    mant = digs[0] + "." + (digs[1:] or "0")
    return ("-" if sign else "") + f"{mant}E{e10}"


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
