"""S6 — input-format dispatch.

Path-based format resolution mirroring the reference's
``PipelineUtils.resolveFormat`` (pipeline/util/src/main/java/org/
datacommons/ingestion/util/PipelineUtils.java:174-193): a path
containing ``tfrecord`` is a TFRecord file of serialized graphs, one
containing ``.jsonld`` is JSON-LD, anything else defaults to MCF text.
We extend the dispatch with the repo's other first-class sources
(template MCF + CSV are handled by the genmcf plan, parquet by the
transcript reader) so one call site can open any graph input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MCF = "mcf"
TFRECORD = "tfrecord"
JSONLD = "jsonld"
PARQUET = "parquet"


def resolve_format(path: str) -> str:
    """PipelineUtils.resolveFormat parity: substring checks, MCF default."""
    if path is None:
        raise ValueError("graph path cannot be None")
    if "tfrecord" in path:
        return TFRECORD
    if ".jsonld" in path:
        return JSONLD
    if path.endswith(".parquet") or path.endswith("/parquet"):
        return PARQUET
    return MCF


def read_graph(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Open any supported graph input as a node-rows DataFrame.

    ``fmt`` overrides the path-based resolution (the reference has no
    override — the Beam pipeline always trusts the path — but an
    explicit format is free here and avoids surprising substring hits).
    """
    fmt = fmt or resolve_format(path)
    if fmt == MCF:
        from import_spark.sources.mcf import read_mcf

        return read_mcf(spark, path)
    if fmt == TFRECORD:
        from import_spark.sources.tfrecord import read_tfrecords

        return read_tfrecords(spark, path)
    if fmt == JSONLD:
        from import_spark.sources.jsonld import read_jsonld

        return read_jsonld(spark, path)
    if fmt == PARQUET:
        return spark.read.parquet(path)
    raise ValueError(f"unknown graph format: {fmt!r} (path={path!r})")
