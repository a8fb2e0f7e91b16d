"""Per-partition lineage records for materialized pipeline stages.

The north rule requires every stage to write *per-partition lineage*
(not just run-level counters) to a checkpoint table so a resumed or
audited run can account for each physical output partition: which
stage produced it, how many rows it holds, and which slice of the
input (conv_id span) it derives from. The reference gets the same
accounting from Beam's per-bundle counters plus Spanner mutation
batches (LogWrapper.java:50-68 counters; SpannerClient.java:92-137
delete-before-write units); here the physical partition IS the
parquet file, so lineage is one column-pruned aggregate per
materialized table keyed by ``input_file_name()``.

Layout: ``<checkpoint_dir>/lineage`` parquet, partitioned by
``(run_id, stage)``. Dynamic partition overwrite makes re-runs
idempotent per stage — a resumed run replaces exactly its own
stage partitions and leaves other runs' lineage untouched
(the same delete-before-write semantics as the data tables).

Cost posture: the lineage scan projects only the file name, the
table's partition column and the two lineage keys — at 100 TB it
reads a few narrow columns of an already-written table once, and it
runs only for materializing runs (``out_dir``/``checkpoint_dir``
set), never in the hot in-memory path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COLS = ["file", "part", "rows", "conv_id_min", "conv_id_max", "run_id", "stage"]


def partition_lineage(
    table: DataFrame, part_col: str | None, run_id: str, stage: str
) -> DataFrame:
    """One row per physical file of ``table``: row count + conv_id span.

    ``part_col`` (e.g. ``_cls`` for the statement snapshot,
    ``subj_bucket`` for the triple table) is carried as the logical
    partition label; tables without one get ``part = NULL``.
    """
    part = (
        F.col(part_col).cast("string") if part_col and part_col in table.columns else F.lit(None).cast("string")
    )
    has_conv = "conv_id" in table.columns
    conv = F.col("conv_id") if has_conv else F.lit(None).cast("string")
    return (
        table.select(
            F.input_file_name().alias("file"),
            part.alias("part"),
            conv.alias("_conv"),
        )
        .groupBy("file", "part")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("_conv").alias("conv_id_min"),
            F.max("_conv").alias("conv_id_max"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("stage", F.lit(stage))
        .select(*LINEAGE_COLS)
    )


def write_stage_lineage(
    spark: SparkSession,
    table_path: str,
    lineage_dir: str,
    run_id: str,
    stage: str,
    part_col: str | None = None,
) -> None:
    """Append (idempotently, per (run_id, stage)) the per-file lineage
    of the parquet table at ``table_path`` to ``lineage_dir``."""
    import shutil

    # dynamic partition overwrite replaces only partitions PRESENT in
    # the written data — an empty stage (e.g. a re-run with no failed
    # rows) would leave the previous run's stage partition stale, so
    # clear it explicitly first
    shutil.rmtree(
        os.path.join(lineage_dir, f"run_id={run_id}", f"stage={stage}"),
        ignore_errors=True,
    )
    table = spark.read.parquet(table_path)
    (
        partition_lineage(table, part_col, run_id, stage)
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("run_id", "stage")
        .parquet(lineage_dir)
    )


def read_lineage(spark: SparkSession, lineage_dir: str) -> DataFrame | None:
    if not os.path.isdir(lineage_dir):
        return None
    return spark.read.parquet(lineage_dir)
