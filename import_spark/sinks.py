"""Table sinks (S9-S12): idempotent materialization of the output model.

The reference writes Node/Edge/Observation mutations to Spanner with
InsertOrUpdate semantics and delete-before-write per provenance
(SpannerClient.java:139-277, :92-137), and the Python importer writes
``triples``/``observations`` SQL tables (simple/stats/db.py:88-147).
Spark-side equivalents:

- ``write_triples``      parquet/Iceberg layout bucketed by subject hash
  (operators/merge.materialize) — Edge table (Edge.java:10-23)
- ``save_as_table``      catalog tables (S12, saveAsTable)
- ``overwrite_provenance`` partition-scoped overwrite = the reference's
  partitioned-DML delete-before-write (S10)

Write ordering (S11, Wait.on in GraphIngestionPipeline.java:273-316) is
the driver's job sequencing: call sites order these calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def save_as_table(df: DataFrame, name: str, mode: str = "overwrite") -> None:
    """S12: catalog table sink (spark_catalog / Iceberg catalog alike)."""
    df.write.mode(mode).saveAsTable(name)


def write_observations(obs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Observations table partitioned by variable (the serving-side
    access path filters on variable first, db.py:100-113)."""
    obs.write.mode(mode).partitionBy("variable").parquet(path)


def overwrite_provenance(df: DataFrame, path: str, provenance: str) -> None:
    """S10: replace exactly one provenance partition (idempotent
    re-import; dynamic partitionOverwriteMode replaces only the
    partitions present in ``df``).

    The dynamic mode is set on the writer, not assumed from the session:
    under Spark's default (static) overwrite mode this call would wipe
    every other provenance partition — the reference contract deletes
    only ``WHERE provenance = ?`` (SpannerClient.java:92-137).
    """
    (
        df.withColumn("provenance", F.lit(provenance))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("provenance")
        .parquet(path)
    )
