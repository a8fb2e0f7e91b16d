"""Incremental transcript ingest with Structured Streaming.

The reference is batch-only (GraphIngestionPipeline.java:74-77 runs
Beam batch mode) — resumability there is re-running imports per
provenance. This module is the Spark-native upgrade the SURVEY's §2.8
flags as the natural stretch: new conversation partitions landing in
the transcripts directory are picked up by a file-source stream with
``Trigger.AvailableNow`` (drain-everything-then-stop — cron-friendly),
pushed through the SAME extract→link transforms, and appended to the
statement snapshot exactly once (checkpointed source offsets make the
ingest idempotent across restarts).

Downstream stages (resolve/canonicalize/merge) remain batch jobs over
the snapshot: local-ref resolution is conversation-local, so appending
whole conversations never invalidates previously resolved ones.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from import_spark.operators.extract import extract_statements
from import_spark.operators.link import link_statements
from import_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def ingest_available_now(
    spark: SparkSession,
    transcripts_dir: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    dcid_dict,
) -> int:
    """Drain all unprocessed transcript files into the statement
    snapshot; returns the number of micro-batches processed."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(transcripts_dir)
    )
    n_batches = {"n": 0}

    def process(batch_df, batch_id: int) -> None:
        linked = link_statements(extract_statements(batch_df), dcid_dict)
        linked.write.mode("append").parquet(snapshot_dir)
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]
