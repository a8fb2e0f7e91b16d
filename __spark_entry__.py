"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship: KG construction over a transcript table that
              blends the sf0.001 ``documents`` rows with deterministic
              synthetic conversations, returning the deduplicated
              canonical triple table.
``queries`` — one entry per implemented SURVEY.md §2 operator
              (import_spark/queries.py).
``oracle_sql`` — DuckDB twins for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from import_spark.plans.kg_pipeline import run_pipeline
    from import_spark.sources.transcripts import dcid_dictionary, generate_transcripts

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    # treat each document as a single-turn conversation, blended with
    # synthetic multi-turn transcripts (same input schema)
    doc_turns = docs.select(
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("ts"),
    )
    tr = generate_transcripts(spark, 200).unionByName(doc_turns)
    res = run_pipeline(spark, tr, dcid_dictionary(spark), verify_text_invariant=False)
    return res.triples.select("subj", "pred", "obj_type", "obj")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from import_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from import_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
