"""Stage 6 — merge/materialize: graph dedupe + subject-hash layout.

Re-expresses the reference's distributed node combine (A1,
PipelineUtils.java:315-432 ``combineGraphNodes``): union all statement
sources, dedupe values per (subject, predicate), drop the generic
``typeOf: Place``/``Thing`` when a more specific type exists
(PipelineUtils.java:390-405), and write partitioned by subject hash
(the Edge-table layout, pipeline/.../Edge.java:10-23 + salted keys
SpannerClient.java:305-316).

Single-shuffle distinct: rows are hash-repartitioned by ``subj`` and
sorted within partitions by (subj, pred, obj); because every duplicate
of (subj, pred, obj) shares ``subj``, a partition-local lag filter is a
*global* distinct — one shuffle instead of the two a naive
``repartition(subj) + dropDuplicates`` plan would produce. Catalyst's
partial aggregation gives map-side combining automatically (the
reference's per-bundle 100k dedup cache, GraphReader.java:202-231).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GENERIC_TYPES = ("Place", "Thing")


def dedupe_triples(triples: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Distinct (subj, pred, obj_type, obj) with ONE shuffle, clustered by subj."""
    parts = [F.col("subj")]
    t = (
        triples.repartition(num_partitions, *parts)
        if num_partitions
        else triples.repartition(*parts)
    )
    w = Window.partitionBy("subj").orderBy("pred", "obj_type", "obj", "conv_id", "turn_idx")
    return (
        t.withColumn("_pp", F.lag("pred").over(w))
        .withColumn("_pt", F.lag("obj_type").over(w))
        .withColumn("_po", F.lag("obj").over(w))
        .filter(
            F.col("_pp").isNull()
            | (F.col("pred") != F.col("_pp"))
            | (F.col("obj_type") != F.col("_pt"))
            | (F.col("obj") != F.col("_po"))
        )
        .drop("_pp", "_pt", "_po")
    )


def drop_generic_types(triples: DataFrame) -> DataFrame:
    """Drop ``typeOf: Place|Thing`` rows when the subject has a more
    specific type (PipelineUtils.java:390-405 value-dedupe rule)."""
    is_type = F.col("pred") == "typeOf"
    specific = (
        triples.filter(is_type & ~F.col("obj").isin(*GENERIC_TYPES))
        .select("subj")
        .dropDuplicates(["subj"])
        .withColumn("_has_specific", F.lit(True))
    )
    out = triples.join(specific, "subj", "left")
    has_specific = F.coalesce(F.col("_has_specific"), F.lit(False))
    return out.filter(
        ~(is_type & F.col("obj").isin(*GENERIC_TYPES) & has_specific)
    ).drop("_has_specific")


def dedupe_and_materialize(
    triples: DataFrame,
    path: str,
    num_buckets: int = 64,
    num_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Fused global dedupe + subject-hash-bucketed write with ONE shuffle.

    Rows are hash-repartitioned by ``subj_bucket = hash(subj) % B``;
    every duplicate of (subj, pred, obj) lands in the same bucket, so a
    within-partition sort + lag filter is a global distinct, and the
    write's ``partitionBy(subj_bucket)`` reuses the same clustering —
    no second exchange (a naive dedupe-then-repartition-for-layout plan
    shuffles the full table twice).
    """
    b = triples.withColumn(
        "subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(num_buckets))
    ).withColumn("_h", F.xxhash64("subj", "pred", "obj_type", "obj"))
    b = (
        b.repartition(num_partitions, "subj_bucket")
        if num_partitions
        else b.repartition("subj_bucket")
    )
    # sort by the 8-byte key hash first: equal keys are adjacent and the
    # sorter resolves almost every comparison on the long prefix instead
    # of 4 string columns (~4x faster sort); the string keys follow as
    # exact tiebreakers (hash collisions stay correct), then lineage
    # cols pin a deterministic survivor
    w = Window.partitionBy("subj_bucket").orderBy(
        "_h", "subj", "pred", "obj_type", "obj", "conv_id", "turn_idx"
    )
    deduped = (
        b.withColumn("_prev_h", F.lag("_h").over(w))
        .withColumn("_ps", F.lag("subj").over(w))
        .withColumn("_pp", F.lag("pred").over(w))
        .withColumn("_pt", F.lag("obj_type").over(w))
        .withColumn("_po", F.lag("obj").over(w))
        .filter(
            F.col("_prev_h").isNull()
            | (F.col("_h") != F.col("_prev_h"))
            | (F.col("subj") != F.col("_ps"))
            | (F.col("pred") != F.col("_pp"))
            | (F.col("obj_type") != F.col("_pt"))
            | (F.col("obj") != F.col("_po"))
        )
        .drop("_prev_h", "_ps", "_pp", "_pt", "_po", "_h")
    )
    deduped.write.mode(mode).partitionBy("subj_bucket").parquet(path)


def materialize(
    triples: DataFrame,
    path: str,
    num_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Write the triple table partitioned by subject hash bucket.

    On Iceberg this is ``writeTo(...).overwritePartitions()`` with a
    ``bucket(subj)`` partition transform (S9/S10 mapping); on plain
    parquet we emit an explicit bucket column. Dynamic partition
    overwrite gives the reference's delete-before-write idempotence
    (SpannerClient.java:92-137).
    """
    (
        triples.withColumn("subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(num_buckets)))
        .repartition("subj_bucket")
        .write.mode(mode)
        .partitionBy("subj_bucket")
        .parquet(path)
    )
