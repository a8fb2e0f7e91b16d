"""Stage 6 — merge/materialize: graph dedupe + subject-hash layout.

Re-expresses the reference's distributed node combine (A1,
PipelineUtils.java:315-432 ``combineGraphNodes``): union all statement
sources, dedupe values per (subject, predicate), drop the generic
``typeOf: Place``/``Thing`` when a more specific type exists
(PipelineUtils.java:390-405), and write partitioned by subject hash
(the Edge-table layout, pipeline/.../Edge.java:10-23 + salted keys
SpannerClient.java:305-316).

Dedupe shape (measured, not guessed): a hash AGGREGATE on the full
(subj, pred, obj_type, obj) key with a deterministic min-lineage
survivor. The 4-key shuffle is skew-free (key cardinality ~= row
count) and gets map-side partial combining (the reference's per-bundle
100k dedup cache, GraphReader.java:202-231). The earlier design — one
shuffle onto the 64-value ``subj_bucket`` key + window-sort lag
filter — bottlenecked scaling two ways: balls-in-bins skew (64 keys
hashed into ~2x-cores partitions makes the slowest task ~2x the mean,
and the imbalance grows with parallelism) and the per-partition sort
itself. At 200k convs the aggregate plan measures 0.88 scaling
efficiency 2->8 cores vs 0.65 for the window plan, and is ~25% faster
at 8 cores. The bucketed write layout costs one SECOND exchange — but
of already-deduped rows, onto the write's own partitioning, so the
big pre-dedupe table still shuffles exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GENERIC_TYPES = ("Place", "Thing")

# Write-exchange fanout: the bucketed write shuffles on
# pmod(xxhash64(subj), WRITE_FANOUT * num_buckets) — same bucket
# assignment (the mod-num_buckets residue is unchanged), 16x more
# distinct exchange keys, so the write tasks stay balanced at any
# parallelism while files stay bounded at fanout x buckets.
WRITE_FANOUT = 16


def dedupe_triples(triples: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Distinct (subj, pred, obj_type, obj) as ONE skew-free hash
    aggregate with map-side partial combine; the surviving lineage
    columns are the minimum (conv_id, turn_idx) — the same survivor the
    former sort-based plan's orderBy pinned, so results are
    bit-identical and deterministic under any shuffle order."""
    t = triples.repartition(num_partitions, "subj") if num_partitions else triples
    return (
        t.groupBy("subj", "pred", "obj_type", "obj")
        .agg(F.min(F.struct("conv_id", "turn_idx")).alias("_l"))
        .select(
            "subj",
            "pred",
            "obj_type",
            "obj",
            F.col("_l.conv_id").alias("conv_id"),
            F.col("_l.turn_idx").alias("turn_idx"),
        )
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
    """Global dedupe + subject-hash-bucketed write.

    Two exchanges, each doing the one thing it is good at:
    1. the big pre-dedupe table shuffles ONCE, on the full
       (subj, pred, obj_type, obj) key — skew-free (key cardinality
       ~= row count) and partially aggregated map-side, so duplicate
       rows combine before they hit the wire;
    2. the already-deduped rows exchange onto a 16x-finer key whose
       mod-``num_buckets`` IS the bucket (``pmod(h, 16B) % B ==
       pmod(h, B)``), so every fine key lands wholly in one task and
       file count stays O(16 x buckets) — independent of task count —
       while the exchange balances 16B balls into the task bins
       instead of B (a 64-value key hashed into ~2x-cores partitions
       re-creates the balls-in-bins skew the aggregate rewrite
       removed: at 16 partitions the slowest write task carries ~2x
       the mean; with the 16x fanout the spread is ~sqrt(16) tighter).
    This replaced a single-shuffle window-sort plan whose 64-value
    bucket key hashed into ~2x-cores partitions: the balls-in-bins
    imbalance grows with parallelism and capped measured 2->8-core
    scaling at 0.65 (0.88 for this plan), with the per-partition sort
    slower than the hash aggregate on top.
    """
    fine = F.pmod(F.xxhash64("subj"), F.lit(num_buckets * WRITE_FANOUT))
    deduped = dedupe_triples(triples).withColumn(
        "subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(num_buckets))
    )
    deduped = (
        deduped.repartition(num_partitions, fine)
        if num_partitions
        else deduped.repartition(fine)
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
        .repartition(F.pmod(F.xxhash64("subj"), F.lit(num_buckets * WRITE_FANOUT)))
        .write.mode(mode)
        .partitionBy("subj_bucket")
        .parquet(path)
    )
