"""Stage 4 — resolve: iterative local-ref resolution with quarantine.

Re-expresses the reference's multi-round resolver (O1/J4/O2,
McfResolver.java:39-128,182-242,244-322): local ``l:`` references are
replaced by the dcid of the conversation-local entity they name;
definition chains (``l:E1 = l:E2 = dcid:X``) resolve by iterating a
self-join to fixpoint; cycles and orphan refs are quarantined into a
failed table with error categories (McfResolver.java:262-281,92-110).

Divergence: a local defined with ≥2 distinct resolved targets inside
one conversation is an error and the local is quarantined
(PropertyResolver.java:114-127 analogue).

Scale: all joins key on ``(conv_id, local)`` — resolution state never
leaves the conversation, so a repartition by ``conv_id`` colocates the
whole loop; rounds are bounded (chain depth ≤ MAX_ROUNDS mirrors the
reference's level-capped recursion, linked_edge_generator.py:110-112);
each round ends with ``localCheckpoint`` to cut lineage
(McfResolver snapshot-per-round precedent, McfResolver.java:163-180).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 20


@dataclass
class ResolveResult:
    resolved: DataFrame  # TRIPLE rows with UNRESOLVED_REF rewritten
    failed: DataFrame  # (conv_id, turn_idx, subj, pred, obj, error) quarantine
    rounds: int


def _dedupe_defs(defs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Dedupe identical defs; flag divergent locals (≥2 distinct targets).

    Returns (clean_defs, divergent_locals).
    """
    # target identity: resolved dcid for direct targets, local name for chained
    d = defs.select(
        "conv_id",
        F.col("subj").alias("local"),
        F.col("obj_type"),
        F.col("obj").alias("target"),
    ).dropDuplicates(["conv_id", "local", "target"])
    counts = d.groupBy("conv_id", "local").agg(F.count("*").alias("n_targets"))
    divergent = counts.filter(F.col("n_targets") > 1).select("conv_id", "local")
    clean = d.join(divergent, ["conv_id", "local"], "left_anti")
    return clean, divergent


def resolve_locals(linked: DataFrame, num_partitions: int | None = None) -> ResolveResult:
    """Resolve UNRESOLVED_REF objects using DEF records in ``linked``."""
    linked = linked.cache()
    triples = linked.filter(F.col("kind") == "TRIPLE")
    defs = linked.filter(F.col("kind") == "DEF")

    clean, divergent = _dedupe_defs(defs)
    if num_partitions:
        clean = clean.repartition(num_partitions, "conv_id")

    # direct defs: target already a dcid; chained defs: target is l:X
    resolved_map = clean.filter(F.col("obj_type") == "RESOLVED_REF").select(
        "conv_id", "local", F.col("target").alias("dcid")
    )
    pending = clean.filter(F.col("obj_type") == "UNRESOLVED_REF").select(
        "conv_id", "local", F.col("target").alias("target_local")
    )
    # drop self-cycles immediately
    self_cyc = pending.filter(F.col("local") == F.col("target_local"))
    pending = pending.filter(F.col("local") != F.col("target_local"))

    rounds = 0
    resolved_map = resolved_map.localCheckpoint()
    pending = pending.localCheckpoint()
    while rounds < MAX_ROUNDS:
        rounds += 1
        step = pending.join(
            resolved_map.select("conv_id", F.col("local").alias("target_local"), "dcid"),
            ["conv_id", "target_local"],
            "left",
        )
        newly = step.filter(F.col("dcid").isNotNull()).select("conv_id", "local", "dcid")
        n_new = newly.count()  # convergence counter (RoundResult.numUpdated analogue)
        if n_new == 0:
            break
        resolved_map = resolved_map.unionByName(newly).localCheckpoint()
        pending = (
            step.filter(F.col("dcid").isNull())
            .select("conv_id", "local", "target_local")
            .localCheckpoint()
        )

    # leftovers: cycles or defs pointing at quarantined/undefined locals
    unresolved_defs = pending.select("conv_id", "local").unionByName(
        self_cyc.select("conv_id", "local")
    )

    # rewrite UNRESOLVED_REF objects in triples
    is_local = F.col("obj_type") == "UNRESOLVED_REF"
    locals_used = triples.filter(is_local)
    others = triples.filter(~is_local)

    joined = locals_used.join(
        resolved_map.select("conv_id", F.col("local").alias("obj"), "dcid"),
        ["conv_id", "obj"],
        "left",
    )
    ok = (
        joined.filter(F.col("dcid").isNotNull())
        .withColumn("obj", F.col("dcid"))
        .withColumn("obj_type", F.lit("RESOLVED_REF"))
        .drop("dcid")
    )
    # error categorization for the quarantine table (O2)
    failed_raw = joined.filter(F.col("dcid").isNull()).drop("dcid")
    failed = (
        failed_raw.join(
            divergent.withColumn("err", F.lit("Resolution_DivergingDcids")).withColumnRenamed(
                "local", "obj"
            ),
            ["conv_id", "obj"],
            "left",
        )
        .join(
            unresolved_defs.withColumn(
                "err2", F.lit("Resolution_IrreplaceableLocalRef")
            ).withColumnRenamed("local", "obj"),
            ["conv_id", "obj"],
            "left",
        )
        .withColumn(
            "error",
            F.coalesce(
                F.col("err"), F.col("err2"), F.lit("Resolution_OrphanLocalReference")
            ),
        )
        .drop("err", "err2")
    )
    return ResolveResult(resolved=others.unionByName(ok), failed=failed, rounds=rounds)
