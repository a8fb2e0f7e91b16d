"""Existence checking: nodes/triples referenced but not defined.

Re-expresses ExistenceChecker (J8, ExistenceChecker.java:28-107): the
reference batches RPCs against the DC API with local caches; here the
known-node set is a DataFrame (broadcast when small) and the check is
one anti-join — missing references come back as counter rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def missing_references(
    triples: DataFrame,
    known_nodes: DataFrame,
    ref_col: str = "obj",
    node_col: str = "node",
    broadcast: bool = True,
) -> DataFrame:
    """Distinct referenced ids absent from ``known_nodes`` (left anti)."""
    refs = triples.select(F.col(ref_col).alias("ref")).dropDuplicates(["ref"])
    kn = known_nodes.select(F.col(node_col).alias("ref")).dropDuplicates(["ref"])
    if broadcast:
        kn = F.broadcast(kn)
    return refs.join(kn, "ref", "left_anti").withColumn(
        "check", F.lit("Existence_MissingReference")
    )


def dangling_objects(triples: DataFrame) -> DataFrame:
    """Self-contained variant: RESOLVED_REF objects that never appear as
    a subject (dangling graph edges) — the local-graph existence pass
    (ExistenceChecker.addLocalGraph, ExternalIdResolver.java:126-152)."""
    subjects = triples.select(F.col("subj").alias("node")).dropDuplicates(["node"])
    refs = (
        triples.filter(F.col("obj_type") == "RESOLVED_REF")
        .select(F.col("obj").alias("node"))
        .dropDuplicates(["node"])
    )
    return refs.join(subjects, "node", "left_anti")
