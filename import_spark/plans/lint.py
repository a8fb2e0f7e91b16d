"""``dc-import lint`` — instance MCF → sanity + existence + stat
checks → report.json, with NO output graph (the reference's lint mode,
Processor.java:59-96: processNodes → optional checkNodes existence
pass → processStats → persistLog).

Stages:
1. sanity    — McfChecker suite over the parsed nodes
   (operators/mcf_checker.py);
2. existence — local-graph missing-reference pass
   (ExistenceChecker.java:28-107; the reference also batches RPCs to
   the DC API — remote calls are out of scope here, so the check runs
   against the local graph only and ``Existence_NumChecks`` counts the
   local checks performed);
3. stats     — StatChecker over the SVObs nodes: duplicate-dcid value
   conflicts (Sanity_InconsistentSvObsValues, LEVEL_ERROR) and the
   StatsCheck_* series warnings (3-sigma, fluctuation buckets, date
   granularity/holes, per-date value inconsistency), series keyed by
   the full facet (place, sv, mmethod, obsPeriod, unit, sFactor —
   StatChecker.java:88-105);
4. report    — LogWrapper-model counter rollup + capped samples
   (report.py), written as ``report.json`` when ``out_dir`` is given.

Golden-tested against the reference's own lint fixture
(tool/src/test/resources/.../lint/statchecks) in tests/test_lint.py.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from import_spark.operators.mcf_checker import check_nodes, failed_node_ids
from import_spark.report import build_report, write_report

# StatChecker.java:88-105 — the series key is place x sv x the facet
FACET_PROPS = ["measurementMethod", "observationPeriod", "unit", "scalingFactor"]
SVOBS_TYPES = ("StatVarObservation",)


@dataclass
class LintResult:
    errors: DataFrame  # (node_id, level, counter, message)
    report: dict = field(default_factory=dict)


def _svobs_table(nodes: DataFrame) -> DataFrame:
    """Long-form nodes → one row per SVObs node with the series facet."""
    first = lambda p: F.min(F.when(F.col("prop") == p, F.col("value")))  # noqa: E731
    return (
        nodes.groupBy("node_id")
        .agg(
            first("typeOf").alias("_type"),
            F.coalesce(first("dcid"), F.col("node_id")).alias("dcid"),
            first("observationAbout").alias("entity"),
            first("variableMeasured").alias("variable"),
            first("observationDate").alias("date"),
            first("value").alias("value_str"),
            *[F.coalesce(first(p), F.lit("")).alias(p) for p in FACET_PROPS],
        )
        .filter(F.col("_type").isin(*SVOBS_TYPES))
    )


def run_lint(
    spark: SparkSession,
    nodes: DataFrame,
    out_dir: str | None = None,
    do_existence_checks: bool = True,
    known_nodes: DataFrame | None = None,
) -> LintResult:
    """Lint long-form instance-MCF node rows; returns errors + report.

    ``known_nodes``: optional extra (node) ids the existence pass
    treats as defined (the stand-in for the reference's DC-API
    existence backend)."""
    from import_spark.operators.skew import widen_narrow_input

    # widen BEFORE the checkpoint: localCheckpoint pins its partitioning,
    # so a narrow exploded input would serialize every downstream pass
    # (checker, svobs agg, stats, existence) on 1-4 tasks
    nodes = widen_narrow_input(nodes).localCheckpoint()

    # 1. sanity suite — the only stage whose failures count against
    # NumNodeSuccesses (the reference tallies successes at processNodes
    # time, before StatChecker runs, Processor.java:130-137). Not
    # materialized here: it flows into the single `errors`
    # localCheckpoint at the end, and the success tally is recovered
    # from that one materialization by excluding the StatChecker-time
    # counter (the only LEVEL_ERROR emitted outside the suite).
    errors = check_nodes(nodes).select("node_id", "level", "counter", "message")
    # StatVar dcid-collision tracking (StatVarState.java:116-189, wired
    # into the reference checker): processNodes-time LEVEL_ERRORs, so
    # they count against NumNodeSuccesses like any suite failure
    from import_spark.operators.mcf_checker import statvar_collisions

    errors = errors.unionByName(statvar_collisions(nodes))

    # 3a. same-LOGICAL-observation value conflicts: key = place x sv x
    # facet x date (SVOBS_VALUE_KEY_PROPS, StatChecker.java:55-63) —
    # dcid plays no part. One error per node whose float value differs
    # from the first-stored value; encounter order is approximated by
    # min(node_id), which matches the reference's file order for
    # parser-generated ids.
    svobs = _svobs_table(nodes).localCheckpoint()
    num = svobs.filter(
        F.col("value_str").rlike(r"\A-?\d+(\.\d+)?([eE][+-]?\d+)?\z")
    ).withColumn("_fv", F.col("value_str").cast("float"))
    obs_key = ["entity", "variable", *FACET_PROPS, "date"]
    first_val = Window.partitionBy(*obs_key).orderBy("node_id")
    dup = (
        num.withColumn("_first", F.first("_fv").over(first_val))
        .filter(F.col("_fv") != F.col("_first"))
        .select(
            "node_id",
            F.lit("LEVEL_ERROR").alias("level"),
            F.lit("Sanity_InconsistentSvObsValues").alias("counter"),
            F.concat(
                F.lit("Found conflicting values for the same observation :: node: '"),
                F.col("node_id"), F.lit("'"),
            ).alias("message"),
        )
    )
    errors = errors.unionByName(dup)

    # 3b. StatsCheck_* series warnings over numeric, deduped points
    from import_spark.operators.stats import (
        date_granularity_issues,
        max_fluctuation_per_series,
        sigma_outliers,
        value_inconsistencies,
    )

    key = ["entity", "variable", *FACET_PROPS]
    obs = svobs.filter(
        F.col("value_str").rlike(r"\A-?\d+(\.\d+)?([eE][+-]?\d+)?\z")
    ).select(
        "node_id",
        *key,
        "date",
        F.col("value_str").cast("double").alias("value"),
    )
    # series checks run on per-(series, date) deduped points like the
    # reference (StatChecker ingests each unique obs once). The
    # checkpoint sits HERE — after the dedup shuffle — because all four
    # stats passes scan `pts`; materializing pre-dedup `obs` instead
    # (obs is a cheap filter over the svobs checkpoint) would re-run
    # the dedup shuffle once per pass.
    pts = obs.dropDuplicates([*key, "date", "value"]).localCheckpoint()
    warn_parts = [
        sigma_outliers(pts, series_key=key).select(*key, "check"),
        max_fluctuation_per_series(pts, series_key=key).select(*key, "check"),
        date_granularity_issues(pts, series_key=key).select(*key, "check"),
        value_inconsistencies(pts, series_key=key).select(*key, "check"),
    ]
    warns = warn_parts[0]
    for p in warn_parts[1:]:
        warns = warns.unionByName(p)
    errors = errors.unionByName(
        warns.select(
            F.concat_ws("/", "entity", "variable").alias("node_id"),
            F.lit("LEVEL_WARNING").alias("level"),
            F.col("check").alias("counter"),
            F.concat(
                F.lit("Stats check failed :: series: '"),
                F.concat_ws("/", "entity", "variable"), F.lit("'"),
            ).alias("message"),
        )
    )

    # 2. existence pass (local graph; Existence_NumChecks counts
    # checks). Only ENTITY-graph reference props are decidable against
    # the local graph — schema-vocabulary refs (typeOf, populationType,
    # measuredProperty, ...) exist in the DC schema the reference
    # queries over RPC, so checking them locally would flag every
    # standard type; they are skipped here by design.
    LOCAL_EXISTENCE_PROPS = [
        "containedIn",
        "containedInPlace",
        "location",
        "memberOf",
        "observationAbout",
        "observedNode",
        "variableMeasured",
    ]
    n_existence_checks = 0
    if do_existence_checks:
        subjects = nodes.select(F.col("node_id").alias("node")).unionByName(
            nodes.filter(F.col("prop") == "dcid").select(F.col("value").alias("node"))
        )
        if known_nodes is not None:
            subjects = subjects.unionByName(known_nodes.select(F.col("node").alias("node")))
        refs = (
            nodes.filter(
                (F.col("value_type") == "RESOLVED_REF")
                & F.col("prop").isin(*LOCAL_EXISTENCE_PROPS)
            )
            .select("node_id", F.col("value").alias("ref"), "prop")
            .dropDuplicates(["node_id", "ref", "prop"])
            .localCheckpoint()
        )
        n_existence_checks = refs.count()
        missing = refs.join(
            F.broadcast(subjects.dropDuplicates(["node"]).withColumnRenamed("node", "ref")),
            "ref",
            "left_anti",
        )
        errors = errors.unionByName(
            missing.select(
                "node_id",
                F.lit("LEVEL_WARNING").alias("level"),
                F.concat(F.lit("Existence_MissingReference_"), F.col("prop")).alias("counter"),
                F.concat(
                    F.lit("Failed reference existence check :: ref: '"),
                    F.col("ref"), F.lit("', property: '"), F.col("prop"),
                    F.lit("', node: '"), F.col("node_id"), F.lit("'"),
                ).alias("message"),
            )
        )

    # the node tally is independent of the error set — run it
    # concurrently with the errors materialization + the two error
    # scans (guide §2.6: actions are only sequential because the
    # driver calls them sequentially; FIFO scheduling back-fills)
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    errors = errors.localCheckpoint()
    with ThreadPoolExecutor(max_workers=3) as pool:
        f_nodes = pool.submit(
            inheritable_thread_target(
                lambda: nodes.select("node_id").distinct().count()
            )
        )
        # suite failures only (processNodes-time tally): the lone
        # LEVEL_ERROR emitted after the tally is the StatChecker's
        # same-observation conflict, excluded by counter name
        f_failed = pool.submit(
            inheritable_thread_target(
                lambda: failed_node_ids(
                    errors.filter(F.col("counter") != "Sanity_InconsistentSvObsValues")
                ).count()
            )
        )
        f_report = pool.submit(
            inheritable_thread_target(lambda: build_report(errors))
        )
        n_nodes = f_nodes.result()
        n_failed = f_failed.result()
        report = f_report.result()
    info = {
        "NumNodesProcessed": n_nodes,
        "NumNodeSuccesses": n_nodes - n_failed,
    }
    if do_existence_checks:
        info["Existence_NumChecks"] = n_existence_checks
    for counter, value in info.items():
        report["levelSummary"].setdefault("LEVEL_INFO", {"counters": {}})[
            "counters"
        ][counter] = int(value)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        write_report(report, out_dir)
    return LintResult(errors=errors, report=report)
