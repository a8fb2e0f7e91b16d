"""StatVar SUM aggregation — roll multiple source StatVars up into one
ancestor StatVar as new TimeSeries + Observation rows.

Reference: ``pipeline/workflow/aggregation-helper/aggregation/
stat_var_aggregator.py:56-325`` — from the Spanner Observation ⨝
TimeSeries join scoped to the source SVs and input provenances it
(1) rewrites each facet to the aggregate form (measurementMethod →
``DataCommonsAggregate`` when empty/already-aggregate else
``dcAggregate/``-prefixed, provenance → the output provenance,
``isDcAggregate`` = true); (2) per (entity1, extra_entities_id, date)
counts the DISTINCT contributing sources and SUMs their SAFE_CASTed
values; (3) keeps only groups where every source contributed
(``contribution_count = len(source_svs)``) unless the check is
skipped; (4) emits one Observation row per surviving group under the
ancestor SV with a FARM_FINGERPRINT facet id over
``prov^mm^period^scaling^unit^'true'`` (the Java
``TimeSeries.calculateFacetId`` order, :215-224,280-291), and one
TimeSeries row per DISTINCT (extra_entities_id, entities, rewritten
facet) that has at least one complete group (:159-175 — note the
reference's TS output carries no entity1; parity kept).

Spark shape: the scoped obs ⨝ ts join is built once and
localCheckpointed (the two EXPORT queries of the reference share one
scan here), then each output is a single hash aggregate; the only
Python is the signed FARM_FINGERPRINT over DISTINCT facet keys
(facet cardinality, not row cardinality — calculations._with_facet_id).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OBS_KEY = ["variable_measured", "entity1", "extra_entities_id", "facet_id"]


@dataclass
class StatVarAggregationConfig:
    """stat_var_aggregator.py:28-35. Provenance names are passed
    already resolved (``get_provenance_name`` is the caller's, as in
    entity_agg/super_enum)."""

    ancestor_sv: str
    source_svs: list[str]
    input_provenances: list[str]
    output_provenance: str
    # NOTE: a duplicated entry in source_svs makes the completeness
    # check unsatisfiable (contribution_count is COUNT DISTINCT but the
    # target is len(source_svs)) — bit-faithful to the reference
    # (:129-131 filter_condition), which has the same property.
    skip_all_sources_present_check: bool = False


@dataclass
class StatVarAggResult:
    timeseries: DataFrame
    observations: DataFrame


def _new_facet_key(facet, output_provenance: str):
    """prov^new_mm^period^scaling^unit^'true' (:215-224, :280-291)."""
    from import_spark.operators.super_enum import _new_mm

    return F.concat_ws(
        "^",
        F.lit(output_provenance),
        _new_mm(facet["measurementMethod"]),
        F.coalesce(facet["observationPeriod"], F.lit("")),
        F.coalesce(facet["scalingFactor"], F.lit("")),
        F.coalesce(facet["unit"], F.lit("")),
        F.lit("true"),
    )


def aggregate_stat_vars(
    observations: DataFrame,
    timeseries: DataFrame,
    config: StatVarAggregationConfig,
) -> StatVarAggResult:
    """Run the SUM roll-up over the Spanner-shaped tables.

    ``observations``: OBS_KEY + (date, value string); ``timeseries``:
    OBS_KEY + provenance + entities (JSON string) + facet struct
    (calculations.FACET_FIELDS). Returns the ancestor-SV TimeSeries and
    Observation rows the reference's two EXPORT queries produce.
    """
    from import_spark.operators.calculations import _with_facet_id
    from import_spark.operators.super_enum import _new_mm

    n_sources = len(config.source_svs)
    facet = F.col("facet")

    # the shared obs ⨝ ts base of both EXPORTs (:160-180, :292-302):
    # both sides prune to the source SVs / input provenances BEFORE the
    # join, so the shuffle moves only the aggregation's own rows
    ts_scoped = timeseries.where(
        F.col("variable_measured").isin(config.source_svs)
        & F.col("provenance").isin(config.input_provenances)
    ).select(
        *OBS_KEY,
        "entities",
        F.struct(
            F.lit(config.output_provenance).alias("provenance"),
            _new_mm(facet["measurementMethod"]).alias("measurementMethod"),
            facet["unit"].alias("unit"),
            facet["observationPeriod"].alias("observationPeriod"),
            facet["scalingFactor"].alias("scalingFactor"),
            F.lit(True).alias("isDcAggregate"),
        ).alias("new_facet"),
        _new_facet_key(facet, config.output_provenance).alias("_facet_key"),
    )
    base = (
        observations.where(F.col("variable_measured").isin(config.source_svs))
        .join(ts_scoped, OBS_KEY)
        .select(
            "variable_measured",
            "entity1",
            "extra_entities_id",
            "date",
            F.col("value").try_cast("double").alias("val_num"),  # SAFE_CAST
            "entities",
            "new_facet",
            "_facet_key",
        )
        # lazy: this is a plan builder — materialize on first action,
        # not at construction (same flag as calculations.py's shared
        # obs⨝facets base)
        .localCheckpoint(eager=False)
    )

    keep = (
        F.lit(True)
        if config.skip_all_sources_present_check
        else (F.col("contribution_count") == n_sources)
    )

    # Observation EXPORT (:292-325): group on the REWRITTEN facet id —
    # facets that collapse under the rewrite aggregate together
    agg = (
        base.groupBy("entity1", "extra_entities_id", "_facet_key", "date")
        .agg(
            F.sum("val_num").alias("total_val"),
            F.countDistinct("variable_measured").alias("contribution_count"),
        )
        .where(keep & F.col("total_val").isNotNull())
    )
    obs_out = _with_facet_id(agg).select(
        F.lit(config.ancestor_sv).alias("variable_measured"),
        "entity1",
        "extra_entities_id",
        "facet_id",
        "date",
        F.col("total_val").cast("string").alias("value"),
    )

    # TimeSeries EXPORT (:155-175): completeness judged per (entity1,
    # extra, date, entities, facet) group, then DISTINCT over
    # (extra, entities, facet) — entity1 is dropped from the output,
    # matching the reference's emitted column set
    ts_groups = (
        base.groupBy(
            "entity1", "extra_entities_id", "date", "entities", "new_facet", "_facet_key"
        )
        .agg(F.countDistinct("variable_measured").alias("contribution_count"))
        .where(keep)
        .select("extra_entities_id", "entities", "new_facet", "_facet_key")
        .distinct()
    )
    ts_out = _with_facet_id(ts_groups).select(
        F.lit(config.ancestor_sv).alias("variable_measured"),
        "extra_entities_id",
        "facet_id",
        "entities",
        F.col("new_facet").alias("facet"),
    )
    return StatVarAggResult(timeseries=ts_out, observations=obs_out)
