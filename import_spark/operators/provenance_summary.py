"""ProvenanceSummary — the per-(variable, provenance) serving-cache
summary: facet-level stats plus place-type roll-ups with top-3 sample
places.

Reference: ``pipeline/workflow/aggregation-helper/aggregation/
provenance_summary_generator.py:56-340`` — joins TimeSeries ⨝
Observation for the scoped provenances, attaches each observed
entity's ``typeOf`` place type, then per (variable, provenance,
facet): min/max date and value, observation count, time-series count
(distinct ``entity|extra``), and per place type the place count,
min/max value and the 3 lexicographically-smallest sample dcids with
their node names; everything is assembled into one JSON cache row per
(variable, provenance) for the KeyValueStore.

Spark shape: the reference's 10k-place ``EXECUTE IMMEDIATE … IN (…)``
pushdown vs full-edge-stream switch is a BigQuery string-literal
workaround — here the place scoping is simply a join against the
distinct observed entities (broadcast under AQE when small, shuffle
otherwise). Top-3 samples are ``slice(array_sort(collect_set(…)), 1,
3)`` — no window, no per-group sort of full data. The final JSON is
built with ``to_json(…, ignoreNullFields=false)`` to keep BQ
JSON_OBJECT's explicit nulls; the reference's unordered ARRAY_AGG of
facet summaries is sorted by facet_id for determinism.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUMMARY_KEYS = ["variable_measured", "provenance_dcid", "facet_id"]


@dataclass
class ProvenanceSummaryResult:
    facet_summaries: DataFrame
    place_type_summaries: DataFrame
    cache_rows: DataFrame  # (type, key, provenance, value) KeyValueStore rows


def provenance_summary(
    timeseries: DataFrame,
    observations: DataFrame,
    edges: DataFrame,
    nodes: DataFrame,
    input_provenances: list[str],
) -> ProvenanceSummaryResult:
    """Build the ProvenanceSummary cache rows plus the structured
    intermediate tables (generator:56-340).

    ``timeseries``: OBS_KEY + provenance + facet struct (FACET_FIELDS,
    optionally ``isDcAggregate``); ``observations``: OBS_KEY + (date,
    value string); ``edges``: (subject_id, predicate, object_id) for
    the typeOf place types; ``nodes``: (subject_id, name) for sample
    place names.
    """
    facet = F.col("facet")
    facet_fields = timeseries.schema["facet"].dataType.fieldNames()
    is_dc_aggregate = (
        facet["isDcAggregate"].cast("boolean")
        if "isDcAggregate" in facet_fields
        else F.lit(None).cast("boolean")
    )
    # Step 1: flat obs = TimeSeries ⨝ Observation on the 4-key
    obs_flat = (
        timeseries.where(F.col("provenance").isin(input_provenances))
        .select(
            "variable_measured",
            "entity1",
            "extra_entities_id",
            "facet_id",
            "provenance",
            facet["measurementMethod"].alias("measurement_method"),
            facet["observationPeriod"].alias("observation_period"),
            facet["unit"].alias("unit"),
            facet["scalingFactor"].alias("scaling_factor"),
            is_dc_aggregate.alias("is_dc_aggregate"),
        )
        .join(
            observations.select(
                "variable_measured",
                "entity1",
                "extra_entities_id",
                "facet_id",
                F.col("date").alias("date_val"),
                F.col("value").try_cast("double").alias("value_num"),
            ),
            ["variable_measured", "entity1", "extra_entities_id", "facet_id"],
        )
        .withColumnRenamed("entity1", "observation_about")
    )

    # Steps 2-4: place types for observed entities (the BQ IN-pushdown
    # gate is a join here)
    place_types = (
        edges.where(F.col("predicate") == "typeOf")
        .select(F.col("subject_id").alias("observation_about"), F.col("object_id").alias("place_type"))
        .join(obs_flat.select("observation_about").distinct(), "observation_about")
    )
    prepared = obs_flat.join(place_types, "observation_about", "left")

    # Steps 5-7: per place type — count, min/max, top-3 sample dcids
    typed = prepared.where(F.col("place_type").isNotNull())
    group_keys = [
        F.col("variable_measured"),
        F.col("provenance").alias("provenance_dcid"),
        F.col("facet_id"),
    ]
    place_stats = typed.groupBy(*group_keys, "place_type").agg(
        F.min("value_num").alias("min_val"),
        F.max("value_num").alias("max_val"),
        F.countDistinct("observation_about").alias("place_count"),
        F.slice(F.array_sort(F.collect_set("observation_about")), 1, 3).alias("top_dcids"),
    )
    samples = (
        place_stats.select(*_SUMMARY_KEYS, "place_type", F.explode("top_dcids").alias("dcid"))
        .join(
            nodes.select(F.col("subject_id").alias("dcid"), "name"),
            "dcid",
            "left",
        )
        .groupBy(*_SUMMARY_KEYS, "place_type")
        .agg(
            F.array_sort(F.collect_list(F.struct("dcid", "name"))).alias("top_places")
        )
    )
    place_type_summaries = place_stats.drop("top_dcids").join(
        samples, _SUMMARY_KEYS + ["place_type"]
    )

    # Step 8a: facet-level stats
    prov = F.col("provenance")
    facet_summaries = (
        obs_flat.groupBy(
            "variable_measured", prov.alias("provenance_dcid"), F.col("facet_id")
        )
        .agg(
            F.min(
                F.when(prov.startswith("dc/base/"), F.expr("substring(provenance, 9)")).otherwise(
                    prov
                )
            ).alias("import_name"),
            F.min("measurement_method").alias("measurement_method"),
            F.min("observation_period").alias("observation_period"),
            F.min("unit").alias("unit"),
            F.min("scaling_factor").alias("scaling_factor"),
            F.min("is_dc_aggregate").alias("is_dc_aggregate"),
            F.min("date_val").alias("min_date"),
            F.max("date_val").alias("max_date"),
            F.min("value_num").alias("facet_min"),
            F.max("value_num").alias("facet_max"),
            F.count("*").alias("facet_obs_count"),
            F.countDistinct(
                F.concat_ws("|", "observation_about", "extra_entities_id")
            ).alias("facet_ts_count"),
        )
    )

    # Step 8b: the JSON cache rows
    pts = place_type_summaries.groupBy(*_SUMMARY_KEYS).agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("place_type"),
                        F.struct(
                            F.col("place_count"),
                            F.col("min_val").alias("min_value"),
                            F.col("max_val").alias("max_value"),
                            F.col("top_places"),
                        ).alias("v"),
                    )
                )
            )
        ).alias("place_type_summary")
    )
    per_facet = facet_summaries.join(pts, _SUMMARY_KEYS, "left").select(
        "variable_measured",
        "provenance_dcid",
        "import_name",
        "facet_obs_count",
        "facet_ts_count",
        F.struct(
            F.struct(
                "measurement_method",
                "observation_period",
                "unit",
                "scaling_factor",
                F.coalesce("is_dc_aggregate", F.lit(False)).alias("is_dc_aggregate"),
            ).alias("series_key"),
            F.col("min_date").alias("earliest_date"),
            F.col("max_date").alias("latest_date"),
            F.col("facet_min").alias("min_value"),
            F.col("facet_max").alias("max_value"),
            F.col("facet_obs_count").cast("double").alias("observation_count"),
            F.col("facet_ts_count").cast("double").alias("time_series_count"),
            F.col("place_type_summary"),
            F.col("facet_id").alias("_facet_id"),  # deterministic array order
        ).alias("facet_summary"),
    )
    cache_rows = (
        per_facet.groupBy("variable_measured", "provenance_dcid")
        .agg(
            F.min("import_name").alias("import_name"),
            F.sum("facet_obs_count").cast("double").alias("observation_count"),
            F.sum("facet_ts_count").cast("double").alias("time_series_count"),
            F.transform(
                F.array_sort(
                    F.collect_list("facet_summary"),
                    lambda a, b: F.when(a["_facet_id"] < b["_facet_id"], -1)
                    .when(a["_facet_id"] > b["_facet_id"], 1)
                    .otherwise(0),
                ),
                lambda s: s.dropFields("_facet_id"),
            ).alias("series_summary"),
        )
        .select(
            F.lit("ProvenanceSummary").alias("type"),
            F.col("variable_measured").alias("key"),
            F.col("provenance_dcid").alias("provenance"),
            F.to_json(
                F.struct("import_name", "observation_count", "time_series_count", "series_summary"),
                {"ignoreNullFields": "false"},
            ).alias("value"),
        )
    )
    return ProvenanceSummaryResult(facet_summaries, place_type_summaries, cache_rows)
