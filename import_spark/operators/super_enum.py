"""Super-enum aggregation — roll sibling StatVars constrained on a
whitelisted enum property up to their parent enum, with SUM/MIN/MAX/
MEAN observation aggregation.

Reference: ``pipeline/workflow/aggregation-helper/aggregation/
super_enum_aggregation_generator.py:26-490`` — (1) SVs carrying one of
the whitelisted enum properties (age, detailedLevelOfSchool,
schoolGradeLevel, educationalAttainment) and an aggregatable
(statType, measuredProperty) pair and no measurementDenominator are
eligible; (2) the whitelisted property's enum value is swapped for its
``specializationOf`` parent, the SV's key string is rebuilt (sorted
``predicate=object`` concat, bookkeeping predicates excluded) and
matched against curated (non-``dc/``) StatVars by key — unmatched
targets get the generated ``dc/<base32(FARM_FINGERPRINT(key))>`` dcid
(the dcid.cc encoding, bit-shared with C1's ``long_id``); (3) new SV
nodes/edges export under ``<provenance>_SuperEnum``; (4) TimeSeries
facets are rewritten (measurementMethod ``dcAggregate/``-prefixed,
provenance suffixed, ``isDcAggregate=true``) with recomputed facet
ids; (5) observations group by (target SV, entity, facet, date) and
aggregate by the strategy table (util.cc via GET_AGGR_STRATEGY).

Spark shape: every step is a filtered scan + hash aggregate/join; the
only Python is the FARM_FINGERPRINT/base32 id over DISTINCT key
strings (broadcast-joined back). The reference's ``STRING_AGG …
ORDER BY predicate`` leaves ties (multi-valued predicates)
unspecified; this implementation sorts by (predicate, object) —
deterministic, and applied identically to both the generated and the
curated side so key matching is unaffected. A curated key matched by
several curated SVs takes the MIN dcid (the reference would emit
duplicate rows).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WHITELISTED_ENUM_PROPS = [
    "age",
    "detailedLevelOfSchool",
    "schoolGradeLevel",
    "educationalAttainment",
]

# generator:259-264,280-285 — predicates excluded from the key string
EXCLUDED_KEY_PREDICATES = [
    "name",
    "description",
    "provenance",
    "isPublic",
    "url",
    "memberOf",
    "label",
    "alternateName",
    "utteranceTemplate",
    "dcid",
    "keyStr",
    "differenceBaselineResolution",
    "scalingFactor",
    "unit",
]

_AGGREGATABLE_PROPS = [
    "amount",
    "area",
    "coverageArea",
    "generation",
    "reserves",
    "retailDrugDistribution",
]
_MEAN_STAT_PROPS = ["precipitation", "maxTemperature", "minTemperature"]


def aggr_strategy(stat_type, prop):
    """GET_AGGR_STRATEGY (generator:86-133) as a Column: SUM/MIN/MAX
    for aggregatable properties, MEAN for the whitelisted
    (statType, property) pairs, else NONE."""
    aggregatable = F.lower(prop).endswith("count") | prop.isin(_AGGREGATABLE_PROPS)
    mean_pair = (
        ((stat_type == "meanValue") & (prop == "concentration"))
        | (
            (stat_type == "measuredValue")
            & prop.isin(
                "lifetimeContractionProbability",
                "heavyPrecipitationIndex",
                "consecutiveDryDays",
            )
        )
        | (stat_type.isin("kurtosis", "skewness", "stdDeviation") & prop.isin(_MEAN_STAT_PROPS))
    )
    return F.when(
        aggregatable,
        F.when(stat_type == "measuredValue", "SUM")
        .when(stat_type == "minValue", "MIN")
        .when(stat_type == "maxValue", "MAX")
        .otherwise("NONE"),
    ).otherwise(F.when(mean_pair, F.lit("MEAN")).otherwise("NONE"))


@dataclass
class SuperEnumResult:
    nodes: DataFrame
    edges: DataFrame
    timeseries: DataFrame
    observations: DataFrame


def _key_str(edge_rows: DataFrame, group_cols: list[str]) -> DataFrame:
    """STRING_AGG(CONCAT(pred,'=',obj), '' ORDER BY pred) per group —
    one hash aggregate; ties broken by object for determinism."""
    return (
        edge_rows.groupBy(*group_cols)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("predicate", "object_id"))
                    ),
                    lambda s: F.concat(s["predicate"], F.lit("="), s["object_id"]),
                ),
                "",
            ).alias("key_str")
        )
    )


def _with_generated_dcid(df: DataFrame, key_col: str = "key_str") -> DataFrame:
    """'dc/' + base32(FARM_FINGERPRINT(key)) over DISTINCT keys
    (generator DC_BASE32_ENCODE; bit-shared with functions/farmhash
    long_id, Guava-parity-gated)."""
    from import_spark.functions.farmhash import long_id
    from import_spark.functions.udfs import distinct_key_join

    return distinct_key_join(
        df, key_col, "generated_sv", lambda k: "dc/" + long_id(k), drop_key=False
    )


def _new_mm(mm):
    """Facet measurementMethod rewrite (generator:377-386)."""
    return (
        F.when(
            mm.isNull() | (mm == "") | (mm == "DataCommonsAggregate"),
            F.lit("DataCommonsAggregate"),
        )
        .when(mm.startswith("dcAggregate/"), mm)
        .otherwise(F.concat(F.lit("dcAggregate/"), mm))
    )


def _facet_fid_key(facet):
    """prov_SuperEnum^new_mm^period^scaling^unit^'true'."""
    return F.concat_ws(
        "^",
        F.concat(facet["provenance"], F.lit("_SuperEnum")),
        _new_mm(facet["measurementMethod"]),
        F.coalesce(facet["observationPeriod"], F.lit("")),
        F.coalesce(facet["scalingFactor"], F.lit("")),
        F.coalesce(facet["unit"], F.lit("")),
        F.lit("true"),
    )


def super_enum_aggregate(
    edges: DataFrame,
    nodes: DataFrame,
    timeseries: DataFrame,
    observations: DataFrame,
    input_provenances: list[str],
) -> SuperEnumResult:
    """Run the super-enum aggregation over the Spanner-shaped tables.

    ``edges``: (subject_id, predicate, object_id, provenance);
    ``nodes``: (subject_id, types array<string>); ``timeseries``:
    OBS_KEY + provenance + facet struct (calculations.FACET_FIELDS);
    ``observations``: OBS_KEY + (date, value string).
    """
    from import_spark.operators.calculations import _with_facet_id

    # Step 1-2: specializationOf relations + prov-scoped SV edges for
    # SVs carrying a whitelisted enum property
    spec = edges.where(F.col("predicate") == "specializationOf").select(
        F.col("subject_id").alias("child"), F.col("object_id").alias("parent")
    )
    scoped = edges.where(F.col("provenance").isin(input_provenances))
    whitelisted_subjects = (
        scoped.where(F.col("predicate").isin(WHITELISTED_ENUM_PROPS))
        .select("subject_id")
        .distinct()
    )
    target_edges = scoped.join(whitelisted_subjects, "subject_id").select(
        "subject_id", "predicate", "object_id", F.col("provenance").alias("source_provenance")
    )

    # Step 3: eligible SVs (one hash aggregate; strategy is native CASE)
    eligible = (
        target_edges.groupBy("subject_id")
        .agg(
            # ANY_VALUE in the reference; MIN for determinism
            F.min("source_provenance").alias("source_provenance"),
            F.max(F.when(F.col("predicate") == "measuredProperty", F.col("object_id"))).alias(
                "measured_property"
            ),
            F.max(F.when(F.col("predicate") == "statType", F.col("object_id"))).alias("stat_type"),
            F.max(
                F.when(F.col("predicate") == "measurementDenominator", F.col("object_id"))
            ).alias("denominator"),
        )
        .where(
            F.col("measured_property").isNotNull()
            & F.col("stat_type").isNotNull()
            & F.col("denominator").isNull()
            & (aggr_strategy(F.col("stat_type"), F.col("measured_property")) != "NONE")
        )
    )

    # Step 4: source SV -> (whitelisted_pred, parent_enum) mappings.
    # The key build uses the SUBJECT-level provenance from the
    # eligibility aggregate (the reference joins e.source_provenance
    # from the ANY_VALUE GROUP BY, generator:214-231), NOT the per-edge
    # provenance: an SV whose definition edges span provenances must
    # yield ONE full key, not partial per-provenance keys.
    raw_props = target_edges.drop("source_provenance").join(
        eligible.select("subject_id", "source_provenance"), "subject_id"
    )
    sv_to_parent = (
        raw_props.where(F.col("predicate").isin(WHITELISTED_ENUM_PROPS))
        .select(
            "subject_id",
            F.col("predicate").alias("whitelisted_pred"),
            F.col("object_id").alias("child_enum"),
        )
        .join(spec, F.col("child_enum") == F.col("child"))
        .select("subject_id", "whitelisted_pred", "child_enum", F.col("parent").alias("parent_enum"))
    )
    target_props = (
        raw_props.join(sv_to_parent, "subject_id")
        .select(
            F.col("subject_id").alias("source_sv"),
            "source_provenance",
            "whitelisted_pred",
            "parent_enum",
            "predicate",
            F.when(
                F.col("predicate") == F.col("whitelisted_pred"), F.col("parent_enum")
            ).otherwise(F.col("object_id")).alias("object_id"),
        )
        .where(~F.col("predicate").isin(EXCLUDED_KEY_PREDICATES))
    )
    target_keys = _key_str(
        target_props, ["source_sv", "source_provenance", "whitelisted_pred", "parent_enum"]
    )

    # curated matches: non-dc/ StatVars by identical key string (one
    # per key — MIN dcid on collision, see module docstring)
    curated_svs = (
        nodes.where(
            F.array_contains("types", "StatisticalVariable")
            & ~F.col("subject_id").startswith("dc/")
        )
        .select("subject_id")
        .distinct()
    )
    curated_keys = (
        _key_str(
            edges.join(curated_svs, "subject_id").where(
                ~F.col("predicate").isin(EXCLUDED_KEY_PREDICATES)
            ),
            ["subject_id"],
        )
        .groupBy("key_str")
        .agg(F.min("subject_id").alias("curated_id"))
    )

    generated = (
        _with_generated_dcid(target_keys)
        .join(curated_keys, "key_str", "left")
        .select(
            "source_sv",
            "source_provenance",
            "whitelisted_pred",
            "parent_enum",
            "key_str",
            F.coalesce(F.col("curated_id"), F.col("generated_sv")).alias("target_sv"),
            F.col("curated_id").isNotNull().alias("is_curated"),
        )
    )
    new_targets = generated.where(~F.col("is_curated"))

    # Step 5: new SV nodes
    out_nodes = new_targets.select(
        F.col("target_sv").alias("subject_id"),
        F.lit(None).cast("string").alias("value"),
        F.lit(None).cast("binary").alias("bytes"),
        F.lit(None).cast("string").alias("name"),
        F.array(F.lit("StatisticalVariable")).alias("types"),
    ).distinct()

    # Step 6: reconstructed edges for new SVs (NO key-predicate
    # exclusion here — the reference re-emits every source edge)
    wl = raw_props.where(F.col("predicate").isin(WHITELISTED_ENUM_PROPS)).select(
        "subject_id",
        F.col("predicate").alias("whitelisted_pred"),
        F.col("object_id").alias("child_enum"),
    )
    nt = new_targets.select(
        F.col("source_sv").alias("_nt_sv"),
        F.col("whitelisted_pred").alias("_nt_pred"),
        F.col("parent_enum").alias("_nt_parent"),
        "target_sv",
    )
    out_edges = (
        raw_props.join(wl, "subject_id")
        .join(spec, F.col("child_enum") == F.col("child"))
        .join(
            nt,
            (F.col("subject_id") == F.col("_nt_sv"))
            & (F.col("whitelisted_pred") == F.col("_nt_pred"))
            & (F.col("parent") == F.col("_nt_parent")),
        )
        .select(
            F.col("target_sv").alias("subject_id"),
            "predicate",
            F.when(F.col("predicate") == F.col("whitelisted_pred"), F.col("parent"))
            .otherwise(F.col("object_id"))
            .alias("object_id"),
            F.concat(F.col("source_provenance"), F.lit("_SuperEnum")).alias("provenance"),
        )
        .distinct()
    )

    # Step 7: TimeSeries with rewritten facets + recomputed facet ids
    ts_scoped = timeseries.where(F.col("provenance").isin(input_provenances))
    src_ts = ts_scoped.join(
        generated.select(F.col("source_sv").alias("variable_measured"), "target_sv").distinct(),
        "variable_measured",
    )
    facet = F.col("facet")
    new_facet = F.struct(
        F.concat(facet["provenance"], F.lit("_SuperEnum")).alias("provenance"),
        _new_mm(facet["measurementMethod"]).alias("measurementMethod"),
        facet["unit"].alias("unit"),
        facet["observationPeriod"].alias("observationPeriod"),
        facet["scalingFactor"].alias("scalingFactor"),
        F.lit(True).alias("isDcAggregate"),
    )
    # entity1 participates in the DISTINCT and is then dropped WITHOUT
    # a second distinct — bit-faithful to the reference (UniqueTS
    # :388-396 includes entity1; the ParsedTS select drops it with no
    # further DISTINCT), so two entities sharing one (entities, facet)
    # emit two identical TS rows exactly as the reference does. (The
    # stat_var_aggregator.py reference file makes the OPPOSITE choice
    # — its UniqueTS excludes entity1 — and statvar_agg.py mirrors
    # that; the asymmetry is the reference's own.)
    out_ts = _with_facet_id(
        src_ts.select(
            F.col("target_sv").alias("variable_measured"),
            "entities",
            "entity1",
            "extra_entities_id",
            new_facet.alias("facet"),
            _facet_fid_key(facet).alias("_facet_key"),
        ).distinct()
    ).select("variable_measured", "entities", "extra_entities_id", "facet_id", "facet")

    # Step 8: aggregated observations — one shuffle on the output key;
    # all four aggregates share it, the strategy CASE picks one
    mapped = (
        observations.join(
            ts_scoped.select(
                "variable_measured",
                "entity1",
                "extra_entities_id",
                "facet_id",
                _facet_fid_key(F.col("facet")).alias("_facet_key"),
            ),
            ["variable_measured", "entity1", "extra_entities_id", "facet_id"],
        )
        .join(
            generated.select(
                F.col("source_sv").alias("variable_measured"), "target_sv"
            ).distinct(),
            "variable_measured",
        )
        .join(
            eligible.select(
                F.col("subject_id").alias("variable_measured"),
                "measured_property",
                "stat_type",
            ),
            "variable_measured",
        )
        .select(
            F.col("target_sv"),
            "entity1",
            "extra_entities_id",
            "_facet_key",
            "date",
            F.col("value").try_cast("double").alias("val_num"),
            "measured_property",
            "stat_type",
        )
    )
    agg = (
        mapped.groupBy("target_sv", "entity1", "extra_entities_id", "_facet_key", "date")
        .agg(
            F.max("stat_type").alias("stat_type"),
            F.max("measured_property").alias("measured_property"),
            F.sum("val_num").alias("_sum"),
            F.min("val_num").alias("_min"),
            F.max("val_num").alias("_max"),
            F.avg("val_num").alias("_avg"),
        )
        .withColumn(
            "total_val",
            F.when(
                aggr_strategy(F.col("stat_type"), F.col("measured_property")) == "SUM",
                F.col("_sum"),
            )
            .when(
                aggr_strategy(F.col("stat_type"), F.col("measured_property")) == "MIN",
                F.col("_min"),
            )
            .when(
                aggr_strategy(F.col("stat_type"), F.col("measured_property")) == "MAX",
                F.col("_max"),
            )
            .when(
                aggr_strategy(F.col("stat_type"), F.col("measured_property")) == "MEAN",
                F.col("_avg"),
            ),
        )
        .where(F.col("total_val").isNotNull())
    )
    out_obs = _with_facet_id(agg).select(
        F.col("target_sv").alias("variable_measured"),
        "entity1",
        "extra_entities_id",
        "facet_id",
        "date",
        F.col("total_val").cast("string").alias("value"),
    )

    return SuperEnumResult(out_nodes, out_edges, out_ts, out_obs)
