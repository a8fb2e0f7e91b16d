"""Entity aggregation — typed-entity counts per (location, date
bucket, constraint slice) with deterministically-generated
StatisticalVariables.

Reference: ``pipeline/workflow/aggregation-helper/aggregation/
entity_aggregation_generator.py:26-473`` — from the Edge table it
(1) extracts the target-typed entities (provenance-scoped), their
locations (multiple location props, ``latLong/`` nodes dropped),
dates, and per-constraint values; (2) groups constraints into
independent slices (two non-wildcard conditions on the same property
split into separate slices); (3) per slice joins entities × locations
× dates × constraint values, applies range/equality filters
(SAFE_CAST numeric semantics), buckets dates per requested format
(YYYY→P1Y, YYYY-MM→P1M, YYYY-MM-DD→P1D) and counts rows per
(location, entity_type, bucket, wildcard values); (4) generates the
SV dcid ``dc/sv/gp/<FARM_FINGERPRINT(sorted key=value concat)>`` and
a human-readable SV name; (5) exports Node / Edge / TimeSeries /
Observation rows with the DataCommonsAggregate facet.

Spark shape: each temp table is one filtered scan of the edge table
(predicate equality pushes down) joined on ``entity_id``; the
per-format UNION ALL of group-bys is a single explode of
``(bucket, period)`` structs into ONE hash aggregate; FARM_FINGERPRINT
runs over DISTINCT key strings only (SV cardinality, not row
cardinality) via the shared broadcast-join helper. The reference's
``CURRENT_DATE()`` fallback for configs without a date property is a
required ``default_date`` parameter here — deterministic jobs don't
read the clock.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PERIODS = {"YYYY": ("P1Y", 4), "YYYY-MM": ("P1M", 7), "YYYY-MM-DD": ("P1D", 10)}


@dataclass
class EntityAggregationConfig:
    """entity_aggregation_generator.py:26-35 (output/input imports are
    provenance ids here — the get_provenance_name step is the
    caller's)."""

    entity_types: list[str]
    location_props: list[str]
    date_prop: str | None
    agg_date_formats: list[str]
    constraints: list[dict]
    output_provenance: str
    input_provenances: list[str]
    default_date: str | None = None  # CURRENT_DATE stand-in when date_prop is None


@dataclass
class EntityAggResult:
    nodes: DataFrame
    edges: DataFrame
    timeseries: DataFrame
    observations: DataFrame


def parse_constraints(constraints: list[dict]) -> list[dict]:
    """_parse_constraints (generator:62-133): wildcard / [min max] /
    [min -] / [- max] / equality, with the bracketed val_str encoding
    used in SV dcids, names and edges."""
    parsed = []
    for i, c in enumerate(constraints):
        if not isinstance(c, dict) or "property" not in c:
            continue
        prop = c["property"]
        unit_suffix = f" {c['unit']}" if c.get("unit") else ""
        val_col = f"{prop}_{i}_val"
        entry = {"prop": prop, "index": i, "val_col": val_col, "is_wildcard": False}
        num = F.col(val_col).try_cast("double")  # SAFE_CAST
        if c.get("wildcard"):
            entry.update(is_wildcard=True, filter=None, val_str="*")
        elif "min" in c and "max" in c:
            entry.update(
                filter=(num >= c["min"]) & (num <= c["max"]),
                val_str=f"[{c['min']} {c['max']}{unit_suffix}]",
            )
        elif "min" in c:
            entry.update(filter=num >= c["min"], val_str=f"[{c['min']} -{unit_suffix}]")
        elif "max" in c:
            entry.update(filter=num <= c["max"], val_str=f"[- {c['max']}{unit_suffix}]")
        elif "value" in c:
            entry.update(filter=F.col(val_col) == str(c["value"]), val_str=str(c["value"]))
        else:
            continue
        parsed.append(entry)
    return parsed


def constraint_slices(parsed: list[dict]) -> list[list[dict]]:
    """generator:153-168: a constraint joins the first slice that has
    no non-wildcard condition on the same property."""
    if not parsed:
        return [[]]
    slices: list[list[dict]] = []
    for c in parsed:
        for s in slices:
            if not any(sc["prop"] == c["prop"] and not sc["is_wildcard"] for sc in s):
                s.append(c)
                break
        else:
            slices.append([c])
    return slices


def _prop_values(edges: DataFrame, prop: str, entities: DataFrame, out_col: str) -> DataFrame:
    """One filtered scan → distinct (entity_id, value), scoped to the
    target entities."""
    vals = (
        edges.where(F.col("predicate") == prop)
        .select(F.col("subject_id").alias("entity_id"), F.col("object_id").alias(out_col))
        .distinct()
    )
    return vals.join(entities.select("entity_id"), "entity_id")


def _sv_dcid_expr(slice_cons: list[dict]):
    """Step 4 (generator:305-343): 'dc/sv/gp/' + FARM_FINGERPRINT of
    the sorted 'key=value' concat. Returns the KEY column; the
    fingerprint itself is joined in over distinct keys."""
    sv_props = {"measuredProperty": "count", "statType": "measuredValue"}
    for c in slice_cons:
        if not c["is_wildcard"]:
            sv_props[c["prop"]] = c["val_str"]
    all_keys = (
        ["populationType"]
        + list(sv_props.keys())
        + [c["prop"] for c in slice_cons if c["is_wildcard"]]
    )
    parts = []
    for i, key in enumerate(sorted(all_keys)):
        if i > 0:
            parts.append(F.lit(","))
        if key == "populationType":
            parts += [F.lit("populationType="), F.col("entity_type")]
        elif key in sv_props:
            parts.append(F.lit(f"{key}={sv_props[key]}"))
        else:
            wc = next(c for c in slice_cons if c["prop"] == key)
            parts += [F.lit(f"{key}="), F.coalesce(F.col(wc["val_col"]), F.lit(""))]
    return F.concat(*parts)


def _sv_name_expr(slice_cons: list[dict]):
    """generator:345-357."""
    parts = [F.lit("Count of "), F.col("entity_type")]
    static_desc = " and ".join(
        f"{c['prop']} {c['val_str']}" for c in slice_cons if not c["is_wildcard"]
    )
    if static_desc:
        parts.append(F.lit(f" with {static_desc}"))
    for c in slice_cons:
        if c["is_wildcard"]:
            parts += [F.lit(f", {c['prop']}="), F.coalesce(F.col(c["val_col"]), F.lit("unknown"))]
    return F.concat(*parts)


def _with_fingerprint(df: DataFrame, key_col, out_col: str, prefix: str = "") -> DataFrame:
    """Signed FARM_FINGERPRINT over DISTINCT keys, broadcast-joined
    back (functions.udfs.distinct_key_join)."""
    from import_spark.functions.udfs import distinct_key_join
    from import_spark.operators.calculations import signed_farm_fingerprint

    return distinct_key_join(
        df, key_col, out_col, lambda k: prefix + str(signed_farm_fingerprint(k))
    )


def aggregate_entities(edges: DataFrame, config: EntityAggregationConfig) -> EntityAggResult:
    """Run one aggregation config; return the four Spanner-table
    exports (generator:135-473)."""
    prov = config.output_provenance

    # Step 1 — scoped working sets (each one filtered scan + distinct)
    entities = (
        edges.where(
            (F.col("predicate") == "typeOf")
            & F.col("object_id").isin(config.entity_types)
            & F.col("provenance").isin(config.input_provenances)
        )
        .select(F.col("subject_id").alias("entity_id"), F.col("object_id").alias("entity_type"))
        .distinct()
    )
    locations = (
        edges.where(F.col("predicate").isin(config.location_props))
        .select(F.col("subject_id").alias("entity_id"), F.col("object_id").alias("location_id"))
        .where(~F.col("location_id").startswith("latLong/"))
        .distinct()
        .join(entities.select("entity_id"), "entity_id")
    )
    if config.date_prop:
        dates = _prop_values(edges, config.date_prop, entities, "raw_date")
    else:
        if not config.default_date:
            raise ValueError(
                "config.default_date is required when date_prop is unset "
                "(the reference reads CURRENT_DATE(); deterministic jobs must not)"
            )
        dates = None

    parsed = parse_constraints(config.constraints)
    cons_tables = {
        c["index"]: _prop_values(edges, c["prop"], entities, c["val_col"]) for c in parsed
    }

    # (bucket, period) structs — the per-format UNION ALL as one explode
    fmt_structs = [
        F.struct(
            F.substring("raw_date", 1, _PERIODS[f][1]).alias("date"),
            F.lit(_PERIODS[f][0]).alias("obs_period"),
        )
        for f in config.agg_date_formats
    ]

    slice_frames: list[tuple[list[dict], DataFrame]] = []
    for slice_cons in constraint_slices(parsed):
        raw = entities.join(locations, "entity_id")
        if dates is not None:
            raw = raw.join(dates, "entity_id")
        else:
            raw = raw.withColumn("raw_date", F.lit(config.default_date))
        for c in slice_cons:
            raw = raw.join(cons_tables[c["index"]], "entity_id")
            if c["filter"] is not None:
                raw = raw.where(c["filter"])

        wildcard_cols = [c["val_col"] for c in slice_cons if c["is_wildcard"]]
        counts = (
            raw.select(
                "entity_id",
                "entity_type",
                "location_id",
                F.explode(F.array(*fmt_structs)).alias("b"),
                *wildcard_cols,
            )
            .groupBy(
                "location_id",
                "entity_type",
                F.col("b.date").alias("obs_date"),
                F.col("b.obs_period").alias("obs_period"),
                *wildcard_cols,
            )
            # COUNT(entity_id), NOT DISTINCT (generator:293): an entity
            # joining twice (two constraint values in range, or two raw
            # dates truncating into one bucket) counts twice, exactly
            # as the reference's row count does
            .agg(F.count("entity_id").alias("event_count"))
        )
        with_sv = _with_fingerprint(
            counts, _sv_dcid_expr(slice_cons), "sv_dcid", prefix="dc/sv/gp/"
        ).withColumn("sv_name", _sv_name_expr(slice_cons))
        slice_frames.append((slice_cons, with_sv))

    combined = slice_frames[0][1].select(
        "location_id", "entity_type", "obs_date", "obs_period", "event_count", "sv_dcid", "sv_name"
    )
    for _, f in slice_frames[1:]:
        combined = combined.unionByName(
            f.select(
                "location_id",
                "entity_type",
                "obs_date",
                "obs_period",
                "event_count",
                "sv_dcid",
                "sv_name",
            )
        )

    # 5.1 SV nodes
    nodes = combined.select(
        F.col("sv_dcid").alias("subject_id"),
        F.col("sv_name").alias("name"),
        F.lit(None).cast("string").alias("value"),
        F.lit(None).cast("binary").alias("bytes"),
        F.array(F.lit("StatisticalVariable")).alias("types"),
    ).distinct()

    # 5.2 SV edges
    def _edge(subject, predicate: str, obj):
        return F.struct(
            subject.alias("subject_id"),
            F.lit(predicate).alias("predicate"),
            obj.alias("object_id"),
            F.lit(prov).alias("provenance"),
        )

    fixed = combined.select(
        F.explode(
            F.array(
                _edge(F.col("sv_dcid"), "typeOf", F.lit("StatisticalVariable")),
                _edge(F.col("sv_dcid"), "populationType", F.col("entity_type")),
                _edge(F.col("sv_dcid"), "measuredProperty", F.lit("count")),
                _edge(F.col("sv_dcid"), "statType", F.lit("measuredValue")),
            )
        ).alias("e")
    ).select("e.*")
    edge_parts = [fixed]
    for slice_cons, f in slice_frames:
        for c in slice_cons:
            if not c["is_wildcard"]:
                edge_parts.append(
                    f.select(
                        F.col("sv_dcid").alias("subject_id"),
                        F.lit(c["prop"]).alias("predicate"),
                        F.lit(c["val_str"]).alias("object_id"),
                        F.lit(prov).alias("provenance"),
                    )
                )
            else:
                edge_parts.append(
                    f.where(F.col(c["val_col"]).isNotNull()).select(
                        F.col("sv_dcid").alias("subject_id"),
                        F.lit(c["prop"]).alias("predicate"),
                        F.col(c["val_col"]).alias("object_id"),
                        F.lit(prov).alias("provenance"),
                    )
                )
    sv_edges = edge_parts[0]
    for p in edge_parts[1:]:
        sv_edges = sv_edges.unionByName(p)
    sv_edges = sv_edges.distinct()

    # facet id: prov^DataCommonsAggregate^period^^^true — per-period
    facet_key = F.concat_ws(
        "^",
        F.lit(prov),
        F.lit("DataCommonsAggregate"),
        F.col("obs_period"),
        F.lit(""),
        F.lit(""),
        F.lit("true"),
    )

    # 5.3 TimeSeries
    timeseries = _with_fingerprint(
        combined.select("sv_dcid", "location_id", "obs_period").distinct().withColumn(
            "_fk", facet_key
        ),
        F.col("_fk"),
        "facet_id",
    ).select(
        F.col("sv_dcid").alias("variable_measured"),
        F.col("location_id").alias("entity1"),
        F.lit("").alias("extra_entities_id"),
        "facet_id",
        F.to_json(F.struct(F.col("location_id").alias("entity1"))).alias("entities"),
        F.to_json(
            F.struct(
                F.lit("DataCommonsAggregate").alias("measurementMethod"),
                F.col("obs_period").alias("observationPeriod"),
                F.lit(prov).alias("provenance"),
                F.lit(True).alias("isDcAggregate"),
            )
        ).alias("facet"),
    )

    # 5.4 Observations
    observations = _with_fingerprint(combined, facet_key, "facet_id").select(
        F.col("sv_dcid").alias("variable_measured"),
        F.col("location_id").alias("entity1"),
        F.lit("").alias("extra_entities_id"),
        "facet_id",
        F.col("obs_date").alias("date"),
        F.col("event_count").cast("string").alias("value"),
    )

    return EntityAggResult(nodes, sv_edges, timeseries, observations)
