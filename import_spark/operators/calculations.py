"""Calculated StatVars — formula-derived series (DIVIDE / MULTIPLY /
ADD / SUBTRACT between two SV-filtered observation sets).

Reference: the BigQuery-federation script built by
``pipeline/workflow/aggregation-helper/aggregation/
stat_var_calculation_generator.py:55-436`` — per calculation manifest
entry it (1) filters the provenance-scoped Observation⨝TimeSeries
working set into two input sides by SV regex / measurement-method
regex / import-name regex / facet equality, (2) equi-joins them on
``(entity1, extra_entities_id, date)``, (3) computes the arithmetic
value (``SAFE_DIVIDE`` semantics, multiplier on DIVIDE/MULTIPLY only),
(4) derives the output SV name (literal, or prefix + I1.sv + I1.mm
with the Temperature/NASA_CMIP6 special cases) and output measurement
method (literal, or prefix + I2.mm stripped of ``dcAggregate/``),
(5) assembles the new facet with ``isDcAggregate=true`` and its
``FARM_FINGERPRINT`` facet id, and (6) exports null-free Observation
rows plus DISTINCT TimeSeries metadata rows.

Spark shape: the temp-table caching step is ONE join of the
observation table with the timeseries (facet) table, reused by every
calculation (localCheckpointed when there is more than one, the
``CREATE TEMP TABLE`` analogue); each side filter is a partial filter
of that base (pushes to the scan for the single-calc case); the
obs⨝obs equi-join shuffles on the (entity, extra, date) key; the
farmhash facet id runs over DISTINCT key strings only (an Arrow-
batched pandas UDF on a cardinality-of-facets frame, never the row
stream) and broadcast-joins back. The TimeSeries export computes
DISTINCT projections BEFORE the join — set-equivalent to the
reference's join-then-DISTINCT, without the date-cross blow-up.

BigQuery's ``FARM_FINGERPRINT`` is the SIGNED FarmHash Fingerprint64
(the optimized-graph facet id C6 uses the unsigned encoding —
TimeSeries.java:170-191; both share functions/farmhash.py, which is
bit-parity-gated against JVM Guava).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Spanner Observation / TimeSeries key columns (SpannerClient schema;
# stat_var_calculation_generator.py:96-110)
OBS_KEY = ["variable_measured", "entity1", "extra_entities_id", "facet_id"]
FACET_FIELDS = [
    "provenance",
    "measurementMethod",
    "unit",
    "observationPeriod",
    "scalingFactor",
]


@dataclass
class CalcResult:
    observations: DataFrame
    timeseries: DataFrame


def _is_regex(pattern: str) -> bool:
    """stat_var_calculation_generator.py:407-409."""
    return any(c in pattern for c in r".*+?^$()[]{}|\/")


def _anchored(pattern: str):
    # REGEXP_CONTAINS(col, r"^pat$")
    return f"^(?:{pattern})$"


def _facet_field(c: str):
    return F.col(f"facet.{c}")


def _input_filter(spec: dict):
    """_get_input_filter_sql (generator:411-436) as a Column."""
    cond = F.lit(True)
    if spec.get("sv_regex"):
        cond = cond & F.col("variable_measured").rlike(_anchored(spec["sv_regex"]))
    if spec.get("measurement_method_regex"):
        cond = cond & _facet_field("measurementMethod").rlike(
            _anchored(spec["measurement_method_regex"])
        )
    if spec.get("import_name_regex"):
        cond = cond & _facet_field("provenance").rlike(_anchored(spec["import_name_regex"]))
    fi = spec.get("facet_info") or {}
    if "unit" in fi:
        cond = cond & (_facet_field("unit") == fi["unit"])
    if "observation_period" in fi:
        cond = cond & (_facet_field("observationPeriod") == fi["observation_period"])
    if "scaling_factor" in fi:
        cond = cond & (_facet_field("scalingFactor") == fi["scaling_factor"])
    return cond


def _prefilter(calculations: list[dict]):
    """_build_spanner_observation_filter (generator:380-405): one OR of
    every input SV pattern, applied before the facet join so the
    filter reaches the observation scan.

    Like the reference, an input WITHOUT sv_regex contributes no term:
    if another input has one, the pre-filter still applies and the
    regex-less input sees only the OR'd subset (the reference documents
    sv_regex as 'always present', generator:405; parity kept rather
    than second-guessed)."""
    conds = []
    seen = set()
    for calc in calculations:
        for key in ("input1", "input2"):
            pat = (calc.get(key) or {}).get("sv_regex", "")
            if not pat or pat in seen:
                continue
            seen.add(pat)
            if _is_regex(pat):
                conds.append(F.col("variable_measured").rlike(_anchored(pat)))
            else:
                conds.append(F.col("variable_measured") == pat)
    if not conds:
        return None
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def _out_sv(output: dict, i1_sv, i1_mm):
    """Output SV name (generator:143-160): literal, or prefix +
    Temperature 'Mean_' special case + I1.sv + '_' + I1.mm with the
    NASA_Mean_CMIP6 aggregate prefix stripped."""
    if "sv" in output:
        return F.lit(output["sv"])
    if "sv_prefix" in output:
        nasa = "dcAggregate/NASA_Mean_CMIP6_"
        return F.concat(
            F.lit(output["sv_prefix"]),
            F.when(i1_sv.startswith("Temperature"), F.lit("Mean_")).otherwise(F.lit("")),
            i1_sv,
            F.lit("_"),
            F.when(
                i1_mm.startswith(nasa), F.expr(f"substring(i1_mm, {len(nasa) + 1})")
            ).otherwise(i1_mm),
        )
    raise ValueError("Calculation output must specify either 'sv' or 'sv_prefix'.")


def _out_mm(output: dict, i2_mm):
    """Output measurement method (generator:162-177): literal, or
    prefix + I2.mm stripped of 'dcAggregate/'."""
    if "measurement_method" in output:
        return F.lit(output["measurement_method"])
    if "measurement_method_prefix" in output:
        agg = "dcAggregate/"
        return F.concat(
            F.lit(output["measurement_method_prefix"]),
            F.when(i2_mm.startswith(agg), F.expr(f"substring(i2_mm, {len(agg) + 1})")).otherwise(
                i2_mm
            ),
        )
    return F.lit(None).cast("string")


def signed_farm_fingerprint(key: str) -> int:
    """BigQuery FARM_FINGERPRINT: FarmHash Fingerprint64 as signed
    INT64 two's complement."""
    from import_spark.functions.farmhash import fingerprint64

    f = fingerprint64(key)
    return f - (1 << 64) if f >= (1 << 63) else f


def facet_fingerprint_key(
    provenance: str, mm: str | None, period: str | None, scaling: str | None, unit: str | None
) -> str:
    """The '^'-joined fingerprint key, field order prov^mm^period^
    scaling^unit^'true' (generator:198-221)."""
    return "^".join(
        [provenance, mm or "", period or "", scaling or "", unit or "", "true"]
    )


def _with_facet_id(df: DataFrame, key_col: str = "_facet_key") -> DataFrame:
    """Signed FARM_FINGERPRINT of the key column — computed on the
    DISTINCT keys (facet cardinality, not row cardinality) and
    broadcast-joined back (functions.udfs.distinct_key_join)."""
    from import_spark.functions.udfs import distinct_key_join

    return distinct_key_join(
        df, key_col, "facet_id", lambda k: str(signed_farm_fingerprint(k))
    )


def calculate_stat_vars(
    obs: DataFrame,
    timeseries: DataFrame,
    calculations: list[dict],
    output_provenance: str,
    value_as_string: bool = True,
) -> CalcResult:
    """Run every calculation manifest entry; return the unioned
    Observation rows and DISTINCT TimeSeries metadata rows
    (generator:46-378).

    ``obs``: (variable_measured, entity1, extra_entities_id, facet_id,
    date, value) — value is the Spanner STRING column; non-numeric
    values SAFE_CAST to null and fall out of the result like the
    reference. ``timeseries``: OBS_KEY + ``entities`` (JSON string) +
    ``facet`` struct with FACET_FIELDS. ``value_as_string=False``
    keeps the calculated value as a double (callers that compare
    values numerically); the reference contract is the STRING cast.
    """
    pre = _prefilter(calculations)
    if pre is not None:
        obs = obs.where(pre)
    base = obs.join(
        timeseries.select(
            *OBS_KEY, "entities", "facet"
        ),
        OBS_KEY,
    ).select(
        "variable_measured",
        "entity1",
        "extra_entities_id",
        "date",
        # SAFE_CAST (generator:306): malformed values -> null, never error
        F.col("value").try_cast("double").alias("val"),
        _facet_field("measurementMethod").alias("mm"),
        "entities",
        "facet",
    )
    if len(calculations) > 1:
        # the CREATE TEMP TABLE analogue: scan + facet join run once
        base = base.localCheckpoint(eager=False)

    obs_parts: list[DataFrame] = []
    ts_parts: list[DataFrame] = []
    for calc in calculations:
        operation = calc.get("operation")
        try:
            multiplier = float(calc.get("multiplier", 1.0))
        except (ValueError, TypeError):
            raise ValueError(f"Invalid multiplier: {calc.get('multiplier')}")
        i1f = _input_filter(calc.get("input1") or {})
        i2f = _input_filter(calc.get("input2") or {})
        output = calc.get("output") or {}

        join_key = ["entity1", "extra_entities_id"]
        i1 = (
            base.where(i1f)
            .select(
                *join_key,
                "date",
                F.col("val").alias("i1_val"),
                F.col("variable_measured").alias("i1_sv"),
                F.coalesce("mm", F.lit("")).alias("i1_mm"),
                "entities",
            )
        )
        i2 = base.where(i2f).select(
            *join_key,
            "date",
            F.col("val").alias("i2_val"),
            F.coalesce("mm", F.lit("")).alias("i2_mm"),
        )

        if operation == "DIVIDE":
            val = F.when(F.col("i2_val") != 0, F.col("i1_val") / F.col("i2_val")) * multiplier
        elif operation == "MULTIPLY":
            val = (F.col("i1_val") * F.col("i2_val")) * multiplier
        elif operation == "ADD":
            val = F.col("i1_val") + F.col("i2_val")
        elif operation == "SUBTRACT":
            val = F.col("i1_val") - F.col("i2_val")
        else:
            raise ValueError(f"Unsupported operation: {operation}")

        out_sv = _out_sv(output, F.col("i1_sv"), F.col("i1_mm"))
        out_mm = _out_mm(output, F.col("i2_mm"))
        fi = output.get("facet_info") or {}
        out_unit = F.lit(fi.get("unit")).cast("string")
        out_period = F.lit(fi.get("observation_period")).cast("string")
        out_scaling = F.lit(fi.get("scaling_factor")).cast("string")
        fkey = F.concat_ws(
            "^",
            F.lit(output_provenance),
            F.coalesce(out_mm, F.lit("")),
            F.coalesce(out_period, F.lit("")),
            F.coalesce(out_scaling, F.lit("")),
            F.coalesce(out_unit, F.lit("")),
            F.lit("true"),
        )

        joined = i1.join(i2, join_key + ["date"]).select(
            out_sv.alias("variable_measured"),
            "entity1",
            "extra_entities_id",
            fkey.alias("_facet_key"),
            "date",
            val.alias("_val"),
        )
        value_col = (
            F.col("_val").cast("string") if value_as_string else F.col("_val")
        )
        obs_parts.append(
            _with_facet_id(joined)
            .where(F.col("_val").isNotNull())
            .select(
                "variable_measured",
                "entity1",
                "extra_entities_id",
                "facet_id",
                "date",
                value_col.alias("value"),
            )
        )

        # TimeSeries metadata: DISTINCT projections joined on the
        # entity key — set-equal to the reference's join-then-DISTINCT
        # (generator:236-295) without crossing dates
        i1d = i1.select(*join_key, "i1_sv", "i1_mm", "entities").distinct()
        i2d = i2.select(*join_key, "i2_mm").distinct()
        ts = (
            i1d.join(i2d, join_key)
            .select(
                out_sv.alias("variable_measured"),
                "extra_entities_id",
                "entities",
                fkey.alias("_facet_key"),
                F.struct(
                    F.lit(output_provenance).alias("provenance"),
                    out_mm.alias("measurementMethod"),
                    out_unit.alias("unit"),
                    out_period.alias("observationPeriod"),
                    out_scaling.alias("scalingFactor"),
                    F.lit(True).alias("isDcAggregate"),
                ).alias("facet"),
            )
            .distinct()
        )
        ts_parts.append(
            _with_facet_id(ts).select(
                "variable_measured", "entities", "extra_entities_id", "facet_id", "facet"
            )
        )

    out_obs = obs_parts[0]
    for p in obs_parts[1:]:
        out_obs = out_obs.unionByName(p)
    out_ts = ts_parts[0]
    for p in ts_parts[1:]:
        out_ts = out_ts.unionByName(p)
    return CalcResult(out_obs, out_ts)
