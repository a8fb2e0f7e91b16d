"""Calculated StatVars parity
(pipeline/workflow/aggregation-helper/aggregation/
stat_var_calculation_generator.py:55-436)."""

from __future__ import annotations

import pytest

from import_spark.operators.calculations import (
    calculate_stat_vars,
    facet_fingerprint_key,
    signed_farm_fingerprint,
)

OBS_SCHEMA = (
    "variable_measured string, entity1 string, extra_entities_id string, "
    "facet_id string, date string, value string"
)
TS_SCHEMA = (
    "variable_measured string, entity1 string, extra_entities_id string, "
    "facet_id string, entities string, "
    "facet struct<provenance:string, measurementMethod:string, unit:string, "
    "observationPeriod:string, scalingFactor:string>"
)


def _facet(prov="p/in", mm=None, unit=None, period=None, scaling=None):
    return (prov, mm, unit, period, scaling)


def _tables(spark):
    obs = spark.createDataFrame(
        [
            ("Count_Person", "geo/A", "", "f1", "2020", "100"),
            ("Count_Person", "geo/B", "", "f1", "2020", "0"),
            ("Count_Person", "geo/C", "", "f1", "2020", "bad-number"),
            ("Count_Thing", "geo/A", "", "f2", "2020", "25"),
            ("Count_Thing", "geo/B", "", "f2", "2020", "10"),
            ("Count_Thing", "geo/C", "", "f2", "2020", "5"),
            # date mismatch — must not join
            ("Count_Thing", "geo/A", "", "f2", "2021", "999"),
        ],
        OBS_SCHEMA,
    )
    ts = spark.createDataFrame(
        [
            ("Count_Person", "geo/A", "", "f1", '["geo/A"]', _facet(mm="Census")),
            ("Count_Person", "geo/B", "", "f1", '["geo/B"]', _facet(mm="Census")),
            ("Count_Person", "geo/C", "", "f1", '["geo/C"]', _facet(mm="Census")),
            ("Count_Thing", "geo/A", "", "f2", '["geo/A"]', _facet(mm="dcAggregate/Sum")),
            ("Count_Thing", "geo/B", "", "f2", '["geo/B"]', _facet(mm="dcAggregate/Sum")),
            ("Count_Thing", "geo/C", "", "f2", '["geo/C"]', _facet(mm="dcAggregate/Sum")),
        ],
        TS_SCHEMA,
    )
    return obs, ts


def test_divide_multiplier_safe_divide_and_badcast(spark):
    obs, ts = _tables(spark)
    res = calculate_stat_vars(
        obs,
        ts,
        [
            {
                "operation": "DIVIDE",
                "multiplier": 2,
                "input1": {"sv_regex": "Count_Thing"},
                "input2": {"sv_regex": "Count_Person"},
                "output": {"sv": "Ratio_Thing_Person", "facet_info": {"unit": "Per2"}},
            }
        ],
        output_provenance="p/out",
        value_as_string=False,
    )
    rows = {r["entity1"]: r for r in res.observations.collect()}
    # geo/B: denominator 0 -> SAFE_DIVIDE null -> dropped
    # geo/C: numerator SAFE_CASTs to null -> dropped
    # 2021 Count_Thing has no Count_Person partner -> no row
    assert set(rows) == {"geo/A"}
    a = rows["geo/A"]
    assert a["value"] == 25 / 100 * 2
    assert a["variable_measured"] == "Ratio_Thing_Person"
    key = facet_fingerprint_key("p/out", None, None, None, "Per2")
    assert a["facet_id"] == str(signed_farm_fingerprint(key))


def test_add_subtract_ignore_multiplier(spark):
    obs, ts = _tables(spark)
    calc = {
        "operation": "ADD",
        "multiplier": 100,
        "input1": {"sv_regex": "Count_Thing"},
        "input2": {"sv_regex": "Count_Person"},
        "output": {"sv": "S"},
    }
    res = calculate_stat_vars(obs, ts, [calc], "p/out", value_as_string=False)
    vals = {r["entity1"]: r["value"] for r in res.observations.collect()}
    assert vals == {"geo/A": 125.0, "geo/B": 10.0}  # multiplier NOT applied
    calc["operation"] = "SUBTRACT"
    res = calculate_stat_vars(obs, ts, [calc], "p/out", value_as_string=False)
    vals = {r["entity1"]: r["value"] for r in res.observations.collect()}
    assert vals == {"geo/A": -75.0, "geo/B": 10.0}


def test_sv_prefix_and_mm_prefix_rules(spark):
    obs = spark.createDataFrame(
        [
            ("Temperature_Max", "geo/A", "", "f1", "2020", "30"),
            ("Count_Person", "geo/A", "", "f2", "2020", "10"),
        ],
        OBS_SCHEMA,
    )
    ts = spark.createDataFrame(
        [
            (
                "Temperature_Max",
                "geo/A",
                "",
                "f1",
                "[]",
                _facet(mm="dcAggregate/NASA_Mean_CMIP6_Hist"),
            ),
            ("Count_Person", "geo/A", "", "f2", "[]", _facet(mm="dcAggregate/Census")),
        ],
        TS_SCHEMA,
    )
    res = calculate_stat_vars(
        obs,
        ts,
        [
            {
                "operation": "MULTIPLY",
                "input1": {"sv_regex": "Temperature_.*"},
                "input2": {"sv_regex": "Count_Person"},
                "output": {
                    "sv_prefix": "calc/",
                    "measurement_method_prefix": "dcAggregate/Derived_",
                },
            }
        ],
        "p/out",
        value_as_string=False,
    )
    row = res.observations.collect()[0]
    # Temperature -> 'Mean_' inserted; NASA_Mean_CMIP6_ prefix stripped from I1.mm
    assert row["variable_measured"] == "calc/Mean_Temperature_Max_Hist"
    ts_row = res.timeseries.collect()[0]
    # I2.mm 'dcAggregate/Census' -> stripped -> prefixed
    assert ts_row["facet"]["measurementMethod"] == "dcAggregate/Derived_Census"
    assert ts_row["facet"]["isDcAggregate"] is True
    assert ts_row["facet"]["provenance"] == "p/out"
    key = facet_fingerprint_key("p/out", "dcAggregate/Derived_Census", None, None, None)
    assert ts_row["facet_id"] == str(signed_farm_fingerprint(key))
    assert row["facet_id"] == ts_row["facet_id"]


def test_facet_and_mm_filters(spark):
    obs, ts = _tables(spark)
    # measurement_method_regex restricts input2 to the Census facet
    res = calculate_stat_vars(
        obs,
        ts,
        [
            {
                "operation": "DIVIDE",
                "input1": {"sv_regex": "Count_Thing", "measurement_method_regex": "dcAggregate/.*"},
                "input2": {"sv_regex": "Count_.*", "measurement_method_regex": "Census"},
                "output": {"sv": "R"},
            }
        ],
        "p/out",
        value_as_string=False,
    )
    vals = {r["entity1"]: r["value"] for r in res.observations.collect()}
    assert vals == {"geo/A": 0.25}

    # a facet_info equality filter that matches nothing -> empty
    res = calculate_stat_vars(
        obs,
        ts,
        [
            {
                "operation": "DIVIDE",
                "input1": {"sv_regex": "Count_Thing", "facet_info": {"unit": "NoSuchUnit"}},
                "input2": {"sv_regex": "Count_Person"},
                "output": {"sv": "R"},
            }
        ],
        "p/out",
    )
    assert res.observations.count() == 0


def test_timeseries_distinct_and_multi_calc_union(spark):
    obs, ts = _tables(spark)
    calcs = [
        {
            "operation": "DIVIDE",
            "input1": {"sv_regex": "Count_Thing"},
            "input2": {"sv_regex": "Count_Person"},
            "output": {"sv": "R1"},
        },
        {
            "operation": "ADD",
            "input1": {"sv_regex": "Count_Thing"},
            "input2": {"sv_regex": "Count_Person"},
            "output": {"sv": "R2"},
        },
    ]
    res = calculate_stat_vars(obs, ts, calcs, "p/out", value_as_string=False)
    svs = {r["variable_measured"] for r in res.observations.collect()}
    assert svs == {"R1", "R2"}
    ts_rows = res.timeseries.collect()
    # distinct per (sv, extra, entities, facet): 3 entities join on both
    # sides -> per calc, one row per entity's entities JSON
    assert len(ts_rows) == len({(r["variable_measured"], r["entities"]) for r in ts_rows})


def test_string_value_contract_and_unknown_op(spark):
    obs, ts = _tables(spark)
    res = calculate_stat_vars(
        obs,
        ts,
        [
            {
                "operation": "ADD",
                "input1": {"sv_regex": "Count_Thing"},
                "input2": {"sv_regex": "Count_Person"},
                "output": {"sv": "S"},
            }
        ],
        "p/out",
    )
    vals = {r["entity1"]: r["value"] for r in res.observations.collect()}
    assert vals["geo/A"] == "125.0"  # Spanner STRING column contract
    with pytest.raises(ValueError, match="Unsupported operation"):
        calculate_stat_vars(
            obs, ts, [{"operation": "MODULO", "input1": {}, "input2": {}, "output": {"sv": "X"}}], "p"
        )
    with pytest.raises(ValueError, match="either 'sv' or 'sv_prefix'"):
        calculate_stat_vars(
            obs, ts, [{"operation": "ADD", "input1": {}, "input2": {}, "output": {}}], "p"
        )
