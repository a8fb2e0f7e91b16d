"""Entity aggregation parity
(pipeline/workflow/aggregation-helper/aggregation/
entity_aggregation_generator.py:26-473)."""

from __future__ import annotations

import pytest

from import_spark.operators.calculations import signed_farm_fingerprint
from import_spark.operators.entity_agg import (
    EntityAggregationConfig,
    aggregate_entities,
    constraint_slices,
    parse_constraints,
)

EDGE_SCHEMA = "subject_id string, predicate string, object_id string, provenance string"


def _edges(spark):
    rows = []
    # three Fire events: e1/e2 in place/A, e3 in place/B; e4 is a
    # different type; e5 lacks the right provenance
    for eid, typ, prov in [
        ("e1", "FireEvent", "p/in"),
        ("e2", "FireEvent", "p/in"),
        ("e3", "FireEvent", "p/in"),
        ("e4", "FloodEvent", "p/in"),
        ("e5", "FireEvent", "p/other"),
    ]:
        rows.append((eid, "typeOf", typ, prov))
    rows += [
        ("e1", "affectedPlace", "place/A", "p/in"),
        ("e2", "affectedPlace", "place/A", "p/in"),
        ("e3", "affectedPlace", "place/B", "p/in"),
        ("e3", "affectedPlace", "latLong/1_2", "p/in"),  # dropped
        ("e4", "affectedPlace", "place/A", "p/in"),
        ("e5", "affectedPlace", "place/A", "p/in"),
        ("e1", "startDate", "2020-01-15", "p/in"),
        ("e2", "startDate", "2020-02-20", "p/in"),
        ("e3", "startDate", "2021-03-25", "p/in"),
        ("e1", "area", "12.5", "p/in"),
        ("e2", "area", "3.0", "p/in"),  # below min -> filtered
        ("e3", "area", "50", "p/in"),
        ("e1", "cause", "lightning", "p/in"),
        ("e2", "cause", "arson", "p/in"),
        ("e3", "cause", "lightning", "p/in"),
    ]
    return spark.createDataFrame(rows, EDGE_SCHEMA)


def _cfg(**kw):
    base = dict(
        entity_types=["FireEvent"],
        location_props=["affectedPlace"],
        date_prop="startDate",
        agg_date_formats=["YYYY"],
        constraints=[],
        output_provenance="p/out",
        input_provenances=["p/in"],
    )
    base.update(kw)
    return EntityAggregationConfig(**base)


def test_basic_counts_types_provenance_latlong_and_buckets(spark):
    res = aggregate_entities(_edges(spark), _cfg(agg_date_formats=["YYYY", "YYYY-MM"]))
    obs = {(r["entity1"], r["date"], r["value"]) for r in res.observations.collect()}
    # e4 wrong type, e5 wrong provenance, latLong location dropped
    assert obs == {
        ("place/A", "2020", "2"),
        ("place/B", "2021", "1"),
        ("place/A", "2020-01", "1"),
        ("place/A", "2020-02", "1"),
        ("place/B", "2021-03", "1"),
    }
    key = "measuredProperty=count,populationType=FireEvent,statType=measuredValue"
    dcid = "dc/sv/gp/" + str(signed_farm_fingerprint(key))
    assert {r["variable_measured"] for r in res.observations.collect()} == {dcid}
    nodes = res.nodes.collect()
    assert [(n["subject_id"], n["name"]) for n in nodes] == [(dcid, "Count of FireEvent")]
    # per-period facet ids
    fids = {
        r["facet_id"]
        for r in res.observations.where("date = '2020'").collect()
    }
    assert fids == {str(signed_farm_fingerprint("p/out^DataCommonsAggregate^P1Y^^^true"))}


def test_constraints_filters_wildcard_dcid_name_and_edges(spark):
    cons = [
        {"property": "area", "min": 10, "max": 100, "unit": "SquareKm"},
        {"property": "cause", "wildcard": True},
    ]
    res = aggregate_entities(_edges(spark), _cfg(constraints=cons))
    obs = {(r["entity1"], r["date"], r["value"]) for r in res.observations.collect()}
    # e2 area 3.0 filtered out; survivors e1 (A, lightning), e3 (B, lightning)
    assert obs == {("place/A", "2020", "1"), ("place/B", "2021", "1")}
    key = (
        "area=[10 100 SquareKm],cause=lightning,measuredProperty=count,"
        "populationType=FireEvent,statType=measuredValue"
    )
    dcid = "dc/sv/gp/" + str(signed_farm_fingerprint(key))
    assert {r["variable_measured"] for r in res.observations.collect()} == {dcid}
    names = {n["name"] for n in res.nodes.collect()}
    assert names == {"Count of FireEvent with area [10 100 SquareKm], cause=lightning"}
    edges = {(e["predicate"], e["object_id"]) for e in res.edges.collect()}
    assert edges == {
        ("typeOf", "StatisticalVariable"),
        ("populationType", "FireEvent"),
        ("measuredProperty", "count"),
        ("statType", "measuredValue"),
        ("area", "[10 100 SquareKm]"),
        ("cause", "lightning"),
    }
    assert {e["provenance"] for e in res.edges.collect()} == {"p/out"}


def test_same_property_value_constraints_split_into_slices():
    parsed = parse_constraints(
        [
            {"property": "cause", "value": "lightning"},
            {"property": "cause", "value": "arson"},
            {"property": "area", "min": 1},
            {"property": "cause", "wildcard": True},
        ]
    )
    slices = constraint_slices(parsed)
    # lightning + area share slice 0; arson forced into slice 1;
    # the wildcard lands in the first slice without a non-wildcard
    # 'cause'... slice 1 has non-wildcard cause=arson, so slice 0? no:
    # slice 0 has cause=lightning (non-wildcard) -> blocked; slice 1
    # has cause=arson (non-wildcard) -> blocked; new slice 2
    assert [sorted((c["prop"], c["val_str"]) for c in s) for s in slices] == [
        [("area", "[1 -]"), ("cause", "lightning")],
        [("cause", "arson")],
        [("cause", "*")],
    ]


def test_two_slices_union_distinct_sv_per_slice(spark):
    cons = [
        {"property": "cause", "value": "lightning"},
        {"property": "cause", "value": "arson"},
    ]
    res = aggregate_entities(_edges(spark), _cfg(constraints=cons))
    rows = {(r["variable_measured"], r["entity1"], r["value"]) for r in res.observations.collect()}
    k1 = "cause=lightning,measuredProperty=count,populationType=FireEvent,statType=measuredValue"
    k2 = "cause=arson,measuredProperty=count,populationType=FireEvent,statType=measuredValue"
    d1 = "dc/sv/gp/" + str(signed_farm_fingerprint(k1))
    d2 = "dc/sv/gp/" + str(signed_farm_fingerprint(k2))
    assert rows == {
        (d1, "place/A", "1"),
        (d1, "place/B", "1"),
        (d2, "place/A", "1"),
    }


def test_timeseries_facets_and_default_date(spark):
    res = aggregate_entities(_edges(spark), _cfg())
    ts = res.timeseries.collect()
    assert all(r["facet"].startswith('{"measurementMethod":"DataCommonsAggregate"') for r in ts)
    assert all(r["entities"] == '{"entity1":"' + r["entity1"] + '"}' for r in ts)

    # no date_prop: default_date required, then buckets come from it
    with pytest.raises(ValueError, match="default_date"):
        aggregate_entities(_edges(spark), _cfg(date_prop=None))
    res = aggregate_entities(
        _edges(spark), _cfg(date_prop=None, default_date="2026-08-20")
    )
    assert {r["date"] for r in res.observations.collect()} == {"2026"}
