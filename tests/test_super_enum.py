"""Super-enum aggregation parity
(pipeline/workflow/aggregation-helper/aggregation/
super_enum_aggregation_generator.py:26-490)."""

from __future__ import annotations

from pyspark.sql import functions as F

from import_spark.functions.farmhash import long_id
from import_spark.operators.calculations import signed_farm_fingerprint
from import_spark.operators.super_enum import (
    aggr_strategy,
    super_enum_aggregate,
)

EDGE_SCHEMA = "subject_id string, predicate string, object_id string, provenance string"
NODE_SCHEMA = "subject_id string, types array<string>"
TS_SCHEMA = (
    "variable_measured string, entity1 string, extra_entities_id string, "
    "facet_id string, entities string, provenance string, "
    "facet struct<provenance:string, measurementMethod:string, unit:string, "
    "observationPeriod:string, scalingFactor:string>"
)
OBS_SCHEMA = (
    "variable_measured string, entity1 string, extra_entities_id string, "
    "facet_id string, date string, value string"
)


def _facet(prov="p/in", mm=None, unit=None, period=None, scaling=None):
    return (prov, mm, unit, period, scaling)


def _sv_edges(sv, age_bucket, prov="p/in"):
    return [
        (sv, "typeOf", "StatisticalVariable", prov),
        (sv, "measuredProperty", "count", prov),
        (sv, "statType", "measuredValue", prov),
        (sv, "populationType", "Person", prov),
        (sv, "age", age_bucket, prov),
        (sv, "name", f"name of {sv}", prov),  # excluded from key
    ]


def _inputs(spark):
    edges = []
    # two sibling SVs on child age buckets that specialize to Years18Plus
    edges += _sv_edges("sv/a", "Years18To24")
    edges += _sv_edges("sv/b", "Years25To34")
    # specializationOf relations (any provenance)
    edges += [
        ("Years18To24", "specializationOf", "Years18Plus", "p/x"),
        ("Years25To34", "specializationOf", "Years18Plus", "p/x"),
    ]
    # an SV with a denominator -> ineligible
    edges += _sv_edges("sv/d", "Years18To24")
    edges.append(("sv/d", "measurementDenominator", "Count_Person", "p/in"))
    # an SV whose strategy is NONE (meanValue + count) -> ineligible
    edges += [
        ("sv/n", "measuredProperty", "count", "p/in"),
        ("sv/n", "statType", "meanValue", "p/in"),
        ("sv/n", "age", "Years18To24", "p/in"),
    ]
    edges_df = spark.createDataFrame(edges, EDGE_SCHEMA)
    nodes_df = spark.createDataFrame([("sv/a", ["StatisticalVariable"])], NODE_SCHEMA)
    ts = [
        ("sv/a", "geo/X", "", "f1", "[]", "p/in", _facet(mm="Census")),
        ("sv/b", "geo/X", "", "f2", "[]", "p/in", _facet(mm="Census")),
        ("sv/d", "geo/X", "", "f3", "[]", "p/in", _facet(mm="Census")),
    ]
    ts_df = spark.createDataFrame(ts, TS_SCHEMA)
    obs = [
        ("sv/a", "geo/X", "", "f1", "2020", "10"),
        ("sv/b", "geo/X", "", "f2", "2020", "32"),
        ("sv/a", "geo/X", "", "f1", "2021", "11"),
        ("sv/d", "geo/X", "", "f3", "2020", "999"),
    ]
    obs_df = spark.createDataFrame(obs, OBS_SCHEMA)
    return edges_df, nodes_df, ts_df, obs_df


def _expected_target():
    # key string: sorted (predicate=object) concat with the whitelisted
    # age swapped for the parent and name/etc. excluded
    key = (
        "age=Years18Plus"
        "measuredProperty=count"
        "populationType=Person"
        "statType=measuredValue"
        "typeOf=StatisticalVariable"
    )
    return key, "dc/" + long_id(key)


def test_sum_rollup_generated_dcid_and_facet(spark):
    res = super_enum_aggregate(*_inputs(spark), input_provenances=["p/in"])
    key, target = _expected_target()
    obs = {(r["variable_measured"], r["date"], r["value"]) for r in res.observations.collect()}
    # siblings sum per date; the denominator SV contributes nothing
    assert obs == {(target, "2020", "42.0"), (target, "2021", "11.0")}
    fid_key = "p/in_SuperEnum^dcAggregate/Census^^^^true"
    fid = str(signed_farm_fingerprint(fid_key))
    assert {r["facet_id"] for r in res.observations.collect()} == {fid}

    # new SV node emitted (no curated match for this key)
    nodes = res.nodes.collect()
    assert [n["subject_id"] for n in nodes] == [target]
    # reconstructed edges: all source predicates incl. name, age
    # swapped to the parent, _SuperEnum provenance
    e = {(r["predicate"], r["object_id"]) for r in res.edges.collect()}
    assert ("age", "Years18Plus") in e
    assert ("measuredProperty", "count") in e
    assert ("name", "name of sv/a") in e and ("name", "name of sv/b") in e
    assert {r["provenance"] for r in res.edges.collect()} == {"p/in_SuperEnum"}

    # timeseries: one distinct row for the merged facet
    ts = res.timeseries.collect()
    assert len(ts) == 1
    assert ts[0]["variable_measured"] == target
    assert ts[0]["facet"]["measurementMethod"] == "dcAggregate/Census"
    assert ts[0]["facet"]["provenance"] == "p/in_SuperEnum"
    assert ts[0]["facet"]["isDcAggregate"] is True
    assert ts[0]["facet_id"] == fid


def test_curated_match_suppresses_new_node(spark):
    edges_df, _, ts_df, obs_df = _inputs(spark)
    key, _ = _expected_target()
    # a curated SV whose key string equals the target's
    curated_edges = [
        ("Count_Person_18Plus", "typeOf", "StatisticalVariable", "p/cur"),
        ("Count_Person_18Plus", "measuredProperty", "count", "p/cur"),
        ("Count_Person_18Plus", "statType", "measuredValue", "p/cur"),
        ("Count_Person_18Plus", "populationType", "Person", "p/cur"),
        ("Count_Person_18Plus", "age", "Years18Plus", "p/cur"),
    ]
    edges_df = edges_df.unionByName(
        edges_df.sparkSession.createDataFrame(curated_edges, EDGE_SCHEMA)
    )
    nodes_df = edges_df.sparkSession.createDataFrame(
        [("Count_Person_18Plus", ["StatisticalVariable"])], NODE_SCHEMA
    )
    res = super_enum_aggregate(edges_df, nodes_df, ts_df, obs_df, ["p/in"])
    assert res.nodes.count() == 0  # curated target -> no new node/edges
    assert res.edges.count() == 0
    assert {r["variable_measured"] for r in res.observations.collect()} == {
        "Count_Person_18Plus"
    }


def test_mm_rewrite_rules(spark):
    edges_df, nodes_df, _, obs_df = _inputs(spark)
    ts = [
        ("sv/a", "geo/X", "", "f1", "[]", "p/in", _facet(mm=None)),
        ("sv/b", "geo/X", "", "f2", "[]", "p/in", _facet(mm="dcAggregate/Already")),
    ]
    ts_df = spark.createDataFrame(ts, TS_SCHEMA)
    res = super_enum_aggregate(edges_df, nodes_df, ts_df, obs_df, ["p/in"])
    mms = {r["facet"]["measurementMethod"] for r in res.timeseries.collect()}
    assert mms == {"DataCommonsAggregate", "dcAggregate/Already"}


def test_aggr_strategy_table(spark):
    rows = [
        ("measuredValue", "count", "SUM"),
        ("minValue", "studentCount", "MIN"),
        ("maxValue", "area", "MAX"),
        ("meanValue", "count", "NONE"),
        ("meanValue", "concentration", "MEAN"),
        ("measuredValue", "heavyPrecipitationIndex", "MEAN"),
        ("kurtosis", "precipitation", "MEAN"),
        ("skewness", "maxTemperature", "MEAN"),
        ("stdDeviation", "minTemperature", "MEAN"),
        ("measuredValue", "income", "NONE"),
        ("stdDeviation", "count", "NONE"),
    ]
    df = spark.createDataFrame(
        [(s, p) for s, p, _ in rows], "stat_type string, prop string"
    ).withColumn("strategy", aggr_strategy(F.col("stat_type"), F.col("prop")))
    got = {(r["stat_type"], r["prop"]): r["strategy"] for r in df.collect()}
    for s, p, want in rows:
        assert got[(s, p)] == want, (s, p, got[(s, p)], want)


def test_min_strategy_rollup(spark):
    # minValue + aggregatable prop rolls up with MIN
    prov = "p/in"
    edges = [
        ("sv/m1", "measuredProperty", "studentCount", prov),
        ("sv/m1", "statType", "minValue", prov),
        ("sv/m1", "age", "Years18To24", prov),
        ("sv/m2", "measuredProperty", "studentCount", prov),
        ("sv/m2", "statType", "minValue", prov),
        ("sv/m2", "age", "Years25To34", prov),
        ("Years18To24", "specializationOf", "Years18Plus", "p/x"),
        ("Years25To34", "specializationOf", "Years18Plus", "p/x"),
    ]
    edges_df = spark.createDataFrame(edges, EDGE_SCHEMA)
    nodes_df = spark.createDataFrame([], NODE_SCHEMA)
    ts_df = spark.createDataFrame(
        [
            ("sv/m1", "geo/X", "", "f1", "[]", prov, _facet()),
            ("sv/m2", "geo/X", "", "f2", "[]", prov, _facet()),
        ],
        TS_SCHEMA,
    )
    obs_df = spark.createDataFrame(
        [
            ("sv/m1", "geo/X", "", "f1", "2020", "7"),
            ("sv/m2", "geo/X", "", "f2", "2020", "3"),
        ],
        OBS_SCHEMA,
    )
    res = super_enum_aggregate(edges_df, nodes_df, ts_df, obs_df, [prov])
    assert {r["value"] for r in res.observations.collect()} == {"3.0"}


def test_multi_provenance_sv_builds_one_key(spark):
    """An SV whose definition edges span two input provenances must
    yield ONE full key under the subject-level (ANY_VALUE/MIN)
    provenance — not partial per-provenance keys (generator:214-231
    joins e.source_provenance from the eligibility GROUP BY, never the
    edge provenance)."""
    edges = []
    # sv/m defined across p/a and p/b: measuredProperty under p/a,
    # the rest (incl. the whitelisted age) under p/b
    edges.append(("sv/m", "measuredProperty", "count", "p/a"))
    edges += [
        ("sv/m", "typeOf", "StatisticalVariable", "p/b"),
        ("sv/m", "statType", "measuredValue", "p/b"),
        ("sv/m", "populationType", "Person", "p/b"),
        ("sv/m", "age", "Years18To24", "p/b"),
    ]
    edges.append(("Years18To24", "specializationOf", "Years18Plus", "p/x"))
    edges_df = spark.createDataFrame(edges, EDGE_SCHEMA)
    nodes_df = spark.createDataFrame([], NODE_SCHEMA)
    ts_df = spark.createDataFrame(
        [("sv/m", "geo/X", "", "f1", "[]", "p/a", _facet(prov="p/a", mm="Census"))],
        TS_SCHEMA,
    )
    obs_df = spark.createDataFrame(
        [("sv/m", "geo/X", "", "f1", "2020", "5")], OBS_SCHEMA
    )
    res = super_enum_aggregate(
        edges_df, nodes_df, ts_df, obs_df, input_provenances=["p/a", "p/b"]
    )
    key = (
        "age=Years18Plus"
        "measuredProperty=count"
        "populationType=Person"
        "statType=measuredValue"
        "typeOf=StatisticalVariable"
    )
    target = "dc/" + long_id(key)
    # one generated node with the FULL key; observations emitted once
    assert [n["subject_id"] for n in res.nodes.collect()] == [target]
    obs = [(r["variable_measured"], r["date"], r["value"]) for r in res.observations.collect()]
    assert obs == [(target, "2020", "5.0")]
    # the subject-level provenance is the MIN ('p/a') -> one edge prov
    assert {r["provenance"] for r in res.edges.collect()} == {"p/a_SuperEnum"}
