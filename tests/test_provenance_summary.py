"""ProvenanceSummary parity
(pipeline/workflow/aggregation-helper/aggregation/
provenance_summary_generator.py:56-340)."""

from __future__ import annotations

import json

from import_spark.operators.provenance_summary import provenance_summary

TS_SCHEMA = (
    "variable_measured string, entity1 string, extra_entities_id string, "
    "facet_id string, provenance string, "
    "facet struct<provenance:string, measurementMethod:string, unit:string, "
    "observationPeriod:string, scalingFactor:string>"
)
OBS_SCHEMA = (
    "variable_measured string, entity1 string, extra_entities_id string, "
    "facet_id string, date string, value string"
)


def _inputs(spark):
    def _facet(mm, unit=None):
        return ("p/in", mm, unit, "P1Y", None)

    ts = spark.createDataFrame(
        [
            ("sv/x", "geo/A", "", "f1", "p/in", _facet("Census", "USD")),
            ("sv/x", "geo/B", "", "f1", "p/in", _facet("Census", "USD")),
            ("sv/x", "geo/C", "", "f2", "p/in", _facet("Survey")),
            ("sv/x", "geo/A", "", "f9", "p/other", _facet("Other")),  # out of scope
        ],
        TS_SCHEMA,
    )
    obs = spark.createDataFrame(
        [
            ("sv/x", "geo/A", "", "f1", "2019", "5"),
            ("sv/x", "geo/A", "", "f1", "2020", "7"),
            ("sv/x", "geo/B", "", "f1", "2020", "100"),
            ("sv/x", "geo/C", "", "f2", "2021", "1"),
            ("sv/x", "geo/A", "", "f9", "2020", "9"),
        ],
        OBS_SCHEMA,
    )
    edges = spark.createDataFrame(
        [
            ("geo/A", "typeOf", "City"),
            ("geo/B", "typeOf", "City"),
            # geo/C untyped -> excluded from place-type summaries
        ],
        "subject_id string, predicate string, object_id string",
    )
    nodes = spark.createDataFrame(
        [("geo/A", "Place A"), ("geo/B", "Place B")], "subject_id string, name string"
    )
    return ts, obs, edges, nodes


def test_facet_summaries_scoping_and_stats(spark):
    res = provenance_summary(*_inputs(spark), input_provenances=["p/in"])
    rows = {r["facet_id"]: r for r in res.facet_summaries.collect()}
    assert set(rows) == {"f1", "f2"}  # p/other filtered
    f1 = rows["f1"]
    assert (f1["min_date"], f1["max_date"]) == ("2019", "2020")
    assert (f1["facet_min"], f1["facet_max"]) == (5.0, 100.0)
    assert f1["facet_obs_count"] == 3
    assert f1["facet_ts_count"] == 2  # geo/A and geo/B
    assert f1["measurement_method"] == "Census"
    assert f1["unit"] == "USD"
    assert f1["import_name"] == "p/in"


def test_base_prefix_stripped_in_import_name(spark):
    ts, obs, edges, nodes = _inputs(spark)
    ts = ts.replace("p/in", "dc/base/MyImport", subset=["provenance"])
    res = provenance_summary(ts, obs, edges, nodes, ["dc/base/MyImport"])
    names = {r["import_name"] for r in res.facet_summaries.collect()}
    assert names == {"MyImport"}


def test_place_type_summary_top_places_and_names(spark):
    res = provenance_summary(*_inputs(spark), input_provenances=["p/in"])
    pts = res.place_type_summaries.collect()
    # only f1 has typed places (geo/C untyped)
    assert [(r["facet_id"], r["place_type"]) for r in pts] == [("f1", "City")]
    r = pts[0]
    assert r["place_count"] == 2
    assert (r["min_val"], r["max_val"]) == (5.0, 100.0)
    assert [(p["dcid"], p["name"]) for p in r["top_places"]] == [
        ("geo/A", "Place A"),
        ("geo/B", "Place B"),
    ]


def test_top_places_limit_3_sorted(spark):
    ts, obs, edges, nodes = _inputs(spark)
    extra_ts = spark.createDataFrame(
        [("sv/x", f"geo/Z{i}", "", "f1", "p/in", ("p/in", "Census", "USD", "P1Y", None)) for i in range(5)],
        TS_SCHEMA,
    )
    extra_obs = spark.createDataFrame(
        [("sv/x", f"geo/Z{i}", "", "f1", "2020", "1") for i in range(5)],
        OBS_SCHEMA,
    )
    extra_edges = spark.createDataFrame(
        [(f"geo/Z{i}", "typeOf", "Village") for i in range(5)],
        "subject_id string, predicate string, object_id string",
    )
    res = provenance_summary(
        ts.unionByName(extra_ts),
        obs.unionByName(extra_obs),
        edges.unionByName(extra_edges),
        nodes,
        ["p/in"],
    )
    village = [r for r in res.place_type_summaries.collect() if r["place_type"] == "Village"][0]
    assert village["place_count"] == 5
    # 3 lexicographically smallest, names null (not in nodes)
    assert [p["dcid"] for p in village["top_places"]] == ["geo/Z0", "geo/Z1", "geo/Z2"]
    assert all(p["name"] is None for p in village["top_places"])


def test_cache_rows_json_shape(spark):
    res = provenance_summary(*_inputs(spark), input_provenances=["p/in"])
    rows = res.cache_rows.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["type"], r["key"], r["provenance"]) == ("ProvenanceSummary", "sv/x", "p/in")
    v = json.loads(r["value"])
    assert v["import_name"] == "p/in"
    assert v["observation_count"] == 4.0
    assert v["time_series_count"] == 3.0
    ss = v["series_summary"]
    assert len(ss) == 2  # sorted by facet id: f1, f2
    assert ss[0]["series_key"] == {
        "measurement_method": "Census",
        "observation_period": "P1Y",
        "unit": "USD",
        "scaling_factor": None,  # explicit nulls, BQ JSON_OBJECT style
        "is_dc_aggregate": False,
    }
    assert ss[0]["earliest_date"] == "2019"
    assert ss[0]["place_type_summary"]["City"]["place_count"] == 2
    assert ss[0]["place_type_summary"]["City"]["top_places"] == [
        {"dcid": "geo/A", "name": "Place A"},
        {"dcid": "geo/B", "name": "Place B"},
    ]
    # f2's untyped place -> null place_type_summary
    assert ss[1]["place_type_summary"] is None
