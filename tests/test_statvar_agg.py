"""StatVar SUM aggregation (stat_var_aggregator.py parity)."""

import pytest

from import_spark.operators.calculations import signed_farm_fingerprint
from import_spark.operators.statvar_agg import (
    StatVarAggregationConfig,
    aggregate_stat_vars,
)

OBS_SCHEMA = (
    "variable_measured string, entity1 string, extra_entities_id string, "
    "facet_id string, date string, value string"
)
TS_SCHEMA = (
    "variable_measured string, entity1 string, extra_entities_id string, "
    "facet_id string, provenance string, entities string, "
    "facet struct<provenance:string,measurementMethod:string,unit:string,"
    "observationPeriod:string,scalingFactor:string>"
)


def _facet(mm, unit=None, period=None, scaling=None):
    return ("p/in", mm, unit, period, scaling)


@pytest.fixture(scope="module")
def tables(spark):
    obs = spark.createDataFrame(
        [
            ("sv/a", "e1", "", "f", "2020", "3"),
            ("sv/b", "e1", "", "f", "2020", "4"),
            # e2 contributes only sv/a -> dropped by the completeness check
            ("sv/a", "e2", "", "f", "2020", "5"),
            # non-numeric value SAFE_CASTs to null but still counts as a
            # contribution (reference: COUNT(DISTINCT variable_measured)
            # over the raw join)
            ("sv/a", "e1", "", "f", "2021", "x"),
            ("sv/b", "e1", "", "f", "2021", "2"),
        ],
        OBS_SCHEMA,
    )
    ts = spark.createDataFrame(
        [
            ("sv/a", "e1", "", "f", "p/in", "[]", _facet("Census")),
            ("sv/b", "e1", "", "f", "p/in", "[]", _facet("Census")),
            ("sv/a", "e2", "", "f", "p/in", "[]", _facet("Census")),
        ],
        TS_SCHEMA,
    )
    return obs, ts


def test_sum_completeness_and_facet_id(spark, tables):
    obs, ts = tables
    cfg = StatVarAggregationConfig("sv/parent", ["sv/a", "sv/b"], ["p/in"], "p/out")
    res = aggregate_stat_vars(obs, ts, cfg)
    rows = {(r.entity1, r.date): r for r in res.observations.collect()}
    fid = str(signed_farm_fingerprint("p/out^dcAggregate/Census^^^^true"))
    assert set(rows) == {("e1", "2020"), ("e1", "2021")}  # e2 incomplete
    assert rows[("e1", "2020")].value == "7.0"
    assert rows[("e1", "2021")].value == "2.0"  # null contribution still counted
    assert all(r.facet_id == fid for r in rows.values())
    assert all(r.variable_measured == "sv/parent" for r in rows.values())

    # one TimeSeries row per distinct (extra, entities, rewritten facet),
    # no entity1 column (reference TS EXPORT column set)
    ts_rows = res.timeseries.collect()
    assert len(ts_rows) == 1
    t = ts_rows[0]
    assert "entity1" not in res.timeseries.columns
    assert (t.variable_measured, t.facet_id, t.entities) == ("sv/parent", fid, "[]")
    assert t.facet.provenance == "p/out"
    assert t.facet.measurementMethod == "dcAggregate/Census"
    assert t.facet.isDcAggregate is True


def test_skip_check_keeps_partial_groups(spark, tables):
    obs, ts = tables
    cfg = StatVarAggregationConfig(
        "sv/parent", ["sv/a", "sv/b"], ["p/in"], "p/out",
        skip_all_sources_present_check=True,
    )
    rows = {(r.entity1, r.date): r.value
            for r in aggregate_stat_vars(obs, ts, cfg).observations.collect()}
    assert rows[("e2", "2020")] == "5.0"


def test_mm_rewrite_variants(spark):
    # empty -> DataCommonsAggregate; dcAggregate/-prefixed kept; facets
    # that rewrite differently form separate (incomplete) groups
    obs = spark.createDataFrame(
        [("sv/a", "e1", "", "f1", "2020", "1"), ("sv/b", "e1", "", "f2", "2020", "2")],
        OBS_SCHEMA,
    )
    ts = spark.createDataFrame(
        [
            ("sv/a", "e1", "", "f1", "p/in", "[]", _facet("")),
            ("sv/b", "e1", "", "f2", "p/in", "[]", _facet("dcAggregate/X")),
        ],
        TS_SCHEMA,
    )
    cfg = StatVarAggregationConfig(
        "sv/parent", ["sv/a", "sv/b"], ["p/in"], "p/out",
        skip_all_sources_present_check=True,
    )
    res = aggregate_stat_vars(obs, ts, cfg)
    fids = {r.facet_id: r.value for r in res.observations.collect()}
    assert fids == {
        str(signed_farm_fingerprint("p/out^DataCommonsAggregate^^^^true")): "1.0",
        str(signed_farm_fingerprint("p/out^dcAggregate/X^^^^true")): "2.0",
    }
    # with the check on, the facet-split groups are each incomplete
    cfg2 = StatVarAggregationConfig("sv/parent", ["sv/a", "sv/b"], ["p/in"], "p/out")
    assert aggregate_stat_vars(obs, ts, cfg2).observations.count() == 0


def test_provenance_scope(spark):
    obs = spark.createDataFrame(
        [("sv/a", "e1", "", "f", "2020", "1"), ("sv/b", "e1", "", "f", "2020", "2")],
        OBS_SCHEMA,
    )
    ts = spark.createDataFrame(
        [
            ("sv/a", "e1", "", "f", "p/in", "[]", _facet("Census")),
            ("sv/b", "e1", "", "f", "p/OTHER", "[]", _facet("Census")),
        ],
        TS_SCHEMA,
    )
    cfg = StatVarAggregationConfig("sv/parent", ["sv/a", "sv/b"], ["p/in"], "p/out")
    # sv/b's series is out of provenance scope -> group incomplete
    assert aggregate_stat_vars(obs, ts, cfg).observations.count() == 0
