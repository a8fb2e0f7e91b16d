"""Golden parity for the simple-importer surfaces (SURVEY §3.3):
variable-per-row / entities / events importers and the Runner-analogue
plan, checked bit-for-bit against the reference's own expected CSVs
(simple/tests/stats/test_data/{variable_per_row_importer,
entities_importer,events_importer})."""

from __future__ import annotations

import json

import pandas as pd
import pytest

REF = "/root/reference/simple/tests/stats/test_data"


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.fillna("").astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _expect(path: str, cols: list[str]) -> pd.DataFrame:
    exp = pd.read_csv(path, dtype=str).fillna("")
    return _sorted(exp[cols])


@pytest.mark.parametrize(
    "case",
    ["single_entity_official_keys", "multi_entity_with_primary", "multi_entity_custom_dimensions"],
)
def test_variable_per_row_golden(spark, case):
    from import_spark.operators.simple_importers import import_variable_per_row

    base = f"{REF}/variable_per_row_importer"
    cfg = json.load(open(f"{base}/input/{case}/config.json"))["inputFiles"][0]
    df = spark.read.csv(f"{base}/input/{case}/input.csv", header=True)
    out = import_variable_per_row(
        df, cfg["columnMappings"], provenance=cfg["provenance"]
    ).toPandas()
    exp = _expect(f"{base}/expected/{case}/observations.db.csv", list(out.columns))
    assert _sorted(out).equals(exp)


def _load_indexed(spark, path: str):
    pdf = pd.read_csv(path, skipinitialspace=True, thousands=",")
    pdf["_idx"] = range(len(pdf))
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize(
    "name", ["without_id_column.csv", "with_id_column.csv", "with_entity_columns.csv"]
)
def test_entities_import_golden(spark, name):
    from import_spark.plans.simple_import import run_simple_import

    base = f"{REF}/entities_importer"
    config = json.load(open(f"{base}/input/config.json"))
    df = _load_indexed(spark, f"{base}/input/{name}")
    res = run_simple_import(spark, config, {name: df}, index_cols={name: "_idx"})
    out = res.triples.toPandas()
    exp = _expect(f"{base}/expected/{name[:-4]}.triples.db.csv", list(out.columns))
    assert _sorted(out).equals(exp)


_ALPHA3 = [
    "USA", "BRA", "CHN", "DEU", "FRA", "GBR", "IND", "JPN", "MEX", "ZAF",
    "CAN", "AUS", "RUS", "ITA", "ESP", "KOR", "NGA", "EGY", "ARG", "COL",
]


@pytest.mark.parametrize("name", ["countryalpha3codes.csv", "idcolumns.csv"])
def test_events_import_golden(spark, name):
    """Full plan: event triples + count observations + node triples +
    distinct-entity typeOf, vs both expected db CSVs. The recon table
    is the offline stand-in for the reference's dc-client resolution
    (alpha3 → country/<alpha3>, what its mocked API returns)."""
    from import_spark.plans.simple_import import run_simple_import

    base = f"{REF}/events_importer"
    config = json.load(open(f"{base}/input/config.json"))
    recon = spark.createDataFrame(
        [(a, f"country/{a}") for a in _ALPHA3], "external_id string, dcid string"
    )
    df = _load_indexed(spark, f"{base}/input/{name}")
    res = run_simple_import(
        spark, config, {name: df}, recon_table=recon, index_cols={name: "_idx"}
    )
    stem = name[:-4]
    for kind, got in (("observations", res.observations), ("triples", res.triples)):
        out = got.toPandas()
        exp = _expect(f"{base}/expected/{stem}.{kind}.db.csv", list(out.columns))
        assert _sorted(out).equals(exp), f"{stem} {kind}"


def test_synth_id_rules():
    from import_spark.operators.simple_importers import synth_id

    c = [0]
    assert synth_id("Count_CrimeEvent", "custom/statvar_", c) == "Count_CrimeEvent"
    assert synth_id("Crime Event2 Count", "custom/statvar_", c) == "Crime_Event2_Count"
    assert synth_id("PRIMARY DESCRIPTION", "c/prop/", c) == "PRIMARY_DESCRIPTION"
    assert synth_id("100% weird!", "c/prop/", c) == "c/prop/1"
    assert synth_id("another?", "c/prop/", c) == "c/prop/2"
    assert synth_id("dcid:geoId/06", "c/prop/", c) == "dcid:geoId/06"


def test_variable_per_row_defaults_and_validation(spark):
    from import_spark.operators.simple_importers import import_variable_per_row

    df = spark.createDataFrame(
        [("geoId/06", "sv1", "2024", "1", ""), ("geoId/07", "sv1", "2024", "-", "dcid:Percent")],
        "place string, var string, when string, val string, u string",
    )
    mappings = {
        "dcid:observationAbout": "place",
        "dcid:variableMeasured": "var",
        "dcid:observationDate": "when",
        "dcid:value": "val",
        "dcid:unit": "u",
    }
    out = import_variable_per_row(
        df, mappings, observation_properties={"unit": "USDollar"}
    ).toPandas()
    # NA-token value row is filtered; empty per-row unit falls back to
    # the default, explicit per-row unit wins (namespace-stripped)
    assert len(out) == 1
    assert out.unit[0] == "USDollar"
    assert out.properties[0] == '{"dcid:observationAbout": "geoId/06"}'

    with pytest.raises(ValueError, match="entity dimension"):
        import_variable_per_row(
            df,
            {"dcid:variableMeasured": "var", "dcid:observationDate": "when", "dcid:value": "val"},
        )


def test_mcf_db_triples_resolution(spark):
    """McfImporter semantics (mcf_importer.py:59-165): subjects resolve
    through their dcid rows, dcid rows themselves are dropped, ID-kind
    values become object_id, URI/namespace subjects pass through
    unmapped, and a dcid-less non-URI subject is dropped (or raises
    under strict=True, the reference's behavior)."""
    import pytest

    from import_spark.operators.simple_importers import mcf_db_triples

    schema = "node_id string, prop string, value_type string, value string, src_file string"
    rows = [
        ("l:a", "dcid", "TEXT", "place/A", "f"),
        ("l:a", "name", "TEXT", "Alpha", "f"),
        ("l:a", "near", "UNRESOLVED_REF", "place/B", "f"),
        ("dcid:meta/1", "url", "TEXT", "http://x", "f"),
        ("bad subject", "name", "TEXT", "dropped", "f"),
    ]
    out = {
        (r.subject_id, r.predicate): (r.object_id, r.object_value)
        for r in mcf_db_triples(spark.createDataFrame(rows, schema)).collect()
    }
    assert out[("place/A", "name")] == (None, "Alpha")
    assert out[("place/A", "near")] == ("place/B", None)
    assert out[("dcid:meta/1", "url")] == (None, "http://x")
    assert len(out) == 3  # dcid rows gone; bad subject quarantined

    with pytest.raises(ValueError, match="dcid not specified"):
        mcf_db_triples(spark.createDataFrame(rows, schema), strict=True).collect()


def test_run_simple_import_mcf_dispatch(spark):
    """A .mcf input flows through the plan into the triples output."""
    from import_spark.plans.simple_import import run_simple_import

    schema = "node_id string, prop string, value_type string, value string, src_file string"
    nodes = spark.createDataFrame(
        [("l:s", "dcid", "TEXT", "source/X", "f"), ("l:s", "name", "TEXT", "Src", "f")], schema
    )
    res = run_simple_import(spark, {}, {"meta.mcf": nodes})
    got = {(r.subject_id, r.predicate, r.object_value) for r in res.triples.collect()}
    assert ("source/X", "name", "Src") in got


def test_json_escape_matches_json_dumps(spark):
    """_json_escape must agree with json.dumps (the reference encoder)
    on quotes, backslashes and ALL control characters — a raw newline
    in a custom-dimension cell must not yield invalid JSON, and the
    Java replacement-string escaping of '\"' must survive."""
    from pyspark.sql import functions as F

    from import_spark.operators.simple_importers import _json_escape

    vals = ['a"b', "back\\slash", "nl\nnl", "tab\there", "mix\"\\\n\x01\x1f", "plain"]
    df = spark.createDataFrame([(v,) for v in vals], "s string").select(
        "s", _json_escape(F.col("s")).alias("e")
    )
    for r in df.collect():
        assert r["e"] == json.dumps(r["s"])[1:-1], repr(r["s"])


def test_file_config_list_shape():
    """The modern list-of-objects inputFiles shape (config.py:96-108)
    must resolve by filename and by pattern."""
    from import_spark.plans.simple_import import _file_config

    cfg = {
        "inputFiles": [
            {"filename": "a.csv", "provenance": "dcid:P1"},
            {"pattern": "events_*.csv", "provenance": "dcid:P2"},
        ]
    }
    assert _file_config(cfg, "a.csv")["provenance"] == "dcid:P1"
    assert _file_config(cfg, "events_2020.csv")["provenance"] == "dcid:P2"
    assert _file_config(cfg, "other.csv") == {}


def test_events_null_keys_excluded(spark):
    """Rows with a null entity or unparseable date must not form
    observation groups (pandas groupby dropna semantics; the
    reference's date_parse raises on bad dates)."""
    from import_spark.operators.simple_importers import import_events

    df = spark.createDataFrame(
        [
            (0, "USA", "2020-01-01", "x"),
            (1, "USA", "2020-06-30", "y"),
            (2, None, "2020-02-02", "z"),      # null entity
            (3, "BRA", "not-a-date", "w"),      # unparseable date
        ],
        "_idx long, loc string, dt string, extra string",
    )
    observations, _triples = import_events(
        df,
        event_type="TestEvent",
        index_col="_idx",
        entity_column="loc",
        date_column="dt",
        computed_variables={"count": "dcid:Count_TestEvent"},
        aggregation_periods={"count": "year"},
        provenance_id="dcid:P",
    )
    rows = {(r["entity"], r["date"]): r["value"] for r in observations.collect()}
    assert rows == {("USA", "2020"): "2"}
