"""MetadataValidator + header-validation parity
(simple/stats/validation.py:25-162, validation_test.py cases;
variable_per_row_importer.py:149-266; entities_importer.py:83-117)."""

from __future__ import annotations

import pytest

from import_spark.operators.metadata_validation import (
    INVALID_CONFIGURATION,
    MISSING_PROVENANCE,
    MISSING_REQUIRED_COLUMNS,
    MISSING_SOURCE,
    UNMAPPED_COLUMNS,
    MetadataValidationError,
    validate_entity_headers,
    validate_headers,
    validate_metadata,
    validate_vpr_headers,
)

TRIPLES_SCHEMA = "subject_id string, predicate string, object_id string, object_value string"


def _triples(spark, rows):
    return spark.createDataFrame(rows, TRIPLES_SCHEMA)


def _cfg(*provs):
    return {
        "inputFiles": [
            {"pattern": f"f{i}.csv", "provenance": p} for i, p in enumerate(provs)
        ]
    }


# --- validation_test.py cases, one for one ---


def test_validation_success(spark):
    t = _triples(
        spark,
        [
            ("dcid:MySource", "typeOf", "Source", None),
            ("dcid:MyProvenance", "typeOf", "Provenance", None),
            ("dcid:MyProvenance", "source", "dcid:MySource", None),
        ],
    )
    errs = validate_metadata(spark, _cfg("dcid:MyProvenance"), t, strict=True)
    assert errs.count() == 0


def test_validation_missing_provenance(spark):
    t = _triples(spark, [("dcid:MySource", "typeOf", "Source", None)])
    with pytest.raises(MetadataValidationError) as exc:
        validate_metadata(spark, _cfg("dcid:MissingProvenance"), t, strict=True)
    assert "referenced provenances are not defined in your MCF files" in str(exc.value)
    assert "dcid:MissingProvenance" in str(exc.value)
    assert exc.value.error_type == MISSING_PROVENANCE


def test_validation_missing_source_link(spark):
    t = _triples(spark, [("dcid:MyProvenance", "typeOf", "Provenance", None)])
    with pytest.raises(MetadataValidationError) as exc:
        validate_metadata(spark, _cfg("dcid:MyProvenance"), t, strict=True)
    assert "Linked sources are missing for defined provenances" in str(exc.value)
    assert "has no linked Source" in str(exc.value)
    assert exc.value.error_type == MISSING_SOURCE


def test_validation_undefined_source_node_passes(spark):
    # Source node itself undefined — still valid (validation_test.py:108)
    t = _triples(
        spark,
        [
            ("dcid:MyProvenance", "typeOf", "Provenance", None),
            ("dcid:MyProvenance", "source", "dcid:MySource", None),
        ],
    )
    assert validate_metadata(spark, _cfg("dcid:MyProvenance"), t, strict=True).count() == 0


def test_validation_missing_provenance_key(spark):
    t = _triples(spark, [])
    with pytest.raises(MetadataValidationError) as exc:
        validate_metadata(spark, {"inputFiles": [{"pattern": "data.csv"}]}, t, strict=True)
    assert "must have a 'provenance' property" in str(exc.value)
    assert exc.value.error_type == INVALID_CONFIGURATION


def test_validation_invalid_provenance_format(spark):
    t = _triples(spark, [])
    with pytest.raises(MetadataValidationError) as exc:
        validate_metadata(spark, _cfg("InvalidProvenanceName"), t, strict=True)
    assert "must be a valid DCID or URI" in str(exc.value)
    assert "InvalidProvenanceName" in str(exc.value)
    assert exc.value.error_type == INVALID_CONFIGURATION


# --- semantics beyond the reference's own tests ---


def test_no_referenced_provenances_is_early_return(spark):
    # validation.py:43-45 — a sourceless provenance is NOT flagged when
    # nothing is referenced at all
    t = _triples(spark, [("dcid:P", "typeOf", "Provenance", None)])
    assert validate_metadata(spark, {"inputFiles": []}, t).count() == 0


def test_clean_dcid_namespace_and_legacy_dict_config(spark):
    # bare subjects gain dcid:, custom namespaces pass through, and the
    # legacy dict-shaped inputFiles is accepted (config.py:111-122)
    t = _triples(
        spark,
        [
            ("BareProv", "dcs:typeOf", "dcid:Provenance", None),
            ("custom:P2", "typeOf", "SubProvenance", None),
            ("custom:P2", "source", None, "src"),
        ],
    )
    cfg = {
        "inputFiles": {
            "a.csv": {"provenance": "dcid:BareProv"},
            "b.csv": {"provenance": "custom:P2"},
        }
    }
    rows = {
        (r["error_type"], r["node"])
        for r in validate_metadata(spark, cfg, t).collect()
    }
    # BareProv defined (typeOf object contains 'Provenance') but no
    # source; custom:P2 defined (substring match) and sourced
    assert rows == {(MISSING_SOURCE, "dcid:BareProv")}


def test_empty_string_source_does_not_count(spark):
    t = _triples(
        spark,
        [
            ("dcid:P", "typeOf", "Provenance", None),
            ("dcid:P", "source", "", ""),
        ],
    )
    rows = [(r["error_type"], r["node"]) for r in validate_metadata(spark, _cfg("dcid:P"), t).collect()]
    assert rows == [(MISSING_SOURCE, "dcid:P")]


def test_registry_defines_and_links(spark):
    # registry provenances count as defined + linked (validation.py:92-99)
    from import_spark.plans.simple_import import _Registry

    reg = _Registry()  # ships "Custom Import" -> (c/p/default, c/s/default)
    t = _triples(spark, [])
    errs = validate_metadata(spark, _cfg("dcid:c/p/default"), t, registry=reg, strict=True)
    assert errs.count() == 0


def test_missing_source_applies_to_unreferenced_defined(spark):
    # the source check covers ALL defined provenances, not just the
    # referenced ones (validation.py:137-152)
    t = _triples(
        spark,
        [
            ("dcid:Referenced", "typeOf", "Provenance", None),
            ("dcid:Referenced", "source", "dcid:S", None),
            ("dcid:Unreferenced", "typeOf", "Provenance", None),
        ],
    )
    rows = [
        (r["error_type"], r["node"])
        for r in validate_metadata(spark, _cfg("dcid:Referenced"), t).collect()
    ]
    assert rows == [(MISSING_SOURCE, "dcid:Unreferenced")]


# --- header validation ---


def test_vpr_headers_happy_and_each_error():
    mappings = {
        "dcid:observationAbout": "who",
        "dcid:variableMeasured": "series",
        "dcid:observationDate": "when",
        "dcid:value": "val",
    }
    cols = ["who", "series", "when", "val"]
    assert validate_vpr_headers("f.csv", cols, mappings) == []

    # missing required mapping
    errs = validate_vpr_headers("f.csv", cols, {"dcid:observationAbout": "who"})
    kinds = {e["errorType"] for e in errs}
    assert MISSING_REQUIRED_COLUMNS in kinds
    assert any(e["problemColumns"] == ["dcid:variableMeasured"] for e in errs)

    # zero entity dimensions
    errs = validate_vpr_headers(
        "f.csv",
        cols,
        {"dcid:variableMeasured": "series", "dcid:observationDate": "when", "dcid:value": "val"},
    )
    assert any(
        e["errorType"] == INVALID_CONFIGURATION and "at least one entity dimension" in e["errorMessage"]
        for e in errs
    )

    # >3 entity dimensions
    too_many = dict(mappings, **{f"dcid:dim{i}": f"d{i}" for i in range(3)})
    errs = validate_vpr_headers("f.csv", cols + [f"d{i}" for i in range(3)], too_many)
    assert any(
        e["errorType"] == INVALID_CONFIGURATION and "Too many entity dimensions" in e["errorMessage"]
        for e in errs
    )

    # expected column absent from the CSV
    errs = validate_vpr_headers("f.csv", ["who", "series", "when"], mappings)
    assert [e["errorType"] for e in errs] == [MISSING_REQUIRED_COLUMNS]
    assert errs[0]["problemColumns"] == ["val"]

    # unmapped physical column unless ignored
    errs = validate_vpr_headers("f.csv", cols + ["extra"], mappings)
    assert [e["errorType"] for e in errs] == [UNMAPPED_COLUMNS]
    assert errs[0]["problemColumns"] == ["extra"]
    assert validate_vpr_headers("f.csv", cols + ["extra"], mappings, ["extra"]) == []


def test_entity_headers():
    # no mappings -> no check (entities_importer.py:85-86)
    assert validate_entity_headers("e.csv", ["a", "b"], None) == []
    errs = validate_entity_headers(
        "e.csv", ["a", "b", "c", "id"], {"k": "a"}, ["b"], id_column="id"
    )
    assert [e["errorType"] for e in errs] == [UNMAPPED_COLUMNS]
    assert errs[0]["problemColumns"] == ["c"]


def test_validate_headers_plan_dispatch(spark):
    cfg = {
        "inputFiles": {
            "vpr.csv": {
                "format": "variablePerRow",
                "provenance": "dcid:P",
                "columnMappings": {
                    "dcid:observationAbout": "who",
                    "dcid:variableMeasured": "series",
                    "dcid:observationDate": "when",
                    "dcid:value": "val",
                },
            },
            "ents.csv": {
                "rowEntityType": "Thing",
                "provenance": "dcid:P",
                "columnMappings": {"dcid:name": "name"},
            },
        }
    }
    inputs = {
        "vpr.csv": spark.createDataFrame([], "who string, series string, when string, val string, stray string"),
        "ents.csv": spark.createDataFrame([], "name string, stray2 string"),
    }
    errs = validate_headers(cfg, inputs)
    assert {(e["file"], e["errorType"]) for e in errs} == {
        ("vpr.csv", UNMAPPED_COLUMNS),
        ("ents.csv", UNMAPPED_COLUMNS),
    }
