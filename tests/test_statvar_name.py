"""StatVar name generation locked to the reference's own test vectors
(StatVarNameGeneratorTest.java) — the full rule set, not the former
subset format."""

from import_spark.functions.statvar_name import format_token, generate_statvar_name


def test_format_token_reference_vectors():
    assert format_token("cumulativeCount") == "Cumulative Count"
    assert format_token("MedicalConditionIncident") == "Medical Condition Incident"
    assert format_token("COVID_19") == "COVID 19"
    assert format_token("Years18To24") == "Years 18 To 24"
    assert format_token("dcid:Count_Person") == "Count Person"
    assert format_token("") == ""
    assert format_token(None) == ""


def test_generate_name_reference_vectors():
    assert (
        generate_statvar_name(
            {
                "typeOf": ["StatisticalVariable"],
                "statType": ["growthRate"],
                "measuredProperty": ["count"],
                "populationType": ["Person"],
                "measurementQualifier": ["Annual"],
            }
        )
        == "Growth Rate Annual Count Of Person"
    )
    assert (
        generate_statvar_name(
            {
                "typeOf": ["StatisticalVariable"],
                "measuredProperty": ["cumulativeCount"],
                "populationType": ["MedicalConditionIncident"],
                "incidentType": ["COVID_19"],
                "medicalStatus": ["ConfirmedCase"],
            }
        )
        == "Cumulative Count Of Medical Condition Incident: COVID 19, Confirmed Case"
    )
    assert (
        generate_statvar_name(
            {
                "typeOf": ["StatisticalVariable"],
                "measuredProperty": ["count"],
                "populationType": ["Person"],
                "isUrban": ["true"],
                "measurementDenominator": ["Count_Person"],
            }
        )
        == "Count Of Person: Is Urban (Per capita)"
    )
    # generic pop type suppressed; non-core props become constraints
    assert (
        generate_statvar_name(
            {
                "typeOf": ["StatisticalVariable"],
                "measuredProperty": ["value"],
                "populationType": ["Thing"],
                "variableMeasured": ["UnemploymentRate"],
            }
        )
        == "Value: Unemployment Rate"
    )
    # popType contains measure → popType wins, no "Of" duplication
    assert (
        generate_statvar_name(
            {
                "typeOf": ["StatisticalVariable"],
                "measuredProperty": ["count"],
                "populationType": ["Count_Person"],
            }
        )
        == "Count Person"
    )


def test_generate_name_extra_rules():
    # statType "Value" suffix stripped; non-period qualifier parenthesized
    assert (
        generate_statvar_name(
            {
                "statType": ["medianValue"],
                "measuredProperty": ["income"],
                "populationType": ["Household"],
                "measurementQualifier": ["Nominal"],
            }
        )
        == "Median Income Of Household (Nominal)"
    )
    # boolean false constraint; non-person denominator
    assert (
        generate_statvar_name(
            {
                "measuredProperty": ["count"],
                "populationType": ["Person"],
                "isInternetUser": ["false"],
                "measurementDenominator": ["Count_Household"],
            }
        )
        == "Count Of Person: Is Internet User (False) (As fraction of Count Household)"
    )


def test_mutator_uses_full_name_rules(spark):
    """A StatVar whose name the old subset format would have gotten
    wrong (denominator + qualifier) now carries the full-rule name."""
    from pyspark.sql import functions as F

    from import_spark.operators.mcf_mutator import mutate_nodes

    nodes = spark.createDataFrame(
        [
            ("SV", "typeOf", "RESOLVED_REF", "StatisticalVariable", ""),
            ("SV", "populationType", "RESOLVED_REF", "Person", ""),
            ("SV", "measuredProperty", "RESOLVED_REF", "count", ""),
            ("SV", "statType", "RESOLVED_REF", "measuredValue", ""),
            ("SV", "measurementQualifier", "RESOLVED_REF", "Annual", ""),
            ("SV", "measurementDenominator", "RESOLVED_REF", "Count_Person", ""),
        ],
        "node_id string, prop string, value_type string, value string, src_file string",
    )
    out, _ = mutate_nodes(nodes)
    names = [r.value for r in out.filter(F.col("prop") == "name").collect()]
    assert names == ["Annual Count Of Person (Per capita)"]
