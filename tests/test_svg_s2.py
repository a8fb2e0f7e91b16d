"""SVG hierarchy lattice (stat_var_hierarchy_generator.py:340-445) and
S2 cell ids (resolvers.py:32-66 pure-math port)."""

import numpy as np
from pyspark.sql import functions as F

from import_spark.functions.s2cells import (
    s2_cell_dcid,
    s2_cell_id,
    s2_cell_id_batch,
    s2_cell_level,
)
from import_spark.operators.svg_hierarchy import generate_svg_hierarchy

NODE_SCHEMA = "node_id string, prop string, value_type string, value string, src_file string"


def _sv(spark):
    rows = [
        ("SV1", "typeOf", "RESOLVED_REF", "StatisticalVariable", ""),
        ("SV1", "dcid", "TEXT", "Count_Person_Female_Asian", ""),
        ("SV1", "populationType", "RESOLVED_REF", "Person", ""),
        ("SV1", "gender", "RESOLVED_REF", "Female", ""),
        ("SV1", "race", "RESOLVED_REF", "Asian", ""),
        ("SV2", "typeOf", "RESOLVED_REF", "StatisticalVariable", ""),
        ("SV2", "dcid", "TEXT", "Count_Person_Male", ""),
        ("SV2", "populationType", "RESOLVED_REF", "Person", ""),
        ("SV2", "gender", "RESOLVED_REF", "Male", ""),
    ]
    return spark.createDataFrame(rows, NODE_SCHEMA)


def test_svg_lattice_structure(spark):
    tri = generate_svg_hierarchy(_sv(spark))
    rows = {(r.subject_id, r.predicate, r.object_id, r.object_value) for r in tri.collect()}
    # leaf membership
    assert ("Count_Person_Female_Asian", "memberOf", "c/g/Person_Gender-Female_Race-Asian", None) in rows
    assert ("Count_Person_Male", "memberOf", "c/g/Person_Gender-Male", None) in rows
    # the two-hop parent chain: drop val, then drop prop
    assert ("c/g/Person_Gender-Female_Race-Asian", "specializationOf", "c/g/Person_Gender_Race-Asian", None) in rows
    assert ("c/g/Person_Gender_Race-Asian", "specializationOf", "c/g/Person_Race-Asian", None) in rows
    assert ("c/g/Person_Gender", "specializationOf", "c/g/Person", None) in rows
    # pop-type top attaches to the custom root
    assert ("c/g/Person", "specializationOf", "c/g/Root", None) in rows
    # names: capitalize-and-split, "With", "=" formatting
    assert ("c/g/Person_Gender-Female", "name", None, "Person With Gender = Female") in rows
    assert ("c/g/Person_Gender", "name", None, "Person With Gender") in rows
    # every SVG is typed
    svg_ids = {s for s, p, o, v in rows if p == "typeOf" and o == "StatVarGroup"}
    named = {s for s, p, o, v in rows if p == "name"}
    assert svg_ids == named and len(svg_ids) == 9


def test_svg_verticals_reference_golden(spark):
    """Full-output golden vs the reference's own verticals fixture
    (simple/tests/stats/test_data/stat_var_hierarchy_generator):
    vertical SVGs under the root, matched pop-type SVGs under their
    verticals, unmatched (Thing) under the root, multi-parent lattice
    nodes, generated names, StatVarGroup typeOf."""
    import os

    import pandas as pd

    from import_spark.operators.svg_hierarchy import (
        generate_svg_hierarchy,
        load_vertical_specs,
    )

    base = "/root/reference/simple/tests/stats/test_data/stat_var_hierarchy_generator"
    if not os.path.isdir(base):
        import pytest

        pytest.skip("reference fixtures unavailable")
    inp = pd.read_csv(os.path.join(base, "input", "verticals.csv"), keep_default_na=False)
    with open(os.path.join(base, "input", "verticals.vertical_specs.json")) as f:
        specs = load_vertical_specs(f.read())
    nodes = spark.createDataFrame(
        [
            (r.subject_id, r.predicate, "RESOLVED_REF", r.object_id or r.object_value, "")
            for r in inp.itertuples()
        ],
        "node_id string, prop string, value_type string, value string, src_file string",
    )
    got = {
        (r.subject_id, r.predicate, r.object_id, r.object_value)
        for r in generate_svg_hierarchy(nodes, vertical_specs=specs).collect()
    }
    exp_pdf = pd.read_csv(os.path.join(base, "expected", "verticals_triples.csv"), keep_default_na=False)
    want = {
        (r.subject_id, r.predicate, r.object_id or None, r.object_value or None)
        for r in exp_pdf.itertuples()
    }
    assert got == want, (sorted(want - got)[:5], sorted(got - want)[:5])


def test_s2_reference_golden():
    # the reference's own documented example (resolvers.py:33)
    assert s2_cell_dcid(38.7, -119.4, 10) == "s2CellId/0x80982b0000000000"


def test_s2_levels_and_containment():
    c30 = s2_cell_id(48.8584, 2.2945, 30)
    assert s2_cell_level(c30) == 30
    for lvl in (0, 5, 10, 20):
        c = s2_cell_id(48.8584, 2.2945, lvl)
        assert s2_cell_level(c) == lvl
        # parent range contains the leaf
        lsb = c & (-c)
        assert (c - lsb) <= c30 <= (c + lsb)


def test_s2_batch_matches_scalar():
    lats = np.array([0.0, 38.7, -45.2, 89.9, -89.9, 12.345])
    lngs = np.array([0.0, -119.4, 170.0, 10.0, -10.0, -0.01])
    batch = s2_cell_id_batch(lats, lngs, 12)
    for k in range(len(lats)):
        assert int(batch[k]) == s2_cell_id(float(lats[k]), float(lngs[k]), 12)


def test_relational_ops(spark):
    from import_spark.operators.relational import (
        ancestor_closure,
        dup_value_conflicts,
        group_percentiles,
    )

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 1, 2.0), ("b", 2, 3.0), ("b", 2, 3.0)],
        ["k", "g", "v"],
    )
    conflicts = dup_value_conflicts(df, ["k"], "v").collect()
    assert [(r.k, r.n_values) for r in conflicts] == [("a", 2)]

    pct = {r.k: r.p50 for r in group_percentiles(df, ["k"], "v", [0.5]).collect()}
    assert pct == {"a": 1.5, "b": 3.0}

    leaves = spark.createDataFrame([(1,), (2,)], ["leaf"])
    lvl1 = spark.createDataFrame([(1, 10), (2, 20)], ["child", "parent"])
    lvl2 = spark.createDataFrame([(10, 100), (20, 100)], ["child", "parent"])
    got = {(r.leaf, r.anc) for r in ancestor_closure(leaves, [lvl1, lvl2]).collect()}
    assert got == {(1, 100), (2, 100)}


def test_summary_report(spark, tmp_path):
    from import_spark.operators.summary import (
        place_series_summary,
        statvar_summary,
        svobs_from_triples,
        write_summary_report,
    )
    import os, json

    triples = spark.createDataFrame(
        [
            ("o1", "typeOf", "StatVarObservation"),
            ("o1", "variableMeasured", "Count_Person"),
            ("o1", "observationAbout", "geoId/06"),
            ("o1", "observationDate", "2019"),
            ("o1", "value", "10"),
            ("o1", "unit", "Person"),
            ("o2", "typeOf", "StatVarObservation"),
            ("o2", "variableMeasured", "Count_Person"),
            ("o2", "observationAbout", "geoId/06"),
            ("o2", "observationDate", "2020"),
            ("o2", "value", "12"),
            ("o2", "unit", "Person"),
            ("x", "typeOf", "City"),
        ],
        ["subj", "pred", "obj"],
    )
    svobs = svobs_from_triples(triples)
    assert svobs.count() == 2
    s = statvar_summary(svobs).collect()
    assert len(s) == 1
    r = s[0]
    assert (r.stat_var, r.num_places, r.num_observations, r.min_value, r.max_value) == (
        "Count_Person", 1, 2, 10.0, 12.0,
    )
    assert (r.num_dates, r.min_date, r.max_date, list(r.units)) == (2, "2019", "2020", ["Person"])
    ps = place_series_summary(svobs).collect()
    assert len(ps) == 1 and list(ps[0].series_dates) == ["2019", "2020"]
    assert list(ps[0].series_values) == [10.0, 12.0]
    out = str(tmp_path / "sum")
    rep = write_summary_report(svobs, out)
    assert os.path.exists(os.path.join(out, "summary_report.csv"))
    with open(os.path.join(out, "summary_report.json")) as f:
        data = json.load(f)
    assert data["statVarSummary"][0]["stat_var"] == "Count_Person"
    # summary_report.html (SummaryReportGenerator.java:33): StatVar
    # table + per-series section with an inline-SVG chart
    with open(os.path.join(out, "summary_report.html")) as f:
        html = f.read()
    assert "<td>Count_Person</td>" in html
    assert "geoId/06" in html and "<svg" in html and "<polyline" in html
    assert "<td>2019</td><td>10.0</td>" in html.replace("</td>\n<td>", "</td><td>")


def test_summary_csv_reference_golden():
    """Bit-exact vs the reference's own writer golden
    (CSVReportWriterTest.java EXPECTED_FILESTREAM): \\r\\n records,
    Java double rendering (10.0 / NaN), [a, b] set lists, empty date
    bounds when no dates were seen."""
    from import_spark.operators.summary import summary_csv

    rows = [
        dict(stat_var="Var1", num_places=0, num_observations=6,
             min_value=10, max_value=None, num_dates=0, min_date=None,
             max_date=None, measurementMethods=["CensusACS5YrSurvey"],
             units=[], scalingFactors=[], observationPeriods=[]),
        dict(stat_var="Var2", num_places=0, num_observations=2,
             min_value=5, max_value=None, num_dates=2, min_date="2020",
             max_date="2025", measurementMethods=["CensusACS5YrSurvey"],
             units=[], scalingFactors=[], observationPeriods=[]),
    ]
    expected = (
        "StatVar,NumPlaces,NumObservations,MinValue,MaxValue,"
        "NumObservationsDates,MinDate,MaxDate,MeasurementMethods,Units,"
        "ScalingFactors,observationPeriods\r\n"
        "Var1,0,6,10.0,NaN,0,,,[CensusACS5YrSurvey],[],[],[]\r\n"
        "Var2,0,2,5.0,NaN,2,2020,2025,[CensusACS5YrSurvey],[],[],[]"
    )
    assert summary_csv(rows).strip() == expected
    # commons-csv DEFAULT quoting: comma-bearing fields quote, quotes double
    from import_spark.operators.summary import _jcsv

    assert _jcsv('a,b') == '"a,b"'
    assert _jcsv('say "hi"') == '"say ""hi"""'
    assert _jcsv('plain') == 'plain'
