"""Lint plan golden vs the reference's own lint fixture
(tool/src/test/resources/org/datacommons/tool/lint/statchecks):
counter rollups for the StatsCheck warnings, the duplicate-SVObs
error, and the node-success arithmetic must match report.json."""

import json
import os

import pytest
from pyspark.sql import functions as F

from import_spark.plans.lint import run_lint
from import_spark.sources.mcf import read_mcf

LINT_FIXTURES = "/root/reference/tool/src/test/resources/org/datacommons/tool/lint"


@pytest.mark.skipif(not os.path.isdir(LINT_FIXTURES), reason="reference fixtures not present")
def test_lint_statchecks_reference_golden(spark, tmp_path):
    nodes = read_mcf(spark, os.path.join(LINT_FIXTURES, "statchecks", "input", "covid.mcf"))
    out_dir = str(tmp_path / "lint")
    res = run_lint(spark, nodes, out_dir=out_dir)

    with open(os.path.join(LINT_FIXTURES, "statchecks", "output", "report.json")) as f:
        want = json.load(f)["levelSummary"]

    got = res.report["levelSummary"]
    # every StatsCheck_* warning counter matches the reference exactly
    # (both presence and count), and none fire that the reference lacks
    want_warn = {
        k: int(v)
        for k, v in want.get("LEVEL_WARNING", {}).get("counters", {}).items()
        if k.startswith("StatsCheck_")
    }
    got_warn = {
        k: v
        for k, v in got.get("LEVEL_WARNING", {}).get("counters", {}).items()
        if k.startswith("StatsCheck_")
    }
    assert got_warn == want_warn
    # duplicate-dcid conflicting values → one error, like the reference
    assert got["LEVEL_ERROR"]["counters"]["Sanity_InconsistentSvObsValues"] == int(
        want["LEVEL_ERROR"]["counters"]["Sanity_InconsistentSvObsValues"]
    )
    # node-success arithmetic matches
    assert got["LEVEL_INFO"]["counters"]["NumNodeSuccesses"] == int(
        want["LEVEL_INFO"]["counters"]["NumNodeSuccesses"]
    )
    # report.json written
    assert os.path.exists(os.path.join(out_dir, "report.json"))


def test_lint_existence_missing_reference(spark):
    """A resolved ref to an undefined node fails the local existence
    pass; defined and known-node refs do not."""
    rows = [
        ("N1", "typeOf", "RESOLVED_REF", "City", ""),
        ("N1", "dcid", "TEXT", "geoId/06", ""),
        ("N1", "containedInPlace", "RESOLVED_REF", "country/USA", ""),
        ("N2", "typeOf", "RESOLVED_REF", "City", ""),
        ("N2", "dcid", "TEXT", "geoId/07", ""),
        ("N2", "containedInPlace", "RESOLVED_REF", "geoId/06", ""),
    ]
    nodes = spark.createDataFrame(
        rows, "node_id string, prop string, value_type string, value string, src_file string"
    )
    res = run_lint(spark, nodes)
    counters = {
        (r.counter, r.node_id)
        for r in res.errors.filter(F.col("counter").startswith("Existence_")).collect()
    }
    assert ("Existence_MissingReference_containedInPlace", "N1") in counters
    assert all(n != "N2" for _, n in counters)  # geoId/06 is defined locally
    known = spark.createDataFrame([("country/USA",)], ["node"])
    res2 = run_lint(spark, nodes, known_nodes=known)
    assert res2.errors.filter(F.col("counter").startswith("Existence_Missing")).count() == 0
    assert res2.report["levelSummary"]["LEVEL_INFO"]["counters"]["Existence_NumChecks"] >= 2
