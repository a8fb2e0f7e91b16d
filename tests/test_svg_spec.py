"""Spec-driven SVG generation vs the reference's own e2e assertions
(pipeline/workflow/aggregation-helper/aggregation/e2e_tests/
stat_var_group_generator_test.py) — the mock data and every Edge/Node
assertion replicated for BOTH base-DC and custom-DC modes."""

import pytest
from pyspark.sql import functions as F

from import_spark.operators.svg_spec import generate_spec_svgs

EDGE_SCHEMA = "subject_id string, predicate string, object_id string, provenance string"
NV_SCHEMA = "subject_id string, value string"


def _edges(spark, rows):
    return spark.createDataFrame(rows, EDGE_SCHEMA)


def _basic_mock(spark, ns):
    """_setup_mock_data (stat_var_group_generator_test.py:58-110)."""
    e = []
    add = lambda s, p, o, prov="TestImport": e.append((s, p, o, prov))  # noqa: E731
    add("Spec_Student", "typeOf", "StatVarGroupSpec")
    add("Spec_Student", "populationType", "Student")
    add("Spec_Student", "vertical", f"{ns}g/TestVertical")
    add("Spec_Person", "typeOf", "StatVarGroupSpec")
    add("Spec_Person", "populationType", "Person")
    add("Spec_Person", "observationProperties", "measuredProperty=count")
    add("Spec_Person", "vertical", f"{ns}g/TestVertical")
    add(f"{ns}g/TestVertical", "specializationOf", f"{ns}g/Root")
    add(f"{ns}g/TestCustomVertical", "specializationOf", f"{ns}g/Root", "TestCustomImport")
    add("Count_Student", "typeOf", "StatisticalVariable")
    add("Count_Student", "populationType", "Student")
    add("Count_Student_Female", "typeOf", "StatisticalVariable")
    add("Count_Student_Female", "populationType", "Student")
    add("Count_Student_Female", "constraintProperties", "gender")
    add("Count_Student_Female", "gender", "Female")
    add("Median_Age_Student", "typeOf", "StatisticalVariable", "TestCustomImport")
    add("Median_Age_Student", "populationType", "Student", "TestCustomImport")
    add("Median_Age_Student", "memberOf", f"{ns}g/TestCustomVertical", "TestCustomImport")
    add("Count_Person", "typeOf", "StatisticalVariable")
    add("Count_Person", "populationType", "Person")
    add("Count_Person", "measuredProperty", "count")
    add("Count_Thing", "typeOf", "StatisticalVariable")
    add("Count_Thing", "populationType", "Thing")
    add("Count_Thing", "measuredProperty", "count")
    return _edges(spark, e), spark.createDataFrame([], NV_SCHEMA)


def _dpv_mock(spark, ns):
    """_setup_dpv_mock_data (stat_var_group_generator_test.py:503-600)."""
    e = []
    add = lambda s, p, o, prov="TestImport": e.append((s, p, o, prov))  # noqa: E731
    add(f"{ns}g/Demographics", "specializationOf", f"{ns}g/Root")
    add(f"{ns}g/MilitaryService", "specializationOf", f"{ns}g/Root")
    nv = [
        ("svProp_measuredProperty_income", "measuredProperty=income"),
        ("dpv_age_Years15Onwards", "age=Years15Onwards"),
        ("dpv_age_Years20Onwards", "age=Years20Onwards"),
        ("dpv_incomeStatus_WithIncome", "incomeStatus=WithIncome"),
    ]
    add("Spec_DPV_Full", "typeOf", "StatVarGroupSpec")
    add("Spec_DPV_Full", "populationType", "Person")
    add("Spec_DPV_Full", "statVarProperties", "svProp_measuredProperty_income")
    add("Spec_DPV_Full", "dependentPropertyValue", "dpv_age_Years15Onwards")
    add("Spec_DPV_Full", "dependentPropertyValue", "dpv_incomeStatus_WithIncome")
    add("Spec_DPV_Full", "vertical", f"{ns}g/Demographics")
    add("Spec_DPV_Partial", "typeOf", "StatVarGroupSpec")
    add("Spec_DPV_Partial", "populationType", "Person")
    add("Spec_DPV_Partial", "statVarProperties", "svProp_measuredProperty_income")
    add("Spec_DPV_Partial", "constraintProperties", "age")
    add("Spec_DPV_Partial", "dependentPropertyValue", "dpv_incomeStatus_WithIncome")
    add("Spec_DPV_Military", "typeOf", "StatVarGroupSpec")
    add("Spec_DPV_Military", "populationType", "Person")
    add("Spec_DPV_Military", "statVarProperties", "svProp_measuredProperty_income")
    add("Spec_DPV_Military", "constraintProperties", "armedForcesStatus")
    add("Spec_DPV_Military", "constraintProperties", "veteranStatus")
    add("Spec_DPV_Military", "dependentPropertyValue", "dpv_age_Years15Onwards")
    add("Spec_DPV_Military", "dependentPropertyValue", "dpv_incomeStatus_WithIncome")
    add("Spec_DPV_Military", "vertical", f"{ns}g/MilitaryService")
    add("Spec_ArmedForces", "typeOf", "StatVarGroupSpec")
    add("Spec_ArmedForces", "populationType", "Person")
    add("Spec_ArmedForces", "statVarProperties", "svProp_measuredProperty_income")
    add("Spec_ArmedForces", "constraintProperties", "armedForcesStatus")
    add("Spec_ArmedForces", "vertical", f"{ns}g/MilitaryService")
    add("Spec_Veteran", "typeOf", "StatVarGroupSpec")
    add("Spec_Veteran", "populationType", "Person")
    add("Spec_Veteran", "statVarProperties", "svProp_measuredProperty_income")
    add("Spec_Veteran", "constraintProperties", "veteranStatus")
    add("Spec_Veteran", "vertical", f"{ns}g/MilitaryService")
    add("Median_Income_Person", "typeOf", "StatisticalVariable")
    add("Median_Income_Person", "populationType", "Person")
    add("Median_Income_Person", "measuredProperty", "income")
    add("Median_Income_Person", "constraintProperties", "age")
    add("Median_Income_Person", "constraintProperties", "incomeStatus")
    add("Median_Income_Person", "age", "Years15Onwards")
    add("Median_Income_Person", "incomeStatus", "WithIncome")
    add("Median_Income_Person_Over20", "typeOf", "StatisticalVariable")
    add("Median_Income_Person_Over20", "populationType", "Person")
    add("Median_Income_Person_Over20", "measuredProperty", "income")
    add("Median_Income_Person_Over20", "constraintProperties", "age")
    add("Median_Income_Person_Over20", "constraintProperties", "incomeStatus")
    add("Median_Income_Person_Over20", "age", "Years20Onwards")
    add("Median_Income_Person_Over20", "incomeStatus", "WithIncome")
    add("Count_Military_Person", "typeOf", "StatisticalVariable")
    add("Count_Military_Person", "populationType", "Person")
    add("Count_Military_Person", "measuredProperty", "income")
    add("Count_Military_Person", "constraintProperties", "armedForcesStatus")
    add("Count_Military_Person", "constraintProperties", "veteranStatus")
    add("Count_Military_Person", "constraintProperties", "age")
    add("Count_Military_Person", "constraintProperties", "incomeStatus")
    add("Count_Military_Person", "armedForcesStatus", "Active")
    add("Count_Military_Person", "veteranStatus", "Veteran")
    add("Count_Military_Person", "age", "Years15Onwards")
    add("Count_Military_Person", "incomeStatus", "WithIncome")
    return _edges(spark, e), spark.createDataFrame(nv, NV_SCHEMA)


def _result_sets(res):
    edges = {
        (r.subject_id, r.predicate, r.object_id, r.provenance)
        for r in res.edges.filter(
            F.col("predicate").isin("memberOf", "specializationOf", "linkedMemberOf")
        ).collect()
    }
    nodes = {
        r.subject_id
        for r in res.nodes.filter(
            F.array_contains("types", "StatVarGroup")
        ).collect()
    }
    return edges, nodes


@pytest.mark.parametrize("is_base_dc", [True, False])
def test_stat_var_group_generation(spark, is_base_dc):
    ns = "dc/" if is_base_dc else "c/"
    prov = ("dc/base/" if is_base_dc else "") + "generated/TestImport"
    prov_c = ("dc/base/" if is_base_dc else "") + "generated/TestCustomImport"
    edges_df, nv = _basic_mock(spark, ns)
    res = generate_spec_svgs(edges_df, nv, is_base_dc=is_base_dc)
    edges, nodes = _result_sets(res)

    assert f"{ns}g/Student" in nodes
    assert f"{ns}g/Student_Gender" in nodes
    assert f"{ns}g/Student_Gender-Female" in nodes

    assert ("Count_Student", "memberOf", f"{ns}g/Student", prov) in edges
    assert ("Count_Student", "linkedMemberOf", f"{ns}g/Student", prov) in edges
    assert ("Count_Student", "linkedMemberOf", f"{ns}g/TestVertical", prov) in edges
    assert ("Count_Student", "linkedMemberOf", f"{ns}g/Root", prov) in edges

    assert ("Count_Student_Female", "memberOf", f"{ns}g/Student_Gender-Female", prov) in edges
    for anc in [
        f"{ns}g/Student_Gender-Female", f"{ns}g/Student_Gender",
        f"{ns}g/Student", f"{ns}g/TestVertical", f"{ns}g/Root",
    ]:
        assert ("Count_Student_Female", "linkedMemberOf", anc, prov) in edges

    if is_base_dc:
        assert ("Count_Person", "memberOf", f"{ns}g/TestVertical", prov) in edges
    else:
        assert ("Count_Person", "memberOf", f"{ns}g/Person", prov) in edges
    assert ("Count_Person", "linkedMemberOf", f"{ns}g/TestVertical", prov) in edges
    assert ("Count_Person", "linkedMemberOf", f"{ns}g/Root", prov) in edges

    if is_base_dc:
        assert ("Count_Thing", "memberOf", f"{ns}g/Uncategorized_Variables", prov) in edges
        assert ("Count_Thing", "linkedMemberOf", f"{ns}g/Uncategorized_Variables", prov) in edges
        assert ("Count_Thing", "linkedMemberOf", f"{ns}g/Uncategorized", prov) in edges
        assert ("Count_Thing", "linkedMemberOf", f"{ns}g/Root", prov) in edges
    else:
        assert ("Count_Thing", "memberOf", f"{ns}g/Thing", prov) in edges
        assert ("Count_Thing", "linkedMemberOf", f"{ns}g/Thing", prov) in edges

    assert (f"{ns}g/Student_Gender-Female", "specializationOf", f"{ns}g/Student_Gender", prov) in edges
    assert (f"{ns}g/Student_Gender", "specializationOf", f"{ns}g/Student", prov) in edges
    assert (f"{ns}g/Student", "specializationOf", f"{ns}g/TestVertical", prov) in edges

    assert ("Median_Age_Student", "linkedMemberOf", f"{ns}g/TestCustomVertical", prov_c) in edges
    assert ("Median_Age_Student", "linkedMemberOf", f"{ns}g/Root", prov_c) in edges


@pytest.mark.parametrize("is_base_dc", [True, False])
def test_pruning_single_child_svgs(spark, is_base_dc):
    ns = "dc/" if is_base_dc else "c/"
    prov = ("dc/base/" if is_base_dc else "") + "generated/TestImport"
    edges_df, nv = _basic_mock(spark, ns)
    res = generate_spec_svgs(
        edges_df, nv, is_base_dc=is_base_dc, should_prune_single_child_svgs=True
    )
    edges, nodes = _result_sets(res)

    assert f"{ns}g/Student" in nodes
    assert f"{ns}g/Student_Gender" not in nodes
    assert f"{ns}g/Student_Gender-Female" not in nodes

    assert ("Count_Student_Female", "memberOf", f"{ns}g/Student", prov) in edges
    assert ("Count_Student_Female", "linkedMemberOf", f"{ns}g/Student", prov) in edges
    assert ("Count_Student_Female", "linkedMemberOf", f"{ns}g/TestVertical", prov) in edges
    assert ("Count_Student_Female", "linkedMemberOf", f"{ns}g/Root", prov) in edges
    assert ("Count_Student_Female", "memberOf", f"{ns}g/Student_Gender-Female", prov) not in edges
    assert ("Count_Student_Female", "linkedMemberOf", f"{ns}g/Student_Gender-Female", prov) not in edges
    assert ("Count_Student_Female", "linkedMemberOf", f"{ns}g/Student_Gender", prov) not in edges
    assert (f"{ns}g/Student_Gender", "specializationOf", f"{ns}g/Student", prov) not in edges
    assert (f"{ns}g/Student_Gender-Female", "specializationOf", f"{ns}g/Student_Gender", prov) not in edges

    assert ("Count_Student", "memberOf", f"{ns}g/Student", prov) in edges
    assert ("Count_Student", "linkedMemberOf", f"{ns}g/Student", prov) in edges
    assert ("Count_Student", "linkedMemberOf", f"{ns}g/TestVertical", prov) in edges
    assert ("Count_Student", "linkedMemberOf", f"{ns}g/Root", prov) in edges

    if is_base_dc:
        assert ("Count_Person", "memberOf", f"{ns}g/TestVertical", prov) in edges
        assert ("Count_Thing", "memberOf", f"{ns}g/Uncategorized_Variables", prov) in edges


@pytest.mark.parametrize("is_base_dc", [True, False])
def test_dpv_matching(spark, is_base_dc):
    ns = "dc/" if is_base_dc else "c/"
    prov = ("dc/base/" if is_base_dc else "") + "generated/TestImport"
    edges_df, nv = _dpv_mock(spark, ns)
    res = generate_spec_svgs(edges_df, nv, is_base_dc=is_base_dc)
    edges, _ = _result_sets(res)

    # SV 1: both DPVs stripped -> 0 cprops -> Demographics
    if is_base_dc:
        assert ("Median_Income_Person", "memberOf", f"{ns}g/Demographics", prov) in edges
    else:
        assert ("Median_Income_Person", "memberOf", f"{ns}g/Person", prov) in edges
    assert ("Median_Income_Person", "linkedMemberOf", f"{ns}g/Demographics", prov) in edges
    assert ("Median_Income_Person", "linkedMemberOf", f"{ns}g/Root", prov) in edges
    assert ("Median_Income_Person", "linkedMemberOf", f"{ns}g/Person_Age-Years15Onwards", prov) not in edges
    assert ("Median_Income_Person", "linkedMemberOf", f"{ns}g/Person_IncomeStatus-WithIncome", prov) not in edges

    # SV 2: value mismatch -> partial spec -> age remains
    if is_base_dc:
        assert ("Median_Income_Person_Over20", "memberOf", f"{ns}g/Demographics", prov) not in edges
        assert ("Median_Income_Person_Over20", "linkedMemberOf", f"{ns}g/Demographics", prov) not in edges
    assert ("Median_Income_Person_Over20", "linkedMemberOf", f"{ns}g/Person_Age-Years20Onwards", prov) in edges

    # SV 3: military spec -> DPVs stripped -> armed/veteran remain
    if is_base_dc:
        assert (f"{ns}g/Person_ArmedForcesStatus", "specializationOf", f"{ns}g/MilitaryService", prov) in edges
        assert (f"{ns}g/Person_VeteranStatus", "specializationOf", f"{ns}g/MilitaryService", prov) in edges
        assert ("Count_Military_Person", "linkedMemberOf", f"{ns}g/MilitaryService", prov) in edges
        assert ("Count_Military_Person", "linkedMemberOf", f"{ns}g/Demographics", prov) not in edges
    else:
        assert (f"{ns}g/Person_ArmedForcesStatus", "specializationOf", f"{ns}g/Person", prov) in edges
        assert (f"{ns}g/Person_VeteranStatus", "specializationOf", f"{ns}g/Person", prov) in edges
        assert ("Count_Military_Person", "linkedMemberOf", f"{ns}g/Person", prov) in edges
    assert ("Count_Military_Person", "linkedMemberOf", f"{ns}g/Root", prov) in edges
    assert ("Count_Military_Person", "linkedMemberOf", f"{ns}g/Person_Age-Years15Onwards", prov) not in edges
    assert ("Count_Military_Person", "linkedMemberOf", f"{ns}g/Person_IncomeStatus-WithIncome", prov) not in edges


@pytest.mark.parametrize("is_base_dc", [True, False])
def test_pruning_dag_fanout(spark, is_base_dc):
    ns = "dc/" if is_base_dc else "c/"
    prov = ("dc/base/" if is_base_dc else "") + "generated/TestImport"
    edges_df, nv = _dpv_mock(spark, ns)
    res = generate_spec_svgs(
        edges_df, nv, is_base_dc=is_base_dc, should_prune_single_child_svgs=True
    )
    edges, nodes = _result_sets(res)

    assert f"{ns}g/Person_ArmedForcesStatus" not in nodes
    assert f"{ns}g/Person_VeteranStatus" not in nodes
    assert f"{ns}g/Person_ArmedForcesStatus_VeteranStatus" not in nodes

    military_member = [
        e for e in edges if e[0] == "Count_Military_Person" and e[1] == "memberOf"
    ]
    if is_base_dc:
        assert len(military_member) == 1, military_member
        assert ("Count_Military_Person", "memberOf", f"{ns}g/MilitaryService", prov) in edges
        assert ("Count_Military_Person", "linkedMemberOf", f"{ns}g/MilitaryService", prov) in edges
    else:
        assert ("Count_Military_Person", "memberOf", f"{ns}g/Person", prov) in edges
        assert ("Count_Military_Person", "linkedMemberOf", f"{ns}g/Person", prov) in edges
    assert ("Count_Military_Person", "linkedMemberOf", f"{ns}g/Root", prov) in edges

    for gone in [
        ("Count_Military_Person", "memberOf", f"{ns}g/Person_ArmedForcesStatus_VeteranStatus", prov),
        ("Count_Military_Person", "linkedMemberOf", f"{ns}g/Person_ArmedForcesStatus_VeteranStatus", prov),
        ("Count_Military_Person", "linkedMemberOf", f"{ns}g/Person_ArmedForcesStatus", prov),
        ("Count_Military_Person", "linkedMemberOf", f"{ns}g/Person_VeteranStatus", prov),
        (f"{ns}g/Person_ArmedForcesStatus_VeteranStatus", "specializationOf", f"{ns}g/Person_ArmedForcesStatus", prov),
        (f"{ns}g/Person_ArmedForcesStatus_VeteranStatus", "specializationOf", f"{ns}g/Person_VeteranStatus", prov),
        (f"{ns}g/Person_ArmedForcesStatus", "specializationOf", f"{ns}g/MilitaryService", prov),
        (f"{ns}g/Person_VeteranStatus", "specializationOf", f"{ns}g/MilitaryService", prov),
    ]:
        assert gone not in edges

    # Median_Income_Person unaffected
    if is_base_dc:
        assert ("Median_Income_Person", "memberOf", f"{ns}g/Demographics", prov) in edges
    else:
        assert ("Median_Income_Person", "memberOf", f"{ns}g/Person", prov) in edges
    assert ("Median_Income_Person", "linkedMemberOf", f"{ns}g/Demographics", prov) in edges
    assert ("Median_Income_Person", "linkedMemberOf", f"{ns}g/Root", prov) in edges

    # Over20: chain pruned; exactly one redirected memberOf in base DC
    over20_member = [
        e for e in edges if e[0] == "Median_Income_Person_Over20" and e[1] == "memberOf"
    ]
    if is_base_dc:
        assert len(over20_member) == 1, over20_member
    else:
        assert ("Median_Income_Person_Over20", "memberOf", f"{ns}g/Person", prov) in edges


@pytest.mark.parametrize("is_base_dc", [True, False])
def test_pruning_no_ghost_edges(spark, is_base_dc):
    ns = "dc/" if is_base_dc else "c/"
    edges_df, nv = _dpv_mock(spark, ns)
    res = generate_spec_svgs(
        edges_df, nv, is_base_dc=is_base_dc, should_prune_single_child_svgs=True
    )
    edges, nodes = _result_sets(res)
    pruned_candidates = [
        f"{ns}g/Person_ArmedForcesStatus",
        f"{ns}g/Person_VeteranStatus",
        f"{ns}g/Person_ArmedForcesStatus_VeteranStatus",
        f"{ns}g/Person_Age",
        f"{ns}g/Person_Age-Years20Onwards",
    ]
    for svg_id in pruned_candidates:
        assert svg_id not in nodes
        ghosts = [e for e in edges if e[2] == svg_id]
        assert ghosts == [], f"ghost edges to pruned {svg_id}: {ghosts}"
