"""Single-child SVG pruning parity (pipeline stat_var_group_generator
pruning pass, stat_var_group_generator.py:730-870)."""

from __future__ import annotations

from import_spark.operators.svg_hierarchy import prune_single_child_svgs

EDGE_SCHEMA = "subject_id string, predicate string, object_id string, provenance string"


def _prune(spark, edges, generated):
    e = spark.createDataFrame(edges, EDGE_SCHEMA)
    g = spark.createDataFrame([(x,) for x in generated], "svg_id string")
    out, pruned = prune_single_child_svgs(e, g)
    return (
        {(r["subject_id"], r["predicate"], r["object_id"]) for r in out.collect()},
        {r["svg_id"] for r in pruned.collect()},
    )


def test_single_child_chain_cascades(spark):
    # root <- g1 <- g2 <- {sv1, sv2}: g1 has one child (g2) -> pruned,
    # g2 keeps two children -> survives and rewires to root
    edges = [
        ("g1", "specializationOf", "root", "p"),
        ("g2", "specializationOf", "g1", "p"),
        ("sv1", "memberOf", "g2", "p"),
        ("sv2", "memberOf", "g2", "p"),
    ]
    out, pruned = _prune(spark, edges, ["g1", "g2"])
    assert pruned == {"g1"}
    assert out == {
        ("g2", "specializationOf", "root"),
        ("sv1", "memberOf", "g2"),
        ("sv2", "memberOf", "g2"),
    }


def test_deep_chain_rewires_to_nearest_survivor(spark):
    # root <- a <- b <- c <- sv1 : c has one child -> prunable; then b,
    # then a — the SV lands directly under root via memberOf
    edges = [
        ("a", "specializationOf", "root", "p"),
        ("b", "specializationOf", "a", "p"),
        ("c", "specializationOf", "b", "p"),
        ("sv1", "memberOf", "c", "p"),
    ]
    out, pruned = _prune(spark, edges, ["a", "b", "c"])
    assert pruned == {"a", "b", "c"}
    assert out == {("sv1", "memberOf", "root")}


def test_empty_group_pruned_and_linked_member_of_dropped(spark):
    edges = [
        ("empty", "specializationOf", "root", "p"),
        ("g", "specializationOf", "root", "p"),
        ("sv1", "memberOf", "g", "p"),
        ("sv2", "memberOf", "g", "p"),
        ("sv9", "linkedMemberOf", "empty", "p"),
    ]
    out, pruned = _prune(spark, edges, ["empty", "g"])
    assert pruned == {"empty"}
    # linkedMemberOf into the pruned SVG is dropped, no replacement
    assert out == {
        ("g", "specializationOf", "root"),
        ("sv1", "memberOf", "g"),
        ("sv2", "memberOf", "g"),
    }


def test_existing_edge_to_effective_parent_not_duplicated(spark):
    # sv1 is a member of both g1 (prunable, child-count 1 via DISTINCT)
    # and root's surviving group g2; g1's rewire target g2... use:
    # g1 -> g2 chain where sv1 already has the redirected edge
    edges = [
        ("g1", "specializationOf", "g2", "p"),
        ("sv1", "memberOf", "g1", "p"),
        ("sv1", "memberOf", "g2", "p"),
        ("sv2", "memberOf", "g2", "p"),
    ]
    out, pruned = _prune(spark, edges, ["g1", "g2"])
    assert pruned == {"g1"}
    assert out == {("sv1", "memberOf", "g2"), ("sv2", "memberOf", "g2")}


def test_dag_all_paths_rewired(spark):
    # diamond: sv1 under p1 and p2 (both prunable chains) leading to
    # distinct survivors r1, r2 -> redirected to BOTH
    edges = [
        ("p1", "specializationOf", "r1", "p"),
        ("p2", "specializationOf", "r2", "p"),
        ("sv1", "memberOf", "p1", "p"),
        ("sv1", "memberOf", "p2", "p"),
        ("svA", "memberOf", "r1", "p"),
        ("svB", "memberOf", "r1", "p"),
        ("svC", "memberOf", "r2", "p"),
        ("svD", "memberOf", "r2", "p"),
    ]
    out, pruned = _prune(spark, edges, ["p1", "p2"])
    assert pruned == {"p1", "p2"}
    assert ("sv1", "memberOf", "r1") in out
    assert ("sv1", "memberOf", "r2") in out


def test_non_generated_never_pruned(spark):
    edges = [
        ("g1", "specializationOf", "root", "p"),
        ("sv1", "memberOf", "g1", "p"),
    ]
    # root has one child but is not generated; g1 has one child and IS
    out, pruned = _prune(spark, edges, ["g1"])
    assert pruned == {"g1"}
    assert out == {("sv1", "memberOf", "root")}
