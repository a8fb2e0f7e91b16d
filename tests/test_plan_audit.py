"""Physical-plan hygiene regressions: the properties that make the
headline operators scale must be visible in the plan, not just
asserted in docstrings — broadcast joins where a dimension is small,
zero exchanges for per-row ops, column-pruned scans, no cartesian
products. A regression that flips one of these (a broadcast falling
back to sort-merge, a projection acquiring a shuffle) changes no
answers at sf0.001 but kills the 100-TB posture."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df):
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_pii_scan_no_shuffle(spark):
    from import_spark.queries import QUERIES

    p = _plan(QUERIES["pii_scan"](spark, SF))
    # pure per-row projection: no KEY shuffle anywhere. The only
    # Exchange allowed is the widen_narrow_input round-robin that
    # spreads a 1-2-partition scan over the cluster (guide §2.5 input
    # skew) — a wide input gets none.
    assert "hashpartitioning" not in p and "rangepartitioning" not in p, p
    assert p.count("- Exchange") <= 1  # at most the widening round-robin
    assert "doc_id" in p and "text" in p


def test_decontaminate_broadcasts_benchmark(spark):
    from import_spark.queries import QUERIES

    p = _plan(QUERIES["decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # scan pruned to the two columns the operator touches
    assert "struct<doc_id:bigint,text:string>" in p


def test_link_broadcast_join(spark):
    from import_spark.queries import QUERIES

    p = _plan(QUERIES["j1_broadcast_link"](spark, SF))
    assert "BroadcastHashJoin" in p


def test_exact_dedup_partial_aggregation(spark):
    from import_spark.queries import QUERIES

    p = _plan(QUERIES["dedup_exact"](spark, SF))
    # map-side partial + final aggregate around ONE exchange
    assert p.count("HashAggregate") >= 2
    assert p.count("Exchange") <= 2


def test_token_stats_no_shuffle(spark):
    from import_spark.queries import QUERIES

    p = _plan(QUERIES["text_token_stats"](spark, SF))
    # no KEY shuffle; only the widen_narrow_input round-robin is allowed
    assert "hashpartitioning" not in p and "rangepartitioning" not in p, p
    assert p.count("- Exchange") <= 1


def test_no_cartesian_products(spark):
    """No headline plan may contain a CartesianProduct; the one
    intentional cross join (similarity's broadcast query set) must be
    a BroadcastNestedLoopJoin, never a shuffled cartesian."""
    from import_spark.queries import QUERIES

    for name in [
        "pii_scan", "decontaminate", "j1_broadcast_link", "dedup_exact",
        "text_quality", "text_fingerprint", "a1_dedupe", "a4_event_counts",
        "sim_cosine_topk",
    ]:
        p = _plan(QUERIES[name](spark, SF))
        assert "CartesianProduct" not in p, name
