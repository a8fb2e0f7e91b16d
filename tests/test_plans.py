"""Physical-plan assertions: the plans we ship are the plans we want.

These guard the scale posture (broadcast joins stay broadcast, the
Python boundary stays column-pruned, dedupe stays single-shuffle,
filters reach the parquet scan) against silent plan regressions.
"""

import datetime

import pytest

from pyspark.sql import functions as F

from import_spark.operators.extract import extract_statements
from import_spark.operators.link import link_statements
from import_spark.sources.transcripts import TRANSCRIPT_SCHEMA, dcid_dictionary


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def turns(spark):
    rows = [("c1", 0, "user", "we looked at iso:US", "", datetime.datetime(2025, 1, 1))]
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def test_link_uses_broadcast_join(spark, turns):
    linked = link_statements(extract_statements(turns), dcid_dictionary(spark))
    plan = _plan(linked)
    assert "BroadcastHashJoin" in plan
    # the statement (streamed) side — between the join and the broadcast
    # build side — must have no shuffle; the dictionary side may shuffle
    # its own (tiny) dedupe aggregation
    streamed = plan.split("BroadcastHashJoin", 1)[1].split("BroadcastExchange", 1)[0]
    assert "MapInPandas" in streamed
    assert "Exchange hashpartitioning" not in streamed


def test_extract_prunes_ts_from_python_boundary(spark, turns):
    ex = extract_statements(turns)
    plan = ex._jdf.queryExecution().analyzed().toString()
    # ts must not cross into the Python stage (Arrow bytes + overflow hazard)
    import re

    mapinpandas = [l for l in plan.split("\n") if "mapInPandas" in l.lower() or "MapInPandas" in l]
    assert mapinpandas and all("ts" not in l.split("#")[0] for l in mapinpandas)


def test_parquet_filter_pushdown(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(1000).selectExpr("id", "cast(id % 7 as string) k").write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("k") == "3").select("id")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,3)]" in plan
    assert "ReadSchema" in plan and "struct<id:bigint,k:string>" in plan


def test_serving_query_pushes_down(spark):
    from import_spark.queries import q_serving_stat_series

    plan = _plan(q_serving_stat_series(spark, "/root/testdata/sf0.001"))
    assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters")[1][:200]


def test_cosine_topk_no_corpus_shuffle_before_topk(spark):
    from import_spark.operators.similarity import cosine_topk_bruteforce

    corpus = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    q = spark.createDataFrame([(9, [1.0, 0.0])], ["query_id", "embedding"])
    plan = _plan(cosine_topk_bruteforce(corpus, q, k=3))
    # queries broadcast; the only hash exchange is the final per-query window
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_max_fluctuation_single_exchange(spark):
    """The fluctuation cascade (distinct-count, sawtooth flag, per-date
    pick, lag, per-series max) runs on ONE hash exchange of the
    observation table — ClusteredDistribution(key, date) accepts
    HashPartitioning(key), so every window/aggregate after the explicit
    repartition is a within-partition sort, never a reshuffle."""
    from import_spark.operators.stats import max_fluctuation_per_series

    obs = spark.createDataFrame(
        [("p1", "v1", "2024-01", 1.0), ("p1", "v1", "2024-02", 99.0)],
        "entity string, variable string, date string, value double",
    )
    plan = _plan(
        max_fluctuation_per_series(obs, series_key=["entity", "variable"])
    )
    assert plan.count("Exchange hashpartitioning") == 1
