"""Skew-aware shuffle join — the explicit hot-key salting path for
joins whose dimension side exceeds the broadcast byte budget.

The broadcast link join (operators/link.py) has no key-partitioned
reduce, so a hot entity costs nothing there. When the dictionary
outgrows the broadcast budget (a full Recon id map at 10^12-turn scale
is tens of GB), the join must shuffle on the key — and a hot entity
(the one place id half the corpus mentions) lands its entire row set in
ONE reduce task. The reference hand-salts its hottest Spanner shards
for exactly this reason (SpannerClient.java:305-316: random shard
suffix on high-traffic keys).

Relationship to AQE: OptimizeSkewedJoin (left ON in session.py) splits
oversized stream-side partitions of sort-merge joins at runtime and is
the safety net for skew nobody predicted. The explicit operator here
gives deterministic bounds that do not depend on runtime statistics or
on which join strategy Catalyst picks: a hot key's rows spread over
``n_salts`` reduce tasks BY CONSTRUCTION, and only HOT dimension keys
are replicated — cold rows keep salt 0 and meet the single
un-replicated dimension copy, so the replication cost is
``n_salts x |hot dim rows|`` (a few rows however large the corpus).

The join result is salt-assignment-independent and equals the unsalted
join (gated by tests/test_operators.py equality tests and the
``j1_salted_link`` driver oracle, which hash-checks the salted plan
against the same DuckDB SQL as the broadcast J1 row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Census cap: a hot-key set is small by definition (each key above the
# threshold owns >= min_count rows of the input). Blowing the cap means
# the threshold is mis-set for the data, not that the census should
# silently truncate.
MAX_HOT_KEYS = 10_000


def hot_join_keys(
    df: DataFrame,
    keys: list[str],
    min_count: int,
    max_keys: int = MAX_HOT_KEYS,
) -> list[tuple]:
    """Exact hot-key census over ``df``: every distinct ``keys`` tuple
    carrying at least ``min_count`` rows.

    One map-side-combined hash aggregate — the shuffle moves one row
    per distinct key per map partition, dimension-sized even at
    10^12 input rows. NULL key tuples are counted too: in a shuffle
    join every null-keyed row hashes to the SAME reduce partition, so
    an all-null mention column is itself a hot key worth salting (it
    never matches, but it must still be shuffled somewhere).
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    rows = counts.filter(F.col("_n") >= min_count).limit(max_keys + 1).collect()
    if len(rows) > max_keys:
        raise ValueError(
            f"hot-key census exceeded {max_keys} keys at min_count={min_count}; "
            "raise min_count (a 'hot' set this large is ordinary cardinality)"
        )
    return [tuple(r[k] for k in keys) for r in rows]


def _hot_df(spark, keys: list[str], key_fields: list[T.StructField], hot: list[tuple]):
    schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in key_fields]
    )
    return spark.createDataFrame(list(hot), schema=schema).withColumn(
        "_hot", F.lit(True)
    )


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "left",
    n_salts: int = 16,
    hot: list[tuple] | None = None,
    hot_min_count: int = 1_000_000,
    salt_on: Column | None = None,
) -> DataFrame:
    """Shuffle ``big`` ⋈ ``dim`` on ``keys`` with hot keys salted over
    ``n_salts`` reduce tasks.

    ``hot``: the hot key tuples (from :func:`hot_join_keys`), or None
    to run the census at ``hot_min_count`` (default 1M — at the target
    scale a key under a million rows fits any reduce task). An empty
    hot set degrades to the plain shuffle join, so the operator is safe
    to leave on unconditionally.

    ``salt_on``: expression whose hash spreads a hot key's big-side
    rows across salts. Defaults to ``xxhash64`` of every big column —
    deterministic on row content (task retries reproduce the same
    assignment), with the caveat that byte-identical duplicate rows
    stay on one salt; pass a row-unique column when the input carries
    heavy full-row duplication.

    Supports ``inner`` and ``left`` (dim-side multiplicity preserved:
    a big row meets the full dim row set of its key at its salt).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if hot is None:
        hot = hot_join_keys(big, keys, hot_min_count)
    # dedupe caller-supplied hot sets: _tag_hot's left join against a
    # DUPLICATED hot tuple would replicate every tagged row once per
    # copy (the census path can't produce dupes; a hand-built list can
    # — found by the hypothesis property on hot=[(None,), (None,)])
    hot = list(dict.fromkeys(tuple(h) for h in hot))
    if not hot:
        return big.join(dim, keys, how)

    key_fields = [big.schema[k] for k in keys]
    hot_df = _hot_df(big.sparkSession, keys, key_fields, hot)

    if salt_on is None:
        salt_on = F.xxhash64(*[F.col(c) for c in big.columns])
    big_salted = _tag_hot(big, hot_df, keys).withColumn(
        "_salt",
        F.when(F.col("_hot"), F.pmod(salt_on, F.lit(n_salts)))
        .otherwise(F.lit(0))
        .cast("int"),
    ).drop("_hot")
    # Hot dim keys fan out to every salt; cold dim rows stay single.
    dim_salted = (
        _tag_hot(dim, hot_df, keys)
        .withColumn(
            "_salts",
            F.when(
                F.col("_hot"), F.sequence(F.lit(0), F.lit(n_salts - 1))
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt", F.explode("_salts"))
        .drop("_hot", "_salts")
    )
    return big_salted.join(dim_salted, keys + ["_salt"], how).drop("_salt")


def _tag_hot(df: DataFrame, hot_df: DataFrame, keys: list[str]) -> DataFrame:
    """``df`` + a ``_hot`` flag via a broadcast join against the hot-key
    set. Null-SAFE key equality: a null key tuple can itself be hot
    (every null-keyed row of a shuffle join hashes to the same reduce
    partition — it never MATCHES, but it must still land somewhere),
    and standard equality could never tag it."""
    d = df.alias("_skew_l")
    h = F.broadcast(hot_df.alias("_skew_r"))
    cond = None
    for k in keys:
        c = F.col(f"_skew_l.{k}").eqNullSafe(F.col(f"_skew_r.{k}"))
        cond = c if cond is None else (cond & c)
    return d.join(h, cond, "left").select("_skew_l.*", F.col("_hot"))


def widen_narrow_input(df: DataFrame, factor: int = 1) -> DataFrame:
    """Spread a NARROW scan over the cluster before per-row-expensive work.

    Small/unsplittable inputs (a single-row-group parquet file, a gzip
    text file) scan as 1-2 partitions, serializing everything downstream
    of the scan on as many tasks (guide §2.5 "input skew": repartition
    immediately after the read). Round-robin repartition up to
    ``factor x defaultParallelism`` when the input has fewer partitions;
    a wide input (the 100-TB case — thousands of splits) passes through
    untouched, so the extra exchange exists exactly when it is cheap and
    needed."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
