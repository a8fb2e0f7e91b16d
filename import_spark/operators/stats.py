"""StatChecker re-expression: series sanity checks as window/group aggs.

The reference walks every (place, statvar) series and accumulates
counters (StatChecker.java); here each check is one declarative
DataFrame transform over the long-form observations table
``(entity, variable, date, value, ...)`` (schema per
simple/stats/db.py:100-113), returning the flagged rows — Catalyst
fuses the shared window/shuffle across checks when composed.

- A5 series_stats          mean/stddev per series     (StatChecker.java:443-463)
- A6 sigma_outliers        |v-μ| > 3σ                 (:414-436)
- A7 fluctuations          successive-delta buckets   (:467-512)
- A8 date_granularity      mixed date-string lengths / month holes (:518-592)
- A9 value_inconsistency   same date, different values (:357-412)
- A10 is q_a10 (queries.py); invalid dates via P6
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SERIES_KEY = ["entity", "variable"]


def series_stats(obs: DataFrame, series_key: list[str] | None = None) -> DataFrame:
    return obs.groupBy(*(series_key or SERIES_KEY)).agg(
        F.count("*").alias("n_obs"),
        F.avg("value").alias("mean_value"),
        F.stddev_pop("value").alias("std_value"),
    )


def sigma_outliers(
    obs: DataFrame, n_sigma: float = 3.0, series_key: list[str] | None = None
) -> DataFrame:
    """Flag points > n_sigma from the series mean (broadcast the stats).
    ``series_key`` defaults to (entity, variable); pass the full facet
    key (entity, variable, measurementMethod, observationPeriod,
    scalingFactor, unit) for reference StatChecker parity
    (StatChecker.java:55-63 keys series by all facet props)."""
    key = series_key or SERIES_KEY
    stats = series_stats(obs, key).select(
        *key, F.col("mean_value").alias("_m"), F.col("std_value").alias("_s")
    )
    return (
        obs.join(stats, key)
        .filter((F.col("_s") > 0) & (F.abs(F.col("value") - F.col("_m")) > n_sigma * F.col("_s")))
        .drop("_m", "_s")
        .withColumn("check", F.lit("StatsCheck_3SigmaOutlier"))
    )


def fluctuations(
    obs: DataFrame,
    big: float = 1.0,
    huge: float = 5.0,
    series_key: list[str] | None = None,
) -> DataFrame:
    """Successive-point percent change buckets (>100%, >500%)."""
    key = series_key or SERIES_KEY
    w = Window.partitionBy(*key).orderBy("date")
    d = obs.withColumn("_prev", F.lag("value").over(w)).filter(
        F.col("_prev").isNotNull() & (F.abs(F.col("_prev")) > 1e-9)
    )
    delta = F.abs(F.col("value") - F.col("_prev")) / F.abs(F.col("_prev"))
    return (
        d.withColumn(
            "check",
            F.when(delta > huge, F.lit("StatsCheck_MaxPercentFluctuationGreaterThan500"))
            .when(delta > big, F.lit("StatsCheck_MaxPercentFluctuationGreaterThan100"))
            .otherwise(F.lit(None)),
        )
        .filter(F.col("check").isNotNull())
        .drop("_prev")
    )


def max_fluctuation_per_series(
    obs: DataFrame,
    big: float = 1.0,
    huge: float = 5.0,
    series_key: list[str] | None = None,
    small_number: float = 1e-6,
) -> DataFrame:
    """StatChecker.checkPercentFluctuations (StatChecker.java:467-512):
    ONE counter per series, from the maximum |signed delta| between
    successive date points, bucketed >500% then >100%; a zero base
    divides by SMALL_NUMBER; a series containing any date with more
    than one distinct value is EXCLUDED entirely (the reference's
    sawtooth guard returns before comparing)."""
    key = series_key or SERIES_KEY
    # One exchange serves the whole cascade: hash-partition by the
    # series key once, then every step — the per-(key, date) distinct
    # count, the per-series sawtooth flag, the per-date dedup pick, the
    # lag window and the final per-series max — is satisfied by that
    # partitioning (ClusteredDistribution(key, date) accepts
    # HashPartitioning(key)), needing only within-partition sorts. The
    # previous shape (distinct-aggregate + dropDuplicates + window)
    # shuffled the full observation table three times.
    w_kd = Window.partitionBy(*key, "date")
    w_k = Window.partitionBy(*key)
    w = Window.partitionBy(*key).orderBy("date")
    d = (
        obs.repartition(*key)
        .withColumn("_nv", F.size(F.collect_set("value").over(w_kd)))
        # sawtooth guard (series excluded if ANY date has >1 distinct
        # value); surviving (key, date) groups are single-valued, so
        # the row_number pick is value-deterministic
        .withColumn("_st", F.max((F.col("_nv") > 1).cast("int")).over(w_k))
        .withColumn("_rn", F.row_number().over(w_kd.orderBy("value")))
        .filter((F.col("_st") == 0) & (F.col("_rn") == 1))
        .withColumn("_prev", F.lag("value").over(w))
        .filter(F.col("_prev").isNotNull())
    )
    delta = F.when(
        F.col("_prev") == 0, F.col("value") / F.lit(small_number)
    ).otherwise((F.col("value") - F.col("_prev")) / F.abs(F.col("_prev")))
    return (
        d.withColumn("_delta", F.abs(delta))
        .groupBy(*key)
        .agg(F.max("_delta").alias("_max_delta"))
        .withColumn(
            "check",
            F.when(F.col("_max_delta") > huge, F.lit("StatsCheck_MaxPercentFluctuationGreaterThan500"))
            .when(F.col("_max_delta") > big, F.lit("StatsCheck_MaxPercentFluctuationGreaterThan100")),
        )
        .filter(F.col("check").isNotNull())
        .select(*key, "check")
    )


def date_granularity_issues(
    obs: DataFrame, series_key: list[str] | None = None
) -> DataFrame:
    """Series with mixed date-string granularities (distinct lengths) or
    inconsistent month deltas between successive dates (holes)."""
    key = series_key or SERIES_KEY
    mixed = (
        obs.groupBy(*key)
        .agg(F.countDistinct(F.length("date")).alias("n_granularities"))
        .filter(F.col("n_granularities") > 1)
        .withColumn("check", F.lit("StatsCheck_Inconsistent_Date_Granularity"))
    )
    # try_cast, not to_date: ANSI-mode to_date throws on a malformed
    # date string; an invalid date must simply not contribute a delta
    # (the reference only ever feeds checker-validated dates here)
    deltas = (
        obs.select(*key, F.when(F.length("date") == 4, F.concat(F.col("date"), F.lit("-01-01"))).when(F.length("date") == 7, F.concat(F.col("date"), F.lit("-01"))).otherwise(F.col("date")).try_cast("date").alias("_d"), "date")
        .withColumn("_prev", F.lag("_d").over(Window.partitionBy(*key).orderBy("_d")))
        .filter(F.col("_prev").isNotNull())
        .withColumn("_months", F.round(F.months_between("_d", "_prev"), 0))
    )
    holes = (
        deltas.groupBy(*key)
        .agg(F.countDistinct("_months").alias("n_deltas"))
        .filter(F.col("n_deltas") > 1)
        .withColumn("check", F.lit("StatsCheck_Data_Holes"))
    )
    return mixed.select(*key, "check").unionByName(holes.select(*key, "check"))


def value_inconsistencies(obs: DataFrame, series_key: list[str] | None = None) -> DataFrame:
    """Same (series, date) with conflicting values (StatChecker.java:596-633)."""
    return (
        obs.groupBy(*(series_key or SERIES_KEY), "date")
        .agg(F.countDistinct("value").alias("n_values"))
        .filter(F.col("n_values") > 1)
        .withColumn("check", F.lit("StatsCheck_Inconsistent_Values"))
    )


def run_all_checks(obs: DataFrame) -> DataFrame:
    """All checks → one counters table (check, n) — the report.json
    counter rollup (LogWrapper.java:50-68)."""
    parts = [
        sigma_outliers(obs).select("check"),
        fluctuations(obs).select("check"),
        date_granularity_issues(obs).select("check"),
        value_inconsistencies(obs).select("check"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("check").agg(F.count("*").alias("n"))
