"""Differ: current vs previous dataset → ADDED / DELETED / MODIFIED rows.

Re-expresses the reference's Beam differ (J5, DifferUtils.java:97-140):
full-outer join on the combined series key, value comparison, diff-type
classification; output schema matches DifferPipeline.java:18-19
(``key_combined, value_combined_current, value_combined_previous,
diff_type``). The key is the 7-prop concat of DifferUtils.java:38-46.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIFF_KEY_PROPS = [
    "variable",
    "entity",
    "date",
    "observation_period",
    "measurement_method",
    "unit",
    "scaling_factor",
]


def _combined_key(df: DataFrame, cols: list[str]):
    # all 7 key props always participate; absent columns contribute ''
    # (fixed-width key format of DifferUtils.java:38-46)
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("")) if c in df.columns else F.lit("")
        for c in cols
    ]
    return F.concat_ws(";", *parts)


def diff_observations(
    current: DataFrame, previous: DataFrame, value_col: str = "value"
) -> DataFrame:
    cur = current.select(
        _combined_key(current, DIFF_KEY_PROPS).alias("key_combined"),
        F.col(value_col).cast("string").alias("value_combined_current"),
    )
    prev = previous.select(
        _combined_key(previous, DIFF_KEY_PROPS).alias("key_combined"),
        F.col(value_col).cast("string").alias("value_combined_previous"),
    )
    j = cur.join(prev, "key_combined", "full_outer")
    return j.withColumn(
        "diff_type",
        F.when(F.col("value_combined_previous").isNull(), "ADDED")
        .when(F.col("value_combined_current").isNull(), "DELETED")
        .when(
            F.col("value_combined_current") != F.col("value_combined_previous"), "MODIFIED"
        )
        .otherwise("UNCHANGED"),
    ).filter(F.col("diff_type") != "UNCHANGED")
