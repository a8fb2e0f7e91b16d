"""SVObs series grouping + facet dedup (A2/A3/C6).

Re-expresses the reference's optimized time-series representation:
- A2 series grouping: ``KV<SeriesKey, StatVarObs> → GroupByKey →
  date-sorted series`` (PipelineUtils.java:250-306; sort :292-297) as a
  single ``groupBy().agg(sort_array(collect_list(struct(...))))`` —
  Catalyst's partial aggregation supplies the reference's per-bundle
  incremental grouping (Processor.java:358-368) for free.
- A3 facet dedup: ``Distinct.withRepresentativeValueFn`` on
  ``variable^entity^extraEntities^facetId`` (GraphReader.java:157-177,
  TimeSeries.java:66-68) as ``dropDuplicates`` on the key columns.
- C6 facet id: farmhash64 of ``import^method^period^sf^unit^isDcAgg``
  as an unsigned-decimal string (TimeSeries.java:170-191).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SERIES_KEY_COLS = ["entity", "variable"]
FACET_PROPS = ["import_name", "measurement_method", "observation_period", "scaling_factor", "unit"]


def group_series(obs: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Long-form observations → one row per series with a date-sorted
    array of (date, value) structs."""
    keys = key_cols or SERIES_KEY_COLS
    return obs.groupBy(*keys).agg(
        F.sort_array(F.collect_list(F.struct("date", "value"))).alias("series"),
        F.count("*").alias("n_obs"),
    )


def dedupe_facets(ts: DataFrame, key_cols: list[str]) -> DataFrame:
    """A3: representative-value distinct on the facet dedupe key."""
    return ts.dropDuplicates(key_cols)


def with_facet_id(obs: DataFrame) -> DataFrame:
    """C6: append the unsigned-decimal farmhash facet id; the key string
    is the '^'-joined facet props (TimeSeries.java:170-191)."""
    from pyspark.sql.pandas.functions import pandas_udf

    from import_spark.functions.farmhash import fingerprint64

    def _fid(keys: pd.Series) -> pd.Series:
        return keys.map(lambda k: str(fingerprint64(k)) if isinstance(k, str) else None)

    fid_udf = pandas_udf(_fid, "string")
    present = [c for c in FACET_PROPS if c in obs.columns]
    key = F.concat_ws(
        "^", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in present]
    )
    return obs.withColumn("facet_id", fid_udf(key))
