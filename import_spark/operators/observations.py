"""P11/P10 — config-driven wide→long observation import.

Re-expresses the simple importer's ObservationsImporter chunk loop
(simple/stats/observations_importer.py:68-139) as one declarative
DataFrame transform:

- drop ignored columns (``ignoreColumns`` config,
  observations_importer.py:87-91);
- pick the entity / date columns from ``columnMappings``
  (``dcid:observationAbout`` / ``dcid:observationDate``), defaulting to
  the first / second column (observations_importer.py:93-96);
- every remaining column is a StatVar column renamed to its sanitized
  id (nodes.py:232-238 → C8 ``sanitize_sv_id``);
- melt wide→long ``(entity, variable, date, value)``
  (observations_importer.py:130-139 ``pd.melt``) — expressed as a
  native explode of per-column structs, no Python in the row path;
- P10 invalid-value filter: NaN / ``<NA>`` / empty and the standard NA
  tokens (data.py:621-626, constants.py:71).

At 100 TB the melt is a narrow map-side 1→K fan-out (no shuffle); the
output is long-form and partitions by whatever key the caller picks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from import_spark.operators.statvar import sanitize_sv_id

# constants.py:71 STANDARD_NA_VALUES (lowercased match) + data.py:624 "<NA>"
STANDARD_NA_VALUES = ["-", "nil", "n/a", "na", "none", "null", "<na>"]

ENTITY_MAPPING_KEY = "dcid:observationAbout"
DATE_MAPPING_KEY = "dcid:observationDate"


def import_wide_observations(
    df: DataFrame,
    ignore_columns: list[str] | None = None,
    column_mappings: dict[str, str] | None = None,
    sv_id_prefix: str = "custom/statvar_",
) -> DataFrame:
    """Wide observation table → long-form (entity, variable, date, value).

    ``column_mappings`` uses the reference's config keys
    (``dcid:observationAbout``/``dcid:observationDate``); unmapped
    entity/date default to the first/second surviving column.
    """
    mappings = column_mappings or {}
    cols = [c for c in df.columns if c not in set(ignore_columns or [])]
    if len(cols) < 3:
        raise ValueError(f"need entity, date and >=1 variable column, got {cols}")
    entity_col = mappings.get(ENTITY_MAPPING_KEY) or cols[0]
    date_col = mappings.get(DATE_MAPPING_KEY) or next(c for c in cols if c != entity_col)
    sv_cols = [c for c in cols if c not in (entity_col, date_col)]
    if not sv_cols:
        raise ValueError("no variable columns left after entity/date selection")

    # column name → sanitized sv id, computed once on the driver (C8);
    # the per-row work is a pure explode of (id, value) structs.
    name_df = df.sparkSession.createDataFrame([(c,) for c in sv_cols], ["name"])
    ids = {
        r["name"]: r["sv_id"]
        for r in name_df.select("name", sanitize_sv_id(F.col("name"), sv_id_prefix).alias("sv_id")).collect()
    }
    from import_spark.operators.skew import widen_narrow_input

    df = widen_narrow_input(df)
    pairs = F.array(
        *[
            F.struct(
                F.lit(ids[c]).alias("variable"),
                F.col(c).cast("string").alias("value"),
            )
            for c in sv_cols
        ]
    )
    long = (
        df.select(
            F.col(entity_col).cast("string").alias("entity"),
            F.col(date_col).cast("string").alias("date"),
            F.explode(pairs).alias("p"),
        )
        .select("entity", F.col("p.variable").alias("variable"), "date", F.col("p.value").alias("value"))
    )
    v = F.col("value")
    return long.filter(
        v.isNotNull()
        & (v != "")
        & (v != "<NA>")
        & ~F.lower(F.trim(v)).isin(*STANDARD_NA_VALUES)
    ).select("entity", "variable", "date", "value")
