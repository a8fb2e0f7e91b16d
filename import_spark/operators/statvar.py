"""StatVar / entity triple synthesis and id sanitization.

Re-expresses the simple importer's dataclass → triples expansion and
id generation:
- T5 StatVar triple synthesis with schema-less defaults
  (simple/stats/data.py:113-178: populationType=Thing,
  measuredProperty=self dcid, statType=measuredValue)
- C8 SV/SVG id sanitization from free-form names
  (simple/stats/nodes.py:36-37, stat_var_hierarchy_generator.py:142-156:
  sanitize to ``custom/statvar_...``; truncate at 255 with a
  sha256-suffix to keep ids unique)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ID_LEN = 255


def sanitize_sv_id(col, prefix: str = "custom/statvar_"):
    """Free-form name → id: non-alnum runs → '_', lowercased, prefixed;
    over-long ids truncated with an 8-char sha256 suffix (C8)."""
    base = F.concat(
        F.lit(prefix),
        F.lower(F.regexp_replace(F.trim(col), r"[^A-Za-z0-9]+", "_")),
    )
    short = F.substring(base, 1, MAX_ID_LEN - 9)
    return F.when(F.length(base) <= MAX_ID_LEN, base).otherwise(
        F.concat(short, F.lit("_"), F.substring(F.sha2(base, 256), 1, 8))
    )


def statvar_triples(svs: DataFrame, id_col: str = "sv_id", name_col: str = "name") -> DataFrame:
    """StatVar rows → long-form triples with schema-less defaults (T5).

    Input: one row per variable with at least (sv_id, name); optional
    populationType / measuredProperty / statType columns override the
    defaults of simple/stats/data.py:125-138.
    """
    sv = svs.select(
        F.col(id_col).alias("subject_id"),
        F.col(name_col).alias("_name"),
        (
            F.col("populationType") if "populationType" in svs.columns else F.lit(None)
        ).alias("_pop"),
        (
            F.col("measuredProperty") if "measuredProperty" in svs.columns else F.lit(None)
        ).alias("_mp"),
        (F.col("statType") if "statType" in svs.columns else F.lit(None)).alias("_st"),
    )
    trip = F.array(
        F.struct(F.lit("typeOf").alias("predicate"), F.lit("StatisticalVariable").alias("object")),
        F.struct(F.lit("name").alias("predicate"), F.col("_name").alias("object")),
        F.struct(
            F.lit("populationType").alias("predicate"),
            F.coalesce(F.col("_pop"), F.lit("Thing")).alias("object"),
        ),
        F.struct(
            F.lit("measuredProperty").alias("predicate"),
            F.coalesce(F.col("_mp"), F.col("subject_id")).alias("object"),
        ),
        F.struct(
            F.lit("statType").alias("predicate"),
            F.coalesce(F.col("_st"), F.lit("measuredValue")).alias("object"),
        ),
    )
    return sv.select("subject_id", F.explode(trip).alias("t")).select(
        "subject_id", F.col("t.predicate").alias("predicate"), F.col("t.object").alias("object")
    )
