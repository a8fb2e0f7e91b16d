"""StatVar / entity / provenance triple synthesis and id sanitization.

Re-expresses the simple importer's dataclass → triples expansion and
id generation:
- T5 StatVar triple synthesis with schema-less defaults
  (simple/stats/data.py:113-178: populationType=Thing,
  measuredProperty=self dcid, statType=measuredValue)
- T6 Entity/Provenance/Source triple synthesis
  (simple/stats/data.py:181-258: fixed triples + custom-property
  fan-out, object_id vs object_value chosen by the URI/namespace rule
  of simple/stats/util.py:85-96)
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


def is_uri_or_namespace(col):
    """Native re-expression of simple/stats/util.py:85-96 — full URL,
    ``dcid:`` reference, or ``alnumprefix:rest`` with no spaces."""
    prefix = F.split(col, ":", 2).getItem(0)
    return (
        col.isNotNull()
        & (col != "")
        & (
            col.startswith("http://")
            | col.startswith("https://")
            | col.startswith("dcid:")
            | (col.contains(":") & ~col.contains(" ") & prefix.rlike(r"\A[A-Za-z0-9]+\z"))
        )
    )


TRIPLE_COLS = ["subject_id", "predicate", "object_id", "object_value"]


def _fixed_plus_custom(df: DataFrame, fixed, skip_props: list[str]) -> DataFrame:
    """Explode a fixed triple array + optional custom ``properties`` map
    (simple/stats/data.py:208-222 pattern: hardcoded predicates are
    skipped in the map; id-vs-value chosen by the URI rule)."""
    base = df.select("subject_id", F.explode(fixed).alias("t")).select(
        "subject_id",
        F.col("t.predicate").alias("predicate"),
        F.col("t.object_id").alias("object_id"),
        F.col("t.object_value").alias("object_value"),
    )
    out = base.filter(F.col("object_id").isNotNull() | F.col("object_value").isNotNull())
    if "properties" in df.columns:
        custom = (
            df.filter(F.col("properties").isNotNull())
            .select("subject_id", F.explode("properties").alias("predicate", "_v"))
            .filter(~F.col("predicate").isin(*skip_props))
            .select(
                "subject_id",
                "predicate",
                F.when(is_uri_or_namespace(F.col("_v")), F.col("_v")).alias("object_id"),
                F.when(~is_uri_or_namespace(F.col("_v")), F.col("_v")).alias("object_value"),
            )
        )
        out = out.unionByName(custom)
    return out


def _t(pred: str, object_id=None, object_value=None):
    return F.struct(
        F.lit(pred).alias("predicate"),
        (object_id if object_id is not None else F.lit(None).cast("string")).alias("object_id"),
        (object_value if object_value is not None else F.lit(None).cast("string")).alias(
            "object_value"
        ),
    )


def entity_triples(entities: DataFrame) -> DataFrame:
    """T6 — Entity rows ``(entity_dcid, entity_type)`` → typeOf triples
    (simple/stats/data.py:181-190)."""
    df = entities.select(
        F.col("entity_dcid").alias("subject_id"), F.col("entity_type").alias("_type")
    )
    return _fixed_plus_custom(df, F.array(_t("typeOf", object_id=F.col("_type"))), [])


def provenance_triples(provenances: DataFrame) -> DataFrame:
    """T6 — Provenance rows ``(id, source_id, name[, url, properties])``
    → typeOf/name/source[/url] + custom-property triples
    (simple/stats/data.py:193-222)."""
    df = provenances.select(
        F.col("id").alias("subject_id"),
        "name",
        "source_id",
        (F.col("url") if "url" in provenances.columns else F.lit(None).cast("string")).alias(
            "_url"
        ),
        *(["properties"] if "properties" in provenances.columns else []),
    )
    fixed = F.array(
        _t("typeOf", object_id=F.lit("Provenance")),
        _t("name", object_value=F.col("name")),
        _t("source", object_id=F.col("source_id")),
        _t("url", object_value=F.when(F.col("_url") != "", F.col("_url"))),
    )
    return _fixed_plus_custom(df, fixed, ["typeOf", "name", "sourceLink", "source", "url"])


def source_triples(sources: DataFrame) -> DataFrame:
    """T6 — Source rows ``(id, name[, url, properties])`` → typeOf/name
    [/url/domain] + custom-property triples; domain = URL authority
    (simple/stats/data.py:226-258, urlparse(url).netloc)."""
    df = sources.select(
        F.col("id").alias("subject_id"),
        "name",
        (F.col("url") if "url" in sources.columns else F.lit(None).cast("string")).alias("_url"),
        *(["properties"] if "properties" in sources.columns else []),
    )
    domain = F.parse_url(F.col("_url"), F.lit("HOST"))
    fixed = F.array(
        _t("typeOf", object_id=F.lit("Source")),
        _t("name", object_value=F.col("name")),
        _t("url", object_value=F.when(F.col("_url") != "", F.col("_url"))),
        _t("domain", object_value=F.when(domain != "", domain)),
    )
    return _fixed_plus_custom(df, fixed, ["typeOf", "name", "url", "domain"])
