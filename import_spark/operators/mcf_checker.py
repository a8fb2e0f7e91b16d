"""McfChecker — per-node sanity suite (reference McfChecker.java:62-795).

Input: long-form node rows (node_id, prop, value_type, value[, src_file]).
Output: error rows (node_id, level, counter, message) — the LogWrapper
entry model (LogWrapper.java:50-110); callers aggregate counters and
derive the per-node pass/fail bit (a node fails if it has any
LEVEL_ERROR row, McfChecker.java:786-794).

Spark-first shape: two passes, both fully JVM-side —
1. row-level checks: one projection emitting an array of error structs
   per statement row, exploded (charset/casing/ascii predicates,
   McfChecker.java:446-568);
2. node-level checks: one groupBy("node_id") building a small
   prop→first-value map + counts for the dozen props the type-specific
   rules consult (required-prop presence, single-valuedness, date
   validity, casing — McfChecker.java:151-171,225-420).

No Python UDFs anywhere; every predicate is a column expression so the
whole suite rides whole-stage codegen and one shuffle (the groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from import_spark import vocabulary as V
from import_spark.functions.values import col_is_valid_date

LEVEL_ERROR = "LEVEL_ERROR"
LEVEL_WARNING = "LEVEL_WARNING"

# McfChecker.java:34-42
PROPS_ONLY_IN_PROP = ["domainIncludes", "rangeIncludes", "subPropertyOf"]
PROPS_ONLY_IN_CLASS = ["subClassOf"]
CLASS_REFS_IN_CLASS = ["name", "label", "dcid", "subClassOf"]
CLASS_REFS_IN_PROP = ["domainIncludes", "rangeIncludes"]
PROP_REFS_IN_PROP = ["name", "label", "dcid", "subPropertyOf"]

# Vocabulary.isStatValueProperty (Vocabulary.java:349-359)
_STAT_VALUE_RE = (
    r"(?i)(value|estimate|stderror|samplesize|growthrate|limit|ratio)$"
)


def _is_stat_value_prop(c):
    lc = F.lower(c)
    return (
        lc.rlike(_STAT_VALUE_RE)
        | lc.startswith("percentile")
        | (lc == "marginoferror")
    )


# dcid charset (McfChecker.java:45-49): \w & / % ) ( + - . :
_DCID_OK = r"^[\w&/%\)\(+\-\.:]+$"
_BIO_DCID_OK = r"^[\w&/%\)\(+\-\.'\*><\]\[|:; ]+$"


def _dcid_ok(c):
    return F.when(c.startswith("bio/"), c.rlike(_BIO_DCID_OK)).otherwise(c.rlike(_DCID_OK))


def _err(cond, level: str, counter, message):
    return F.when(
        cond,
        F.struct(
            F.lit(level).alias("level"),
            (counter if not isinstance(counter, str) else F.lit(counter)).alias("counter"),
            message.alias("message"),
        ),
    )


def _msg(*parts):
    return F.concat(*[F.lit(p) if isinstance(p, str) else p for p in parts])


def check_nodes(nodes: DataFrame) -> DataFrame:
    """Run the sanity suite → error rows (node_id, level, counter, message)."""
    row_errors = _row_checks(nodes)
    node_errors = _node_checks(nodes)
    return row_errors.unionByName(node_errors)


def failed_node_ids(errors: DataFrame) -> DataFrame:
    """Distinct node_ids with at least one LEVEL_ERROR entry."""
    return (
        errors.filter(F.col("level") == LEVEL_ERROR).select("node_id").distinct()
    )


# Column-expression trees bind only to column NAMES, so they are
# reusable across DataFrames; building them costs thousands of py4j
# round-trips (~2-5s of driver time per call) — build once per process.
_EXPR_CACHE: dict = {}


def _row_checks(nodes: DataFrame) -> DataFrame:
    checks = _EXPR_CACHE.get("row_checks")
    if checks is None:
        checks = _EXPR_CACHE["row_checks"] = _build_row_checks()
    nid = F.col("node_id")
    return (
        nodes.select(nid.alias("node_id"), F.explode(F.filter(checks, lambda x: x.isNotNull())).alias("e"))
        .select("node_id", "e.level", "e.counter", "e.message")
    )


def _build_row_checks():
    p, vt, v, nid = F.col("prop"), F.col("value_type"), F.col("value"), F.col("node_id")
    is_ref_prop = p.isin(*sorted(V.REFERENCE_PROPS))
    return F.array(
        _err(p == "", LEVEL_ERROR, "Sanity_EmptyProperty",
             _msg("Found an empty property :: node: '", nid, "'")),
        _err(
            (p != "") & ~F.substring(p, 1, 1).rlike("^[a-z]$"),
            LEVEL_ERROR, "Sanity_NotInitLowerPropName",
            _msg("Found property name that does not start with a lower-case :: property: '",
                 p, "', node: '", nid, "'"),
        ),
        _err(
            (vt != "TEXT") & v.rlike(r"[^\x00-\x7F]"),
            LEVEL_ERROR, "Sanity_NonAsciiValueInNonText",
            _msg("Found non-ascii characters in a value that is not text :: value: '",
                 v, "', type: '", vt, "', property: '", p, "', node: '", nid, "'"),
        ),
        _err(
            is_ref_prop & vt.isin("TEXT", "NUMBER"),
            LEVEL_ERROR, "Sanity_RefPropHasNonRefValue",
            _msg("Found text/numeric value in a reference property :: value: '",
                 v, "', property: '", p, "', node: '", nid, "'"),
        ),
        _err(
            (p == "dcid") & (F.length(v) > V.MAX_DCID_LENGTH),
            LEVEL_ERROR, "Sanity_VeryLongDcid",
            _msg("Found a very long dcid value; must be less than ",
                 F.lit(str(V.MAX_DCID_LENGTH)), " :: node: '", nid, "'"),
        ),
        _err(
            (
                ((p == "dcid") & vt.isin("TEXT", "RESOLVED_REF") & (F.length(v) <= V.MAX_DCID_LENGTH))
                | ((p != "dcid") & (vt == "RESOLVED_REF"))
            )
            & (v != "") & ~_dcid_ok(v),
            LEVEL_ERROR,
            F.concat(F.lit("Sanity_InvalidChars_"), p),
            _msg("Found invalid chars in dcid value :: value: '", v,
                 "', property: '", p, "', node: '", nid, "'"),
        ),
    )


def _node_checks(nodes: DataFrame) -> DataFrame:
    """One groupBy pass: per-node prop map + type-driven rules."""
    cached = _EXPR_CACHE.get("node_checks")
    if cached is None:
        cached = _EXPR_CACHE["node_checks"] = _build_node_checks()
    keep, aggs, checks = cached
    # ONE exchange for both the distinct and the per-node agg: hash
    # partitioning on node_id (a subset of the distinct key) satisfies
    # the clustering requirement of BOTH downstream aggregates, so
    # Catalyst inserts no further exchange — measured ~2x faster than
    # the naive dropDuplicates-then-groupBy two-shuffle plan
    nodes = (
        nodes.select("node_id", "prop", "value")
        .filter(keep)
        .repartition("node_id")
        .dropDuplicates(["node_id", "prop", "value"])
    )
    g = nodes.groupBy("node_id").agg(*aggs)
    nid = F.col("node_id")
    return g.select(
        nid.alias("node_id"),
        F.explode(F.filter(checks, lambda x: x.isNotNull())).alias("e"),
    ).select("node_id", "e.level", "e.counter", "e.message")


def _build_node_checks():
    interesting = [
        "typeOf", "dcid", "name", "label",
        "variableMeasured", "observationAbout", "observationDate", "value",
        "measuredProperty", "statType", "populationType", "location",
        "observedNode", "measurementResult", "subClassOf", "subPropertyOf",
        "domainIncludes", "rangeIncludes",
    ]
    keep = F.col("prop").isin(*interesting) | _is_stat_value_prop(F.col("prop"))
    # DISTINCT (node, prop, value) before the agg (see _node_checks):
    # "multiple values" means multiple DISTINCT values; one partial-agg
    # dedupe shuffle, NOT per-agg countDistinct (EXPAND blowup).

    # conditional aggs (not a prop→value map: Spark raises on duplicate
    # map keys, and multi-value props are legal input here)
    def cnt(prop, alias):
        return F.count(F.when(F.col("prop") == prop, 1)).alias(alias)

    def fst(prop, alias):
        return F.min(F.when(F.col("prop") == prop, F.col("value"))).alias(alias)

    aggs = (
            F.collect_set(F.when(F.col("prop") == "typeOf", F.col("value"))).alias("types"),
            cnt("dcid", "n_dcid"), fst("dcid", "dcid"),
            cnt("variableMeasured", "n_vm"), cnt("observationAbout", "n_oa"),
            cnt("observationDate", "n_od"), fst("observationDate", "obs_date"),
            cnt("value", "n_val"),
            cnt("measuredProperty", "n_mp"), fst("measuredProperty", "mprop"),
            cnt("statType", "n_st"), fst("statType", "stat_type"),
            cnt("populationType", "n_pt"), fst("populationType", "pop_type"),
            cnt("location", "n_loc"),
            cnt("observedNode", "n_on"),
            cnt("measurementResult", "n_mr"),
            fst("name", "name"), fst("label", "label"),
            cnt("subClassOf", "n_sco"), cnt("subPropertyOf", "n_spo"),
            cnt("domainIncludes", "n_di"), cnt("rangeIncludes", "n_ri"),
            F.count(F.when(_is_stat_value_prop(F.col("prop")), 1)).alias("n_statval"),
            F.min(
                F.when(
                    _is_stat_value_prop(F.col("prop")),
                    F.struct(F.col("prop"), F.col("value")),
                )
            ).alias("statval"),
    )
    nid = F.col("node_id")
    types = F.col("types")
    has = lambda t: F.array_contains(types, t)  # noqa: E731
    is_svobs = has("StatVarObservation")
    is_statvar = has("StatisticalVariable")
    is_legacy_obs = F.exists(
        types, lambda t: t.endswith("Observation") & (t != "StatVarObservation")
    )
    is_legacy_pop = F.exists(types, lambda t: t.endswith("Population"))
    is_class = has("Class")
    is_prop = has("Property")

    def req(cond, count_col, prop, type_name, level=LEVEL_ERROR):
        """checkRequiredSingleValueProp (McfChecker.java:683-729)."""
        missing = _err(
            cond & (F.col(count_col) == 0), level,
            f"Sanity_MissingOrEmpty_{prop}",
            _msg("Found a missing or empty property value :: property: '",
                 f"{prop}", "', node: '", nid, "', type: '", f"{type_name}", "'"),
        )
        multiple = _err(
            cond & (F.col(count_col) > 1), level,
            f"Sanity_MultipleVals_{prop}",
            _msg("Found multiple values for single-value property :: property: '",
                 f"{prop}", "', node: '", nid, "'"),
        )
        return [missing, multiple]

    init_upper = lambda c: F.substring(c, 1, 1).rlike("^[A-Z]$")  # noqa: E731
    init_lower = lambda c: F.substring(c, 1, 1).rlike("^[a-z]$")  # noqa: E731
    stat_type_known = _is_stat_value_prop(F.col("stat_type")) | (
        F.col("stat_type") == "measurementResult"
    )

    checks = F.array(
        # checkCommon: required typeOf + Thing type
        _err(F.size(types) == 0, LEVEL_ERROR, "Sanity_MissingOrEmpty_typeOf",
             _msg("Found a missing or empty property value :: property: 'typeOf', node: '",
                  nid, "', type: 'Thing'")),
        _err(has("Thing"), LEVEL_ERROR, "Sanity_TypeThing",
             _msg("Found a node with type Thing :: node: '", nid, "'")),
        _err(F.col("n_dcid") > 1, LEVEL_ERROR, "Sanity_MultipleDcidValues",
             _msg("Found dcid with more than one value :: count: ",
                  F.col("n_dcid").cast("string"), ", node: '", nid, "'")),
        # SVObs (McfChecker.java:305-341)
        *req(is_svobs, "n_vm", "variableMeasured", "StatVarObservation"),
        *req(is_svobs, "n_oa", "observationAbout", "StatVarObservation"),
        *req(is_svobs, "n_od", "observationDate", "StatVarObservation"),
        _err(
            is_svobs & (F.col("n_od") == 1) & ~col_is_valid_date(F.col("obs_date")),
            LEVEL_ERROR, "Sanity_InvalidObsDate",
            _msg("Found a non-ISO8601 compliant date value :: value: '",
                 F.col("obs_date"), "', property: 'observationDate', node: '", nid, "'"),
        ),
        *req(is_svobs, "n_val", "value", "StatVarObservation", LEVEL_WARNING),
        # StatVar (McfChecker.java:225-303)
        *req(is_statvar, "n_pt", "populationType", "StatisticalVariable", LEVEL_WARNING),
        _err(
            is_statvar & (F.col("n_pt") > 0) & ~init_upper(F.col("pop_type")),
            LEVEL_ERROR, "Sanity_NotInitUpper_populationType",
            _msg("Found a class reference that does not start with an upper-case :: reference: '",
                 F.col("pop_type"), "', property: 'populationType', node: '", nid, "'"),
        ),
        *req(is_statvar, "n_mp", "measuredProperty", "StatisticalVariable"),
        _err(
            is_statvar & (F.col("n_mp") > 0)
            & (F.col("mprop") != F.coalesce(F.col("dcid"), F.lit("")))
            & ~init_lower(F.col("mprop")),
            LEVEL_ERROR, "Sanity_NotInitLower_measuredProperty",
            _msg("Found a property reference that does not start with a lower-case :: reference: '",
                 F.col("mprop"), "', property: 'measuredProperty', node: '", nid, "'"),
        ),
        *req(is_statvar, "n_st", "statType", "StatisticalVariable"),
        _err(
            is_statvar & (F.col("n_st") > 0) & ~stat_type_known,
            LEVEL_ERROR, "Sanity_UnknownStatType",
            _msg("Found an unknown statType value :: value: '", F.col("stat_type"),
                 "', node: '", nid, "'"),
        ),
        *req(is_statvar, "n_dcid", "dcid", "StatisticalVariable"),
        # Legacy population (McfChecker.java:342-351)
        *req(is_legacy_pop, "n_pt", "populationType", "StatisticalPopulation"),
        _err(
            is_legacy_pop & (F.col("n_pt") > 0) & ~init_upper(F.col("pop_type")),
            LEVEL_ERROR, "Sanity_NotInitUpper_populationType",
            _msg("Found a class reference that does not start with an upper-case :: reference: '",
                 F.col("pop_type"), "', property: 'populationType', node: '", nid, "'"),
        ),
        *req(is_legacy_pop, "n_loc", "location", "StatisticalPopulation"),
        # Legacy observation (McfChecker.java:353-420)
        *req(is_legacy_obs, "n_mp", "measuredProperty", "Observation"),
        _err(
            is_legacy_obs & (F.col("n_mp") > 0) & ~init_lower(F.col("mprop")),
            LEVEL_ERROR, "Sanity_NotInitLower_measuredProperty",
            _msg("Found a property reference that does not start with a lower-case :: reference: '",
                 F.col("mprop"), "', property: 'measuredProperty', node: '", nid, "'"),
        ),
        *req(is_legacy_obs, "n_on", "observedNode", "Observation"),
        *req(is_legacy_obs, "n_od", "observationDate", "Observation"),
        _err(
            is_legacy_obs & (F.col("n_od") == 1) & ~col_is_valid_date(F.col("obs_date")),
            LEVEL_ERROR, "Sanity_InvalidObsDate",
            _msg("Found a non-ISO8601 compliant date value :: value: '",
                 F.col("obs_date"), "', property: 'observationDate', node: '", nid, "'"),
        ),
        _err(
            is_legacy_obs & (F.col("n_statval") > 0)
            & F.col("statval.value").cast("double").isNull(),
            LEVEL_ERROR, "Sanity_NonDoubleObsValue",
            _msg("Found a non-double Observation value :: value: '",
                 F.col("statval.value"), "', property: '", F.col("statval.prop"),
                 "', node: '", nid, "'"),
        ),
        _err(
            is_legacy_obs & (F.col("n_statval") == 0) & (F.col("n_mr") == 0),
            LEVEL_WARNING, "Sanity_ObsMissingValueProp",
            _msg("Observation node missing value property :: node: '", nid, "'"),
        ),
        # Class / Property (McfChecker.java:605-681)
        *[
            _err(
                is_class & (F.col(c) > 0), LEVEL_ERROR, "Sanity_UnexpectedPropInClass",
                _msg("Unexpected property in Class node :: property: '", pr,
                     "', node: '", nid, "'"),
            )
            for pr, c in [("domainIncludes", "n_di"), ("rangeIncludes", "n_ri"), ("subPropertyOf", "n_spo")]
        ],
        _err(
            is_prop & (F.col("n_sco") > 0), LEVEL_ERROR, "Sanity_UnexpectedPropInProperty",
            _msg("Unexpected property in Property node :: property: 'subClassOf', node: '", nid, "'"),
        ),
        _err(
            (is_class | is_prop)
            & F.col("dcid").isNotNull()
            & (F.coalesce(F.col("name"), F.col("label")).isNotNull())
            & (F.col("dcid") != F.coalesce(F.col("name"), F.col("label"))),
            LEVEL_ERROR, "Sanity_DcidNameMismatchInSchema",
            _msg("Schema node with dcid/name mismatch :: name: '",
                 F.coalesce(F.col("name"), F.col("label")), "', dcid: '",
                 F.col("dcid"), "', node: '", nid, "'"),
        ),
        _err(
            is_class & (F.coalesce(F.col("dcid"), F.lit("")) != "Thing") & (F.col("n_sco") == 0),
            LEVEL_ERROR, "Sanity_MissingOrEmpty_subClassOf",
            _msg("Found a missing or empty property value :: property: 'subClassOf', node: '",
                 nid, "', type: 'Class'"),
        ),
    )
    return keep, aggs, checks


def check_gate(nodes: DataFrame) -> DataFrame:
    """The TmcfCsvParser inline per-node gate (TmcfCsvParser.java:225-228):
    a node with ANY check entry — warnings included, because
    McfChecker.addLog sets nodeFailure unconditionally
    (McfChecker.java:790-793) — is dropped from the parsed graph.
    Distinct from the lint/resolution quarantine, which only acts on
    LEVEL_ERROR rows (failed_node_ids)."""
    flagged = check_nodes(nodes).select("node_id").distinct()
    return nodes.join(flagged, "node_id", "left_anti")
