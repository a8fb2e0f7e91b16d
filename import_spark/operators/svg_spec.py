"""Spec-driven StatVarGroup generation (StatVarGroupSpec + DPV core).

Re-expresses the BigQuery StatVarGroupGenerator script
(``pipeline/workflow/aggregation-helper/aggregation/
stat_var_group_generator.py:107-913``) as Spark DataFrame passes:

- **Spec pivot** — StatVarGroupSpec nodes' (populationType,
  statVarProperties, constraintProperties, vertical,
  dependentPropertyValue) edges pivot to per-spec arrays; the
  statVarProperties / dependentPropertyValue object_ids resolve to
  their untyped Node values first (SpecValues).
- **DPV matching** — a SV matches a DPV spec when populationType is
  equal, statVarProperties overlap (or the spec declares none), the
  SV's constraintProperties EXACTLY equal spec cprops ∪ DPV
  predicates, and every DPV p=v pair matches the SV exactly; the most
  specific match (most DPVs, then most cprops) wins and its pvs are
  STRIPPED before hierarchy generation.
- **Basic-population filter** — bare popType groups are suppressed for
  basic population types (Person, Thing, …) when enabled (the base-DC
  default); those SVs attach to verticals / Uncategorized instead.
- **Vertical spec attachment** — 0-1-cprop specs with a vertical place
  generated top-level SVGs under their verticals (specializationOf)
  and SVs under the linked vertical closure (linkedMemberOf), with the
  Uncategorized fallbacks and filters of the reference.
- **Iterative lattice** — from the leaf (popType, pvs) group, each
  round drops one pv to a "prop-only" group (node2) and then the prop
  entirely (node3), deduped against everything generated so far.
- **Pruning** — reuses :func:`svg_hierarchy.prune_single_child_svgs`
  (already modeled on this generator's pruning pass).

Scale shape: the loop state (AllResults) is per-(SV × attr-subset) —
bounded by the SV dimension times 2^#cprops with #cprops ≤ ~5, i.e.
metadata-sized; every step is a native DataFrame op, each round
localCheckpointed to keep plans flat. The only full-data inputs are
the edge scans, which reduce to per-SV aggregates in one pass.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASIC_POPULATION_TYPES = [
    "Person", "BLSWorker", "USCWorker", "Thing", "Household",
    "HousingUnit", "Place", "Energy",
]

SPEC_PREDICATES = [
    "populationType", "statVarProperties", "constraintProperties",
    "vertical", "dependentPropertyValue",
]

MAX_ANCESTOR_LEVELS = 11  # the recursive CTEs stop extending at level 10


def format_name(c):
    """FormatName UDF: '_'→' ', split camelCase and letter/digit
    boundaries, trim, capitalize the first character."""
    s = F.regexp_replace(c, "_", " ")
    s = F.regexp_replace(s, r"([a-z])([A-Z])", r"$1 $2")
    s = F.regexp_replace(s, r"([A-Z])([A-Z][a-z])", r"$1 $2")
    s = F.regexp_replace(s, r"([A-Za-z])([0-9])", r"$1 $2")
    s = F.regexp_replace(s, r"([0-9])([A-Za-z])", r"$1 $2")
    s = F.trim(s)
    return F.concat(F.upper(F.substring(s, 1, 1)), F.substring(s, 2, 1_000_000))


def _is_basic(pop_col):
    return pop_col.isin(*BASIC_POPULATION_TYPES)


def _name_node_id(name_col):
    """CONCAT(SUBSTR(name,1,16), ':', TO_BASE64(SHA256(name)))."""
    return F.concat(
        F.substring(name_col, 1, 16),
        F.lit(":"),
        F.base64(F.unhex(F.sha2(name_col, 256))),
    )


def generated_provenance_expr(is_base_dc: bool, prov_col):
    """get_sql_generated_provenance_expr (common.py:33-38)."""
    if is_base_dc:
        return F.concat(
            F.lit("dc/base/generated/"),
            F.regexp_replace(prov_col, r"^dc/base/(generated/)?", ""),
        )
    return F.concat(
        F.lit("generated/"), F.regexp_replace(prov_col, r"^(generated/)?", "")
    )


def _attr_id_token(attr_col):
    """'Gender = Female' → 'Gender-Female' (spaces removed, '='→'-')."""
    return F.regexp_replace(F.regexp_replace(attr_col, " ", ""), "=", "-")


def _prop_only_token(attr_col):
    """'Gender = Female' → 'Gender' (prop side, spaces removed)."""
    return F.regexp_replace(F.split(attr_col, " = ")[0], " ", "")


@dataclass
class SvgSpecResult:
    nodes: DataFrame  # (subject_id, value, name, types)
    edges: DataFrame  # (subject_id, predicate, object_id, provenance)
    pruned_svgs: DataFrame | None = None


def _ancestor_closure(seeds: DataFrame, hierarchy: DataFrame) -> DataFrame:
    """VerticalAncestors: all specializationOf ancestors of ``seeds``
    (subject_id), ≤ MAX_ANCESTOR_LEVELS hops. Returns (subject_id,
    ancestor_svg) distinct rows."""
    hops = hierarchy.select(
        F.col("subject_id").alias("_via"), F.col("object_id").alias("_up")
    )
    anc = (
        seeds.join(hops, seeds["subject_id"] == hops["_via"])
        .select("subject_id", F.col("_up").alias("ancestor_svg"))
        .distinct()
        .localCheckpoint()
    )
    frontier = anc
    for _ in range(MAX_ANCESTOR_LEVELS - 1):
        ext = (
            frontier.join(hops, frontier["ancestor_svg"] == hops["_via"])
            .select("subject_id", F.col("_up").alias("ancestor_svg"))
            .distinct()
        )
        grown = anc.unionByName(ext).distinct().localCheckpoint()
        if grown.count() == anc.count():
            return grown
        frontier = ext.join(
            anc, ["subject_id", "ancestor_svg"], "left_anti"
        ).localCheckpoint()
        anc = grown
    return anc


def generate_spec_svgs(
    edges: DataFrame,
    node_values: DataFrame | None = None,
    is_base_dc: bool = True,
    namespace: str | None = None,
    should_filter_basic_population_type: bool | None = None,
    should_prune_single_child_svgs: bool = False,
    max_iterations: int = 50,
) -> SvgSpecResult:
    """The full generator. ``edges``: (subject_id, predicate, object_id,
    provenance). ``node_values``: (subject_id, value) rows of UNTYPED
    nodes, used to resolve statVarProperties / dependentPropertyValue
    spec objects to their literal values (SpecValues)."""
    spark = edges.sparkSession
    ns = namespace if namespace is not None else ("dc/" if is_base_dc else "c/")
    should_filter = (
        should_filter_basic_population_type
        if should_filter_basic_population_type is not None
        else is_base_dc
    )
    gen_prov_prefix = ("dc/base/" if is_base_dc else "") + "generated/"
    uncategorized_svg = f"{ns}g/Uncategorized"
    uncategorized_sv_svg = f"{ns}g/Uncategorized_Variables"
    root_svg = f"{ns}g/Root"

    edges = edges.select("subject_id", "predicate", "object_id", "provenance")

    # ---------------------------------------------------------- spec pivot
    spec_subjects = (
        edges.filter(
            (F.col("predicate") == "typeOf")
            & (F.col("object_id") == "StatVarGroupSpec")
        )
        .select("subject_id")
        .distinct()
    )
    spec_objects = (
        edges.filter(F.col("predicate").isin(*SPEC_PREDICATES))
        .join(spec_subjects, "subject_id", "left_semi")
        .select("subject_id", "predicate", "object_id")
        .distinct()
    )
    # resolve statVarProperties / dependentPropertyValue object ids to
    # untyped-node values; the rest pass object_id through
    resolved_preds = ["statVarProperties", "dependentPropertyValue"]
    if node_values is not None:
        nv = node_values.select(
            F.col("subject_id").alias("object_id"), F.col("value").alias("_nv")
        )
        resolved = (
            spec_objects.filter(F.col("predicate").isin(*resolved_preds))
            .join(nv, "object_id")
            .select("subject_id", "predicate", F.col("_nv").alias("value"))
        )
    else:
        resolved = spec_objects.filter(
            F.col("predicate").isin(*resolved_preds)
        ).select("subject_id", "predicate", F.col("object_id").alias("value"))
    spec_values = resolved.unionByName(
        spec_objects.filter(
            F.col("predicate").isin("populationType", "constraintProperties", "vertical")
        ).select("subject_id", "predicate", F.col("object_id").alias("value"))
    ).localCheckpoint()

    def _pivot_arr(pred):
        return F.array_sort(
            F.collect_list(F.when(F.col("predicate") == pred, F.col("value")))
        )

    pivot = spec_values.groupBy("subject_id").agg(
        _pivot_arr("populationType").alias("populationTypes"),
        _pivot_arr("statVarProperties").alias("statVarProperties"),
        _pivot_arr("constraintProperties").alias("constraintProperties"),
        _pivot_arr("vertical").alias("vertical"),
        _pivot_arr("dependentPropertyValue").alias("dependentPropertyValue"),
    ).withColumn("populationType", F.col("populationTypes")[0]).localCheckpoint()

    # normalized DPV: FormatName(p) = FormatName(v)
    def _norm_dpv(d):
        return F.concat(
            format_name(F.trim(F.split(d, "=")[0])),
            F.lit(" = "),
            format_name(F.trim(F.split(d, "=")[1])),
        )

    dpv_spec = (
        pivot.filter(F.size("dependentPropertyValue") > 0)
        .select(
            F.col("subject_id").alias("spec_id"),
            "populationType",
            "statVarProperties",
            "constraintProperties",
            F.array_join(
                F.array_sort(
                    F.array_distinct(
                        F.concat(
                            F.col("constraintProperties"),
                            F.transform(
                                F.col("dependentPropertyValue"),
                                lambda d: F.trim(F.split(d, "=")[0]),
                            ),
                        )
                    )
                ),
                ",",
            ).alias("cprops_key"),
            F.transform(F.col("dependentPropertyValue"), _norm_dpv).alias(
                "normalized_dpvs"
            ),
            F.size("dependentPropertyValue").alias("dpv_count"),
            F.size("constraintProperties").alias("cprop_count"),
        )
        .localCheckpoint()
    )

    # ------------------------------------------------- vertical hierarchy
    hierarchy = edges.filter(F.col("predicate") == "specializationOf").select(
        "subject_id", "object_id"
    )
    vertical_seeds = (
        spec_values.filter(F.col("predicate") == "vertical")
        .select(F.col("value").alias("subject_id"))
        .distinct()
    )
    vertical_ancestors = (
        _ancestor_closure(vertical_seeds, hierarchy)
        .groupBy("subject_id")
        .agg(F.array_sort(F.collect_set("ancestor_svg")).alias("ancestors"))
        .localCheckpoint()
    )

    # VerticalSpec: 0-1 cprop specs with a vertical; one row per
    # (spec × statVarProperty) — first CSV element of each — or one
    # NULL-svProp row when the spec declares none
    vs_base = pivot.filter(
        (F.size("constraintProperties") <= 1) & (F.size("vertical") > 0)
    )
    svp = F.when(
        F.size("statVarProperties") > 0, F.col("statVarProperties")
    ).otherwise(F.array(F.lit(None).cast("string")))
    vs_rows = vs_base.select(
        "subject_id",
        "populationType",
        F.explode(svp).alias("svProp"),
        "constraintProperties",
        "vertical",
    ).withColumn("svProp", F.split(F.col("svProp"), ",")[0])
    v_anc = vertical_ancestors.select(
        F.col("subject_id").alias("_v"), "ancestors"
    )
    vertical_spec = (
        vs_rows.select(
            "subject_id", "populationType", "svProp", "constraintProperties",
            "vertical", F.explode("vertical").alias("_v"),
        )
        .join(v_anc, "_v", "left")
        .select(
            "subject_id",
            "populationType",
            "svProp",
            "constraintProperties",
            F.array_join("constraintProperties", ",").alias("cprops_key"),
            "vertical",
            F.array_sort(
                F.array_distinct(
                    F.concat(
                        F.col("vertical"),
                        F.coalesce("ancestors", F.array().cast("array<string>")),
                    )
                )
            ).alias("linkedVertical"),
        )
        .distinct()
        .localCheckpoint()
    )

    # ------------------------------------------------- curated member SVs
    curated_member = (
        edges.filter(
            (F.col("predicate") == "memberOf")
            & ~F.col("provenance").startswith(gen_prov_prefix)
        )
        .select(
            F.col("subject_id").alias("statvar"),
            F.col("object_id").alias("parent_svg"),
            "provenance",
        )
        .localCheckpoint()
    )
    curated_anc = _ancestor_closure(
        curated_member.select(F.col("parent_svg").alias("subject_id")).distinct(),
        hierarchy,
    )
    curated_linked = (
        curated_member.select(
            "statvar", F.col("parent_svg").alias("ancestor_svg"), "provenance"
        )
        .unionByName(
            curated_member.join(
                curated_anc.withColumnRenamed("subject_id", "parent_svg"),
                "parent_svg",
            ).select("statvar", "ancestor_svg", "provenance")
        )
        .select(
            F.col("statvar").alias("subject_id"),
            F.lit("linkedMemberOf").alias("predicate"),
            F.col("ancestor_svg").alias("object_id"),
            generated_provenance_expr(is_base_dc, F.col("provenance")).alias(
                "provenance"
            ),
        )
        .distinct()
    )

    # ---------------------------------------------------- SV base data
    statvars = (
        edges.filter(
            (F.col("predicate") == "typeOf")
            & (F.col("object_id") == "StatisticalVariable")
            & ~F.col("provenance").startswith(gen_prov_prefix)
        )
        .select("subject_id", "provenance")
        .distinct()
        .localCheckpoint()
    )
    constraint_props = [
        r["object_id"]
        for r in edges.filter(F.col("predicate") == "constraintProperties")
        .select("object_id")
        .distinct()
        .collect()
    ]
    needed = ["populationType", "measuredProperty", "constraintProperties"] + [
        p.replace("'", "") for p in constraint_props
    ]
    sv_triples = (
        edges.filter(
            F.col("predicate").isin(*needed) & ~F.col("object_id").startswith("[")
        )
        .join(statvars.select("subject_id"), "subject_id", "left_semi")
        .select("subject_id", "predicate", "object_id")
        .distinct()
        .localCheckpoint()
    )
    pop = (
        sv_triples.filter(F.col("predicate") == "populationType")
        .select("subject_id", F.col("object_id").alias("populationType"))
        .distinct()
    )
    sv_props = (
        sv_triples.filter(F.col("predicate") == "measuredProperty")
        .groupBy("subject_id")
        .agg(
            F.array_sort(
                F.collect_list(F.concat(F.lit("measuredProperty="), F.col("object_id")))
            ).alias("sv_statVarProperties")
        )
    )
    cprops = (
        sv_triples.filter(F.col("predicate") == "constraintProperties")
        .groupBy("subject_id")
        .agg(F.array_sort(F.collect_list("object_id")).alias("cprops"))
    )
    cprop_triples = sv_triples.join(
        cprops.select("subject_id", F.explode("cprops").alias("predicate")).distinct(),
        ["subject_id", "predicate"],
    )
    fmt_pv = F.concat(
        format_name(F.col("predicate")), F.lit(" = "), format_name(F.col("object_id"))
    )
    sv_pvs = (
        cprop_triples.select(
            "subject_id", "predicate", "object_id", fmt_pv.alias("pv")
        )
        .groupBy("subject_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("predicate", "object_id", "pv"))
                ),
                lambda s: s["pv"],
            ).alias("sv_pvs")
        )
    )
    empty_arr = F.array().cast("array<string>")
    sv_base = (
        pop.join(statvars, "subject_id")
        .join(sv_props, "subject_id", "left")
        .join(cprops, "subject_id", "left")
        .join(sv_pvs, "subject_id", "left")
        .select(
            "subject_id",
            "populationType",
            F.coalesce("sv_statVarProperties", empty_arr).alias("sv_statVarProperties"),
            F.coalesce("cprops", empty_arr).alias("cprops"),
            F.coalesce("sv_pvs", empty_arr).alias("sv_pvs"),
            F.array_join(F.coalesce("cprops", empty_arr), ",").alias("cprops_key"),
            "provenance",
        )
        .localCheckpoint()
    )

    # ---------------------------------------------------- DPV matching
    m = sv_base.join(
        dpv_spec.withColumnRenamed("cprops_key", "_spec_ck"),
        on=["populationType"],
    ).filter(
        (
            (F.size("statVarProperties") == 0)
            | (
                F.size(
                    F.array_intersect("sv_statVarProperties", "statVarProperties")
                )
                > 0
            )
        )
        & (F.size("cprops") > 0)
        & (F.col("cprops_key") == F.col("_spec_ck"))
        & (F.size("sv_pvs") > 0)
        & (
            F.size(F.array_intersect("normalized_dpvs", "sv_pvs"))
            == F.size("normalized_dpvs")
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("subject_id").orderBy(
        F.col("dpv_count").desc(), F.col("cprop_count").desc(), F.col("spec_id")
    )
    sv_dpv_match = (
        m.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("subject_id", "spec_id", F.col("normalized_dpvs").alias("dpvs_to_strip"))
        .localCheckpoint()
    )

    # ---------------------------------------------------- initial lattice
    stripped = cprop_triples.join(sv_dpv_match, "subject_id", "left").filter(
        ~F.coalesce(
            F.array_contains("dpvs_to_strip", fmt_pv), F.lit(False)
        )
    )
    constraints = (
        stripped.select("subject_id", "predicate", "object_id", fmt_pv.alias("pv"))
        .groupBy("subject_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("predicate", "object_id", "pv"))),
                lambda s: s["predicate"],
            ).alias("aligned_cps"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("predicate", "object_id", "pv"))),
                lambda s: s["pv"],
            ).alias("pvs"),
        )
    )

    def _leaf_id(pop_col, pvs_col):
        return F.concat(
            F.lit(f"{ns}g/"),
            pop_col,
            F.lit("_"),
            F.array_join(F.transform(pvs_col, _attr_id_token), "_"),
        )

    def _leaf_name(pop_col, pvs_col):
        return F.concat(
            format_name(pop_col), F.lit(" With "), F.array_join(pvs_col, ", ")
        )

    def _bare_group(pop_col, name: bool):
        bare = format_name(pop_col) if name else F.concat(F.lit(f"{ns}g/"), pop_col)
        if should_filter:
            return F.when(~_is_basic(pop_col), bare)
        return bare

    svp_exploded = F.when(
        F.size("sv_statVarProperties") > 0, F.col("sv_statVarProperties")
    ).otherwise(F.array(F.lit(None).cast("string")))
    initial = (
        sv_base.join(
            curated_member.select(F.col("statvar").alias("subject_id")).distinct(),
            "subject_id",
            "left_anti",
        )
        .join(constraints, "subject_id", "left")
        .select(
            F.lit(None).cast("string").alias("node1"),
            F.lit(None).cast("string").alias("node2"),
            F.lit("").alias("node2name"),
            F.when(
                F.size(F.coalesce("pvs", empty_arr)) > 0,
                _leaf_id(F.col("populationType"), F.col("pvs")),
            )
            .otherwise(_bare_group(F.col("populationType"), name=False))
            .alias("node3"),
            F.when(
                F.size(F.coalesce("pvs", empty_arr)) > 0,
                _leaf_name(F.col("populationType"), F.col("pvs")),
            )
            .otherwise(_bare_group(F.col("populationType"), name=True))
            .alias("node3name"),
            F.col("subject_id").alias("statvar"),
            "populationType",
            F.explode(svp_exploded).alias("statVarProperties"),
            empty_arr.alias("constraintProperties"),
            F.coalesce("aligned_cps", empty_arr).alias("newConstraintProperties"),
            F.coalesce("pvs", empty_arr).alias("attributes"),
            F.lit(0).alias("iteration"),
            "provenance",
        )
        .localCheckpoint()
    )

    # ---------------------------------------------------- iterative loop
    all_results = initial
    frontier = initial
    for it in range(1, max_iterations + 1):
        src = frontier.filter(F.size("attributes") >= 1)
        if src.isEmpty():
            break
        tgt = src.select(
            "*", F.posexplode("attributes").alias("target_idx", "_attr")
        )
        drop_i = lambda arr, i: F.filter(arr, lambda _, j: j != i)  # noqa: E731
        node2_id = F.concat(
            F.lit(f"{ns}g/"),
            F.col("populationType"),
            F.lit("_"),
            F.array_join(
                F.transform(
                    F.col("attributes"),
                    lambda a, j: F.when(
                        j == F.col("target_idx"), _prop_only_token(a)
                    ).otherwise(_attr_id_token(a)),
                ),
                "_",
            ),
        )
        node2_name = F.concat(
            format_name(F.col("populationType")),
            F.lit(" With "),
            F.array_join(
                F.transform(
                    F.col("attributes"),
                    lambda a, j: F.when(
                        j == F.col("target_idx"), F.split(a, " = ")[0]
                    ).otherwise(a),
                ),
                ", ",
            ),
        )
        rest = drop_i(F.col("attributes"), F.col("target_idx"))
        node3_id = F.when(
            F.size("attributes") > 1,
            F.concat(
                F.lit(f"{ns}g/"),
                F.col("populationType"),
                F.lit("_"),
                F.array_join(F.transform(rest, _attr_id_token), "_"),
            ),
        ).otherwise(_bare_group(F.col("populationType"), name=False))
        node3_name = F.when(
            F.size("attributes") > 1,
            F.concat(
                format_name(F.col("populationType")),
                F.lit(" With "),
                F.array_join(rest, ", "),
            ),
        ).otherwise(_bare_group(F.col("populationType"), name=True))
        out = tgt.select(
            F.col("node3").alias("node1"),
            node2_id.alias("node2"),
            node2_name.alias("node2name"),
            node3_id.alias("node3"),
            node3_name.alias("node3name"),
            "statvar",
            "populationType",
            "statVarProperties",
            F.col("newConstraintProperties").alias("constraintProperties"),
            drop_i(F.col("newConstraintProperties"), F.col("target_idx")).alias(
                "newConstraintProperties"
            ),
            rest.alias("attributes"),
            F.lit(it).alias("iteration"),
            "provenance",
        ).distinct()
        seen = (
            all_results.select(
                F.col("statvar").alias("_s_statvar"),
                F.col("node1").alias("_s_node1"),
                F.col("node2").alias("_s_node2"),
                F.col("node3").alias("_s_node3"),
            )
            .distinct()
        )
        new = out.join(
            seen,
            on=(
                (F.col("statvar") == F.col("_s_statvar"))
                & F.col("node1").eqNullSafe(F.col("_s_node1"))
                & F.col("node2").eqNullSafe(F.col("_s_node2"))
                & F.col("node3").eqNullSafe(F.col("_s_node3"))
            ),
            how="left_anti",
        ).localCheckpoint()
        if new.isEmpty():
            break
        all_results = all_results.unionByName(new).localCheckpoint()
        frontier = new

    # ------------------------------------------- vertical edges for SVs
    prov_gen = generated_provenance_expr(is_base_dc, F.col("provenance"))
    zero_attr = initial.filter(F.size("attributes") == 0)
    if should_filter:
        zero_attr = zero_attr.filter(_is_basic(F.col("populationType")))
    else:
        zero_attr = zero_attr.filter(F.lit(False))
    vs_zero = vertical_spec.filter(F.size("constraintProperties") == 0).select(
        F.col("populationType").alias("_pt"),
        F.col("svProp").alias("_svp"),
        F.col("vertical").alias("_vert"),
        F.col("linkedVertical").alias("_lv"),
    )
    zj = zero_attr.join(
        vs_zero,
        on=(
            (F.col("populationType") == F.col("_pt"))
            & (F.col("_svp").isNull() | (F.col("statVarProperties") == F.col("_svp")))
        ),
        how="left",
    )
    member_targets = F.when(
        F.size(F.coalesce("_vert", empty_arr)) == 0,
        F.array(F.lit(uncategorized_sv_svg)),
    ).otherwise(F.col("_vert"))
    linked_targets = F.when(
        F.size(F.coalesce("_lv", empty_arr)) == 0,
        F.array(
            F.lit(root_svg), F.lit(uncategorized_svg), F.lit(uncategorized_sv_svg)
        ),
    ).otherwise(F.col("_lv"))
    sv_vertical_edges = (
        zj.select(
            F.col("statvar").alias("subject_id"),
            prov_gen.alias("provenance"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("memberOf").alias("predicate"),
                        member_targets.alias("targets"),
                    ),
                    F.struct(
                        F.lit("linkedMemberOf").alias("predicate"),
                        linked_targets.alias("targets"),
                    ),
                )
            ).alias("_m"),
        )
        .select(
            "subject_id",
            F.col("_m.predicate").alias("predicate"),
            F.explode("_m.targets").alias("object_id"),
            "provenance",
        )
        .distinct()
    )

    # ------------------------------------------ vertical edges for SVGs
    basic_top = (
        all_results.filter(
            (F.col("iteration") > 0) & (F.size("constraintProperties") == 1)
        )
        .filter(_is_basic(F.col("populationType")) if should_filter else F.lit(False))
        .select(
            F.col("node2").alias("svg_id"),
            "statvar",
            "constraintProperties",
            "populationType",
            "provenance",
        )
    )
    nonbasic_top = (
        all_results.filter(
            F.col("node3").isNotNull() & (F.size("constraintProperties") == 0)
        )
        .filter(
            ~_is_basic(F.col("populationType")) if should_filter else F.lit(True)
        )
        .select(
            F.col("node3").alias("svg_id"),
            "statvar",
            empty_arr.alias("constraintProperties"),
            "populationType",
            "provenance",
        )
    )
    top_svgs = basic_top.unionByName(nonbasic_top).distinct()
    vs_keyed = vertical_spec.select(
        F.col("populationType").alias("_pt"),
        F.col("cprops_key").alias("_ck"),
        F.col("vertical").alias("_vert"),
        F.col("linkedVertical").alias("_lv"),
    ).distinct()
    base_joined = top_svgs.join(
        vs_keyed,
        on=(
            (F.col("populationType") == F.col("_pt"))
            & (F.array_join("constraintProperties", ",") == F.col("_ck"))
        ),
        how="left",
    ).select(
        "statvar",
        "svg_id",
        prov_gen.alias("provenance"),
        F.when(
            F.size(F.coalesce("_vert", empty_arr)) == 0,
            F.array(F.lit(uncategorized_svg)),
        )
        .otherwise(F.col("_vert"))
        .alias("svg_targets"),
        F.when(
            F.size(F.coalesce("_lv", empty_arr)) == 0,
            F.array(F.lit(root_svg), F.lit(uncategorized_svg)),
        )
        .otherwise(F.col("_lv"))
        .alias("statvar_targets"),
    ).localCheckpoint()
    raw_svg_edges = base_joined.select(
        F.col("svg_id").alias("subject_id"),
        F.lit("specializationOf").alias("predicate"),
        F.explode("svg_targets").alias("object_id"),
        "provenance",
    ).distinct()
    # drop the Uncategorized parent when the SVG has a categorized one
    wsvg = Window.partitionBy("subject_id", "predicate", "provenance")
    filtered_svg_edges = (
        raw_svg_edges.withColumn(
            "_cat",
            F.sum(
                F.when(F.col("object_id") != uncategorized_svg, 1).otherwise(0)
            ).over(wsvg),
        )
        .filter((F.col("object_id") != uncategorized_svg) | (F.col("_cat") == 0))
        .drop("_cat")
        .localCheckpoint()
    )
    raw_sv_edges = base_joined.select(
        F.col("statvar").alias("subject_id"),
        F.lit("linkedMemberOf").alias("predicate"),
        F.explode("statvar_targets").alias("object_id"),
        "provenance",
        F.col("svg_id").alias("parent_svg_id"),
    ).distinct()
    # keep an Uncategorized linkedMemberOf only when the parent SVG
    # itself landed in Uncategorized
    unc_parents = filtered_svg_edges.filter(
        F.col("object_id") == uncategorized_svg
    ).select(
        F.col("subject_id").alias("parent_svg_id"),
        F.col("provenance").alias("_p2"),
    ).distinct()
    filtered_sv_edges = (
        raw_sv_edges.join(
            unc_parents,
            on=(
                (raw_sv_edges["parent_svg_id"] == unc_parents["parent_svg_id"])
                & (raw_sv_edges["provenance"] == unc_parents["_p2"])
            ),
            how="left",
        )
        .filter(
            (F.col("object_id") != uncategorized_svg) | F.col("_p2").isNotNull()
        )
        .select("subject_id", "predicate", "object_id", "provenance")
        .distinct()
    )
    svg_vertical_edges = filtered_svg_edges.select(
        "subject_id", "predicate", "object_id", "provenance"
    ).unionByName(filtered_sv_edges)

    # ------------------------------------------------- nodes and edges
    n2name_node = _name_node_id(F.col("node2name"))
    n3name_node = _name_node_id(F.col("node3name"))
    svg_type = F.array(F.lit("StatVarGroup"))
    def _nstruct(sub, val, name, types, keep):
        return F.struct(
            sub.alias("subject_id"),
            val.alias("value"),
            name.alias("name"),
            types.alias("types"),
            keep.alias("keep"),
        )

    node_rows = (
        all_results.select(
            F.explode(
                F.array(
                    _nstruct(
                        F.col("node2"), F.col("node2"), F.col("node2name"),
                        svg_type, F.col("node2").isNotNull(),
                    ),
                    _nstruct(
                        F.col("node3"), F.col("node3"), F.col("node3name"),
                        svg_type, F.col("node3").isNotNull(),
                    ),
                    _nstruct(
                        n2name_node, F.col("node2name"), F.lit(""),
                        empty_arr, F.col("node2").isNotNull(),
                    ),
                    _nstruct(
                        n3name_node, F.col("node3name"), F.lit(""),
                        empty_arr, F.col("node3").isNotNull(),
                    ),
                )
            ).alias("n")
        )
        .filter(F.col("n.keep"))
        .select("n.subject_id", "n.value", "n.name", "n.types")
        .distinct()
    )
    def _estruct(sub, pred, obj, keep):
        return F.struct(
            sub.alias("subject_id"),
            pred.alias("predicate"),
            obj.alias("object_id"),
            keep.alias("keep"),
        )

    edge_rows = (
        all_results.select(
            prov_gen.alias("provenance"),
            F.explode(
                F.array(
                    _estruct(
                        F.col("statvar"), F.lit("memberOf"), F.col("node3"),
                        (F.col("iteration") == 0) & F.col("node3").isNotNull(),
                    ),
                    _estruct(
                        F.col("node2"), F.lit("typeOf"), F.lit("StatVarGroup"),
                        F.col("node2").isNotNull(),
                    ),
                    _estruct(
                        F.col("node2"), F.lit("name"), n2name_node,
                        F.col("node2").isNotNull(),
                    ),
                    _estruct(
                        F.col("node3"), F.lit("typeOf"), F.lit("StatVarGroup"),
                        F.col("node3").isNotNull(),
                    ),
                    _estruct(
                        F.col("node3"), F.lit("name"), n3name_node,
                        F.col("node3").isNotNull(),
                    ),
                    _estruct(
                        F.col("node1"), F.lit("specializationOf"), F.col("node2"),
                        F.col("node1").isNotNull() & F.col("node2").isNotNull(),
                    ),
                    _estruct(
                        F.col("node2"), F.lit("specializationOf"), F.col("node3"),
                        F.col("node2").isNotNull() & F.col("node3").isNotNull(),
                    ),
                    _estruct(
                        F.col("statvar"), F.lit("linkedMemberOf"), F.col("node2"),
                        F.col("node2").isNotNull(),
                    ),
                    _estruct(
                        F.col("statvar"), F.lit("linkedMemberOf"), F.col("node3"),
                        F.col("node3").isNotNull(),
                    ),
                )
            ).alias("e"),
        )
        .filter(F.col("e.keep"))
        .select("e.subject_id", "e.predicate", "e.object_id", "provenance")
        .distinct()
        .unionByName(sv_vertical_edges)
        .unionByName(svg_vertical_edges)
        .unionByName(curated_linked)
        .distinct()
        .localCheckpoint()
    )

    pruned = None
    if should_prune_single_child_svgs:
        from import_spark.operators.svg_hierarchy import prune_single_child_svgs

        generated_svgs = (
            all_results.select(F.col("node2").alias("svg_id"))
            .unionByName(all_results.select(F.col("node3").alias("svg_id")))
            .filter(F.col("svg_id").isNotNull())
            .distinct()
        )
        edge_rows, pruned = prune_single_child_svgs(edge_rows, generated_svgs)
        # drop every remaining edge and node touching a pruned SVG
        p_sub = pruned.withColumnRenamed("svg_id", "subject_id")
        p_obj = pruned.withColumnRenamed("svg_id", "object_id")
        edge_rows = edge_rows.join(p_sub, "subject_id", "left_anti").join(
            p_obj, "object_id", "left_anti"
        )
        node_rows = node_rows.join(p_sub, "subject_id", "left_anti")

    return SvgSpecResult(nodes=node_rows, edges=edge_rows, pruned_svgs=pruned)
