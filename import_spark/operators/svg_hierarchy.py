"""StatVar-hierarchy (SVG) generation — the Spark re-expression of
simple/stats/stat_var_hierarchy_generator.py:35-478.

Semantics: every StatisticalVariable with constraint PVs
``(p1=v1 … pk=vk)`` attaches (memberOf) to a leaf SVG identified by
``c/g/<PopType>_<P1>-<V1>_…``; parent SVGs are derived by dropping the
VALUE of one property at a time (a "prop without val" SVG, e.g.
``c/g/Person_Gender`` = persons of all genders), and from those by
dropping the valueless property entirely — a lattice walk that
terminates at the bare population-type SVG, which attaches to the
root (specializationOf). Names follow the reference's
capitalize-and-split-camel-case convention; over-long SVG ids get a
sha256 suffix (stat_var_hierarchy_generator.py:29-31,143-158).

Spark shape: the SV table collapses to DISTINCT (popType, pvs) combos
first — the only big-data step, one groupBy — then the lattice walk is
an iterative frontier expansion (explode one-val-dropped parents,
dropDuplicates per round, ≤ 2·max-#pvs rounds) entirely in DataFrame
ops. SVG counts are metadata-sized, so every round is tiny regardless
of SV count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_SVG_ID_LENGTH = 255
SVG_ID_HASH_LENGTH = 8
CUSTOM_SVG_PREFIX = "c/g/"
DEFAULT_CUSTOM_ROOT_SVG_ID = CUSTOM_SVG_PREFIX + "Root"
# schema_constants.py:53 TYPE_STATISTICAL_VARIABLE_GROUP — the emitted
# typeOf object is the short form, per the reference's own fixtures
STAT_VAR_GROUP_TYPE = "StatVarGroup"
DEFAULT_POPULATION_TYPE = "Thing"

SV_HIERARCHY_PROPS_BLOCKLIST = {
    "dcid", "typeOf", "isPublic", "provenance", "resMCFFile", "keyString",
    "populationType", "constraintProperties", "name", "label", "alternateName",
    "description", "descriptionUrl", "memberOf", "utteranceTemplate",
    "searchDescription", "source", "footnote", "isNormalizable",
    "denominatorForNormalization", "measuredProperty", "measurementMethod",
    "measurementDenominator", "measurementQualifier", "scalingFactor", "unit",
    "statType", "censusACSTableId", "includedIn", "observationProperties",
}


def _capitalize(c):
    """First letter upper, rest untouched (NOT initcap — the reference
    preserves inner camelCase, stat_var_hierarchy_generator.py:458-462)."""
    return F.concat(F.upper(F.substring(c, 1, 1)), F.substring(c, 2, 1_000_000))


def _token(c):
    """_to_dcid_token: strip non-alphanumerics, capitalize first letter."""
    t = F.regexp_replace(c, "[^0-9a-zA-Z]+", "")
    return _capitalize(t)


def _gen_name(c):
    """_capitalize_and_split: EnergySource → Energy Source."""
    return F.trim(F.regexp_replace(_capitalize(c), "([A-Z])", " $1"))


def _gen_name_py(dcid: str, dcid2name: dict[str, str] | None = None) -> str:
    """Driver-side twin of ``_gen_name`` with the dcid→name override
    (stat_var_hierarchy_generator.py _gen_name: the override is ALSO
    capitalize-and-split)."""
    import re

    s = (dcid2name or {}).get(dcid) or dcid
    s = s[:1].upper() + s[1:]
    return re.sub(r"([A-Z])", r" \1", s).strip()


def load_vertical_specs(data: str) -> list[dict]:
    """Parse the reference's vertical-spec JSON
    (``{"specs": [{"populationType", "measuredProperties",
    "verticals"}]}``, data.py VerticalSpec.from_json)."""
    import json

    return [
        {
            "populationType": s.get("populationType", DEFAULT_POPULATION_TYPE),
            "measuredProperties": set(s.get("measuredProperties", [])),
            "verticals": set(s.get("verticals", [])),
        }
        for s in json.loads(data).get("specs", [])
    ]


def _svg_id(pop_type, pvs):
    """c/g/<PopType>[_<Prop>-<Val>…] with sha256 suffix when over-long."""
    pv_part = F.transform(
        pvs,
        lambda pv: F.when(
            pv["val"] != "", F.concat(_token(pv["prop"]), F.lit("-"), _token(pv["val"]))
        ).otherwise(_token(pv["prop"])),
    )
    raw = F.concat_ws("_", F.array(F.concat(F.lit(CUSTOM_SVG_PREFIX), _token(pop_type))), pv_part)
    max_base = MAX_SVG_ID_LENGTH - SVG_ID_HASH_LENGTH - 1
    return F.when(
        F.length(raw) > MAX_SVG_ID_LENGTH,
        F.concat(
            F.substring(raw, 1, max_base),
            F.lit("-"),
            F.substring(F.sha2(raw, 256), 1, SVG_ID_HASH_LENGTH),
        ),
    ).otherwise(raw)


def _svg_name(pop_type, pvs):
    pv_names = F.transform(
        pvs,
        lambda pv: F.when(
            pv["val"] != "",
            F.concat(_gen_name(pv["prop"]), F.lit(" = "), _gen_name(pv["val"])),
        ).otherwise(_gen_name(pv["prop"])),
    )
    return F.when(
        F.size(pvs) > 0,
        F.concat(_gen_name(pop_type), F.lit(" With "), F.concat_ws(", ", pv_names)),
    ).otherwise(_gen_name(pop_type))


def extract_svs(sv_nodes: DataFrame, blocklist: set[str] | None = None) -> DataFrame:
    """Long-form SV node rows → (sv_id, pop_type, pvs) with pvs the
    prop-sorted constraint array (stat_var_hierarchy_generator.py:481-520)."""
    bl = sorted(blocklist or SV_HIERARCHY_PROPS_BLOCKLIST)
    sv_ids = (
        sv_nodes.filter((F.col("prop") == "typeOf") & (F.col("value") == "StatisticalVariable"))
        .select("node_id")
        .distinct()
    )
    rows = sv_nodes.join(sv_ids, "node_id")
    return rows.groupBy("node_id").agg(
        F.coalesce(
            F.min(F.when(F.col("prop") == "dcid", F.col("value"))), F.col("node_id")
        ).alias("sv_id"),
        F.coalesce(
            F.min(F.when(F.col("prop") == "populationType", F.col("value"))),
            F.lit(DEFAULT_POPULATION_TYPE),
        ).alias("pop_type"),
        F.sort_array(
            F.collect_set(
                F.when(
                    ~F.col("prop").isin(*bl),
                    F.struct(F.col("prop").alias("prop"), F.col("value").alias("val")),
                )
            )
        ).alias("pvs"),
    ).select("node_id", "sv_id", "pop_type", "pvs")


def generate_svg_hierarchy(
    sv_nodes: DataFrame,
    blocklist: set[str] | None = None,
    root_svg_id: str = DEFAULT_CUSTOM_ROOT_SVG_ID,
    max_rounds: int = 24,
    vertical_specs: list[dict] | None = None,
    dcid2name: dict[str, str] | None = None,
) -> DataFrame:
    """SV nodes → hierarchy triples
    (subject_id, predicate, object_id, object_value).

    Emitted per SVG: ``typeOf StatVarGroup``, ``name``,
    ``specializationOf <parent>`` (pop-type SVGs → the root); per SV:
    ``memberOf <leaf svg>`` — the reference's SVG.triples()
    (stat_var_hierarchy_generator.py:209-231).

    ``vertical_specs`` (load_vertical_specs output) reproduces
    _attach_verticals (stat_var_hierarchy_generator.py:279-310): a
    parentless pop-type SVG whose pop type matches a spec AND shares a
    measured property with it attaches under each of the spec's
    vertical SVGs (``c/g/<vertical>`` → root) instead of directly
    under the root; unmatched pop-type SVGs keep the root parent. The
    vertical attachment is config-driven metadata (pop types x specs),
    so it runs driver-side on collected tops — the lattice walk and
    the big SV collapse stay distributed."""
    svs = extract_svs(sv_nodes, blocklist)

    # the one big-data step: collapse SVs onto distinct leaf SVGs
    leaf = svs.withColumn("svg_id", _svg_id(F.col("pop_type"), F.col("pvs")))
    member_triples = leaf.select(
        F.col("sv_id").alias("subject_id"),
        F.lit("memberOf").alias("predicate"),
        F.col("svg_id").alias("object_id"),
        F.lit(None).cast("string").alias("object_value"),
    )
    frontier = (
        leaf.select("svg_id", "pop_type", "pvs")
        .withColumn("has_pwv", F.lit(False))
        .dropDuplicates(["svg_id"])
        .localCheckpoint()
    )
    seen = frontier.select("svg_id").localCheckpoint()
    all_svgs = frontier.localCheckpoint()
    edges = None

    for _ in range(max_rounds):
        if frontier.isEmpty():
            break
        # parents of all-values SVGs: drop the VALUE of one prop at a time
        with_vals = frontier.filter(~F.col("has_pwv") & (F.size("pvs") > 0))
        p1 = with_vals.select(
            "svg_id",
            "pop_type",
            F.explode(
                F.transform(
                    F.col("pvs"),
                    lambda pv, i: F.transform(
                        F.col("pvs"),
                        lambda pv2, j: F.when(
                            i == j,
                            F.struct(pv2["prop"].alias("prop"), F.lit("").alias("val")),
                        ).otherwise(pv2),
                    ),
                )
            ).alias("ppvs"),
        ).withColumn("has_pwv", F.lit(True))
        # parents of prop-without-val SVGs: drop the valueless prop
        pwv = frontier.filter(F.col("has_pwv"))
        p2 = pwv.select(
            "svg_id",
            "pop_type",
            F.filter(F.col("pvs"), lambda pv: pv["val"] != "").alias("ppvs"),
        ).withColumn("has_pwv", F.lit(False))
        parents = p1.unionByName(p2).withColumn(
            "parent_svg_id", _svg_id(F.col("pop_type"), F.col("ppvs"))
        )
        new_edges = parents.select(
            F.col("svg_id").alias("child"), F.col("parent_svg_id").alias("parent")
        ).dropDuplicates()
        edges = new_edges if edges is None else edges.unionByName(new_edges).dropDuplicates()
        edges = edges.localCheckpoint()
        new_svgs = (
            parents.select(
                F.col("parent_svg_id").alias("svg_id"),
                "pop_type",
                F.col("ppvs").alias("pvs"),
                "has_pwv",
            )
            .dropDuplicates(["svg_id"])
            .join(seen, "svg_id", "left_anti")
            .localCheckpoint()
        )
        seen = seen.unionByName(new_svgs.select("svg_id")).localCheckpoint()
        all_svgs = all_svgs.unionByName(new_svgs).localCheckpoint()
        frontier = new_svgs

    # SVG info triples
    info = all_svgs.select(
        F.col("svg_id").alias("subject_id"),
        F.col("pop_type"),
        F.col("pvs"),
    )
    type_triples = info.select(
        "subject_id",
        F.lit("typeOf").alias("predicate"),
        F.lit(STAT_VAR_GROUP_TYPE).alias("object_id"),
        F.lit(None).cast("string").alias("object_value"),
    )
    name_triples = info.select(
        "subject_id",
        F.lit("name").alias("predicate"),
        F.lit(None).cast("string").alias("object_id"),
        _svg_name(F.col("pop_type"), F.col("pvs")).alias("object_value"),
    )
    # specializationOf: child → parent; pop-type tops → root
    spec = (edges if edges is not None else frontier.limit(0).select(
        F.col("svg_id").alias("child"), F.col("svg_id").alias("parent"))
    ).select(
        F.col("child").alias("subject_id"),
        F.lit("specializationOf").alias("predicate"),
        F.col("parent").alias("object_id"),
        F.lit(None).cast("string").alias("object_value"),
    )
    tops_df = all_svgs.join(
        (edges.select(F.col("child").alias("svg_id")) if edges is not None else all_svgs.limit(0).select("svg_id")),
        "svg_id",
        "left_anti",
    ).select("svg_id", "pop_type")

    spark = sv_nodes.sparkSession
    extra_rows: list[tuple] = []
    attached_tops: set[str] = set()
    if vertical_specs:
        # pop type → union of descendant SVs' measured properties
        # (_add_measured_properties_to_parent_svgs rolls every SV's
        # mprop up to its parentless pop-type SVG, so the rollup equals
        # a per-pop-type distinct)
        sv_mp = sv_nodes.filter(F.col("prop") == "measuredProperty").select(
            "node_id", F.col("value").alias("mprop")
        )
        pop2mp = {
            r["pop_type"]: set(r["mprops"])
            for r in svs.select("node_id", "pop_type")
            .join(sv_mp, "node_id")
            .groupBy("pop_type")
            .agg(F.collect_set("mprop").alias("mprops"))
            .collect()
        }
        top_by_pop = {r["pop_type"]: r["svg_id"] for r in tops_df.collect()}
        vertical_ids: list[str] = []
        for spec_d in vertical_specs:
            top_id = top_by_pop.get(spec_d["populationType"])
            if not top_id:
                continue
            if not (spec_d["measuredProperties"] & pop2mp.get(spec_d["populationType"], set())):
                continue
            for vertical in sorted(spec_d["verticals"]):
                vid = CUSTOM_SVG_PREFIX + vertical
                if vid not in vertical_ids:
                    vertical_ids.append(vid)
                    extra_rows += [
                        (vid, "typeOf", STAT_VAR_GROUP_TYPE, None),
                        (vid, "name", None, _gen_name_py(vertical, dcid2name)),
                        (vid, "specializationOf", root_svg_id, None),
                    ]
                extra_rows.append((top_id, "specializationOf", vid, None))
                attached_tops.add(top_id)

    root_src = tops_df
    if attached_tops:
        root_src = tops_df.filter(~F.col("svg_id").isin(*sorted(attached_tops)))
    tops = root_src.select(
        F.col("svg_id").alias("subject_id"),
        F.lit("specializationOf").alias("predicate"),
        F.lit(root_svg_id).alias("object_id"),
        F.lit(None).cast("string").alias("object_value"),
    )
    out = (
        type_triples.unionByName(name_triples)
        .unionByName(spec)
        .unionByName(tops)
        .unionByName(member_triples)
    )
    if extra_rows:
        out = out.unionByName(
            spark.createDataFrame(
                extra_rows,
                "subject_id string, predicate string, object_id string, object_value string",
            )
        )
    return out


def prune_single_child_svgs(
    edges: DataFrame,
    generated_svgs: DataFrame,
    max_iterations: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """Prune generated SVGs with at most one child, rewiring surviving
    children to their nearest non-pruned ancestor.

    Reference: the pipeline StatVarGroup generator's pruning pass
    (pipeline/workflow/aggregation-helper/aggregation/
    stat_var_group_generator.py:730-870): the prunable set grows
    iteratively — a generated SVG whose DISTINCT child count in the
    bypass-updated parent-child graph is <= 1 (including 0: empty
    groups) becomes prunable, which can drop an ancestor's count to
    <= 1 on the next round (<= ``max_iterations`` rounds, the
    reference's cap). Each surviving child of a pruned SVG is
    redirected to every non-prunable ancestor reachable through
    prunable chains (ALL DAG paths), predicate preserved, unless that
    edge already exists. Every edge touching a pruned SVG — including
    ``linkedMemberOf`` pointers — is dropped. Only generated SVGs are
    prunable; verticals/root/uncategorized are never in
    ``generated_svgs``.

    Spark shape: the SVG edge set is tiny next to the data tables, so
    the loops are cheap; each round's frontier is localCheckpointed to
    keep plans flat, mirroring the hierarchy walk above. Returns
    ``(pruned_edges, pruned_svg_ids)``.
    """
    pred = F.col("predicate")
    pc = (
        edges.where(pred.isin("specializationOf", "memberOf"))
        .select(
            F.col("subject_id").alias("child"),
            F.col("object_id").alias("parent"),
            "predicate",
        )
        .distinct()
        .localCheckpoint()
    )
    gen = generated_svgs.select("svg_id").distinct().localCheckpoint()
    spark = edges.sparkSession
    prunable = spark.createDataFrame([], "svg_id string")
    current = pc

    def _bypass(prunable_df: DataFrame) -> DataFrame:
        """Rebuild the parent-child graph from the ORIGINAL edges with
        prunable nodes bypassed (the recursive Walk CTE)."""
        walk = pc
        hops = pc.select(
            F.col("child").alias("_via"), F.col("parent").alias("_up")
        ).join(prunable_df.withColumnRenamed("svg_id", "_via"), "_via")
        for _ in range(max_iterations):
            ext = (
                walk.join(hops, walk["parent"] == hops["_via"])
                .select("child", F.col("_up").alias("parent"), "predicate")
            )
            grown = walk.unionByName(ext).distinct().localCheckpoint()
            if grown.count() == walk.count():
                walk = grown
                break
            walk = grown
        return (
            walk.join(prunable_df.withColumnRenamed("svg_id", "parent"), "parent", "left_anti")
            .join(prunable_df.withColumnRenamed("svg_id", "child"), "child", "left_anti")
        )

    for _ in range(max_iterations):
        cand = gen.join(prunable, "svg_id", "left_anti")
        new = (
            cand.join(current, cand["svg_id"] == current["parent"], "left")
            .groupBy("svg_id")
            .agg(F.countDistinct("child").alias("_n"))
            .where(F.col("_n") <= 1)
            .select("svg_id")
            .localCheckpoint()
        )
        if new.isEmpty():
            break
        prunable = prunable.unionByName(new).distinct().localCheckpoint()
        current = _bypass(prunable)

    if prunable.isEmpty():
        return edges, prunable

    # effective parents: walk up from children of pruned SVGs through
    # prunable chains to every non-prunable ancestor (all DAG paths)
    p_parent = prunable.withColumnRenamed("svg_id", "parent")
    ep = (
        pc.join(p_parent, "parent")
        .select(
            F.col("child").alias("node_id"),
            F.col("parent").alias("effective_parent"),
            "predicate",
        )
        .localCheckpoint()
    )
    up = pc.select(F.col("child").alias("_via"), F.col("parent").alias("_up")).join(
        prunable.withColumnRenamed("svg_id", "_via"), "_via"
    )
    for _ in range(max_iterations):
        ext = (
            ep.join(up, ep["effective_parent"] == up["_via"])
            .select("node_id", F.col("_up").alias("effective_parent"), "predicate")
        )
        grown = ep.unionByName(ext).distinct().localCheckpoint()
        if grown.count() == ep.count():
            ep = grown
            break
        ep = grown
    ep = ep.join(
        prunable.withColumnRenamed("svg_id", "effective_parent"), "effective_parent", "left_anti"
    ).join(prunable.withColumnRenamed("svg_id", "node_id"), "node_id", "left_anti")

    # redirected edges: provenance (and any other columns) from the
    # original edge into a pruned parent; skip already-existing edges
    extra_cols = [c for c in edges.columns if c not in ("subject_id", "predicate", "object_id")]
    orig_into_pruned = edges.join(
        prunable.withColumnRenamed("svg_id", "object_id"), "object_id"
    ).select(
        F.col("subject_id").alias("node_id"),
        "predicate",
        *extra_cols,
    )
    redirected = (
        ep.join(orig_into_pruned, ["node_id", "predicate"])
        .select(
            F.col("node_id").alias("subject_id"),
            "predicate",
            F.col("effective_parent").alias("object_id"),
            *extra_cols,
        )
        .distinct()
        .join(
            edges.select("subject_id", "predicate", "object_id"),
            ["subject_id", "predicate", "object_id"],
            "left_anti",
        )
    )
    kept = edges.join(
        prunable.withColumnRenamed("svg_id", "subject_id"), "subject_id", "left_anti"
    ).join(prunable.withColumnRenamed("svg_id", "object_id"), "object_id", "left_anti")
    return kept.select(*edges.columns).unionByName(redirected.select(*edges.columns)), prunable
