"""NL sentence + topic-cache generation for custom-DC imports.

Re-expresses ``/root/reference/simple/stats/nl.py:40-190`` (generate_nl_
sentences, generate_topic_cache, SentenceCandidates, TopicCacheNode)
and its Runner call shape (runner.py:812-830: sentences from
StatisticalVariable + Topic triples; topic cache from Topic +
StatVarPeerGroup triples) as DataFrame aggregations:

- ``sentences.csv``      per-subject sentence = searchDescription
  triples joined with ';' in input order, else the LAST name triple;
  subjects with neither are skipped; row order = first appearance of
  the subject in the triples stream.
- ``custom_catalog.yaml`` static catalog (nl_constants.py constants)
  pointing the serving stack at the embeddings CSV.
- ``custom_dc_topic_cache.json`` per-subject node JSON: typeOf/name
  appended per triple, relevantVariable(+List) / member(+List) merged
  into one ordered list (list-valued triples CSV-split and stripped).

The Vertex embedding call itself (embedding_generator.py) is a network
boundary and stays descoped; everything here is the pure-local text
generation the reference tests golden-check (nl_test.py).

Scale shape: one groupBy over the (dimension-sized) SV/Topic triple
set; sentence assembly is native collect_list/array_sort/array_join.
The topic-cache JSON is a serving artifact assembled driver-side from
the per-subject aggregate (bounded by the topic dimension, not data).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SENTENCE_SEPARATOR = ";"

# nl_constants.py (public catalog constants for the custom index)
CUSTOM_EMBEDDINGS_INDEX = "user_all_minilm_mem"
CUSTOM_MODEL = "ft-final-v20230717230459-all-MiniLM-L6-v2"
CUSTOM_MODEL_PATH = "gs://datcom-nl-models/ft_final_v20230717230459.all-MiniLM-L6-v2"

TYPE_STATISTICAL_VARIABLE = "StatisticalVariable"
TYPE_TOPIC = "Topic"
TYPE_STAT_VAR_PEER_GROUP = "StatVarPeerGroup"

_STRIP = lambda c: F.regexp_replace(F.regexp_replace(c, r"^\s+", ""), r"\s+$", "")  # noqa: E731


def _with_ord(triples: DataFrame, order_col: str | None) -> DataFrame:
    if order_col is not None:
        return triples.withColumn("_ord", F.col(order_col).cast("long"))
    # fall back to arrival order within the plan; deterministic for a
    # single-file scan / createDataFrame, which is the artifact shape
    return triples.withColumn("_ord", F.monotonically_increasing_id())


def subjects_of_type(triples: DataFrame, type_name: str) -> DataFrame:
    """Distinct subject_ids carrying ``typeOf → <type_name>`` (the
    object_id side, as in nl_test._without_*_triples)."""
    return (
        triples.filter(
            (F.col("predicate") == "typeOf") & (F.col("object_id") == type_name)
        )
        .select("subject_id")
        .distinct()
    )


def without_subject_type(triples: DataFrame, type_name: str) -> DataFrame:
    """Drop every triple of subjects typed ``type_name`` (the caller-side
    filter the reference applies before each generator)."""
    return triples.join(subjects_of_type(triples, type_name), "subject_id", "left_anti")


def only_subject_types(triples: DataFrame, type_names: list[str]) -> DataFrame:
    """Keep triples of subjects typed any of ``type_names`` (the
    Runner's select_triples_by_subject_type union, runner.py:812-820)."""
    subs = None
    for t in type_names:
        s = subjects_of_type(triples, t)
        subs = s if subs is None else subs.unionByName(s)
    return triples.join(subs.distinct(), "subject_id", "left_semi")


def nl_sentences(triples: DataFrame, order_col: str | None = None) -> DataFrame:
    """(subject_id, predicate, object_id, object_value) triples →
    (dcid, sentence) rows, ordered by first subject appearance.

    SentenceCandidates semantics (nl.py:131-155): all searchDescription
    values in input order joined with ';'; else the LAST name value;
    empty results dropped (nl.py:59-63 skips and warns).
    """
    t = _with_ord(triples, order_col)
    p = F.col("predicate")
    sd_struct = F.when(
        p == "searchDescription",
        F.struct(F.col("_ord").alias("o"), F.col("object_value").alias("v")),
    )
    agg = t.groupBy("subject_id").agg(
        F.min("_ord").alias("_first"),
        F.transform(
            F.array_sort(F.collect_list(sd_struct)), lambda s: s["v"]
        ).alias("_sds"),
        F.max_by(
            F.when(p == "name", F.col("object_value")),
            F.when(p == "name", F.col("_ord")),
        ).alias("_name"),
    )
    sentence = F.when(
        F.size("_sds") > 0, F.array_join("_sds", SENTENCE_SEPARATOR)
    ).otherwise(F.col("_name"))
    return (
        agg.withColumn("sentence", sentence)
        .filter(F.col("sentence").isNotNull() & (F.col("sentence") != ""))
        .orderBy("_first")
        .select(F.col("subject_id").alias("dcid"), "sentence")
    )


def _csv_field(v: str) -> str:
    """pandas ``to_csv`` minimal quoting (the reference writes the
    sentences frame through it, nl.py:66-71)."""
    if any(ch in v for ch in (',', '"', '\n', '\r')):
        return '"' + v.replace('"', '""') + '"'
    return v


def sentences_csv_text(sentences: DataFrame) -> str:
    """Bit-exact ``sentences.csv`` body (header + rows, trailing
    newline), matching the golden files byte for byte. An empty
    sentence set yields just ``"\\n"`` — the reference builds
    ``pd.DataFrame([])`` (no columns) and ``to_csv(index=False)``
    emits no header for it."""
    rows = sentences.collect()
    if not rows:
        return "\n"
    out = ["dcid,sentence"]
    for r in rows:
        out.append(f"{_csv_field(r['dcid'])},{_csv_field(r['sentence'])}")
    return "\n".join(out) + "\n"


def custom_catalog_dict(nl_dir: str, embeddings_path: str) -> dict:
    """The catalog structure of nl.py:110-130 (_catalog_dict)."""
    return {
        "version": "1",
        "indexes": {
            CUSTOM_EMBEDDINGS_INDEX: {
                "store_type": "MEMORY",
                "source_path": nl_dir,
                "embeddings_path": embeddings_path,
                "model": CUSTOM_MODEL,
            },
        },
        "models": {
            CUSTOM_MODEL: {
                "type": "LOCAL",
                "usage": "EMBEDDINGS",
                "gcs_folder": CUSTOM_MODEL_PATH,
                "score_threshold": 0.5,
            }
        },
    }


def custom_catalog_yaml(nl_dir: str, embeddings_path: str) -> str:
    import yaml

    return yaml.safe_dump(custom_catalog_dict(nl_dir, embeddings_path))


def topic_cache_nodes(triples: DataFrame, order_col: str | None = None) -> DataFrame:
    """Per-subject TopicCacheNode fields (nl.py:157-190) as a DataFrame:
    (subject_id, _first, types, names, relevant_vars, members) with
    every list in triple order and list-valued triples ("a, b") split
    on ',' and stripped."""
    t = _with_ord(triples, order_col)
    p = F.col("predicate")

    def ordered_vals(item_expr):
        return F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            item_expr.isNotNull(),
                            F.struct(F.col("_ord").alias("o"), item_expr.alias("i")),
                        )
                    )
                ),
                lambda s: s["i"],
            )
        )

    single = lambda pred, col: F.when(p == pred, F.array(F.col(col)))  # noqa: E731
    listed = lambda pred: F.when(  # noqa: E731
        p == pred, F.transform(F.split("object_value", ","), _STRIP)
    )
    return t.groupBy("subject_id").agg(
        F.min("_ord").alias("_first"),
        ordered_vals(single("typeOf", "object_id")).alias("types"),
        ordered_vals(single("name", "object_value")).alias("names"),
        ordered_vals(
            F.coalesce(
                single("relevantVariable", "object_id"),
                listed("relevantVariableList"),
            )
        ).alias("relevant_vars"),
        ordered_vals(
            F.coalesce(single("member", "object_id"), listed("memberList"))
        ).alias("members"),
    )


def topic_cache_json(triples: DataFrame, order_col: str | None = None) -> str:
    """``custom_dc_topic_cache.json`` content, byte-identical to the
    reference's ``json.dumps({"nodes": [...]}, indent=1)``."""
    nodes = []
    for r in topic_cache_nodes(triples, order_col).orderBy("_first").collect():
        node: dict = {"dcid": [r["subject_id"]]}
        if r["types"]:
            node["typeOf"] = list(r["types"])
        if r["names"]:
            node["name"] = list(r["names"])
        if r["relevant_vars"]:
            node["relevantVariableList"] = list(r["relevant_vars"])
        if r["members"]:
            node["memberList"] = list(r["members"])
        nodes.append(node)
    return json.dumps({"nodes": nodes}, indent=1)


def write_nl_outputs(
    triples: DataFrame,
    nl_dir: str,
    order_col: str | None = None,
    generate_topic_cache: bool = True,
) -> None:
    """Materialize the reference's NL artifact layout under ``nl_dir``:
    sentences.csv, embeddings/custom_catalog.yaml and (optionally)
    custom_dc_topic_cache.json — with the same caller-side type
    filtering AND type ordering as runner.py:812-830: the Runner
    concatenates ``topic_triples + sv_triples`` (and ``topic_triples +
    sv_peer_group_triples`` for the cache), so Topic subjects come
    FIRST in the artifacts regardless of the subjects' interleaving in
    the source triple stream; within a type group the original order
    is kept."""
    import os

    t = _with_ord(triples, order_col)

    def _type_ordered(type_names: list[str]) -> tuple[DataFrame, str]:
        """Runner-shaped concat: group triples by subject type in the
        given order, preserving source order within each group (one
        composite order column — type rank then original _ord)."""
        from pyspark.sql.window import Window

        parts = None
        for rank, name in enumerate(type_names):
            part = t.join(
                subjects_of_type(t, name), "subject_id", "left_semi"
            ).withColumn("_type_rank", F.lit(rank).cast("long"))
            parts = part if parts is None else parts.unionByName(part)
        # row_number over (type rank, source order) — robust to any
        # _ord magnitude (monotonically_increasing_id uses high bits);
        # the unpartitioned window is fine on this dimension-sized set
        out = parts.withColumn(
            "_runner_ord",
            F.row_number()
            .over(Window.orderBy("_type_rank", "_ord"))
            .cast("long"),
        )
        return out, "_runner_ord"

    os.makedirs(os.path.join(nl_dir, "embeddings"), exist_ok=True)
    sent_triples, sent_ord = _type_ordered([TYPE_TOPIC, TYPE_STATISTICAL_VARIABLE])
    with open(os.path.join(nl_dir, "sentences.csv"), "w") as f:
        f.write(sentences_csv_text(nl_sentences(sent_triples, sent_ord)))
    emb_path = os.path.join(nl_dir, "embeddings", "embeddings.csv")
    with open(os.path.join(nl_dir, "embeddings", "custom_catalog.yaml"), "w") as f:
        f.write(custom_catalog_yaml(nl_dir, emb_path))
    if generate_topic_cache:
        has_topics = (
            subjects_of_type(triples, TYPE_TOPIC).limit(1).count() > 0
        )
        if has_topics:
            cache_triples, cache_ord = _type_ordered(
                [TYPE_TOPIC, TYPE_STAT_VAR_PEER_GROUP]
            )
            with open(os.path.join(nl_dir, "custom_dc_topic_cache.json"), "w") as f:
                f.write(topic_cache_json(cache_triples, cache_ord))
