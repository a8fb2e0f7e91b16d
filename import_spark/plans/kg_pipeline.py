"""The end-to-end KG-construction pipeline over transcript tables.

Stage DAG (north rule; the Spark re-expression of
GraphIngestionPipeline.java:44-113 + Processor.java:59-147):

1. scan        — stable (conv_id, turn_idx) input; text-equality digest
2. extract     — vectorized statement extraction (operators/extract.py)
3. link        — broadcast entity linking (operators/link.py)
4. resolve     — iterative local-ref resolution + quarantine (operators/resolve.py)
5. canonicalize— sameAs connected components, min-dcid rewrite
6. merge       — single-shuffle dedupe, subject-hash layout, write

Every stage records counters into a metrics table
(``(run_id, stage, counter, value)`` — the LogWrapper counter model,
LogWrapper.java:50-68) and, when a checkpoint dir is given, persists
its output parquet so a re-run resumes from the last completed stage
(idempotent, the Wait.on/delete-before-write ordering of
GraphIngestionPipeline.java:273-316 collapses into driver-sequenced
stages + dynamic partition overwrite).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from import_spark.operators.canonicalize import canonicalize_triples, connected_components
from import_spark.operators.extract import extract_statements
from import_spark.operators.link import link_statements
from import_spark.operators.merge import dedupe_triples, drop_generic_types, materialize
from import_spark.operators.resolve import resolve_locals

FINAL_COLS = ["subj", "pred", "obj_type", "obj", "conv_id", "turn_idx"]


@dataclass
class PipelineResult:
    triples: DataFrame
    failed: DataFrame
    metrics: list[dict] = field(default_factory=list)
    text_digest_in: int = 0
    text_digest_out: int = 0


def text_digest(transcripts: DataFrame) -> int:
    """Order-independent digest of per-turn text under (conv_id, turn_idx)
    identity — the per-turn text-equality invariant (input_hint)."""
    row = transcripts.select(
        F.bit_xor(F.xxhash64("conv_id", "turn_idx", "text")).alias("d")
    ).collect()[0]
    return row["d"] or 0


class _Metrics:
    def __init__(self, run_id: str):
        self.run_id = run_id
        self.rows: list[dict] = []
        self._t0 = time.time()

    def add(self, stage: str, counter: str, value) -> None:
        self.rows.append(
            {
                "run_id": self.run_id,
                "stage": stage,
                "counter": counter,
                "value": int(value) if isinstance(value, bool) is False and value is not None else value,
                "elapsed_sec": round(time.time() - self._t0, 3),
            }
        )

    def add_df_counts(self, stage: str, df: DataFrame, key_col: str) -> None:
        for r in df.groupBy(key_col).count().collect():
            self.add(stage, r[key_col], r["count"])


def _ckpt_path(checkpoint_dir: str | None, run_id: str, stage: str) -> str | None:
    if not checkpoint_dir:
        return None
    return os.path.join(checkpoint_dir, run_id, stage)


def _stage_done(path: str | None) -> bool:
    return bool(path) and os.path.exists(os.path.join(path, "_SUCCESS"))


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    dcid_dict: DataFrame,
    out_dir: str | None = None,
    checkpoint_dir: str | None = None,
    run_id: str = "run0",
    num_partitions: int | None = None,
    check_generic_types: bool = False,
    num_buckets: int = 64,
    verify_text_invariant: bool = True,
) -> PipelineResult:
    m = _Metrics(run_id)

    # 1. scan
    din = text_digest(transcripts) if verify_text_invariant else 0
    m.add("scan", "text_digest", din)

    # 2-3. extract + link (narrow; one fused Python stage + broadcast join)
    ex_path = _ckpt_path(checkpoint_dir, run_id, "linked")
    if _stage_done(ex_path):
        linked = spark.read.parquet(ex_path)
        m.add("link", "resumed_from_checkpoint", 1)
    else:
        extracted = extract_statements(transcripts)
        linked = link_statements(extracted, dcid_dict)
        if ex_path:
            linked.write.mode("overwrite").parquet(ex_path)
            linked = spark.read.parquet(ex_path)
    linked = linked.cache()
    kind_counts = {r["kind"]: r["count"] for r in linked.groupBy("kind").count().collect()}
    for k, v in kind_counts.items():
        m.add("extract", f"rows_{k.lower()}", v)
    err_counts = (
        linked.filter(F.col("kind") == "ERROR").groupBy("pred").count().collect()
    )
    for r in err_counts:
        m.add("extract", r["pred"], r["count"])

    # 4. resolve
    res = resolve_locals(linked, num_partitions=num_partitions)
    resolved = res.resolved.cache()
    failed = res.failed.cache()
    m.add("resolve", "rounds", res.rounds)
    for r in failed.groupBy("error").count().collect():
        m.add("resolve", r["error"], r["count"])

    # 5. canonicalize
    same_as = resolved.filter(F.col("pred") == "sameAs").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    components = connected_components(same_as).cache()
    m.add("canonicalize", "nodes_rewritten", components.count())
    canon = canonicalize_triples(resolved, components)

    # 6. merge + materialize
    if check_generic_types:
        canon = drop_generic_types(canon)
    final = dedupe_triples(canon.select(*FINAL_COLS), num_partitions=num_partitions)
    if not out_dir:
        final = final.cache()
    if out_dir:
        materialize(final, os.path.join(out_dir, "triples"), num_buckets=num_buckets)
        final = spark.read.parquet(os.path.join(out_dir, "triples"))
        failed_cols = [c for c in failed.columns]
        failed.write.mode("overwrite").parquet(os.path.join(out_dir, "failed"))
        m.add("merge", "failed_cols", len(failed_cols))
    m.add("merge", "triples_final", final.count())
    # release intermediates: final (and failed) are materialized by now
    linked.unpersist()
    resolved.unpersist()
    components.unpersist()

    # invariant: input text unchanged under stable ordering
    dout = text_digest(transcripts) if verify_text_invariant else 0
    m.add("merge", "text_digest_out", dout)
    if verify_text_invariant and dout != din:
        raise AssertionError("per-turn text-equality invariant violated")

    if out_dir:
        with open(os.path.join(out_dir, f"metrics_{run_id}.json"), "w") as f:
            json.dump(m.rows, f, indent=1)

    return PipelineResult(
        triples=final, failed=failed, metrics=m.rows, text_digest_in=din, text_digest_out=dout
    )
