"""The end-to-end KG-construction pipeline over transcript tables.

Stage DAG (north rule; the Spark re-expression of
GraphIngestionPipeline.java:44-113 + Processor.java:59-147):

1. scan        — stable (conv_id, turn_idx) input; text-equality digest
2. extract     — vectorized statement extraction (operators/extract.py)
3. link        — broadcast entity linking (operators/link.py)
4. resolve     — iterative local-ref resolution + quarantine (operators/resolve.py)
5. canonicalize— sameAs connected components, min-dcid rewrite
6. merge       — single-shuffle dedupe, subject-hash layout, write

Pass discipline (what makes this scale): the extracted+linked statement
set is materialized ONCE as a columnar snapshot (zstd parquet — the
in-sandbox stand-in for an Iceberg stage table); every later consumer
is a column-pruned, predicate-pushed scan of that snapshot instead of a
JVM-object cache (deserialized caches of wide string rows are GC poison
at high core counts). The big table is shuffled exactly once (dedupe)
and the final row count comes from parquet metadata, not a recount.

Every stage records counters into a metrics list
(``(run_id, stage, counter, value)`` — the LogWrapper counter model,
LogWrapper.java:50-68) and the snapshot makes re-runs resume past
extract+link (idempotent; the Wait.on/delete-before-write ordering of
GraphIngestionPipeline.java:273-316 collapses into driver-sequenced
stages + dynamic partition overwrite).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from import_spark.operators.canonicalize import (
    BROADCAST_CC_MAX_ROWS,
    canonicalize_triples,
    connected_components,
    connected_components_fast,
)
from import_spark.operators.extract import extract_and_link
from import_spark.operators.link import dcid_map_from_df
from import_spark.operators.merge import (
    dedupe_and_materialize,
    dedupe_triples,
    drop_generic_types,
)
from import_spark.operators.resolve import resolve_locals, resolve_locals_fast

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
                "value": int(value) if value is not None else None,
                "elapsed_sec": round(time.time() - self._t0, 3),
            }
        )


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
    keep_snapshot: bool | None = None,
) -> PipelineResult:
    m = _Metrics(run_id)

    # 1. scan
    din = text_digest(transcripts) if verify_text_invariant else 0
    m.add("scan", "text_digest", din)

    # 2-3. extract + link: one fused Python stage + broadcast join,
    # materialized ONCE as a columnar snapshot
    if checkpoint_dir:
        snap = os.path.join(checkpoint_dir, run_id, "linked")
        keep = True if keep_snapshot is None else keep_snapshot
    else:
        snap = os.path.join(tempfile.gettempdir(), f"import_spark_snap_{run_id}_{os.getpid()}")
        keep = False if keep_snapshot is None else keep_snapshot
    # Resume is only valid if the snapshot was built from the SAME
    # inputs: persist (text digest, dcid-dict digest) alongside it and
    # compare before trusting _SUCCESS (stale run_id reuse otherwise
    # silently serves an old extract+link).
    dict_digest = (
        dcid_dict.select(F.bit_xor(F.xxhash64(*dcid_dict.columns)).alias("d")).collect()[0]["d"]
        or 0
    )
    digest_path = os.path.join(snap, "_input_digest.json")
    cur_digest = {"text_digest": din, "dict_digest": dict_digest}
    resume_ok = False
    if os.path.exists(os.path.join(snap, "_SUCCESS")) and os.path.exists(digest_path):
        with open(digest_path) as f:
            resume_ok = json.load(f) == cur_digest
    if resume_ok:
        m.add("link", "resumed_from_checkpoint", 1)
    else:
        linked_plan = extract_and_link(transcripts, dcid_map_from_df(dcid_dict))
        # kind-partitioned snapshot: DEF/ERROR scans touch only their
        # (tiny) files; TRIPLE scans skip them
        linked_plan.write.mode("overwrite").partitionBy("kind").parquet(snap)
        with open(digest_path, "w") as f:
            json.dump(cur_digest, f)
    linked = spark.read.parquet(snap)

    # counters: one pruned scan (kind), one pushdown scan (rare ERROR rows)
    for r in linked.groupBy("kind").count().collect():
        m.add("extract", f"rows_{r['kind'].lower()}", r["count"])
    err_counts = (
        linked.filter(F.col("kind") == "ERROR").groupBy("pred").count().collect()
    )
    for r in err_counts:
        m.add("extract", r["pred"], r["count"])

    # 4. resolve (the DEF counter sizes its broadcast decision — no extra job)
    kind_counts = {
        r["counter"]: r["value"] for r in m.rows if r["counter"].startswith("rows_")
    }
    n_defs = kind_counts.get("rows_def", None)
    res = resolve_locals_fast(linked, approx_defs=n_defs) or resolve_locals(
        linked, num_partitions=num_partitions, approx_defs=n_defs
    )
    resolved = res.resolved
    failed = res.failed.localCheckpoint()
    m.add("resolve", "rounds", res.rounds)
    for r in failed.groupBy("error").count().collect():
        m.add("resolve", r["error"], r["count"])

    # 5. canonicalize (sameAs edges: one pruned scan of the snapshot)
    same_as = resolved.filter(F.col("pred") == "sameAs").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    fast_cc = connected_components_fast(same_as)
    components = (fast_cc if fast_cc is not None else connected_components(same_as)).localCheckpoint()
    n_components = components.count()
    m.add("canonicalize", "nodes_rewritten", n_components)
    # reuse the counter for the broadcast size gate — no extra job
    canon = canonicalize_triples(
        resolved, components, broadcast_map=n_components <= BROADCAST_CC_MAX_ROWS
    )

    # 6. merge + materialize (the single big shuffle IS the write layout)
    if check_generic_types:
        canon = drop_generic_types(canon)
    if out_dir:
        tri_path = os.path.join(out_dir, "triples")
        dedupe_and_materialize(
            canon.select(*FINAL_COLS),
            tri_path,
            num_buckets=num_buckets,
            num_partitions=num_partitions,
        )
        final = spark.read.parquet(tri_path)
        failed.write.mode("overwrite").parquet(os.path.join(out_dir, "failed"))
    else:
        final = dedupe_triples(
            canon.select(*FINAL_COLS), num_partitions=num_partitions
        ).cache()
    # parquet metadata count (no recompute) when materialized
    m.add("merge", "triples_final", final.count())

    # invariant: input text unchanged under stable ordering
    dout = text_digest(transcripts) if verify_text_invariant else 0
    m.add("merge", "text_digest_out", dout)
    if verify_text_invariant and dout != din:
        raise AssertionError("per-turn text-equality invariant violated")

    if out_dir:
        with open(os.path.join(out_dir, f"metrics_{run_id}.json"), "w") as f:
            json.dump(m.rows, f, indent=1)
    if not keep and os.path.exists(snap):
        shutil.rmtree(snap, ignore_errors=True)

    return PipelineResult(
        triples=final, failed=failed, metrics=m.rows, text_digest_in=din, text_digest_out=dout
    )
