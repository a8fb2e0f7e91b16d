"""The end-to-end KG-construction pipeline over transcript tables.

Stage DAG (north rule; the Spark re-expression of
GraphIngestionPipeline.java:44-113 + Processor.java:59-147):

1. scan        — stable (conv_id, turn_idx) input; text-equality digest
2. extract     — vectorized statement extraction (operators/extract.py)
3. link        — broadcast entity linking (operators/link.py)
4. resolve     — iterative local-ref resolution + quarantine (operators/resolve.py)
5. canonicalize— sameAs connected components, min-dcid rewrite
6. merge       — single-shuffle dedupe, subject-hash layout, write

Pass discipline (what makes this scale): only the NARROW statement
classes (DEF/ERROR/sameAs/local-ref — ~5% of rows) are materialized;
the fat plain-triple rows (~95%) are never stored. Their single
consumer — the fused resolve+canonicalize+dedupe+write pass —
re-runs the extraction scan streaming straight into the dedupe
shuffle. Extraction is a narrow, deterministic, whole-stage-codegen'd
pass (simple anchors never leave the JVM), so the recompute costs CPU
that scales with cores, where caching the statement table costs a
columnar write+read of ~20x the bytes — pure memory bandwidth, which
a single box does NOT scale with cores and a 100 TB run could not
hold at all. With a checkpoint_dir the extract+link output IS
materialized once, as a class-partitioned zstd-parquet snapshot (the
in-sandbox stand-in for an Iceberg stage table) for cross-process
resumability; narrow passes then read only their tiny partitions.
Either way the big table is shuffled exactly once (dedupe) and the
final row count comes from parquet metadata, not a recount.

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
from import_spark.operators.extract import FUSED_SCHEMA, extract_and_link, extract_statements
from import_spark.operators.link import dcid_map_from_df, link_statements
from import_spark.operators.merge import (
    dedupe_and_materialize,
    dedupe_triples,
    drop_generic_types,
)
from import_spark.operators.resolve import resolve_defs_fast, resolve_locals
from import_spark.plans.lineage import write_stage_lineage

FINAL_COLS = ["subj", "pred", "obj_type", "obj", "conv_id", "turn_idx"]

# Statement-class column for the single materialization of the
# extract+link output. Every later pass filters on this ONE int
# column, so both materialization modes prune to the rows the pass
# actually needs instead of re-scanning the fat statement table:
#  - parquet snapshot: `_cls` is the partition column (partition
#    pruning — the DEF/ERROR/sameAs/local scans touch only their
#    tiny files; finer than the earlier kind= layout);
#  - in-memory cache: the extract output is sorted within partitions
#    by `_cls`, so the columnar cache's 10k-row batches are
#    class-homogeneous and the cache scan's batch-stat pruning
#    (min/max on `_cls`) skips the ~95% plain-triple batches for
#    every narrow pass.
# Plain triples (cls 0) are ~95% of rows at any scale (measured 46.0M
# of 48.6M at 1M conversations), so the narrow passes drop from full
# scans to ~5% scans; only the final merge pass reads cls<=2 in full.
CLS_TRIPLE, CLS_LOCAL, CLS_SAMEAS, CLS_DEF, CLS_ERROR = 0, 1, 2, 3, 4
_CLS_KIND = {CLS_TRIPLE: "TRIPLE", CLS_LOCAL: "TRIPLE", CLS_SAMEAS: "TRIPLE",
             CLS_DEF: "DEF", CLS_ERROR: "ERROR"}


def _with_cls(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "_cls",
        F.when(F.col("kind") == "DEF", F.lit(CLS_DEF))
        .when(F.col("kind") == "ERROR", F.lit(CLS_ERROR))
        .when(F.col("pred") == "sameAs", F.lit(CLS_SAMEAS))
        .when(F.col("obj_type") == "UNRESOLVED_REF", F.lit(CLS_LOCAL))
        .otherwise(F.lit(CLS_TRIPLE)),
    )


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


def dict_digest(dcid_dict: DataFrame) -> int:
    """Order-independent digest of the dcid dictionary — the other half
    of the snapshot resume marker. ONE definition, shared with the
    streaming ingest (streaming/incremental.py): a silent formula
    divergence would make the digests never match and the resume
    fast-path quietly regenerate every run."""
    row = dcid_dict.select(
        F.bit_xor(F.xxhash64(*dcid_dict.columns)).alias("d")
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


# The fused extract+link carries the dictionary as a JVM map literal
# (one py4j-built expression pair per entry, extract.py:427-428) and a
# Python closure — both driver-side structures whose practical limit is
# ENTRY COUNT, not the collect byte budget. Above it, the pipeline
# falls back to the unfused extract + link JOIN (broadcast while the
# dictionary fits the broadcast budget, hot-key salted shuffle beyond —
# operators/skew.py), which is the only shape a multi-GB Recon map can
# take at 10^12-turn scale.
FUSED_DICT_MAX_ROWS = 10_000


def _resolve_link_strategy(dcid_dict: DataFrame, requested: str) -> str:
    if requested in ("fused", "broadcast", "salted"):
        return requested
    if requested != "auto":
        raise ValueError(f"unknown link_strategy {requested!r}")
    from import_spark.functions.size_gate import (
        BROADCAST_BUDGET_BYTES,
        DRIVER_COLLECT_BUDGET_BYTES,
        fits_bytes,
    )

    n = dcid_dict.count()
    if n <= FUSED_DICT_MAX_ROWS and fits_bytes(
        dcid_dict, n, DRIVER_COLLECT_BUDGET_BYTES
    ):
        return "fused"
    if fits_bytes(dcid_dict, n, BROADCAST_BUDGET_BYTES):
        return "broadcast"
    return "salted"


def _join_strategy_for(dcid_dict: DataFrame) -> str:
    """broadcast vs salted for a dictionary that cannot be a driver
    closure: broadcast while it fits the executor broadcast budget,
    hot-key salted shuffle beyond."""
    from import_spark.functions.size_gate import BROADCAST_BUDGET_BYTES, fits_bytes

    n = dcid_dict.count()
    return "broadcast" if fits_bytes(dcid_dict, n, BROADCAST_BUDGET_BYTES) else "salted"


def _link_plan(
    transcripts: DataFrame,
    dcid_dict: DataFrame,
    strategy: str,
    narrow_only: bool = False,
    dmap: dict | None = None,
) -> DataFrame:
    """The extract+link stage under the resolved strategy. ``fused`` is
    the closure-dictionary hot path; the join strategies produce the
    same columns/rows via the unfused pair (equality asserted in
    test_pipeline_e2e), without the narrow-only elision — the
    downstream ``_cls`` filter prunes the same rows."""
    if strategy == "fused":
        if dmap is None:
            from import_spark.operators.link import DictionaryOverBudget

            try:
                dmap = dcid_map_from_df(dcid_dict)
            except DictionaryOverBudget:
                # explicit "fused" with an over-budget dictionary:
                # degrade to the join path rather than OOM the driver
                # (auto mode never picks fused in this regime —
                # _resolve_link_strategy's size gate)
                strategy = _join_strategy_for(dcid_dict)
        if dmap is not None:
            return extract_and_link(transcripts, dmap, narrow_only=narrow_only)
    cols = [f.name for f in FUSED_SCHEMA.fields]
    return link_statements(
        extract_statements(transcripts), dcid_dict, strategy=strategy
    ).select(*cols)


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
    link_strategy: str = "auto",
) -> PipelineResult:
    m = _Metrics(run_id)
    link_strategy = _resolve_link_strategy(dcid_dict, link_strategy)
    # resolve the fused driver dict UP FRONT so the recorded strategy is
    # the one that actually runs: an explicit "fused" request over the
    # driver budget degrades to the join path here, not mid-plan
    dmap = None
    if link_strategy == "fused":
        from import_spark.operators.link import DictionaryOverBudget

        try:
            dmap = dcid_map_from_df(dcid_dict)
        except DictionaryOverBudget:
            link_strategy = _join_strategy_for(dcid_dict)
    m.add("link", f"strategy_{link_strategy}", 1)
    # per-partition lineage lands next to the checkpoint (or, without
    # one, the output) — one (run_id, stage)-partitioned parquet table
    lin_dir = (
        os.path.join(checkpoint_dir or out_dir, "lineage")
        if (checkpoint_dir or out_dir)
        else None
    )

    # 1. scan
    din = text_digest(transcripts) if verify_text_invariant else 0
    m.add("scan", "text_digest", din)

    # 2-3. extract + link: fused JVM projection + Python stage for the
    # parse-heavy turn subset (operators/extract.py). With a
    # checkpoint_dir the full output is snapshotted once as a
    # class-partitioned parquet table (resumable across processes;
    # narrow scans touch only their tiny partitions). Without one,
    # only the narrow classes are persisted and the fat triples are
    # recomputed by their single consumer (see module docstring).
    snap = None
    keep = False
    if checkpoint_dir:
        snap = os.path.join(checkpoint_dir, run_id, "linked")
        keep = True if keep_snapshot is None else keep_snapshot
        # Resume is only valid if the snapshot was built from the SAME
        # inputs: persist (text digest, dcid-dict digest) alongside it
        # and compare before trusting the files (stale run_id reuse
        # otherwise silently serves an old extract+link). The digest
        # file doubles as the success marker — it is renamed into
        # place only AFTER the parquet write returns (the dynamic
        # partition-overwrite committer writes no _SUCCESS file).
        digest_path = os.path.join(snap, "_input_digest.json")
        cur_digest = {"text_digest": din, "dict_digest": dict_digest(dcid_dict)}
        resume_ok = False
        if os.path.exists(digest_path):
            with open(digest_path) as f:
                resume_ok = json.load(f) == cur_digest
        if resume_ok:
            m.add("link", "resumed_from_checkpoint", 1)
        else:
            # stale/absent marker: the snapshot dir is a derived
            # artifact — remove it WHOLE before regenerating. A
            # partial dynamic overwrite into a directory laid out by a
            # different partitioning (the streamed snapshot uses
            # (_b, _cls); this writer uses (_cls)) would leave
            # mixed-depth partition dirs that break discovery.
            if os.path.exists(snap):
                shutil.rmtree(snap, ignore_errors=True)
            linked_plan = _with_cls(
                _link_plan(transcripts, dcid_dict, link_strategy, dmap=dmap)
            )
            (
                linked_plan.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_cls")
                .parquet(snap)
            )
            tmp_digest = digest_path + ".tmp"
            with open(tmp_digest, "w") as f:
                json.dump(cur_digest, f)
            os.replace(tmp_digest, digest_path)
            if lin_dir:
                write_stage_lineage(spark, snap, lin_dir, run_id, "link", part_col="_cls")
                m.add("link", "lineage_written", 1)
        linked = spark.read.parquet(snap)
    else:
        # In-memory mode: persist ONLY the narrow classes (~5% of rows —
        # DEF/ERROR/sameAs/local; measured 2.6M of 48.6M at 1M convs).
        # The fat plain-triple rows are NOT cached: their single
        # consumer (the fused resolve+canonicalize+dedupe+write pass)
        # re-runs the extraction streaming straight into the dedupe
        # shuffle. Extraction is a narrow, deterministic, codegen'd
        # scan (simple anchors never leave the JVM), so recomputing it
        # costs CPU that scales with cores, while caching 95% of the
        # statement table costs a full columnar write+read — pure
        # memory bandwidth, the one resource that does NOT scale with
        # cores on a box (and at 100 TB the fat intermediate could
        # never be cached at all; persisting small side-outputs and
        # recomputing narrow lineage is the only design that survives).
        full = _with_cls(_link_plan(transcripts, dcid_dict, link_strategy, dmap=dmap))
        linked = None
        narrow = (
            _with_cls(
                _link_plan(
                    transcripts, dcid_dict, link_strategy, narrow_only=True, dmap=dmap
                )
            )
            .filter(F.col("_cls") >= CLS_LOCAL)
            .persist()
        )

    # counters. Snapshot mode: per-class totals read ONLY the `_cls`
    # partition column. In-memory mode: the narrow cache holds classes
    # 1-4; the fat-triple total is collected for free during the big
    # pass via an Observation on the recomputed stream (no extra job).
    obs = None
    if linked is not None:
        cls_counts = {r["_cls"]: r["count"] for r in linked.groupBy("_cls").count().collect()}
        narrow_src = linked
    else:
        cls_counts = {r["_cls"]: r["count"] for r in narrow.groupBy("_cls").count().collect()}
        narrow_src = narrow
    kind_counts: dict[str, int] = {}
    for c, n in cls_counts.items():
        k = _CLS_KIND[c]
        kind_counts[k] = kind_counts.get(k, 0) + n
    for k in sorted(kind_counts):
        if k == "TRIPLE" and linked is None:
            continue  # deferred to the Observation on the big pass
        m.add("extract", f"rows_{k.lower()}", kind_counts[k])
    for r in narrow_src.filter(F.col("_cls") == CLS_ERROR).groupBy("pred").count().collect():
        m.add("extract", r["pred"], r["count"])

    # 4-6. resolve → canonicalize → merge.
    #
    # Fast path (defs fit the driver gate — the common shape: locals are
    # bounded per conversation): the def fixpoint runs driver-side and
    # every downstream consumer is a broadcast join. With the `_cls`
    # clustering, the ONLY pass that touches the fat plain-triple rows
    # is the final fused resolve+canonicalize+dedupe+write; the
    # def-collect, sameAs-edge and failed-quarantine passes all prune
    # to their ~5% classes. The distributed fallback (defs above the
    # gate) keeps the iterative resolver loop.
    n_defs = kind_counts.get("DEF", 0)
    fat_src = linked if linked is not None else full
    triples = fat_src.filter(F.col("_cls") <= CLS_SAMEAS).drop("_cls")
    if linked is None:
        from pyspark.sql import Observation

        obs = Observation("extract")
        triples = triples.observe(obs, F.count(F.lit(1)).alias("rows_triple"))
    same_src = narrow_src.filter(F.col("_cls") == CLS_SAMEAS).drop("_cls")
    loc_src = narrow_src.filter(F.col("_cls").isin(CLS_LOCAL, CLS_SAMEAS)).drop("_cls")
    is_local = F.col("obj_type") == "UNRESOLVED_REF"
    maps = resolve_defs_fast(
        narrow_src.filter(F.col("_cls") == CLS_DEF).drop("_cls"), approx_defs=n_defs
    )
    if maps is not None:
        m.add("resolve", "rounds", 0)
        # The sameAs edge set must exist BEFORE the big pass (CC feeds
        # canonicalize), so it gets its own (class-pruned) scan; the
        # failed quarantine is only consumed by sinks/counters and is
        # LAZY here — it materializes in the concurrent tail below,
        # hidden under the big triple write instead of adding a serial
        # scan up front.
        edges = (
            same_src
            .withColumn("_lk", F.when(is_local, F.col("obj")))
            .join(
                maps.rmap.select(
                    "conv_id", F.col("obj").alias("_lk"), F.col("dcid").alias("_dc")
                ),
                ["conv_id", "_lk"],
                "left",
            )
            .filter(~(is_local & F.col("_dc").isNull()))
            .select(
                F.col("subj").alias("src"),
                F.coalesce(F.col("_dc"), F.col("obj")).alias("dst"),
            )
        )
        failed = (
            loc_src.filter(is_local)
            .join(maps.rmap.withColumnRenamed("dcid", "_dc"), ["conv_id", "obj"], "left")
            .filter(F.col("_dc").isNull())
            .drop("_dc")
            .join(maps.divergent.withColumn("err", F.lit("Resolution_DivergingDcids")), ["conv_id", "obj"], "left")
            .join(maps.unresolved.withColumn("err2", F.lit("Resolution_IrreplaceableLocalRef")), ["conv_id", "obj"], "left")
            .withColumn(
                "error",
                F.coalesce(F.col("err"), F.col("err2"), F.lit("Resolution_OrphanLocalReference")),
            )
            .drop("err", "err2")
        )
        # the fused final pass: resolve locals inline (dropping failed
        # rows — they are quarantined above), then canonicalize
        # join on a nulled key so only local-ref rows can match the map
        # (null join keys never match — non-local rows pass through)
        resolved = (
            triples.withColumn("_lk", F.when(is_local, F.col("obj")))
            .join(
                maps.rmap.select(
                    "conv_id", F.col("obj").alias("_lk"), F.col("dcid").alias("_dc")
                ),
                ["conv_id", "_lk"],
                "left",
            )
            .filter(~(is_local & F.col("_dc").isNull()))
            .withColumn("obj", F.coalesce(F.col("_dc"), F.col("obj")))
            .withColumn(
                "obj_type",
                F.when(is_local, F.lit("RESOLVED_REF")).otherwise(F.col("obj_type")),
            )
            .drop("_dc", "_lk")
        )
    else:
        # distributed fallback (defs above the driver gate): the
        # iterative resolver consumes the full statement set several
        # times — materialize it for this path only
        if linked is None:
            fallback_src = full.persist()
        else:
            fallback_src = linked
        res = resolve_locals(
            fallback_src.drop("_cls"), num_partitions=num_partitions, approx_defs=n_defs
        )
        if obs is not None:
            # the observed recompute stream is not consumed on this
            # path; count the (now materialized) statements directly
            obs = None
            m.add(
                "extract",
                "rows_triple",
                fallback_src.filter(F.col("_cls") <= CLS_SAMEAS).count(),
            )
        resolved = res.resolved
        failed = res.failed.localCheckpoint()
        m.add("resolve", "rounds", res.rounds)
        edges = resolved.filter(F.col("pred") == "sameAs").select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )

    # 5. canonicalize (sameAs connected components). The fast path
    # returns a parquet-backed map (already materialized — count() is
    # metadata-only); only the distributed loop's result needs a
    # lineage-cutting checkpoint here.
    fast_cc = connected_components_fast(edges)
    components = fast_cc if fast_cc is not None else connected_components(edges).localCheckpoint()
    n_components = components.count()
    m.add("canonicalize", "nodes_rewritten", n_components)
    # reuse the counter for the broadcast row gate; the byte gate
    # samples the (checkpointed, small) component map — one tiny job
    from import_spark.functions.size_gate import BROADCAST_BUDGET_BYTES, fits_bytes

    canon = canonicalize_triples(
        resolved,
        components,
        broadcast_map=n_components <= BROADCAST_CC_MAX_ROWS
        and fits_bytes(components, n_components, BROADCAST_BUDGET_BYTES),
    )

    # 6. merge + materialize. The failed-quarantine materialization,
    # its sink write and its error counters are independent of the big
    # triple write (S11's write barrier is between stages, not between
    # sibling sinks) — they run as concurrent actions and hide under
    # the big write's task tail instead of adding serial full-table
    # scans; Spark schedulers interleave concurrent jobs fairly.
    if check_generic_types:
        canon = drop_generic_types(canon)
    from concurrent.futures import ThreadPoolExecutor

    already_mat = maps is None  # distributed path checkpointed `failed`

    def _failed_tail():
        fm = failed if already_mat else failed.localCheckpoint()
        if out_dir:
            fm.write.mode("overwrite").parquet(os.path.join(out_dir, "failed"))
        return fm, fm.groupBy("error").count().collect()

    if out_dir:
        tri_path = os.path.join(out_dir, "triples")
        with ThreadPoolExecutor(max_workers=2) as pool:
            fut_tri = pool.submit(
                dedupe_and_materialize,
                canon.select(*FINAL_COLS),
                tri_path,
                num_buckets=num_buckets,
                num_partitions=num_partitions,
            )
            fut_failed = pool.submit(_failed_tail)
            fut_tri.result()
            m.add("merge", "triples_written", 1)
            failed, failed_counts = fut_failed.result()
            m.add("merge", "failed_written", 1)
        if lin_dir:
            write_stage_lineage(
                spark, tri_path, lin_dir, run_id, "merge", part_col="subj_bucket"
            )
            failed_path = os.path.join(out_dir, "failed")
            if os.path.isdir(failed_path):
                write_stage_lineage(spark, failed_path, lin_dir, run_id, "resolve")
            m.add("merge", "lineage_written", 1)
        final = spark.read.parquet(tri_path)
    else:
        final = dedupe_triples(
            canon.select(*FINAL_COLS), num_partitions=num_partitions
        ).cache()
        with ThreadPoolExecutor(max_workers=2) as pool:
            fut_cnt = pool.submit(final.count)
            fut_failed = pool.submit(_failed_tail)
            fut_cnt.result()
            failed, failed_counts = fut_failed.result()
    for r in failed_counts:
        m.add("resolve", r["error"], r["count"])
    if obs is not None:
        # collected during the big pass — no extra job
        m.add("extract", "rows_triple", obs.get["rows_triple"])
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
        # A11: counters as a queryable table, appended per run — the
        # LogWrapper counter model as data (run_id, stage, counter,
        # value, elapsed_sec), partitioned by run for lineage
        spark.createDataFrame(
            [
                (r["run_id"], r["stage"], r["counter"], r["value"], r["elapsed_sec"])
                for r in m.rows
            ],
            "run_id string, stage string, counter string, value long, elapsed_sec double",
        ).write.mode("append").partitionBy("run_id").parquet(
            os.path.join(out_dir, "metrics")
        )
    if snap is None:
        # final is materialized (counted above); release the caches so
        # repeated in-process runs don't accumulate executor storage
        narrow.unpersist()
        if maps is None:
            fallback_src.unpersist()
    elif not keep and os.path.exists(snap):
        shutil.rmtree(snap, ignore_errors=True)

    return PipelineResult(
        triples=final, failed=failed, metrics=m.rows, text_digest_in=din, text_digest_out=dout
    )
