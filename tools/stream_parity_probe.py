"""Streaming-vs-batch parity probe at scale.

Drains a materialized transcript table through the Structured-Streaming
ingest (streaming/incremental.py, AvailableNow, exactly-once per-batch
partitions), resumes the batch stages from the streamed snapshot, runs
the plain batch pipeline on the same input, and compares the two triple
multisets with ``exceptAll`` in BOTH directions. Zero diffs = the
streaming path is bit-equivalent to the batch path at this scale (the
driver-gated ``kg_streaming`` query proves the same thing hash-vs-DuckDB
at fixture scale; this probe is the 2,500x-larger sibling).

Usage:
    python tools/stream_parity_probe.py [convs] [cores]

Defaults: 500000 conversations (re-materialized to
/tmp/spark_graft_transcripts_<convs> if missing — the same table
tools/scaling_bench.py uses), 32 cores. Recorded run (2026-08-19):
8 micro-batches, 18,758,702 triples each route, 0 diffs either way.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(convs: int = 500000, cores: int = 32) -> int:
    from import_spark.plans.kg_pipeline import run_pipeline
    from import_spark.session import get_spark
    from import_spark.sources.transcripts import dcid_dictionary, generate_transcripts
    from import_spark.streaming.incremental import ingest_to_pipeline_snapshot

    spark = get_spark("stream-parity", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    src = f"/tmp/spark_graft_transcripts_{convs}"
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        generate_transcripts(spark, convs, partitions=64).write.mode(
            "overwrite"
        ).parquet(src)
    root = f"/tmp/stream_parity_probe_{convs}"
    shutil.rmtree(root, ignore_errors=True)
    d = dcid_dictionary(spark)

    t0 = time.time()
    nb = ingest_to_pipeline_snapshot(
        spark, src, root, d, run_id="s", max_files_per_trigger=8
    )
    t_drain = round(time.time() - t0, 1)

    tr = spark.read.parquet(src)
    t0 = time.time()
    res_s = run_pipeline(spark, tr, d, checkpoint_dir=root, run_id="s", keep_snapshot=True)
    assert any(
        r["counter"] == "resumed_from_checkpoint" for r in res_s.metrics
    ), "batch stages must resume from the STREAMED snapshot"
    tri_s = res_s.triples.select("subj", "pred", "obj_type", "obj").localCheckpoint()
    n_s = tri_s.count()
    t_resume = round(time.time() - t0, 1)

    t0 = time.time()
    res_b = run_pipeline(spark, tr, d, verify_text_invariant=False)
    tri_b = res_b.triples.select("subj", "pred", "obj_type", "obj").localCheckpoint()
    n_b = tri_b.count()
    t_batch = round(time.time() - t0, 1)

    d1 = tri_s.exceptAll(tri_b).count()
    d2 = tri_b.exceptAll(tri_s).count()
    print(f"batches={nb} drain={t_drain}s resume={t_resume}s batch={t_batch}s")
    print(f"triples streamed={n_s} batch={n_b} except(s-b)={d1} except(b-s)={d2}")
    ok = d1 == 0 and d2 == 0 and n_s == n_b
    print("PARITY", ok)
    shutil.rmtree(root, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(*[int(a) for a in sys.argv[1:]]))
