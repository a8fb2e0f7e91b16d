"""spark-submit entry point for the KG-construction job.

Cluster:
    zip -r import_spark.zip import_spark
    SPARK_GRAFT_NO_MASTER=1 spark-submit --py-files import_spark.zip \
        tools/run_job.py --input /data/transcripts --dict /data/dcid_dict.parquet \
        --out /data/kg --checkpoint /data/ckpt --run-id 2026-08-16

Local smoke:
    python tools/run_job.py --synth-convs 10000 --out /tmp/kg_out

The job is idempotent per --run-id: a re-run resumes past the
extract+link snapshot and dynamic partition overwrite replaces the
output partitions it writes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="transcripts parquet/Iceberg path")
    p.add_argument("--dict", dest="dict_path", help="dcid dictionary parquet (prop, ext_id, dcid)")
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint")
    p.add_argument("--run-id", default="run0")
    p.add_argument("--num-buckets", type=int, default=64)
    p.add_argument("--synth-convs", type=int, help="generate a synthetic input instead of --input")
    p.add_argument("--skip-text-invariant", action="store_true")
    p.add_argument(
        "--stream-ingest",
        action="store_true",
        help="drain --input via Structured Streaming (Trigger.AvailableNow, "
        "exactly-once) into the extract+link snapshot before the batch "
        "stages resume from it; requires --checkpoint",
    )
    args = p.parse_args()
    if args.stream_ingest and not (args.checkpoint and args.input):
        p.error("--stream-ingest requires --checkpoint and --input")

    from import_spark.plans.kg_pipeline import run_pipeline
    from import_spark.session import get_spark
    from import_spark.sources.transcripts import dcid_dictionary, generate_transcripts

    spark = get_spark(f"kg-construct-{args.run_id}")
    if args.synth_convs:
        transcripts = generate_transcripts(spark, args.synth_convs)
    elif args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        p.error("one of --input / --synth-convs is required")
    dcid_dict = (
        spark.read.parquet(args.dict_path) if args.dict_path else dcid_dictionary(spark)
    )
    if args.stream_ingest:
        from import_spark.streaming.incremental import ingest_to_pipeline_snapshot

        n = ingest_to_pipeline_snapshot(
            spark, args.input, args.checkpoint, dcid_dict, run_id=args.run_id,
            compute_text_digest=not args.skip_text_invariant,
        )
        print(json.dumps({"stream_micro_batches": n}))
    res = run_pipeline(
        spark,
        transcripts,
        dcid_dict,
        out_dir=args.out,
        checkpoint_dir=args.checkpoint,
        run_id=args.run_id,
        num_buckets=args.num_buckets,
        verify_text_invariant=not args.skip_text_invariant,
    )
    print(json.dumps({"metrics": res.metrics}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
