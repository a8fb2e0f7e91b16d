"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The KG-construction throughput (triples/sec, the BASELINE.json metric)
is measured on a deterministic synthetic transcript table sized by
$SPARK_GRAFT_KG_CONVS (default 40000 conversations ≈ 260k turns).
Scaling-efficiency evidence (N vs 4N cores) lives in tools/scaling_bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> int:
    """Fully materialize a DataFrame without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    kg_convs = int(os.environ.get("SPARK_GRAFT_KG_CONVS", 40000))

    from import_spark.queries import QUERIES
    from import_spark.session import get_spark

    spark = get_spark("bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    # warm up the JVM/Python workers once (not timed)
    spark.range(1000000).selectExpr("sum(id)").collect()

    import gc

    for name, fn in QUERIES.items():
        if name == "kg_pipeline":
            continue  # timed separately with throughput accounting
        t0 = time.time()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
        # queries are independent: between runs, release cached
        # relations and let the ContextCleaner drop orphaned
        # localCheckpoint blocks so one query's retained storage does
        # not tax the next (outside the timed window)
        spark.catalog.clearCache()
        gc.collect()

    # KG-construction throughput. The workload is an Iceberg-table SCAN
    # (input_hint), so the deterministic transcript table is
    # materialized to parquet first and the timed run reads it — same
    # methodology as tools/scaling_bench.py; generation is excluded.
    import tempfile

    from import_spark.plans.kg_pipeline import run_pipeline
    from import_spark.sources.transcripts import dcid_dictionary, generate_transcripts

    tr_path = os.path.join(tempfile.gettempdir(), f"bench_transcripts_{kg_convs}")
    if not os.path.exists(os.path.join(tr_path, "_SUCCESS")):
        generate_transcripts(spark, kg_convs, partitions=2 * cores).write.mode(
            "overwrite"
        ).parquet(tr_path)
    tr = spark.read.parquet(tr_path)
    # steady-state throughput, same methodology as tools/scaling_bench:
    # one untimed warm-up run compiles the pipeline's codegen/Python
    # workers, then the timed run measures the warmed job
    warm = generate_transcripts(spark, 2000).localCheckpoint()
    run_pipeline(spark, warm, dcid_dictionary(spark), verify_text_invariant=False).triples.count()
    spark.catalog.clearCache()
    gc.collect()
    t0 = time.time()
    res = run_pipeline(spark, tr, dcid_dictionary(spark), verify_text_invariant=False)
    n_triples = res.triples.count()
    kg_sec = round(time.time() - t0, 3)
    timings["kg_pipeline"] = kg_sec
    triples_per_sec = round(n_triples / kg_sec, 1)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_headline_query_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir.rstrip("/").split("sf")[-1],
                "kg_triples": n_triples,
                "kg_triples_per_sec": triples_per_sec,
                "kg_convs": kg_convs,
                "cores": cores,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
