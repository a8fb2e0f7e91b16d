"""Extra measurement harness for optimization round 6 (guide §1).

NOT the frozen driver bench (bench.py). Usage:

    python bench_extra.py <query>[,<query>...] [--sf /root/testdata/sf1.0]
        [--reps 2] [--explain plans/r06/<q>_before.txt] [--stages]

Per query: optional untimed warm-up at sf0.01, then `reps` timed runs
to a noop sink (computation only, guide §1.4), best-of reported.
--explain writes `.explain("formatted")` to the given path (one query
only). --stages prints per-stage executor run times from the UI REST
API so the hot stage is identifiable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _stage_report(spark):
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
            stages = json.load(r)
    except Exception as e:  # noqa: BLE001
        print(f"  (stage report unavailable: {e})")
        return
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    for s in stages[:15]:
        print(
            f"  stage {s['stageId']:4d} {s['status']:9s} tasks={s['numCompleteTasks']:4d} "
            f"run={s.get('executorRunTime', 0) / 1000:8.1f}s "
            f"cpu={s.get('executorCpuTime', 0) / 1e9:8.1f}s "
            f"shufR={s.get('shuffleReadBytes', 0) / 1e6:8.1f}MB "
            f"shufW={s.get('shuffleWriteBytes', 0) / 1e6:8.1f}MB  {s.get('name', '')[:70]}"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--warm", default="/root/testdata/sf0.01")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--explain", default=None)
    ap.add_argument("--stages", action="store_true")
    args = ap.parse_args()

    from import_spark.queries import QUERIES
    from import_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    extra = {"spark.ui.enabled": "true"} if args.stages else None
    spark = get_spark("bench-extra", cores=cores, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    from bench import _drain_session_state

    results = {}
    for name in args.queries.split(","):
        fn = QUERIES[name]
        if args.explain:
            df = fn(spark, args.sf)
            os.makedirs(os.path.dirname(args.explain) or ".", exist_ok=True)
            with open(args.explain, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
            print(f"wrote {args.explain}")
        if not args.no_warm and os.path.isdir(args.warm):
            spark.sparkContext.setJobDescription(f"warm:{name}")
            _force(fn(spark, args.warm))
            _drain_session_state(spark)
        best = None
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.time()
            _force(fn(spark, args.sf))
            dt = time.time() - t0
            print(f"{name} rep{i}: {dt:.3f}s", flush=True)
            best = dt if best is None else min(best, dt)
            _drain_session_state(spark)
        results[name] = round(best, 3)
    if args.stages:
        _stage_report(spark)
    print("RESULT " + json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
