"""Same-window scaling pair with stage-level loss accounting.

Runs the KG pipeline at one parallelism level (fresh JVM, warm-up,
taskset-confined by the caller) and reports wall time, the sum of
executor task time (Spark UI REST API), and driver-side gaps between
jobs. Two back-to-back invocations at N and 4N cores give a
same-window efficiency pair PLUS the decomposition of where the 4N
residual goes: task-time inflation (shared memory hierarchy on one
box), in-job scheduling tails, and driver-side time.

This is the probe that produced `r4head_same_window_pair` in
BENCH/scaling.json (1c 294.06s / 4c 90.18s = 0.815 raw 1->4 in a
verified-clean window, task-time inflation 1.137x, driver gaps 6.5s at
4c vs 12.0s at 1c): campaigns interleave short 4c trials across ~40
minutes of host drift, while a solo back-to-back pair compares like
windows. Usage:

    taskset -c 0   python tools/stage_profile.py 1
    taskset -c 0-3 python tools/stage_profile.py 4 [transcripts_path] [shuffle_partitions]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from import_spark.plans.kg_pipeline import run_pipeline  # noqa: E402
from import_spark.session import get_spark  # noqa: E402
from import_spark.sources.transcripts import (  # noqa: E402
    dcid_dictionary,
    generate_transcripts,
)


def _ts(s: str) -> float:
    return datetime.strptime(
        s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
    ).timestamp()


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/spark_graft_transcripts_500000"
    )
    shuf = int(sys.argv[3]) if len(sys.argv) > 3 else None

    spark = get_spark(
        "stage-profile",
        cores=cores,
        shuffle_partitions=shuf,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def rest(what: str):
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/{what}"
        ) as r:
            return json.loads(r.read())

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_transcripts(spark, 500000, partitions=32).write.mode(
            "overwrite"
        ).parquet(path)
    tr = spark.read.parquet(path)

    # mid-size warm-up: JIT needs real volume (see tools/scaling_bench.py)
    warm = generate_transcripts(spark, 20000).localCheckpoint()
    run_pipeline(
        spark, warm, dcid_dictionary(spark), verify_text_invariant=False
    ).triples.count()

    jobs_before = {j["jobId"] for j in rest("jobs")}

    t0 = time.time()
    res = run_pipeline(
        spark, tr, dcid_dictionary(spark), verify_text_invariant=False
    )
    n = res.triples.count()
    wall = time.time() - t0

    jobs = []
    for j in rest("jobs"):
        if j["jobId"] in jobs_before or "submissionTime" not in j:
            continue
        sub = _ts(j["submissionTime"])
        comp = _ts(j.get("completionTime", j["submissionTime"]))
        jobs.append(
            {
                "id": j["jobId"],
                "sub": sub,
                "comp": comp,
                "dur": round(comp - sub, 2),
                "desc": (j.get("name") or "")[:70],
            }
        )
    jobs.sort(key=lambda x: x["sub"])

    run_time_ms = 0
    for s in rest("stages?status=complete"):
        if "submissionTime" in s and _ts(s["submissionTime"]) >= t0 - 1:
            run_time_ms += s.get("executorRunTime", 0)

    gaps = []
    prev_end = t0
    covered = 0.0
    for jb in jobs:
        gap = jb["sub"] - prev_end
        if gap > 0.2:
            gaps.append(
                {"gap_s": round(gap, 2), "before": f'job{jb["id"]}:{jb["desc"]}'}
            )
        covered += max(0.0, jb["comp"] - max(jb["sub"], prev_end))
        prev_end = max(prev_end, jb["comp"])

    print(
        json.dumps(
            {
                "cores": cores,
                "wall_s": round(wall, 2),
                "n_triples": n,
                "n_jobs": len(jobs),
                "sum_task_time_s": round(run_time_ms / 1000.0, 1),
                "ideal_parallel_s": round(run_time_ms / 1000.0 / cores, 1),
                "job_covered_s": round(covered, 1),
                "driver_gap_s": round(wall - covered, 1),
                "gaps_over_200ms": gaps,
                "top_jobs": [
                    {"id": j["id"], "dur": j["dur"], "desc": j["desc"]}
                    for j in sorted(jobs, key=lambda x: -x["dur"])[:8]
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
