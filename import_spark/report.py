"""LogWrapper-model report: counters by level + per-counter capped
message samples → ``report.json`` (reference LogWrapper.java:49-51,
93-139 — MAX_MESSAGES_PER_COUNTER=30 — and the Debug.Log proto shape
persisted by persistLog, LogWrapper.java:145-176).

Input is the engine's uniform error-row relation
``(node_id, level, counter, message)`` produced by the checker,
mutator and resolver. Aggregation happens in Spark (one groupBy);
only the capped per-counter samples reach the driver.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_MESSAGES_PER_COUNTER = 30
REPORT_JSON = "report.json"

LEVELS = ["LEVEL_INFO", "LEVEL_WARNING", "LEVEL_ERROR", "LEVEL_FATAL"]


def build_report(
    errors: DataFrame,
    info_counters: dict[str, int] | None = None,
    max_messages: int = MAX_MESSAGES_PER_COUNTER,
) -> dict:
    """Aggregate error rows → LogWrapper-shaped report dict.

    ``errors``: (node_id, level, counter, message) — level optional
    (defaults LEVEL_ERROR). ``info_counters``: driver-side counters
    (NumRowSuccesses etc., Processor.java:395-397)."""
    if "level" not in errors.columns:
        errors = errors.withColumn("level", F.lit("LEVEL_ERROR"))
    # Cap at insertion time like the reference (LogWrapper caps each
    # counter at MAX_MESSAGES_PER_COUNTER as entries arrive): a naive
    # collect_list-then-slice buffers EVERY message of a hot counter
    # (millions of rows — the exact scenario reports exist for) in one
    # aggregation buffer. Two bounded stages instead:
    # 1. per (level, counter, input-partition): slice inside the task,
    #    so no buffer outlives its own input partition;
    # 2. final: each group shuffles at most max_messages per input
    #    partition, flattened and re-sliced. No window, no skewed
    #    single-reducer partition for the hot counter.
    agg = (
        errors.groupBy("level", "counter", F.spark_partition_id().alias("_p"))
        .agg(
            F.count("*").alias("_c"),
            F.slice(F.collect_list("message"), 1, max_messages).alias("_m"),
        )
        .groupBy("level", "counter")
        .agg(
            F.sum("_c").alias("count"),
            F.slice(F.flatten(F.collect_list("_m")), 1, max_messages).alias("messages"),
        )
        .collect()
    )
    level_summary: dict[str, dict] = {}
    entries = []
    for r in sorted(agg, key=lambda r: (r["level"], r["counter"])):
        level_summary.setdefault(r["level"], {"counters": {}})["counters"][
            r["counter"]
        ] = r["count"]
        entries.append(
            {
                "level": r["level"],
                "counter": r["counter"],
                "count": r["count"],
                "messageSamples": list(r["messages"]),
            }
        )
    for counter, value in (info_counters or {}).items():
        level_summary.setdefault("LEVEL_INFO", {"counters": {}})["counters"][
            counter
        ] = int(value)
    return {"levelSummary": level_summary, "entries": entries}


def write_report(report: dict, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, REPORT_JSON)
    with open(path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    return path
