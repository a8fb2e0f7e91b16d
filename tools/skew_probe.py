"""Hot-key skew probe: plain shuffle join vs operators/skew.salted_join
on an adversarially skewed key distribution.

Input shape (synthesized natively, no Python row loop): BIG has half
its rows on ONE hot key and the other half uniform over 100k cold
keys; DIM carries one row per key. Broadcast is disabled for the
probe's joins (the salted path's premise is a dictionary too large to
broadcast), so every variant pays a real shuffle on the key:

  plain/aqe_off   — the naive plan: the hot key's half of the corpus
                    lands in ONE reduce task
  plain/aqe_on    — Spark's own safety net (AQE OptimizeSkewedJoin
                    splits the oversized stream-side partition)
  salted/aqe_off  — the explicit operator: hot keys spread over
                    n_salts reduce tasks by construction

Trials are interleaved round-robin across variants (this host's
delivered performance drifts; see BENCH/BASELINE.md) and the best of
``--trials`` per variant is reported, with row-count equality asserted
across all variants.

Usage: python tools/skew_probe.py [rows] [cores] [n_salts] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_inputs(spark, n_rows: int, n_cold_keys: int = 100_000):
    big = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise((F.pmod(F.xxhash64("id"), F.lit(n_cold_keys)) + 1).cast("int"))
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    dim = (
        spark.range(n_cold_keys + 1)
        .select(
            F.col("id").cast("int").alias("k"),
            F.concat(F.lit("dcid/"), F.col("id")).alias("dcid"),
        )
        .localCheckpoint()
    )
    return big, dim


def timed_noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_salts = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from import_spark.operators.skew import salted_join
    from import_spark.session import get_spark

    spark = get_spark("skew-probe", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    big, dim = build_inputs(spark, n_rows)
    hot = [(0,)]

    # Post-join per-row work stays in the join's output partition until
    # the next exchange — in the KG pipeline that's dcid hashing and
    # string assembly. A narrow join on this box is DRAM-bound (the one
    # hot task gets the whole memory bus to itself while balanced tasks
    # contend), so the probe measures both shapes.
    work = F.sha2(F.concat_ws("|", F.col("payload"), F.col("dcid")), 256).alias("h")

    def plain():
        return big.join(dim, ["k"], "left")

    def salted():
        return salted_join(big, dim, ["k"], how="left", n_salts=n_salts, hot=hot)

    variants = {
        "plain_aqe_off": (plain, False),
        "plain_aqe_on": (plain, True),
        "salted_aqe_off": (salted, False),
        "plain_hashed_aqe_off": (lambda: plain().select(work), False),
        "plain_hashed_aqe_on": (lambda: plain().select(work), True),
        "salted_hashed_aqe_off": (lambda: salted().select(work), False),
    }
    counts = {}
    times: dict[str, list[float]] = {name: [] for name in variants}
    for name, (fn, _) in variants.items():
        counts[name] = fn().count()
    assert len(set(counts.values())) == 1, counts

    for _ in range(trials):
        for name, (fn, aqe) in variants.items():
            spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
            times[name].append(round(timed_noop(fn()), 3))
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    best = {name: min(ts) for name, ts in times.items()}
    print(
        json.dumps(
            {
                "rows": n_rows,
                "cores": cores,
                "n_salts": n_salts,
                "join_rows": counts["plain_aqe_off"],
                "best_sec": best,
                "trials_sec": times,
                "speedup_salted_vs_plain_aqe_off": round(
                    best["plain_aqe_off"] / best["salted_aqe_off"], 2
                ),
                "speedup_hashed_salted_vs_plain_aqe_off": round(
                    best["plain_hashed_aqe_off"] / best["salted_hashed_aqe_off"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
