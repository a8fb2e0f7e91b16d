"""SparkSession construction with scale-oriented defaults.

The defaults encode the scale posture demanded by the target (100 TB /
10^12 turns on a 1000-executor cluster): AQE on (runtime re-plan +
skew-join splitting, the Spark analogue of the reference's hand-rolled
shard salting, SpannerClient.java:305-316), adaptive shuffle partition
coalescing, Arrow for every pandas UDF boundary, and broadcast joins
for dimension tables (the reference's Recon/existence caches,
ExternalIdResolver.java:57-152).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _local_threads(cores: int) -> int:
    """Worker-thread count for ``local[...]`` at a given core budget.

    When the budget is the WHOLE machine (and big enough for it to
    matter), reserve 2 vCPUs for the runtime's auxiliary threads (GC,
    Netty, Python daemons) and the hypervisor's own per-VM service
    work. Measured on this class of VM: saturating every vCPU with
    task threads triggers lock-holder preemption and a >4x wall-time
    collapse on shuffle/write stages (22s → 3.5s for the same stage
    at local[32] vs local[30] on 32 vCPUs); a partially-used machine
    shows none of this. On a real multi-executor cluster the same
    policy is the standard "cores per executor < vCPUs per host"
    sizing rule.
    """
    host = os.cpu_count() or cores
    if cores >= 16 and cores >= host:
        return cores - 2
    return cores


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of RDDs currently persisted in the block manager."""
    return set(dict(spark.sparkContext._jsc.getPersistentRDDs()).keys())


def release_checkpoints(spark, results, before_ids):
    """Re-materialize ``results`` and release every block-manager RDD
    persisted since ``before_ids`` (a ``persistent_rdd_ids`` snapshot)
    that does not back them.

    Iterative operators cut lineage with ``localCheckpoint`` per round;
    the superseded rounds' blocks otherwise linger until driver GC and
    tax every later job in the session (measured: a 10-round resolver
    left enough retained storage to double an unrelated follow-up
    query). An EAGER localCheckpoint of each return value is
    self-contained — it stores its own computed partitions — so the
    loop-era blocks can be dropped immediately and safely."""
    sc = spark.sparkContext
    mid = persistent_rdd_ids(spark)
    fresh = [df.localCheckpoint() for df in results]
    for rid, rdd in dict(sc._jsc.getPersistentRDDs()).items():
        if rid in mid and rid not in before_ids:
            rdd.unpersist()
    return fresh


def get_spark(
    app_name: str = "import_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this engine.

    On a real cluster the same configs apply; only ``master`` changes
    (spark-submit provides it). Shuffle partitions default to 2x cores
    locally; on a cluster AQE coalesces from a high initial number, so
    the static setting matters less.
    """
    cores = cores or default_parallelism()
    shuffle_partitions = shuffle_partitions or max(2 * cores, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # shuffle/cache/broadcast IO codec: zstd beats the lz4 default
        # on this text-heavy workload wherever bytes are the wall —
        # measured 12% faster end-to-end at 8 cores and 3.6% at 2 on
        # the 1M-conv KG pipeline (same-window A/B pairs); on a real
        # cluster the shuffle bytes also cross the network, where the
        # better ratio pays again
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        b = b.master(f"local[{_local_threads(cores)}]")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
