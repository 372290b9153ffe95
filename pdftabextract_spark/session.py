"""SparkSession factory with scale-aware defaults.

Local sandbox runs on local[N]; the same settings map to multi-executor
clusters (AQE, skew join, Arrow batching). Shuffle partitions default to
the core count — the per-page group keys used throughout the engine give
far more groups than partitions at any realistic scale, so AQE coalescing
handles small inputs while large inputs spread evenly.
"""

import os

from pyspark.sql import SparkSession


def get_spark(app_name="pdftabextract_spark", cores=None, shuffle_partitions=None,
              arrow_max_records=2048, extra_conf=None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores), 8)

    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOTE (round 6): raising
        # spark.sql.adaptive.coalescePartitions.initialPartitionNum to 512
        # was A/B'd and REJECTED as a default. It won ~8% on the sf1.0
        # operator suite (finer AQE splits for the q18/q20 exchanges) but
        # catastrophically regressed small sessions: the e2e pipelines'
        # pandas-kernel stages ran all 512 tasks un-coalesced at cores=8
        # (~107 ms fixed Python cost per task -> 2.2s extract became
        # 22.4s), and the coalescing behavior across session shapes was
        # not predictable enough to gate on. Revisit only with a
        # per-exchange mechanism.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # scan split size (guide §6), parameterised for ops; default =
        # Spark's 128m. A/B at the sf1.0 bench (round 6): 16m splits were
        # equal-or-slower on every query (q12 0.276 vs 0.254, q17 0.66 vs
        # 0.52 best-of-4) — the few-split small-file scans here are not
        # scan-bound, and per-row-heavy operators spread small inputs
        # explicitly (partitioning.spread_small_input) instead. At scale,
        # raise toward 512m-1g for large sequential scans.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # one Arrow batch ~ a bounded number of pages/boxes per Python call
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_max_records))
        # local mode: the driver heap is ALL the memory there is; size it
        # to the machine (the sandbox has 128GiB) — an 8g heap makes big
        # persists evict/spill and large jobs go superlinear
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # the grid-assignment cogroup joins a frame with an aggregate derived
        # from itself; keys are unambiguous by construction (grouped by name
        # on each side), so relax the strict self-join analyzer check
        .config("spark.sql.analyzer.failAmbiguousSelfJoin", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
