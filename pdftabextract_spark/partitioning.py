"""Partitioning helpers shared by operators.

A single small parquet file yields 1-2 scan splits no matter how many
cores the session has (splits cannot be finer than row groups), so any
operator doing heavy per-row work directly on such a scan serializes on a
handful of tasks. ``spread_small_input`` fixes exactly that case without
penalizing at-scale inputs, which already arrive in enough splits.
"""

from pyspark.sql import DataFrame

# inputs whose Catalyst size estimate is below this are repartitioned to
# the default parallelism before heavy narrow per-row work; larger inputs
# are left untouched (repartitioning them would shuffle real bytes for
# parallelism they already have)
SPREAD_INPUT_MAX_BYTES = 1 << 30


def spread_small_input(df: DataFrame,
                       max_bytes: int = SPREAD_INPUT_MAX_BYTES) -> DataFrame:
    """Round-robin repartition a *small* input across the default
    parallelism (no-op for inputs estimated above ``max_bytes`` or when
    plan statistics are unavailable). Driver-side only — reads the
    optimized plan's size estimate, runs no job. Downstream consumers
    must not depend on row order or physical partitioning (ours all
    aggregate on keys or compute row-wise values)."""
    try:
        spark = df.sparkSession
        target = spark.sparkContext.defaultParallelism
        size = int(str(df._jdf.queryExecution().optimizedPlan().stats()
                       .sizeInBytes()))
    except Exception:
        return df
    return df.repartition(target) if size <= max_bytes else df
