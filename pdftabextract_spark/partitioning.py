"""Partitioning helpers shared by operators.

A single small parquet file yields 1-2 scan splits no matter how many
cores the session has (splits cannot be finer than row groups), so any
operator doing heavy per-row work directly on such a scan serializes on a
handful of tasks. ``spread_small_input`` fixes exactly that case without
penalizing at-scale inputs, which already arrive in enough splits.
"""

from pyspark.sql import DataFrame

# inputs whose Catalyst size estimate falls in [MIN, MAX) are
# repartitioned to the default parallelism before heavy narrow per-row
# work. Larger inputs are left untouched (repartitioning them would
# shuffle real bytes for parallelism they already have); tinier inputs
# too (their per-row work is cheaper than the extra exchange + stage
# barrier — interleaved r5-vs-r6 A/B at sf0.1 measured the unconditional
# spread costing q20 ~0.25s and q19 ~0.1s on sub-MB embeddings while
# winning nothing).
SPREAD_INPUT_MAX_BYTES = 1 << 30
SPREAD_INPUT_MIN_BYTES = 4 << 20


def spread_small_input(df: DataFrame,
                       max_bytes: int = SPREAD_INPUT_MAX_BYTES,
                       min_bytes: int = SPREAD_INPUT_MIN_BYTES) -> DataFrame:
    """Round-robin repartition a *small but not tiny* input across the
    default parallelism (no-op for inputs estimated outside
    ``[min_bytes, max_bytes)`` or when plan statistics are unavailable).
    Driver-side only — reads the optimized plan's size estimate, runs no
    job. Downstream consumers must not depend on row order or physical
    partitioning (ours all aggregate on keys or compute row-wise
    values)."""
    try:
        spark = df.sparkSession
        target = spark.sparkContext.defaultParallelism
        size = int(str(df._jdf.queryExecution().optimizedPlan().stats()
                       .sizeInBytes()))
    except Exception:
        return df
    return df.repartition(target) if min_bytes <= size < max_bytes else df
