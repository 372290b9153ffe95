"""Corpus-level column-model fit and per-page repair — the Spark staging of
get_adjusted_cluster_centers (/root/reference/pdftabextract/clustering.py:77-165,
see kernels.clustering for the math):

  stage A (distributed)  per-page cluster centers, normalized to start at 0
  stage B (distributed)  pool all normalized centers, cluster them globally,
                         reduce to (median, count) per pooled cluster —
                         only this tiny summary reaches the driver
  stage C (driver)       sequential-stateful iterative filter to exactly
                         n_required medians (kernels.fit_center_model)
  stage D (distributed)  broadcast the model; per-page repair via
                         find_best_matching_array in an Arrow-batched UDF

The only corpus-wide exchange is stage B's aggregation of ~pages x columns
doubles; payload to the driver is O(distinct column offsets).
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F, types as T

from ..kernels.clustering import (
    fit_center_model, find_best_matching_array, zip_clusters_and_values,
    find_clusters_1d_break_dist,
)
from .clustering import global_cluster_summary


def normalized_centers(centers: DataFrame, group_cols=("doc_id", "page")) -> DataFrame:
    """center - first(center per group, ascending) — parity with
    clustering.py:104-108 (centers start at 0)."""
    w = W.partitionBy(*group_cols)
    return centers.withColumn(
        "center_norm", F.col("center") - F.min("center").over(w))


MAX_DRIVER_POOL = 5_000_000  # pooled centers; ~40MB of doubles


def fit_column_model(centers: DataFrame, n_required_clusters: int,
                     dist_thresh: float, group_cols=("doc_id", "page")) -> np.ndarray:
    """Stages A(norm)+B+C: returns the normalized model array (driver-side
    numpy, broadcast-sized).

    Fast path: the pooled normalized centers are ~pages x columns doubles —
    collect and run the exact numpy kernels (sorting 10^5-10^6 floats on
    the driver beats a single-partition window by seconds). Above
    MAX_DRIVER_POOL values fall back to the distributed single-ordering
    summary; at true web scale the fit is sharded per layout family before
    this point (SURVEY §7)."""
    pooled = normalized_centers(centers, group_cols).select("center_norm")
    return fit_column_model_pooled(pooled, n_required_clusters, dist_thresh)


def fit_column_model_pooled(pooled: DataFrame, n_required_clusters: int,
                            dist_thresh: float) -> np.ndarray:
    """Stages B+C over an already-normalized pooled centers frame (one
    column ``center_norm``). Entry point for the fused page-profile path,
    where per-page centers arrive as sorted arrays and normalization is a
    JVM transform (center - centers[0]) instead of a window min."""
    arrow = pooled.toPandas()["center_norm"].to_numpy(dtype=float)
    if len(arrow) <= MAX_DRIVER_POOL:
        cluster_ind = find_clusters_1d_break_dist(arrow, dist_thresh)
        clusters_w_vals = zip_clusters_and_values(cluster_ind, arrow)
        # order clusters by ascending value like the window formulation
        clusters_w_vals.sort(key=lambda cw: cw[1].min())
        model, _ = fit_center_model(clusters_w_vals, n_required_clusters)
        return model

    summary = global_cluster_summary(pooled, "center_norm", dist_thresh)
    rows = summary.orderBy("cluster_id").collect()
    # fit_center_model only consumes len(values) and median(values), so
    # synthesize count-length arrays filled with the exact cluster median
    clusters_w_vals = [
        (np.arange(r["n"]), np.full(r["n"], float(r["center"])))
        for r in rows
    ]
    model, _ = fit_center_model(clusters_w_vals, n_required_clusters)
    return model


def repair_page_centers(page_centers: DataFrame, model: np.ndarray,
                        centers_col="centers",
                        same_size_use_model_arr_diff_thresh=None) -> DataFrame:
    """Stage D: per-page sorted centers array -> repaired array of exactly
    len(model) positions (find_best_matching_array against the broadcast
    model). Arrow-batched pandas UDF; the model rides the closure (tiny)."""
    model_list = [float(x) for x in model]
    thresh = same_size_use_model_arr_diff_thresh

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _repair(centers: pd.Series) -> pd.Series:
        m = np.array(model_list, dtype=float)
        out = []
        for arr in centers:
            base = np.asarray(arr, dtype=float)
            if len(base) == 0:
                out.append([float(x) for x in m])
                continue
            fixed, _ = find_best_matching_array(
                base, m, same_size_use_model_arr_diff_thresh=thresh)
            out.append([float(x) for x in fixed])
        return pd.Series(out)

    return page_centers.withColumn("centers_fixed", _repair(F.col(centers_col)))


def fit_and_repair(centers: DataFrame, n_required_clusters: int,
                   dist_thresh: float, group_cols=("doc_id", "page"),
                   same_size_use_model_arr_diff_thresh=None) -> DataFrame:
    """Full get_adjusted_cluster_centers over a centers DataFrame
    (group_cols + center). Returns one row per page:
    group_cols + centers (detected, sorted) + centers_fixed (repaired)."""
    model = fit_column_model(centers, n_required_clusters, dist_thresh, group_cols)
    per_page = (
        centers.groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("center")).alias("centers"))
    )
    return repair_page_centers(
        per_page, model,
        same_size_use_model_arr_diff_thresh=same_size_use_model_arr_diff_thresh)


def spark_adjust_bad_positions(positions: DataFrame, group_cols=("doc_id", "page"),
                               positions_col="positions",
                               pos_check_signif_level=0.05) -> DataFrame:
    """adjust_bad_positions (clustering.py:319-365) staged for Spark:
    corpus aggregates (median position count; columnwise mean widths of
    good pages) computed distributed, then the per-page chi-square check
    and repair in an Arrow-batched UDF with the tiny mean-widths model in
    the closure."""
    from ..kernels.stats import chisquare

    n_col = F.size(positions_col)
    with_n = positions.withColumn("_n", n_col)
    median_n = with_n.select(
        F.expr("percentile(_n, 0.5)").alias("m")).collect()[0]["m"]
    median_n = int(median_n)

    good = with_n.where(F.col("_n") == median_n)
    # columnwise mean across good pages: posexplode + groupBy(position index)
    col_means = (
        good.select(F.posexplode(positions_col).alias("i", "v"))
        .groupBy("i").agg(F.avg("v").alias("mean_v"))
        .orderBy("i").collect()
    )
    mean_positions = np.array([r["mean_v"] for r in col_means])
    if len(mean_positions) == 0:
        return positions.withColumn("positions_fixed", F.col(positions_col))
    mean_widths = np.diff(mean_positions)
    if len(mean_widths) and mean_widths.min() < 0:
        raise ValueError("invalid positions: got negative mean width")
    mw_list = [float(x) for x in mean_widths]
    alpha = pos_check_signif_level

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _fix(pos_arrays: pd.Series) -> pd.Series:
        mw = np.array(mw_list)
        out = []
        for arr in pos_arrays:
            p = np.asarray(arr, dtype=float)
            if len(p) != median_n or (len(p) > 1 and np.diff(p).min() < 0):
                p_val = 0.0
            else:
                _, p_val = chisquare(np.diff(p), mw)
            if p_val < alpha:
                p = np.concatenate([[p[0]], p[0] + np.cumsum(mw)])
            out.append([float(x) for x in p])
        return pd.Series(out)

    return positions.withColumn("positions_fixed", _fix(F.col(positions_col)))
