"""End-to-end span-sequence equality: synthetic corpus ground truth vs the
full pipeline (north-rule invariant: (kind, text, media_ref, order) per
document)."""

import pytest
from pyspark.sql import functions as F

from pdftabextract_spark.sources import synth
from pdftabextract_spark.plans.pipeline import (
    PipelineParams, extract_from_span_table, extract_cells)
from pdftabextract_spark.sources.spans import textboxes_from_spans


PARAMS = synth.CorpusParams(seed=42, n_docs=24, n_cols=5)
PIPE = PipelineParams(n_cols=PARAMS.n_cols,
                      min_col_width=PARAMS.min_col_width,
                      min_row_height=PARAMS.min_row_height)


def _mismatches(result, expected):
    r = result.select("doc_id", "offset", "kind", "text", "media_ref")
    e = expected.select(
        "doc_id", "offset",
        F.col("kind").alias("e_kind"), F.col("text").alias("e_text"),
        F.col("media_ref").alias("e_media_ref"))
    joined = r.join(e, ["doc_id", "offset"], "full_outer")
    bad = joined.where(
        ~(F.col("kind").eqNullSafe(F.col("e_kind"))
          & F.col("text").eqNullSafe(F.col("e_text"))
          & F.col("media_ref").eqNullSafe(F.col("e_media_ref"))))
    return bad


def test_span_sequence_equality_text_corpus(spark):
    span_docs = synth.span_docs_df(spark, PARAMS)
    result = extract_from_span_table(span_docs, PIPE)
    expected = synth.expected_spans_df(spark, PARAMS)

    n_result = result.count()
    n_expected = expected.count()
    assert n_expected > 0
    assert n_result == n_expected

    bad = _mismatches(result, expected)
    rows = bad.limit(20).collect()
    assert not rows, "span mismatches: %s" % rows


def test_zero_area_boxes_dropped_at_scan(spark):
    span_docs = synth.span_docs_df(spark, PARAMS)
    boxes = textboxes_from_spans(span_docs)
    assert boxes.where(F.col("value") == "ZERO").count() == 0
    assert boxes.where((F.col("width") <= 0) | (F.col("height") <= 0)).count() == 0


def test_cells_match_ground_truth(spark):
    span_docs = synth.span_docs_df(spark, PARAMS)
    boxes = textboxes_from_spans(span_docs)
    cells = extract_cells(boxes, PIPE)
    gt = synth.gt_cells_df(spark, PARAMS)

    joined = cells.join(
        gt.withColumnRenamed("cell_text", "gt_text"),
        ["doc_id", "page", "row_idx", "col_idx"], "full_outer")
    bad = joined.where(~F.col("cell_text").eqNullSafe(F.col("gt_text")))
    rows = bad.limit(10).collect()
    assert not rows, "cell mismatches: %s" % rows


def test_packed_pages_unique_across_batch_splits(spark):
    """Pages straddling Arrow batches must not emit duplicate partial rows
    (regression: output depended on parallelism)."""
    from pdftabextract_spark.plans.pipeline import extract_cells_packed
    # tiny Arrow batches force every page to straddle batch boundaries
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        boxes = textboxes_from_spans(synth.span_docs_df(spark, PARAMS))
        packed = extract_cells_packed(boxes, PIPE)
        total = packed.count()
        distinct = packed.select("doc_id", "page").distinct().count()
        assert total == distinct
        n_spans = packed.agg(F.sum(F.size("cells"))).collect()[0][0]
        expected = synth.expected_spans_df(spark, PARAMS).count()
        assert n_spans == expected
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
