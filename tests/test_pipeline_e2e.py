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
        expected = synth.expected_spans_df(spark, PARAMS).count()
        # both kernel paths: with the exchange, and the span-table
        # page-contiguous fast path (regression for the skipped exchange)
        for contiguous in (False, True):
            packed = extract_cells_packed(boxes, PIPE,
                                          page_contiguous=contiguous)
            total = packed.count()
            distinct = packed.select("doc_id", "page").distinct().count()
            assert total == distinct, "contiguous=%s" % contiguous
            n_spans = packed.agg(F.sum(F.size("cells"))).collect()[0][0]
            assert n_spans == expected, "contiguous=%s" % contiguous
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_pack_joined_raises_on_non_contiguous_input(spark):
    """The packing kernel must fail loudly (not emit silent duplicates)
    when its page-contiguity precondition is violated. The public join
    path happens to restore contiguity under SMJ (sorted by join key), so
    drive the kernel directly with interleaved joined-shape rows."""
    from pdftabextract_spark.operators.grid import pack_joined

    def row(doc, page, box_id, left):
        return (doc, page, box_id, left, 10.0, 5.0, 5.0, "v",
                [0.0, 50.0, 100.0], [0.0, 30.0, 60.0])

    # page 1 recurs after page 2 closed it — within one partition. (A
    # trailing page 3 keeps the recurrence out of the carry buffer, which
    # deliberately re-merges a recurrence of the LAST key in a batch.)
    rows = [row("d", 1, 0, 5.0), row("d", 2, 0, 5.0), row("d", 1, 1, 55.0),
            row("d", 3, 0, 5.0)]
    joined = spark.createDataFrame(
        rows, "doc_id string, page int, box_id int, left double, top double, "
              "width double, height double, value string, "
              "col_positions array<double>, row_positions array<double>"
    ).coalesce(1)
    with pytest.raises(Exception) as exc:
        pack_joined(joined).count()
    assert "page-contiguous" in str(exc.value) or "recurred" in str(exc.value)

    # sanity: the same rows in contiguous order pack cleanly into 3 pages
    ok_rows = [rows[0], rows[2], rows[1], rows[3]]
    ok = spark.createDataFrame(
        ok_rows, "doc_id string, page int, box_id int, left double, top double, "
                 "width double, height double, value string, "
                 "col_positions array<double>, row_positions array<double>"
    ).coalesce(1)
    assert pack_joined(ok).count() == 3


def test_image_page_attribution_with_sparse_images(spark):
    """Images must take the page of their ADJACENT text spans, not their
    rank among image spans (ADVICE r1): a doc where only pages 2 and 5
    carry images must map them to pages 2 and 5, not 1 and 2."""
    from pdftabextract_spark.sources.spans import pages_from_spans

    def tsp(page, off):
        return {"kind": "text",
                "text": '{"v":"x","l":10.0,"t":10.0,"w":5.0,"h":5.0,"p":%d}' % page,
                "media_ref": None, "offset": off}

    def isp(ref, off):
        return {"kind": "image", "text": None, "media_ref": ref, "offset": off}

    spans = []
    off = 0
    for page in range(1, 6):
        if page in (2, 5):  # only these pages were scanned
            spans.append(isp("mem://d/%d.png" % page, off)); off += 1
        spans.append(tsp(page, off)); off += 1
        spans.append(tsp(page, off)); off += 1
    docs = spark.createDataFrame(
        [("d", spans)],
        "doc_id string, spans array<struct<"
        "kind string, text string, media_ref string, offset int>>")

    got = {r["page"]: r["media_ref"]
           for r in pages_from_spans(docs).collect()}
    assert got == {2: "mem://d/2.png", 5: "mem://d/5.png"}


def test_image_page_attribution_trailing_and_imageonly(spark):
    """Fallbacks: a trailing image with no following text gets
    prev-text-page + 1; an all-image doc falls back to rank order."""
    from pdftabextract_spark.sources.spans import pages_from_spans

    trailing = [
        {"kind": "text",
         "text": '{"v":"x","l":1.0,"t":1.0,"w":2.0,"h":2.0,"p":1}',
         "media_ref": None, "offset": 0},
        {"kind": "image", "text": None, "media_ref": "mem://t/2.png",
         "offset": 1},
    ]
    imageonly = [
        {"kind": "image", "text": None, "media_ref": "mem://i/1.png", "offset": 0},
        {"kind": "image", "text": None, "media_ref": "mem://i/2.png", "offset": 1},
    ]
    docs = spark.createDataFrame(
        [("t", trailing), ("i", imageonly)],
        "doc_id string, spans array<struct<"
        "kind string, text string, media_ref string, offset int>>")
    got = {(r["doc_id"], r["page"]): r["media_ref"]
           for r in pages_from_spans(docs).collect()}
    assert got == {("t", 2): "mem://t/2.png",
                   ("i", 1): "mem://i/1.png",
                   ("i", 2): "mem://i/2.png"}


def test_image_page_attribution_multi_trailing(spark):
    """VERDICT r2 item 8: several trailing images (no following text) must
    land on DISTINCT monotone pages prev+1, prev+2, ... — the old
    prev+1-for-all fallback collided them onto one page and the
    first-by-offset rule silently dropped all but the first."""
    from pdftabextract_spark.sources.spans import pages_from_spans

    spans = [
        {"kind": "text",
         "text": '{"v":"x","l":1.0,"t":1.0,"w":2.0,"h":2.0,"p":3}',
         "media_ref": None, "offset": 0},
        {"kind": "image", "text": None, "media_ref": "mem://m/a.png",
         "offset": 1},
        {"kind": "image", "text": None, "media_ref": "mem://m/b.png",
         "offset": 2},
        {"kind": "image", "text": None, "media_ref": "mem://m/c.png",
         "offset": 3},
    ]
    docs = spark.createDataFrame(
        [("m", spans)],
        "doc_id string, spans array<struct<"
        "kind string, text string, media_ref string, offset int>>")
    got = {r["page"]: r["media_ref"]
           for r in pages_from_spans(docs).collect()}
    assert got == {4: "mem://m/a.png", 5: "mem://m/b.png",
                   6: "mem://m/c.png"}


def test_fused_profiles_equal_window_formulation(spark):
    """positions_fused (single-exchange Arrow kernel) must produce
    byte-identical per-page borders to the window+agg formulation."""
    from pyspark.sql import functions as F
    from pdftabextract_spark.sources import synth
    from pdftabextract_spark.sources.spans import textboxes_from_spans
    from pdftabextract_spark.plans.pipeline import (
        PipelineParams, positions_fused, page_extents, column_positions,
        row_positions)

    params = synth.CorpusParams(seed=4242, n_docs=25, n_cols=5)
    pipe = PipelineParams(n_cols=5, min_col_width=params.min_col_width,
                          min_row_height=params.min_row_height)
    boxes = (textboxes_from_spans(synth.span_docs_df(spark, params))
             .where((F.col("width") > 0) & (F.col("height") > 0)))

    extents = page_extents(boxes)
    old = (column_positions(boxes, pipe, extents)
           .join(row_positions(boxes, pipe, extents), ["doc_id", "page"]))
    new = positions_fused(boxes, pipe, persist=False)

    j = old.alias("o").join(new.alias("n"), ["doc_id", "page"], "full_outer")
    diff = j.where(~(
        F.col("o.col_positions").eqNullSafe(F.col("n.col_positions"))
        & F.col("o.row_positions").eqNullSafe(F.col("n.row_positions")))).count()
    assert diff == 0
    assert new.count() == old.count() > 0


def test_skewed_page_counts_extraction(spark):
    """North-star skew hardening: pages-per-doc is heavy-tailed at corpus
    scale. A corpus where a few docs carry 50x the median page count must
    extract with exact span-sequence equality — the unit of work is the
    PAGE key (doc_id, page), so a mega-doc spreads across partitions
    instead of hot-spotting one."""
    from pyspark.sql import functions as F
    from pdftabextract_spark.sources import synth
    from pdftabextract_spark.plans.pipeline import (
        PipelineParams, extract_from_span_table)

    params = synth.CorpusParams(seed=97, n_docs=14, n_cols=5,
                                page_dist=((1, 0.6), (2, 0.25), (50, 0.15)))
    pipe = PipelineParams(n_cols=5, min_col_width=params.min_col_width,
                          min_row_height=params.min_row_height)
    result = extract_from_span_table(synth.span_docs_df(spark, params), pipe)
    expected = synth.expected_spans_df(spark, params)
    # the corpus really is skewed
    pages_per_doc = (synth.pages_df(spark, params)
                     .groupBy("doc_id").count().agg(
                         F.max("count"), F.expr("percentile(count, 0.5)"))
                     .first())
    assert pages_per_doc[0] >= 25 * max(pages_per_doc[1], 1)

    j = result.alias("r").join(expected.alias("e"),
                               ["doc_id", "offset"], "full_outer")
    bad = j.where(~(F.col("r.kind").eqNullSafe(F.col("e.kind"))
                    & F.col("r.text").eqNullSafe(F.col("e.text")))).count()
    assert bad == 0 and expected.count() > 0
