"""schoollist-style composition (§3.2): double-page corpus -> separator
detection from Hough lines -> box split + renumber -> text-path grid
extraction -> cells equal the single-page ground truth."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdftabextract_spark.sources import synth
from pdftabextract_spark.kernels.png import encode_png
from pdftabextract_spark.operators.imgstage import detect_lines
from pdftabextract_spark.operators.splitpages import (
    find_separator_positions, split_boxes)
from pdftabextract_spark.plans.pipeline import PipelineParams, extract_cells
from pdftabextract_spark.operators.clustering import cluster_centers
from pdftabextract_spark.operators.imgstage import line_border_centers

PARAMS = synth.CorpusParams(seed=21, n_docs=4, n_cols=4,
                            page_dist=((2, 1.0),), with_images=False)


def _double_page_tables(spark):
    """Pair consecutive pages of each doc into double pages: right half's
    boxes shift +w; a strong separator line sits at x=w (both halves share
    the family layout so w is identical)."""
    col_positions = synth.family_layout(PARAMS)
    boxes_rows, pages_rows, media_rows = [], [], []
    for doc_idx in range(PARAMS.n_docs):
        doc_id, pages = synth.gen_doc(doc_idx, PARAMS, col_positions)
        for k in range(0, len(pages), 2):
            a, b = pages[k], pages[k + 1]
            dp = k // 2 + 1
            w = a["page_w"]
            width = w + b["page_w"]
            height = max(a["page_h"], b["page_h"])
            ref = "mem://%s/dp%d.png" % (doc_id, dp)
            pages_rows.append((doc_id, dp, width, height, ref, width, height))
            bid = 0
            for l, t, bw, bh, v in a["boxes"]:
                boxes_rows.append((doc_id, dp, bid, l, t, bw, bh, v))
                bid += 1
            for l, t, bw, bh, v in b["boxes"]:
                boxes_rows.append((doc_id, dp, bid, l + w, t, bw, bh, v))
                bid += 1
            # image: separator + each half's grid verticals (enough for the
            # separator pick; rows come from text)
            img = np.full((height, width), 255, dtype=np.uint8)
            for p in list(col_positions) + [w + p for p in col_positions]:
                x = int(round(p))
                if 0 <= x < width - 1:
                    img[:, x:x + 2] = 0
            img[:, w:w + 3] = 0  # the separator line
            media_rows.append((ref, encode_png(img)))
    boxes = spark.createDataFrame(
        boxes_rows, "doc_id string, page int, box_id int, left double, top double, "
                    "width double, height double, value string")
    pages_df = spark.createDataFrame(
        pages_rows, "doc_id string, page int, width int, height int, "
                    "media_ref string, img_w int, img_h int")
    media = spark.createDataFrame(media_rows, "media_ref string, bytes binary")
    return boxes, pages_df, media, col_positions


def test_double_page_split_extraction(spark):
    boxes, pages_df, media, col_positions = _double_page_tables(spark)
    w_half = float(col_positions[-1] + PARAMS.margin_x)

    lines = detect_lines(pages_df, media)
    centers = line_border_centers(lines, pages_df, "v",
                                  PARAMS.min_col_width / 4)
    seps = find_separator_positions(
        centers.select("doc_id", "page", "center"), pages_df)
    got = {r["split_pos"] for r in seps.collect()}
    assert all(abs(p - w_half) < 6 for p in got), (got, w_half)

    split, _page_map = split_boxes(boxes, seps, pages_df)
    # drop zero-area decoys before comparing counts
    live = split.where((F.col("width") > 0) & (F.col("height") > 0))

    pipe = PipelineParams(n_cols=PARAMS.n_cols,
                          min_col_width=PARAMS.min_col_width,
                          min_row_height=PARAMS.min_row_height)
    cells = extract_cells(live, pipe)
    gt = synth.gt_cells_df(spark, PARAMS)

    # split pages renumber 1..2N in original order == the generator's pages
    joined = cells.join(
        gt.withColumnRenamed("cell_text", "gt_text"),
        ["doc_id", "page", "row_idx", "col_idx"], "full_outer")
    bad = joined.where(~F.col("cell_text").eqNullSafe(F.col("gt_text")))
    rows = bad.limit(10).collect()
    assert not rows, "double-page mismatches: %s" % rows
