"""Double-page split: separator pick, box splitting + renumbering, image
halving."""

import numpy as np
from pyspark.sql import functions as F

from pdftabextract_spark.operators.splitpages import (
    find_separator_positions, split_boxes, split_media)
from pdftabextract_spark.kernels.png import encode_png, decode_png


def _double_page_fixture(spark):
    # one doc, two double pages, width 1000, separator line near 498
    boxes = [
        # page 1: left half boxes (A), right half boxes (B)
        ("d1", 1, 0, 50.0, 100.0, 80.0, 20.0, "a1"),
        ("d1", 1, 1, 200.0, 300.0, 60.0, 20.0, "a2"),
        ("d1", 1, 2, 550.0, 120.0, 90.0, 20.0, "b1"),
        ("d1", 1, 3, 700.0, 400.0, 60.0, 20.0, "b2"),
        # page 2
        ("d1", 2, 0, 80.0, 90.0, 70.0, 20.0, "c1"),
        ("d1", 2, 1, 600.0, 150.0, 70.0, 20.0, "d1v"),
    ]
    boxes_df = spark.createDataFrame(
        boxes, "doc_id string, page int, box_id int, left double, top double, "
               "width double, height double, value string")
    pages_df = spark.createDataFrame(
        [("d1", 1, 1000, 600, "m1", 1000, 600), ("d1", 2, 1000, 600, "m2", 1000, 600)],
        "doc_id string, page int, width int, height int, media_ref string, "
        "img_w int, img_h int")
    centers = spark.createDataFrame(
        [("d1", 1, 60.0), ("d1", 1, 498.0), ("d1", 1, 940.0),
         ("d1", 2, 120.0), ("d1", 2, 502.0)],
        "doc_id string, page int, center double")
    return boxes_df, pages_df, centers


def test_separator_and_split(spark):
    boxes_df, pages_df, centers = _double_page_fixture(spark)
    seps = find_separator_positions(centers, pages_df)
    got = {(r["doc_id"], r["page"]): r["split_pos"] for r in seps.collect()}
    assert got == {("d1", 1): 498.0, ("d1", 2): 502.0}

    out, page_map = split_boxes(boxes_df, seps, pages_df)
    rows = {(r["page"], r["value"]): (r["left"], r["top"]) for r in out.collect()}
    # page 1 -> new pages 1 (A) and 2 (B); page 2 -> 3 (A) and 4 (B)
    assert rows[(1, "a1")] == (50.0, 100.0)
    assert rows[(1, "a2")] == (200.0, 300.0)
    assert rows[(2, "b1")] == (550.0 - 498.0, 120.0)
    assert rows[(2, "b2")] == (700.0 - 498.0, 400.0)
    assert rows[(3, "c1")] == (80.0, 90.0)
    assert rows[(4, "d1v")] == (600.0 - 502.0, 150.0)

    dims = {r["new_page"]: (r["new_width"], r["new_height"]) for r in page_map.collect()}
    assert dims == {1: (498, 600), 2: (502, 600), 3: (502, 600), 4: (498, 600)}


def test_split_media_halves(spark):
    boxes_df, pages_df, centers = _double_page_fixture(spark)
    seps = find_separator_positions(centers, pages_df)
    img = np.zeros((60, 100), dtype=np.uint8)
    img[:, :50] = 10
    img[:, 50:] = 200
    media = spark.createDataFrame(
        [("m1", bytearray(encode_png(img)))], "media_ref string, bytes binary")
    # force a known split pos for the media test
    seps1 = spark.createDataFrame([("d1", 1, 50.0)],
                                  "doc_id string, page int, split_pos double")
    out = {r["media_ref"]: bytes(r["bytes"]) for r in
           split_media(media, pages_df, seps1).collect()}
    a = decode_png(out["m1#A"])
    b = decode_png(out["m1#B"])
    assert a.shape == (60, 50) and (a == 10).all()
    assert b.shape == (60, 50) and (b == 200).all()
