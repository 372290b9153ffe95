"""Pluggable clustering, stddev/empty-section cluster filters, export
sinks, spark adjust_bad_positions."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdftabextract_spark.operators.clustering import (
    cluster_centers, cluster_centers_pluggable)
from pdftabextract_spark.operators.imgstage import filter_empty_cluster_sections
from pdftabextract_spark.operators.model import spark_adjust_bad_positions
from pdftabextract_spark.operators.export import (
    cells_to_wide, page_grids_json, boxes_to_pdf2xml, col_name)


def _vals_df(spark, vals, doc="d1", page=1):
    return spark.createDataFrame([(doc, page, float(v)) for v in vals],
                                 "doc_id string, page int, pos double")


def test_pluggable_break_dist_matches_window_op(spark):
    vals = [1, 2, 3, 50, 51, 52, 200]
    df = _vals_df(spark, vals)
    a = cluster_centers(df, "pos", 20.0, ("doc_id", "page")).collect()
    b = cluster_centers_pluggable(df, "pos", ("doc_id", "page"),
                                  method="break_dist", dist_thresh=20.0).collect()
    assert sorted((r["center"], r["n"]) for r in a) == \
        sorted((r["center"], r["n"]) for r in b)


def test_pluggable_hierarchical(spark):
    vals = [1, 2, 3, 50, 51, 52, 200]
    df = _vals_df(spark, vals)
    got = cluster_centers_pluggable(df, "pos", ("doc_id", "page"),
                                    method="hierarchical", t=20.0,
                                    criterion="distance").collect()
    centers = sorted(r["center"] for r in got)
    assert centers == [2.0, 51.0, 200.0]
    # bare kwargs hit the fclusterdata default criterion='inconsistent':
    # a depth-2 window holds <=3 link heights, so no coefficient can
    # exceed sqrt(2) (~1.414) and t=2 keeps the whole page one cluster
    one = cluster_centers_pluggable(df, "pos", ("doc_id", "page"),
                                    method="hierarchical", t=2.0).collect()
    assert len(one) == 1 and one[0]["n"] == 7


def test_stddev_filter(spark):
    # one tight cluster (sd ~0.8) and one loose cluster (sd ~8)
    vals = [10, 11, 12, 100, 120]
    df = _vals_df(spark, vals)
    got = cluster_centers_pluggable(df, "pos", ("doc_id", "page"),
                                    method="break_dist", dist_thresh=50.0,
                                    stddev_thresh=5.0).collect()
    assert len(got) == 1 and got[0]["center"] == 11.0


def test_empty_section_filter_matches_kernel(spark):
    # columns at 100/200/300/400; boxes only near 100, 200, 400
    centers = spark.createDataFrame(
        [("d1", 1, i, c, 3) for i, c in enumerate([100.0, 200.0, 300.0, 400.0])],
        "doc_id string, page int, cluster_id int, center double, n long")
    box_rows = []
    bid = 0
    for x in (95.0, 96.0, 97.0, 195.0, 196.0, 197.0, 395.0, 396.0, 397.0):
        box_rows.append(("d1", 1, bid, x, 10.0, 4.0, 10.0, "t"))
        bid += 1
    boxes = spark.createDataFrame(
        box_rows, "doc_id string, page int, box_id int, left double, top double, "
                  "width double, height double, value string")
    kept = filter_empty_cluster_sections(centers, boxes, "v", n_texts_ratio=0.5)
    got = sorted(r["center"] for r in kept.collect())
    # band (200,300] has zero boxes -> cluster 300 dropped... but it is the
    # predecessor of kept 400: re-inclusion only applies before the FIRST
    # kept cluster (imgproc.py:352-358) — here 100 is first kept, so 300 stays dropped
    assert got == [100.0, 200.0, 400.0]


def test_spark_adjust_bad_positions(spark):
    pages = {
        0: [8.0, 28.0, 33.0, 38.0], 1: [10.0, 30.0, 35.0, 40.0],
        2: [10.0, 30.0, 35.0, 40.0], 3: [0.0, 20.0, 25.0, 32.0],
        4: [3.0, 21.0, 25.0, 31.0], 5: [3.0, 21.0, 25.0, 31.0],
        6: [3.0, 21.0, 20.0, 31.0],
        7: [3.0, 21.0, 25.0, 28.0, 31.0],
        8: [3.0, 21.0, 25.0, 70.0],
    }
    df = spark.createDataFrame([("d", p, v) for p, v in pages.items()],
                               "doc_id string, page int, positions array<double>")
    out = {r["page"]: r["positions_fixed"]
           for r in spark_adjust_bad_positions(df).collect()}
    from pdftabextract_spark.kernels.clustering import adjust_bad_positions
    expect = adjust_bad_positions({p: np.array(v) for p, v in pages.items()})
    for p in pages:
        assert np.allclose(out[p], expect[p]), p


def test_col_name_padding():
    assert col_name(0, 9) == "col01"
    assert col_name(16, 17) == "col17"
    assert col_name(0, 3) == "col1"


def test_exports(spark):
    cells = spark.createDataFrame(
        [("d1", 1, 0, 0, "a"), ("d1", 1, 0, 1, "b"),
         ("d1", 1, 1, 0, ""), ("d1", 1, 1, 1, "d")],
        "doc_id string, page int, row_idx int, col_idx int, cell_text string")
    wide = cells_to_wide(cells).collect()
    assert [r["col1"] for r in wide] == ["a", ""]
    assert [r["col2"] for r in wide] == ["b", "d"]
    assert wide[0]["from_page"] == 1

    positions = spark.createDataFrame(
        [("d1", 1, [0.0, 10.0, 20.0], [0.0, 5.0])],
        "doc_id string, page int, col_positions array<double>, row_positions array<double>")
    grid = json.loads(page_grids_json(positions).collect()[0]["grid_json"])
    assert grid == [[[[0.0, 0.0], [10.0, 5.0]], [[10.0, 0.0], [20.0, 5.0]]]]

    boxes = spark.createDataFrame(
        [("d1", 1, 0, 10.6, 20.4, 30.0, 40.0, "a<b&c")],
        "doc_id string, page int, box_id int, left double, top double, "
        "width double, height double, value string")
    pages = spark.createDataFrame([("d1", 1, 600, 800, None, None, None)],
                                  "doc_id string, page int, width int, height int, "
                                  "media_ref string, img_w int, img_h int")
    xml = boxes_to_pdf2xml(boxes, pages).collect()[0]["xml"]
    assert '<text top="20" left="11" width="30" height="40">a&lt;b&amp;c</text>' in xml
    assert '<page number="1"' in xml and 'width="600"' in xml
    # round-trips through the ingester
    import xml.etree.ElementTree as ET
    root = ET.fromstring(xml)
    assert root.find("page").find("text") is not None
