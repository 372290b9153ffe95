"""Debug overlay sink (VERDICT r2 item 6 — reference imgproc.py:364-442):
pure-numpy rasterization + the Spark overlay operators, pinned against
the reference's committed ALA pagegrids."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdftabextract_spark.kernels import draw as D
from pdftabextract_spark.kernels.png import decode_png

REF_DIR = "/root/reference/examples/catalogue_30s"
GOLD_GRIDS = os.path.join(
    REF_DIR, "generated_output/ALA1934_RR-excerpt.pdf.pagegrids.json")
needs_ref = pytest.mark.skipif(
    not os.path.exists(GOLD_GRIDS), reason="reference example data not present")

RED = (255, 0, 0)


def test_draw_segment_within_half_pixel():
    img = np.zeros((60, 80, 3), np.uint8)
    x0, y0, x1, y1 = 3.2, 5.7, 71.9, 48.3
    D.draw_segment(img, x0, y0, x1, y1, RED, width=1)
    ys, xs = np.nonzero((img == RED).all(axis=2))
    assert len(xs) >= 60
    # every painted pixel within ~0.71px of the ideal segment
    dx, dy = x1 - x0, y1 - y0
    L = np.hypot(dx, dy)
    d = np.abs(dy * (xs - x0) - dx * (ys - y0)) / L
    assert d.max() <= 0.75, d.max()


def test_draw_grid_exact_positions():
    img = np.zeros((100, 200, 3), np.uint8)
    cols, rows = [10.4, 99.6], [20.0, 77.49]
    D.draw_grid(img, cols, rows, color=RED, width=1, scale_x=1.0, scale_y=1.0)
    red = (img == RED).all(axis=2)
    assert sorted(np.where(red.all(axis=0))[0]) == [10, 100]
    assert sorted(np.where(red.all(axis=1))[0]) == [20, 77]
    # scaled draw
    img2 = np.zeros((100, 200, 3), np.uint8)
    D.draw_grid(img2, [25.0], [25.0], color=RED, width=1,
                scale_x=2.0, scale_y=0.5)
    red2 = (img2 == RED).all(axis=2)
    assert list(np.where(red2.all(axis=0))[0]) == [50]
    assert list(np.where(red2.all(axis=1))[0]) == [12]  # rint(12.5) even


def test_draw_polar_lines_vertical_and_horizontal():
    img = np.zeros((120, 160, 3), np.uint8)
    D.draw_polar_lines(img, [(40.0, 0.0)], color=RED, width=1)      # x=40
    assert (img[:, 40] == RED).all()
    img2 = np.zeros((120, 160, 3), np.uint8)
    D.draw_polar_lines(img2, [(70.0, np.pi / 2)], color=(0, 255, 0),
                       width=1)                                      # y=70
    assert (img2[70, :, 1] == 255).sum() == 160


def _gold_positions():
    """Committed pagegrids -> per-page sorted unique col/row borders."""
    grids = json.load(open(GOLD_GRIDS))
    out = {}
    for pg, rows in grids.items():
        cols, rws = set(), set()
        for row in rows:
            for (l, t), (r, b) in row:
                cols.add(l); cols.add(r); rws.add(t); rws.add(b)
        out[int(pg)] = (sorted(cols), sorted(rws))
    return out


@needs_ref
@pytest.mark.slow
def test_grid_overlay_matches_committed_pagegrids(spark):
    """Render the committed ALA pagegrids onto the real scanned pages via
    the Spark overlay sink; every painted border line must sit within 1px
    of the committed position scaled into image space (and nothing else
    may be painted full-span)."""
    import xml.etree.ElementTree as ET
    from pdftabextract_spark.operators.overlay import render_grid_overlays

    tree = ET.parse(os.path.join(REF_DIR, "data/ALA1934_RR-excerpt.pdf.xml"))
    page_dims = {int(p.attrib["number"]): (float(p.attrib["width"]),
                                           float(p.attrib["height"]))
                 for p in tree.getroot().iter("page")}
    gold = _gold_positions()

    pages_rows, media_rows, pos_rows = [], [], []
    for pg in sorted(gold):
        img_path = os.path.join(
            REF_DIR, "data/ALA1934_RR-excerpt.pdf-%d_1.png" % pg)
        raw = open(img_path, "rb").read()
        import struct
        iw, ih = struct.unpack(">II", raw[16:24])
        w, h = page_dims[pg]
        ref = "mem://ala/%d" % pg
        pages_rows.append(("ala", pg, int(w), int(h), ref, iw, ih))
        media_rows.append((ref, bytearray(raw)))
        pos_rows.append(("ala", pg, gold[pg][0], gold[pg][1]))

    pages = spark.createDataFrame(
        pages_rows, "doc_id string, page int, width int, height int, "
                    "media_ref string, img_w int, img_h int")
    media = spark.createDataFrame(media_rows, "media_ref string, bytes binary")
    positions = spark.createDataFrame(
        pos_rows, "doc_id string, page int, col_positions array<double>, "
                  "row_positions array<double>")

    out = {r["page"]: r for r in render_grid_overlays(
        positions, pages, media, color=RED, line_width=1).collect()}
    assert sorted(out) == sorted(gold)

    for pg, r in out.items():
        ov = decode_png(bytes(r["overlay"]))
        red = (ov[:, :, 0] == 255) & (ov[:, :, 1] == 0) & (ov[:, :, 2] == 0)
        iw, ih = ov.shape[1], ov.shape[0]
        w, h = page_dims[pg]
        want_cols = {int(x) for x in np.rint(
            np.array(gold[pg][0]) * (iw / w))}
        want_rows = {int(y) for y in np.rint(
            np.array(gold[pg][1]) * (ih / h))}
        got_cols = set(np.where(red.all(axis=0))[0])
        got_rows = set(np.where(red.all(axis=1))[0])
        # every committed border has a painted line within 1px, and every
        # painted full-span line corresponds to a committed border
        for want, got in ((want_cols, got_cols), (want_rows, got_rows)):
            for x in want:
                assert min(abs(x - g) for g in got) <= 1, (pg, x, sorted(got))
            for g in got:
                assert min(abs(g - x) for x in want) <= 1, (pg, g, sorted(want))
