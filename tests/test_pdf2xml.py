"""pdf2xml ingestion against the reference's own example XML (ALA
catalogue excerpt) plus a synthetic file exercising the parse quirks."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pdftabextract_spark.sources.pdf2xml import read_pdf2xml_dir, spans_from_pdf2xml
from pdftabextract_spark.sources.spans import textboxes_from_spans

ALA_XML = "/root/reference/examples/catalogue_30s/data/ALA1934_RR-excerpt.pdf.xml"

SYNTH_XML = """<?xml version="1.0"?>
<pdf2xml producer="poppler">
<page number="1" width="612.5" height="792.9">
  <image top="0" left="0" width="613" height="793" src="p1.png"/>
  <text top="10.9" left="20.2" width="100.7" height="12.3">hello <b>bold</b> tail</text>
  <text top="40" left="20" width="0" height="12">zero-width-drop</text>
  <text top="60.5" left="30.5" width="50.5" height="10.5">plain</text>
</page>
<page number="2" width="612" height="792">
  <text top="5" left="6" width="7" height="8">p2</text>
</page>
</pdf2xml>
"""


@pytest.fixture()
def xml_dir():
    d = tempfile.mkdtemp(prefix="ptx_xml_")
    with open(os.path.join(d, "docA.xml"), "w") as f:
        f.write(SYNTH_XML)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_parse_quirks(spark, xml_dir):
    boxes, pages = read_pdf2xml_dir(spark, xml_dir)
    b = {r["value"]: r for r in boxes.collect()}
    # int(float()) truncation parity (common.py:175-185)
    assert b["hello  bold  tail"]["left"] == 20.0
    assert b["hello  bold  tail"]["top"] == 10.0
    assert b["hello  bold  tail"]["width"] == 100.0
    assert b["hello  bold  tail"]["height"] == 12.0
    # markup flattened via itertext join (note the double spaces — reference parity, common.py:144)
    
    # zero-area dropped
    assert "zero-width-drop" not in b
    p = {r["page"]: r for r in pages.where(F.col("doc_id") == "docA").collect()}
    assert p[1]["width"] == 612 and p[1]["height"] == 792
    assert p[1]["media_ref"] == "p1.png" and p[1]["img_w"] == 613
    assert p[2]["media_ref"] is None


def test_spans_roundtrip(spark, xml_dir):
    boxes, pages = read_pdf2xml_dir(spark, xml_dir)
    span_docs = spans_from_pdf2xml(boxes, pages)
    rows = span_docs.collect()
    assert len(rows) == 1
    spans = rows[0]["spans"]
    kinds = [s["kind"] for s in spans]
    assert kinds == ["image", "text", "text", "text"]
    assert [s["offset"] for s in spans] == [0, 1, 2, 3]
    # exploding back yields the same boxes
    back = textboxes_from_spans(span_docs)
    assert back.count() == boxes.count()
    vals = {r["value"] for r in back.collect()}
    assert vals == {"hello  bold  tail", "plain", "p2"}


def test_reference_ala_example(spark):
    if not os.path.exists(ALA_XML):
        pytest.skip("reference example XML not present")
    d = tempfile.mkdtemp(prefix="ptx_ala_")
    try:
        shutil.copy(ALA_XML, os.path.join(d, "ALA1934.xml"))
        boxes, pages = read_pdf2xml_dir(spark, d)
        n_pages = pages.count()
        assert n_pages == 4  # FIXTURES.md §3: 4 pages, page space 892x1261
        p1 = pages.where(F.col("page") == 1).collect()[0]
        assert (p1["width"], p1["height"]) == (892, 1261)
        assert boxes.count() > 1000  # dense catalogue pages
        # reading order + span assembly work on real data
        spans = spans_from_pdf2xml(boxes, pages)
        total = spans.select(F.explode("spans")).count()
        assert total == boxes.count() + n_pages
    finally:
        shutil.rmtree(d, ignore_errors=True)
