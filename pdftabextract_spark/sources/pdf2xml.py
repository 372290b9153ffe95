"""pdf2xml ingestion: poppler `pdftohtml -xml` output -> the engine's span
corpus (corpus-prep step; SURVEY §2.1 read_xml/parse_pages).

Files are parsed executor-side (binaryFiles -> ElementTree inside
mapPartitions batches) so a directory of per-document XML files ingests in
parallel. Parity with /root/reference/pdftabextract/common.py:34-150:

* page attrs width/height via int(float(...)) truncation (common.py:128);
* text attrs left/top/width/height likewise (common.py:175-185);
* value = ' '.join(itertext()) flattening <b>/<i> markup (common.py:144);
* zero-area boxes dropped (common.py:138-141, geom.py:145-151);
* image selection 'first' | 'topleft' (common.py:97-122).
"""

import os
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_BOXES_SCHEMA = ("doc_id string, page int, box_id int, left double, top double, "
                 "width double, height double, value string")
_PAGES_SCHEMA = ("doc_id string, page int, width int, height int, "
                 "media_ref string, img_w int, img_h int")


def _parse_doc(doc_id: str, xml_bytes: bytes, select_image="first"):
    root = ET.fromstring(xml_bytes)
    boxes, pages = [], []
    for p in root.findall("page"):
        p_num = int(p.attrib["number"])
        p_w = int(float(p.attrib["width"]))
        p_h = int(float(p.attrib["height"]))

        imgs = p.findall("image")
        imgfile = None
        img_w = img_h = None
        if imgs:
            chosen = None
            if select_image == "first" or len(imgs) == 1:
                chosen = imgs[0]
            elif select_image == "topleft":
                for tag in imgs:
                    if int(tag.attrib.get("top", "1")) == 0 and int(tag.attrib.get("left", "1")) == 0:
                        chosen = tag
                        break
                if chosen is None:
                    raise ValueError(
                        "multiple images on page %d but none at top-left" % p_num)
            else:
                raise ValueError("invalid select_image %r" % select_image)
            imgfile = chosen.attrib.get("src")
            if "width" in chosen.attrib:
                img_w = int(float(chosen.attrib["width"]))
                img_h = int(float(chosen.attrib["height"]))
        pages.append((doc_id, p_num, p_w, p_h, imgfile, img_w, img_h))

        box_id = 0
        for t in p.findall("text"):
            w = int(float(t.attrib["width"]))
            h = int(float(t.attrib["height"]))
            left = int(float(t.attrib["left"]))
            top = int(float(t.attrib["top"]))
            if w <= 0 or h <= 0:  # zero-area drop at scan
                continue
            value = " ".join(t.itertext())
            boxes.append((doc_id, p_num, box_id,
                          float(left), float(top), float(w), float(h), value))
            box_id += 1
    return boxes, pages


def read_pdf2xml_dir(spark: SparkSession, path: str, select_image="first"):
    """Parse every .xml file under ``path`` (doc_id = file basename).
    Returns (textboxes DF, pages DF)."""
    files = spark.sparkContext.binaryFiles(os.path.join(path, "*.xml"))

    def to_boxes(items):
        for fname, data in items:
            doc_id = os.path.splitext(os.path.basename(fname))[0]
            boxes, _ = _parse_doc(doc_id, data, select_image)
            for b in boxes:
                yield b

    def to_pages(items):
        for fname, data in items:
            doc_id = os.path.splitext(os.path.basename(fname))[0]
            _, pages = _parse_doc(doc_id, data, select_image)
            for p in pages:
                yield p

    boxes_df = spark.createDataFrame(files.mapPartitions(to_boxes), _BOXES_SCHEMA)
    pages_df = spark.createDataFrame(files.mapPartitions(to_pages), _PAGES_SCHEMA)
    return boxes_df, pages_df


def spans_from_pdf2xml(boxes: DataFrame, pages: DataFrame) -> DataFrame:
    """Assemble the north-rule span table from parsed pdf2xml rows: per doc,
    interleave one image span per page (when present) with its text spans
    in reading order (top, left)."""
    from pyspark.sql import Window as W, functions as F

    text_spans = boxes.select(
        "doc_id", "page",
        F.lit("text").alias("kind"),
        F.to_json(F.struct(
            F.col("value").alias("v"), F.col("left").alias("l"),
            F.col("top").alias("t"), F.col("width").alias("w"),
            F.col("height").alias("h"), F.col("page").alias("p"))).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(1).alias("_k"), F.col("top").alias("_o1"), F.col("left").alias("_o2"))
    image_spans = pages.where(F.col("media_ref").isNotNull()).select(
        "doc_id", "page",
        F.lit("image").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        "media_ref",
        F.lit(0).alias("_k"), F.lit(-1.0).alias("_o1"), F.lit(-1.0).alias("_o2"))
    both = text_spans.unionByName(image_spans)
    w = W.partitionBy("doc_id").orderBy("page", "_k", "_o1", "_o2")
    numbered = both.withColumn("offset", F.row_number().over(w) - 1)
    from .spans import assemble_span_table
    return assemble_span_table(
        numbered.select("doc_id", "kind", "text", "media_ref", "offset"))
