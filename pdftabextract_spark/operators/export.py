"""Export sinks mirroring the reference's output artifacts.

* ``cells_to_wide``: datatable_to_dataframe parity
  (/root/reference/pdftabextract/extract.py:120-150) — long cells pivot to
  colNN columns (zero-padded names, extract.py:135,147) plus from_page
  (catalog_30s.py:284-286).
* ``page_grids_json``: save_page_grids parity (common.py:45-67) — the
  pdf2xml-viewer JSON shape {page: [[ [[l,t],[r,b]], ... ], ...]}.
* ``boxes_to_pdf2xml``: the repaired-XML sink (catalog_30s.py:150-153) —
  re-serializes textboxes as pdf2xml with int(round()) coordinates
  (common.py:190-196 write-back semantics).
"""

from pyspark.sql import DataFrame, functions as F


def col_name(i: int, n_cols: int) -> str:
    """colNN naming: 1-based, zero-padded to len(str(n_cols + 1)) —
    exact parity with extract.py:135,147."""
    zfill_n = len(str(n_cols + 1))
    return "col" + str(i + 1).zfill(zfill_n)


def cells_to_wide(cells: DataFrame) -> DataFrame:
    """Pivot long cells to one row per (doc, page, row) with colNN columns
    and a from_page column. Pivot happens only at export (engine-internal
    stays long-form — SURVEY §1.5). The ``collect()`` here is a 1-value
    scalar action (max col count) needed to name the pivot columns —
    export-only, never on the analytics hot path."""
    max_col = cells.agg(F.max("col_idx")).collect()[0][0]
    if max_col is None:  # zero cells: empty wide frame, key columns only
        return (cells.select("doc_id", "page", "row_idx")
                .withColumn("from_page", F.col("page")))
    n_cols = max_col + 1
    names = [col_name(i, n_cols) for i in range(n_cols)]
    wide = (cells.groupBy("doc_id", "page", "row_idx")
            .pivot("col_idx", list(range(n_cols)))
            .agg(F.first("cell_text")))
    for i, name in enumerate(names):
        wide = wide.withColumnRenamed(str(i), name)
    return (wide.withColumn("from_page", F.col("page"))
            .orderBy("doc_id", "page", "row_idx"))


def page_grids_json(positions: DataFrame) -> DataFrame:
    """Per page, the viewer-compatible grid JSON: list of rows, each a list
    of cells [[l,t],[r,b]]."""
    from .grid import cells_from_positions
    cells = cells_from_positions(positions)
    rows = (cells
            .groupBy("doc_id", "page", "row_idx")
            .agg(F.array_sort(F.collect_list(F.struct(
                "col_idx",
                F.array(F.array("cell_l", "cell_t"),
                        F.array("cell_r", "cell_b")).alias("rect")))).alias("_c"))
            .select("doc_id", "page", "row_idx",
                    F.transform("_c", lambda c: c["rect"]).alias("cells")))
    grids = (rows.groupBy("doc_id", "page")
             .agg(F.array_sort(F.collect_list(F.struct("row_idx", "cells"))).alias("_r"))
             .select("doc_id", "page",
                     F.to_json(F.transform("_r", lambda r: r["cells"])).alias("grid_json")))
    return grids


def boxes_to_pdf2xml(boxes: DataFrame, pages: DataFrame) -> DataFrame:
    """One row per doc: (doc_id, xml) — repaired textboxes serialized as
    pdf2xml. Coordinates written as int(round()) like the reference's XML
    write-back (common.py:194-195)."""
    text_elem = F.concat(
        F.lit('<text top="'), F.round("top").cast("long").cast("string"),
        F.lit('" left="'), F.round("left").cast("long").cast("string"),
        F.lit('" width="'), F.round("width").cast("long").cast("string"),
        F.lit('" height="'), F.round("height").cast("long").cast("string"),
        F.lit('">'),
        F.regexp_replace(F.regexp_replace(F.regexp_replace(
            F.col("value"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;"),
        F.lit("</text>"))
    per_page_texts = (boxes
                      .groupBy("doc_id", "page")
                      .agg(F.array_join(F.transform(
                          F.array_sort(F.collect_list(F.struct("box_id", text_elem.alias("el")))),
                          lambda x: x["el"]), "\n").alias("texts_xml")))
    page_elem = F.concat(
        F.lit('<page number="'), F.col("page").cast("string"),
        F.lit('" position="absolute" top="0" left="0" width="'),
        F.col("width").cast("string"),
        F.lit('" height="'), F.col("height").cast("string"), F.lit('">\n'),
        F.coalesce("texts_xml", F.lit("")), F.lit("\n</page>"))
    pages_xml = (pages.join(per_page_texts, ["doc_id", "page"], "left")
                 .groupBy("doc_id")
                 .agg(F.array_join(F.transform(
                     F.array_sort(F.collect_list(F.struct("page", page_elem.alias("el")))),
                     lambda x: x["el"]), "\n").alias("pages_xml")))
    return pages_xml.select(
        "doc_id",
        F.concat(F.lit('<pdf2xml producer="pdftabextract_spark">\n'),
                 F.col("pages_xml"), F.lit("\n</pdf2xml>")).alias("xml"))
