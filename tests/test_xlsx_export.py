"""Native XLSX sink: structure + value round-trip via independent
stdlib parsing (zip + ElementTree), incl. the wide-frame export path."""

import os
import tempfile
import xml.etree.ElementTree as ET
import zipfile

from pdftabextract_spark.operators.xlsx import (
    _col_letter, dataframe_to_xlsx, write_xlsx)

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _read_sheet(path):
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
                "xl/_rels/workbook.xml.rels",
                "xl/worksheets/sheet1.xml"} <= names
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    rows = {}
    for row in root.iter(NS + "row"):
        cells = {}
        for c in row.iter(NS + "c"):
            ref = c.attrib["r"]
            t = c.attrib.get("t")
            if t == "inlineStr":
                cells[ref] = c.find(NS + "is").find(NS + "t").text or ""
            else:
                cells[ref] = c.find(NS + "v").text
        rows[int(row.attrib["r"])] = cells
    return rows


def test_col_letters():
    assert [_col_letter(i) for i in (0, 1, 25, 26, 27, 701, 702)] == \
        ["A", "B", "Z", "AA", "AB", "ZZ", "AAA"]


def test_write_xlsx_values_and_escaping():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.xlsx")
        write_xlsx(p, ["name", "n", "note"],
                   [("a<b>&\"'", 3, "x"), ("row2", 2.5, None)])
        rows = _read_sheet(p)
        assert rows[1] == {"A1": "name", "B1": "n", "C1": "note"}
        assert rows[2]["A2"] == "a<b>&\"'"
        assert rows[2]["B2"] == "3"
        assert rows[3]["B3"] == "2.5"
        assert "C3" not in rows[3]  # None cells omitted (to_excel NaN blank)


def test_write_xlsx_nonfinite_and_quote_sheetname():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "nf.xlsx")
        write_xlsx(p, ["x"], [(float("nan"),), (float("inf"),), (1.5,)],
                   sheet_name='Res "2026" & more')
        rows = _read_sheet(p)
        assert "A2" not in rows.get(2, {})   # NaN -> blank
        assert "A3" not in rows.get(3, {})   # inf -> blank
        assert rows[4]["A4"] == "1.5"
        import zipfile as zf
        with zf.ZipFile(p) as z:
            wb = ET.fromstring(z.read("xl/workbook.xml"))  # parses = well-formed
        ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
        assert wb.find(ns + "sheets")[0].attrib["name"] == 'Res "2026" & more'


def test_write_xlsx_numpy_scalars_and_control_chars():
    """ADVICE r3: numpy scalars must land as numeric cells (not inline
    text) and XML-1.0-illegal control chars must be stripped, not
    escaped (Excel/openpyxl reject files containing them)."""
    import numpy as np
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "np.xlsx")
        write_xlsx(p, ["x"],
                   [(np.int64(7),), (np.float32(2.5),), (np.float64("nan"),),
                    (np.bool_(True),), ("a\x00b\x07c\tkeep",)])
        rows = _read_sheet(p)
        sheet_cells = {r: c for r, c in rows.items()}
    # numeric cells have no t= attribute -> parsed as <v> text
    assert sheet_cells[2]["A2"] == "7"
    assert sheet_cells[3]["A3"] == "2.5"
    assert "A4" not in sheet_cells.get(4, {})  # np NaN -> blank
    assert sheet_cells[5]["A5"] == "1"         # np.bool_ -> boolean cell
    assert sheet_cells[6]["A6"] == "ab" + "c\tkeep"  # \x00,\x07 stripped, tab kept


def test_cells_to_wide_empty(spark):
    from pdftabextract_spark.operators.export import cells_to_wide
    empty = spark.createDataFrame(
        [], "doc_id string, page int, row_idx int, col_idx int, cell_text string")
    wide = cells_to_wide(empty)
    assert wide.count() == 0
    assert wide.columns == ["doc_id", "page", "row_idx", "from_page"]


def test_dataframe_to_xlsx_wide_cells(spark):
    """The reference's final export step (catalog_30s.py:294-296): the
    wide colNN frame written sheet-wise, row order pinned."""
    from pdftabextract_spark.operators.export import cells_to_wide
    cells = spark.createDataFrame(
        [("d", 1, 0, 0, "a"), ("d", 1, 0, 1, "b"),
         ("d", 1, 1, 0, "c"), ("d", 2, 0, 0, "z")],
        "doc_id string, page int, row_idx int, col_idx int, cell_text string")
    wide = cells_to_wide(cells)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "cells.xlsx")
        dataframe_to_xlsx(wide, p, sheet_name="cells",
                          order_by=["doc_id", "page", "row_idx"])
        rows = _read_sheet(p)
    header = [rows[1][k] for k in sorted(rows[1], key=lambda r: r[0])]
    assert header[:3] == ["doc_id", "page", "row_idx"]
    col1 = header.index("col1")
    # row 2 = (d,1,row0): col1=a col2=b ; row 4 = (d,2,row0): col1=z
    assert rows[2][_col_letter(col1) + "2"] == "a"
    assert rows[2][_col_letter(col1 + 1) + "2"] == "b"
    assert rows[4][_col_letter(col1) + "4"] == "z"
