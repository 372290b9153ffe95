"""Minimal native XLSX sink — closes the reference's `df.to_excel` export
step (examples/catalogue_30s/catalog_30s.py:294-296, schoollist_1.py:331,
schoollist_2.py:347: the wide colNN frame written with index=False).

No spreadsheet library exists in the runtime, so this writes the OOXML
parts directly: an .xlsx file is a ZIP of five XML parts; cells use
inline strings (no shared-string table) which every reader including
pandas/openpyxl/Excel accepts. Export-only driver-side materialization,
same contract as cells_to_wide -> CSV (the wide pivot is already a
collect-sized artifact by design, SURVEY §1.5)."""

import math
import numbers
import re
import zipfile

import numpy as np
from xml.sax.saxutils import escape, quoteattr

# XML 1.0 forbids C0 control chars except tab/newline/CR; Excel rejects
# files containing them even escaped, so strip rather than escape.
_XML_ILLEGAL = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    '</Types>')

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    '</Relationships>')

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name=%s sheetId="1" r:id="rId1"/></sheets></workbook>')

_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    '</Relationships>')


def _col_letter(i):
    """0-based column index -> A1 letters."""
    s = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def _cell_xml(ref, value):
    # numbers.Integral / numbers.Real (not bare int/float) so numpy
    # scalars (np.int64, np.float32) become numeric cells too, coerced
    # through int()/float() for a stable decimal repr
    if value is None:
        return ""
    if isinstance(value, (bool, np.bool_)):
        return '<c r="%s" t="b"><v>%d</v></c>' % (ref, int(value))
    if isinstance(value, numbers.Integral):
        return '<c r="%s"><v>%r</v></c>' % (ref, int(value))
    if isinstance(value, numbers.Real):
        value = float(value)
        if not math.isfinite(value):
            return ""  # NaN/inf have no OOXML numeric form (to_excel blanks NaN)
        return '<c r="%s"><v>%r</v></c>' % (ref, value)
    return ('<c r="%s" t="inlineStr"><is><t xml:space="preserve">%s</t></is></c>'
            % (ref, escape(_XML_ILLEGAL.sub("", str(value)))))


def write_xlsx(path, header, rows, sheet_name="Sheet1"):
    """Write header + iterable of row tuples as a single-sheet .xlsx."""
    body = []
    all_rows = [list(header)] + [list(r) for r in rows]
    for ri, row in enumerate(all_rows):
        cells = "".join(
            _cell_xml("%s%d" % (_col_letter(ci), ri + 1), v)
            for ci, v in enumerate(row))
        body.append('<row r="%d">%s</row>' % (ri + 1, cells))
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheetData>%s</sheetData></worksheet>' % "".join(body))
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK % quoteattr(sheet_name))
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def dataframe_to_xlsx(df, path, sheet_name="Sheet1", order_by=None):
    """Spark DataFrame -> .xlsx (header from the schema, to_excel
    index=False parity). ``order_by`` optionally fixes row order — pass
    the same keys the CSV export sorts by for identical artifacts."""
    if order_by:
        df = df.orderBy(*order_by)
    rows = ([None if v is None else v for v in r] for r in df.collect())
    write_xlsx(path, df.columns, rows, sheet_name=sheet_name)
