"""Excel (.xlsx) sink — stdlib-only (zipfile + hand-rendered OOXML).

Reference: /root/reference/internal/output/excel.go (784 LoC on excelize):
default sheet name "Sheet1" (:131-132), header row from record keys
(:250-253, sorted for determinism like the XML sink), typed cells, and a
max-rows-per-sheet guard (DefaultExcelMaxSheetRows, :39). The sandbox has
no excel library, so this writer emits the minimal OOXML package itself:
[Content_Types].xml + _rels + workbook + one worksheet with inline
strings — readable by Excel/LibreOffice/openpyxl.

Spark-first split: mirrors the XML sink — an xlsx is a single ZIP
artifact, so rows stream to the driver via toLocalIterator (bounded
memory) while all upstream computation stays distributed. Numbers write
as numeric cells, booleans as b-cells, everything else as inline strings
(nested values via the same JSON stringification as the CSV sink).
"""

from __future__ import annotations

import zipfile

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .xmlsink import escape_xml

DEFAULT_SHEET = "Sheet1"
MAX_SHEET_ROWS = 1_048_576  # the .xlsx format limit (excel.go caps below it)

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _workbook_xml(sheet_name: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape_xml(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )


def col_letter(idx: int) -> str:
    """0-based column index -> A1-style letters (0->A, 26->AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    if isinstance(value, bytes):
        value = value.decode("utf-8", "replace")
    return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{escape_xml(str(value))}</t></is></c>")


def row_xml(row_no: int, values: list) -> str:
    cells = "".join(
        _cell_xml(f"{col_letter(i)}{row_no}", v) for i, v in enumerate(values)
    )
    return f'<row r="{row_no}">{cells}</row>'


def write_excel(df: DataFrame, path: str, sheet_name: str = DEFAULT_SHEET,
                include_headers: bool = True,
                max_sheet_rows: int = MAX_SHEET_ROWS) -> int:
    """Write one worksheet; returns data rows written. Raises when the row
    count would exceed the sheet limit (the reference rotates sheets; a
    Spark user should partition output files instead)."""
    from .sinks import csv_safe

    flat = csv_safe(df)
    cols = [f.name for f in flat.schema.fields]

    import io
    buf = io.StringIO()
    buf.write('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              '<worksheet xmlns="http://schemas.openxmlformats.org/'
              'spreadsheetml/2006/main"><sheetData>')
    row_no = 0
    if include_headers:
        row_no += 1
        buf.write(row_xml(row_no, cols))
    n = 0
    for row in flat.toLocalIterator():
        row_no += 1
        if row_no > max_sheet_rows:
            raise ValueError(
                f"xlsx sheet limit exceeded ({max_sheet_rows} rows); "
                "partition the output instead")
        buf.write(row_xml(row_no, [row[c] for c in cols]))
        n += 1
    buf.write("</sheetData></worksheet>")

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _workbook_xml(sheet_name))
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", buf.getvalue())
    return n
