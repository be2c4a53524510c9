"""Minimal XLSX (SpreadsheetML, ECMA-376) writer for ``csv_to_xls``.

The reference (common.py:652-661) converts a finished CSV report to a
spreadsheet via the ``xlsxwriter`` package: one worksheet, every cell
written as text, output path ``filename[:-4] + '.xlsx'``.  That
package isn't in this container, and an .xlsx file is just a ZIP of
five small XML parts, so this module writes them directly — same
observable contract (a standards-valid workbook whose sheet1 holds the
CSV's cells as strings), no third-party dependency.

Cells are emitted as inline strings (``t="inlineStr"``) so no shared-
strings table is needed and the part can be streamed row-by-row —
the writer never holds more than one CSV row in memory, which is the
right shape for converting a large crawl report.
"""

from __future__ import annotations

import csv
import zipfile
from xml.sax.saxutils import escape

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
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
    '</workbook>')

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    '</Relationships>')


def _col_name(c: int) -> str:
    """0-based column index -> A1-style column letters (0 -> A)."""
    name = ''
    c += 1
    while c:
        c, rem = divmod(c - 1, 26)
        name = chr(ord('A') + rem) + name
    return name


def _cell(r: int, c: int, value: str) -> str:
    return ('<c r="%s%d" t="inlineStr"><is><t xml:space="preserve">%s'
            '</t></is></c>' % (_col_name(c), r + 1, escape(value)))


def rows_to_xlsx(rows, out_path: str) -> int:
    """Write an iterable of string-cell rows as a one-sheet workbook.

    Streams: consumes ``rows`` once, holds one row at a time.  Returns
    the number of rows written.
    """
    n = 0
    with zipfile.ZipFile(out_path, 'w', zipfile.ZIP_DEFLATED) as z:
        z.writestr('[Content_Types].xml', _CONTENT_TYPES)
        z.writestr('_rels/.rels', _ROOT_RELS)
        z.writestr('xl/workbook.xml', _WORKBOOK)
        z.writestr('xl/_rels/workbook.xml.rels', _WORKBOOK_RELS)
        with z.open('xl/worksheets/sheet1.xml', 'w') as f:
            f.write(b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    b'<worksheet xmlns="http://schemas.openxmlformats.org/'
                    b'spreadsheetml/2006/main"><sheetData>')
            for r, row in enumerate(rows):
                cells = ''.join(_cell(r, c, '%s' % col)
                                for c, col in enumerate(row))
                f.write(('<row r="%d">%s</row>' % (r + 1, cells))
                        .encode('utf-8'))
                n = r + 1
            f.write(b'</sheetData></worksheet>')
    return n


def csv_to_xls(filename: str) -> str:
    """Convert a CSV report to ``filename[:-4] + '.xlsx'``.

    Reference parity (common.py:652-661): one worksheet, each CSV cell
    written as a text cell, same output-path rule.  Returns the output
    path.
    """
    out = filename[:-4] + '.xlsx'
    with open(filename, 'rt', newline='', encoding='utf-8') as f:
        rows_to_xlsx(csv.reader(f), out)
    return out
