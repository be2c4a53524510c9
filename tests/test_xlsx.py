"""csv_to_xls parity (reference common.py:652-661): a CSV report
becomes a standards-valid one-sheet .xlsx whose cells round-trip as
text.  Verified by unzipping the workbook and parsing the
SpreadsheetML parts with the stdlib — no spreadsheet library."""

import csv
import zipfile
import xml.etree.ElementTree as ET

from webscraping_ray.kernels.xlsx import _col_name, csv_to_xls, rows_to_xlsx

NS = '{http://schemas.openxmlformats.org/spreadsheetml/2006/main}'


def _read_sheet(path):
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert {'[Content_Types].xml', '_rels/.rels', 'xl/workbook.xml',
                'xl/_rels/workbook.xml.rels',
                'xl/worksheets/sheet1.xml'} <= names
        # every XML part must parse
        for n in names:
            ET.fromstring(z.read(n))
        sheet = ET.fromstring(z.read('xl/worksheets/sheet1.xml'))
    rows = []
    for row in sheet.iter(NS + 'row'):
        cells = []
        for c in row.iter(NS + 'c'):
            assert c.get('t') == 'inlineStr'
            t = c.find(NS + 'is/' + NS + 't')
            cells.append(t.text if t.text is not None else '')
        rows.append(cells)
    return rows


def test_csv_to_xls_round_trip(tmp_path):
    rows = [['url', 'n_links', 'note'],
            ['http://a.com/?q=1&r=2', '5', 'café <b>'],
            ['http://b.com/', '0', 'line1\nline2'],
            ['', '', '  padded  ']]
    src = str(tmp_path / 'report.csv')
    with open(src, 'w', newline='', encoding='utf-8') as f:
        csv.writer(f).writerows(rows)
    out = csv_to_xls(src)
    assert out == str(tmp_path / 'report.xlsx')
    assert _read_sheet(out) == rows


def test_rows_to_xlsx_streams_and_counts(tmp_path):
    out = str(tmp_path / 'big.xlsx')
    n = rows_to_xlsx((['r%d' % i, str(i)] for i in range(1000)), out)
    assert n == 1000
    got = _read_sheet(out)
    assert len(got) == 1000 and got[7] == ['r7', '7']


def test_col_names():
    assert [_col_name(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] \
        == ['A', 'B', 'Z', 'AA', 'AB', 'AZ', 'BA', 'ZZ', 'AAA']
