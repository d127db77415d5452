"""Minimal xlsx writer for tests (stdlib zip + SpreadsheetML), producing
workbooks shaped like the reference's fixtures (FIXTURES.md F1/F2).

date/datetime values are written the way Excel writes them: as serial
numbers with a date-styled cellXf (numFmtId 14 for dates, 22 for
datetimes) — exercising the reader's styles.xml decode path."""

from __future__ import annotations

import zipfile
from datetime import date, datetime

_EPOCH = datetime(1899, 12, 30)


def _serial(v: date | datetime) -> float:
    dt = v if isinstance(v, datetime) else datetime(v.year, v.month, v.day)
    return (dt - _EPOCH).total_seconds() / 86400.0


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, datetime):
        return f'<c r="{ref}" s="2"><v>{_serial(value)}</v></c>'
    if isinstance(value, date):
        return f'<c r="{ref}" s="1"><v>{int(_serial(value))}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value}</v></c>'
    # '>' must be escaped too: a literal ']]>' in character data is not
    # well-formed XML (found by the round-trip fuzz — the reader's
    # parser rightly rejects it; real Excel writers escape '>')
    text = (
        str(value)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )
    return f'<c r="{ref}" t="inlineStr"><is><t>{text}</t></is></c>'


def _col_name(i: int) -> str:
    name = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        name = chr(ord("A") + rem) + name
    return name


_STYLES = (
    '<?xml version="1.0"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    "<cellXfs count=\"3\">"
    '<xf numFmtId="0"/>'
    '<xf numFmtId="14" applyNumberFormat="1"/>'
    '<xf numFmtId="22" applyNumberFormat="1"/>'
    "</cellXfs></styleSheet>"
)


def write_xlsx(path: str, rows: list[list], sheet_name: str = "Sheet1") -> None:
    row_xml = []
    for r, row in enumerate(rows):
        cells = "".join(
            _cell_xml(f"{_col_name(c)}{r + 1}", v) for c, v in enumerate(row)
        )
        row_xml.append(f'<row r="{r + 1}">{cells}</row>')
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(row_xml)}</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{sheet_name}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/styles.xml", _STYLES)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
