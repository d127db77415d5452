"""Minimal deterministic xlsx writer — fixture generator for the Excel
source's smoke ids and tests (the reference only READS Excel; this
writer exists so the A3 scan path can be driver-proven end to end
without shipping binary fixtures). Supports exactly what the smoke
needs: one sheet, a header row, int/float/str cells (inline strings —
no sharedStrings indirection)."""

from __future__ import annotations

import zipfile

_CONTENT_TYPES = (
    '<?xml version="1.0"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" '
    'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WORKBOOK = (
    '<?xml version="1.0"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)
_WB_RELS = (
    '<?xml version="1.0"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _col_name(i: int) -> str:
    name = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        name = chr(ord("A") + rem) + name
    return name


def _fmt_float(x: float) -> str:
    """Shortest repr digits, always plain decimal notation (no exponent);
    ``float()`` of the result round-trips bit-exactly."""
    import math
    from decimal import Decimal

    if math.isnan(x) or math.isinf(x):
        raise ValueError(f"non-finite float not representable in xlsx: {x}")
    s = repr(x)
    if "e" not in s and "E" not in s:
        return s
    return format(Decimal(s), "f")


def _cell(ref: str, value) -> str:
    if value is None:
        # emit an empty, explicitly-referenced cell: dropping the cell
        # entirely would misalign readers that index by position rather
        # than by the r= reference
        return f'<c r="{ref}"/>'
    if isinstance(value, float):
        # repr-stable decimal notation — str()/repr() switch to
        # scientific for |x| ≥ 1e16 or < 1e-4, which SpreadsheetML
        # readers may parse differently
        return f'<c r="{ref}"><v>{_fmt_float(value)}</v></c>'
    if isinstance(value, int) and not isinstance(value, bool):
        return f'<c r="{ref}"><v>{value}</v></c>'
    text = (
        str(value)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )
    return f'<c r="{ref}" t="inlineStr"><is><t>{text}</t></is></c>'


def write_xlsx(path: str, header: list[str], rows: list[tuple]) -> str:
    """Write ``rows`` under ``header`` to a single-sheet workbook."""
    body = []
    for r, row in enumerate([tuple(header)] + [tuple(r) for r in rows]):
        cells = "".join(
            _cell(f"{_col_name(c)}{r + 1}", v) for c, v in enumerate(row)
        )
        body.append(f'<row r="{r + 1}">{cells}</row>')
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return path
