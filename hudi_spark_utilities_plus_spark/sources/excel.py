"""Excel (.xlsx) reader — stdlib implementation, no external deps.

Reference parity (A3): ``spark.read.format("excel")`` via spark-excel
(``HoodieExcelImporter.scala:94-98``) with the documented option surface
(``docs/file/01.Excel Ingestion.md:36-49``). This environment has no
spark-excel jar or openpyxl, so the reader parses the xlsx container
(zip + SpreadsheetML) directly and materializes a DataFrame. Options
honored:

- ``header`` (default true): first row of the range is column names
- ``dataAddress``: ``'Sheet1'!A1:C4`` / ``Sheet1!A1`` / ``A1`` sub-range
- ``inferSchema`` (default false → everything string, matching
  spark-excel's strings-by-default)
- ``treatEmptyValuesAsNulls`` (default true)
- ``ignoreAfterHeader``: skip N rows after the header row
- glob paths: multi-file reads concatenate row-wise

Scale note: xlsx is a driver-side format (a workbook must be unzipped
whole); the importer's job is to land it in a parquet lake table once,
after which everything is distributed. Parsing happens on the driver,
as spark-excel does per file; many files parallelize via the glob list.
"""

from __future__ import annotations

import glob as _glob
import re
import xml.etree.ElementTree as ET
import zipfile
from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


class ErrorCell(str):
    """Marker for cells with t="e" (e.g. #DIV/0!); mapped per the
    setErrorCellsToFallbackValues option in read_excel."""


_REL_NS = {
    "r": "http://schemas.openxmlformats.org/package/2006/relationships",
}
_R_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)


def _col_to_idx(ref: str) -> int:
    """'A' → 0, 'AB' → 27."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _parse_cell_ref(ref: str) -> tuple[int, int]:
    m = re.match(r"([A-Z]+)(\d+)", ref)
    if not m:
        raise ValueError(f"bad cell ref: {ref}")
    return int(m.group(2)) - 1, _col_to_idx(m.group(1))


def parse_data_address(addr: str) -> tuple[str | None, tuple[int, int], tuple[int, int] | None]:
    """'Sheet1'!A1:C4 → (sheet, (r0,c0), (r1,c1)); end None = open range."""
    sheet = None
    if "!" in addr:
        sheet_part, addr = addr.split("!", 1)
        sheet = sheet_part.strip("'")
    if ":" in addr:
        a, b = addr.split(":", 1)
        return sheet, _parse_cell_ref(a), _parse_cell_ref(b)
    return sheet, _parse_cell_ref(addr), None


def _read_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall("m:si", _NS):
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


def _sheet_path(zf: zipfile.ZipFile, sheet_name: str | None) -> str:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_map = {
        rel.get("Id"): rel.get("Target") for rel in rels.findall("r:Relationship", _REL_NS)
    }
    for sh in wb.find("m:sheets", _NS).findall("m:sheet", _NS):
        if sheet_name is None or sh.get("name") == sheet_name:
            target = rel_map[sh.get(_R_ATTR)]
            return target if target.startswith("xl/") else f"xl/{target.lstrip('/')}"
    raise ValueError(f"sheet not found: {sheet_name}")


def read_xlsx_rows(
    path: str, sheet_name: str | None = None
) -> list[dict[int, object]]:
    """Sparse rows: list of {col_idx: raw_value} in row order."""
    with zipfile.ZipFile(path) as zf:
        shared = _read_shared_strings(zf)
        sheet_xml = zf.read(_sheet_path(zf, sheet_name))
    root = ET.fromstring(sheet_xml)
    rows: list[dict[int, object]] = []
    for row in root.iter(f"{{{_NS['m']}}}row"):
        r_idx = int(row.get("r", len(rows) + 1)) - 1
        while len(rows) <= r_idx:
            rows.append({})
        vals: dict[int, object] = rows[r_idx]
        for c in row.findall("m:c", _NS):
            ref = c.get("r")
            _, col = _parse_cell_ref(ref) if ref else (0, len(vals))
            t = c.get("t", "n")
            v_el = c.find("m:v", _NS)
            if t == "inlineStr":
                is_el = c.find("m:is", _NS)
                val = "".join(
                    t_el.text or "" for t_el in is_el.iter(f"{{{_NS['m']}}}t")
                ) if is_el is not None else None
            elif v_el is None or v_el.text is None:
                val = None
            elif t == "s":
                val = shared[int(v_el.text)]
            elif t == "b":
                val = v_el.text == "1"
            elif t == "e":
                val = ErrorCell(v_el.text or "")
            elif t == "str":
                val = v_el.text
            else:  # numeric
                txt = v_el.text
                val = float(txt) if ("." in txt or "e" in txt.lower()) else int(txt)
            vals[col] = val
    return rows


def _infer(values: list[object]) -> list[object]:
    """Column-wise type inference: int → float → bool → date → str."""

    def try_cast(caster):
        out = []
        for v in values:
            if v is None:
                out.append(None)
                continue
            try:
                out.append(caster(v))
            except (ValueError, TypeError):
                return None
        return out

    for caster in (
        lambda v: int(str(v)) if not isinstance(v, bool) else _raise(),
        lambda v: float(str(v)) if not isinstance(v, bool) else _raise(),
        lambda v: _to_bool(v),
        lambda v: datetime.strptime(str(v), "%Y-%m-%d").date(),
    ):
        cast = try_cast(caster)
        if cast is not None:
            return cast
    return [None if v is None else str(v) for v in values]


def _raise():
    raise ValueError


def _to_bool(v: object) -> bool:
    if isinstance(v, bool):
        return v
    s = str(v).lower()
    if s in ("true", "false"):
        return s == "true"
    raise ValueError(s)


def read_excel(
    spark: SparkSession, path: str, options: dict[str, str] | None = None
) -> DataFrame:
    """Load one or many (glob) xlsx files into a DataFrame."""
    opts = {k.lower(): v for k, v in (options or {}).items()}
    if opts.get("workbookpassword"):
        raise NotImplementedError(
            "encrypted workbooks (workbookPassword) need an OOXML crypto "
            "library not present in this environment"
        )
    error_fallback = (
        str(opts.get("seterrorcellstofallbackvalues", "false")).lower() == "true"
    )
    header = str(opts.get("header", "true")).lower() == "true"
    infer = str(opts.get("inferschema", "false")).lower() == "true"
    empty_as_null = (
        str(opts.get("treatemptyvaluesasnulls", "true")).lower() == "true"
    )
    ignore_after_header = int(opts.get("ignoreafterheader", 0))
    sheet, start, end = (None, (0, 0), None)
    if "dataaddress" in opts:
        sheet, start, end = parse_data_address(opts["dataaddress"])

    paths = sorted(_glob.glob(path)) or [path]
    all_rows: list[list[object]] = []
    names: list[str] | None = None
    for p in paths:
        rows = read_xlsx_rows(p, sheet)
        r0, c0 = start
        r1 = end[0] if end else (len(rows) - 1)
        c1 = end[1] if end else max((max(r) for r in rows if r), default=0)
        width = c1 - c0 + 1
        grid = [
            [rows[r].get(c0 + i) if r < len(rows) else None for i in range(width)]
            for r in range(r0, min(r1, len(rows) - 1) + 1)
        ]
        if header and grid:
            hdr = [str(v) if v is not None else f"_c{i}" for i, v in enumerate(grid[0])]
            body = grid[1 + ignore_after_header :]
        else:
            hdr = [f"_c{i}" for i in range(width)]
            body = grid
        if names is None:
            names = hdr
        all_rows.extend(body)

    # error cells: fallback to their literal error text when requested,
    # else null (docs/file/01.Excel Ingestion.md:42 semantics)
    all_rows = [
        [
            (str(v) if error_fallback else None) if isinstance(v, ErrorCell) else v
            for v in row
        ]
        for row in all_rows
    ]
    if empty_as_null:
        all_rows = [[None if v == "" else v for v in row] for row in all_rows]

    cols = list(zip(*all_rows)) if all_rows else [[] for _ in names or []]
    if infer:
        cols = [_infer(list(c)) for c in cols]
    else:
        cols = [[None if v is None else str(v) for v in c] for c in cols]
    data = [tuple(col[i] for col in cols) for i in range(len(all_rows))]

    def spark_type(col: list[object]) -> str:
        for v in col:
            if v is None:
                continue
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, int):
                return "bigint"
            if isinstance(v, float):
                return "double"
            if isinstance(v, (date, datetime)):
                return "date"
            return "string"
        return "string"

    schema = ", ".join(
        f"`{n}` {spark_type(list(c))}" for n, c in zip(names or [], cols)
    )
    return spark.createDataFrame(data, schema=schema)
