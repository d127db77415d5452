"""Minimal BIFF8 ``.xls`` writer for test fixtures — the legacy-format
counterpart of ``xlsx_util``. Emits a spec-compliant OLE2 container with
a single Workbook stream (padded past the 4096 B mini-stream cutoff so
it lives in regular FAT sectors) and BIFF8 records: BOF/BOUNDSHEET/XF/
FORMAT/SST/LABELSST/NUMBER/BOOLERR/EOF. Low-level record builders are
exported so tests can compose RK/MULRK/FORMULA/CONTINUE cases directly.
"""

from __future__ import annotations

import struct
from datetime import date, datetime

_EPOCH = datetime(1899, 12, 30)


def rec(rtype: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rtype, len(payload)) + payload


def bof(substream: int) -> bytes:
    return rec(0x0809, struct.pack("<HHHHII", 0x0600, substream, 0, 0, 0, 0))


EOF_REC = rec(0x000A, b"")


def xf(ifmt: int) -> bytes:
    payload = bytearray(20)
    struct.pack_into("<H", payload, 2, ifmt)
    return rec(0x00E0, bytes(payload))


def fmt(ifmt: int, code: str) -> bytes:
    b = code.encode("latin-1")
    return rec(0x041E, struct.pack("<HHB", ifmt, len(b), 0) + b)


def sst(strings: list[str]) -> bytes:
    body = struct.pack("<II", len(strings), len(strings))
    for s in strings:
        # XLUnicodeRichExtendedString: compressed 8-bit when every char
        # fits latin-1, else UTF-16LE with the fHighByte flag set — the
        # same dispatch real Excel writes, so the reader's both-encoding
        # SST decode path gets exercised by unicode fixtures
        try:
            b = s.encode("latin-1")
            body += struct.pack("<HB", len(s), 0) + b
        except UnicodeEncodeError:
            b = s.encode("utf-16-le")
            # cch counts UTF-16 CODE UNITS, not python characters — a
            # non-BMP char (surrogate pair) is two units (fuzz-found:
            # len(s) undercounts and truncates the read)
            body += struct.pack("<HB", len(b) // 2, 1) + b
    return rec(0x00FC, body)


def boundsheet(pos: int, name: str) -> bytes:
    b = name.encode("latin-1")
    return rec(0x0085, struct.pack("<IBB", pos, 0, 0) + struct.pack("<BB", len(b), 0) + b)


def number(r: int, c: int, xf_idx: int, v: float) -> bytes:
    return rec(0x0203, struct.pack("<HHHd", r, c, xf_idx, v))


def rk(r: int, c: int, xf_idx: int, rkval: int) -> bytes:
    return rec(0x027E, struct.pack("<HHHI", r, c, xf_idx, rkval))


def mulrk(r: int, c0: int, pairs: list[tuple[int, int]]) -> bytes:
    body = struct.pack("<HH", r, c0)
    for xf_idx, rkval in pairs:
        body += struct.pack("<HI", xf_idx, rkval)
    body += struct.pack("<H", c0 + len(pairs) - 1)
    return rec(0x00BD, body)


def labelsst(r: int, c: int, isst: int) -> bytes:
    return rec(0x00FD, struct.pack("<HHHI", r, c, 0, isst))


def boolerr(r: int, c: int, v: int, is_err: bool) -> bytes:
    return rec(0x0205, struct.pack("<HHHBB", r, c, 0, v, int(is_err)))


def formula_num(r: int, c: int, xf_idx: int, v: float) -> bytes:
    # cached numeric result; empty token array
    return rec(0x0006, struct.pack("<HHHd", r, c, xf_idx, v) + b"\x00" * 6 + b"\x00\x00")


def formula_str(r: int, c: int) -> bytes:
    cached = b"\x00" + b"\x00" * 5 + b"\xff\xff"
    return rec(0x0006, struct.pack("<HHH", r, c, 0) + cached + b"\x00" * 6 + b"\x00\x00")


def string_rec(s: str) -> bytes:
    b = s.encode("latin-1")
    return rec(0x0207, struct.pack("<HB", len(b), 0) + b)


def ole_wrap(stream: bytes) -> bytes:
    """Wrap one Workbook stream in a single-FAT-sector OLE2 container.
    Padded to >= 4096 B so the stream legitimately uses regular sectors
    (sub-cutoff streams belong in the mini stream, which this minimal
    writer does not emit)."""
    stream = stream + b"\x00" * (max(4096, -(-len(stream) // 512) * 512) - len(stream))
    n_s = len(stream) // 512
    assert n_s <= 126, "fixture too large for the single-FAT writer"

    fat = [0xFFFFFFFD, 0xFFFFFFFE]  # sector 0 = FAT itself, 1 = directory
    for i in range(n_s):
        fat.append(2 + i + 1 if i < n_s - 1 else 0xFFFFFFFE)
    fat += [0xFFFFFFFF] * (128 - len(fat))
    fat_sector = struct.pack("<128I", *fat)

    def dirent(name: str, etype: int, child: int, start: int, size: int) -> bytes:
        nm = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[: len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<iii", e, 68, -1, -1, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<I", e, 120, size)
        return bytes(e)

    directory = (
        dirent("Root Entry", 5, 1, 0xFFFFFFFE, 0)
        + dirent("Workbook", 2, -1, 2, len(stream))
        + b"\x00" * 256
    )

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 0x0003)  # major (v3)
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # sector shift
    struct.pack_into("<H", header, 32, 6)  # mini sector shift
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, 1)  # first dir sector
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<I", header, 60, 0xFFFFFFFE)  # no miniFAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, 0xFFFFFFFE)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    difat = [0] + [0xFFFFFFFF] * 108  # FAT at sector 0
    struct.pack_into("<109I", header, 76, *difat)
    return bytes(header) + fat_sector + directory + stream


def write_xls(path: str, grid: list[list[object]], sheet: str = "Sheet1") -> None:
    """Write a grid of str/int/float/bool/date/datetime/None cells.
    XF 0 = general, XF 1 = date (ifmt 14), XF 2 = datetime (ifmt 22)."""
    strings: list[str] = []
    s_idx: dict[str, int] = {}
    cells = b""
    for r, row in enumerate(grid):
        for c, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, bool):
                cells += boolerr(r, c, int(v), False)
            elif isinstance(v, datetime):
                serial = (v - _EPOCH).total_seconds() / 86400.0
                cells += number(r, c, 2, serial)
            elif isinstance(v, date):
                serial = (datetime(v.year, v.month, v.day) - _EPOCH).days
                cells += number(r, c, 1, float(serial))
            elif isinstance(v, (int, float)):
                cells += number(r, c, 0, float(v))
            else:
                s = str(v)
                if s not in s_idx:
                    s_idx[s] = len(strings)
                    strings.append(s)
                cells += labelsst(r, c, s_idx[s])
    sheet_stream = bof(0x0010) + cells + EOF_REC
    # globals: BOF, XFs, SST, BOUNDSHEET (position fixed up below), EOF
    fixed = bof(0x0005) + xf(0) + xf(14) + xf(22) + sst(strings)
    globals_len = len(fixed) + len(boundsheet(0, sheet)) + len(EOF_REC)
    stream = fixed + boundsheet(globals_len, sheet) + EOF_REC + sheet_stream
    with open(path, "wb") as fh:
        fh.write(ole_wrap(stream))
