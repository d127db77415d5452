"""Legacy Excel ``.xls`` (BIFF8) reader — stdlib struct parsing, no deps.

Reference parity (A3): the reference's spark-excel dependency reads both
OOXML ``.xlsx`` and legacy BIFF ``.xls`` workbooks (fixtures
``boxer-excel/src/test/resources/exmaple/spreadsheets/
infer_stricter_numerical_types.xls``, ``simple_encrypted.xls``; POI does
the container work there). This environment has no POI/xlrd, so this
module parses the two layers directly:

1. **OLE2 / Compound File Binary** container: header → DIFAT → FAT →
   directory; streams under the mini-stream cutoff (4096 B) chain
   through the miniFAT inside the root entry's mini stream — the common
   case for small workbooks.
2. **BIFF8 record stream** (``Workbook``/``Book`` stream): BOF/
   BOUNDSHEET locate worksheet substreams; SST + CONTINUE carry shared
   strings (character data may restart a fresh flags byte at every
   record boundary); cells come from LABELSST / NUMBER / RK / MULRK /
   BOOLERR / LABEL / FORMULA (cached values); FORMAT + XF records drive
   the same date-style detection as the xlsx path (builtin numFmtIds are
   shared between BIFF and ECMA-376).

The output shape is identical to ``excel.read_xlsx_rows`` — sparse
``{col: value}`` dicts in row order — so every downstream option
(header, dataAddress, inferSchema, …) works unchanged for ``.xls``.

Encrypted workbooks (FILEPASS record) decrypt through
:mod:`.offcrypto`'s RC4 CryptoAPI / standard-RC4 implementation when
``workbookPassword`` is supplied, and raise a clear ``ValueError``
otherwise.
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timedelta

OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC


# ---------------------------------------------------------------------------
# OLE2 / CFB container
# ---------------------------------------------------------------------------


def _sector(data: bytes, idx: int, size: int) -> bytes:
    off = 512 + idx * size
    return data[off : off + size]


def _chain(fat: list[int], start: int) -> list[int]:
    out, cur, seen = [], start, set()
    while cur not in (_ENDOFCHAIN, _FREESECT) and cur < len(fat):
        if cur in seen:
            raise ValueError("cyclic sector chain in OLE container")
        seen.add(cur)
        out.append(cur)
        cur = fat[cur]
    return out


def ole_streams(data: bytes) -> dict[str, bytes]:
    """Directory-name → stream bytes for every stream in the container."""
    if data[:8] != OLE_MAGIC:
        raise ValueError("not an OLE2 compound file (bad magic)")
    sec_size = 1 << struct.unpack_from("<H", data, 30)[0]
    mini_size = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    first_dir = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    first_minifat = struct.unpack_from("<I", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    first_difat = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", data, 76))
    cur = first_difat
    for _ in range(n_difat):
        sec = _sector(data, cur, sec_size)
        entries = struct.unpack(f"<{sec_size // 4}I", sec)
        difat.extend(entries[:-1])
        cur = entries[-1]
    fat_sectors = [s for s in difat[:n_fat] if s not in (_FREESECT,)]
    fat: list[int] = []
    for s in fat_sectors:
        fat.extend(struct.unpack(f"<{sec_size // 4}I", _sector(data, s, sec_size)))

    def read_chain(start: int, size: int) -> bytes:
        return b"".join(_sector(data, s, sec_size) for s in _chain(fat, start))[
            :size
        ]

    # directory entries (128 B each)
    dir_raw = b"".join(
        _sector(data, s, sec_size) for s in _chain(fat, first_dir)
    )
    entries = []
    for off in range(0, len(dir_raw), 128):
        e = dir_raw[off : off + 128]
        if len(e) < 128:
            break
        nlen = struct.unpack_from("<H", e, 64)[0]
        if nlen < 2:
            continue
        name = e[: nlen - 2].decode("utf-16-le", errors="replace")
        etype = e[66]
        start = struct.unpack_from("<I", e, 116)[0]
        size = struct.unpack_from("<I", e, 120)[0]
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    mini_container = read_chain(root[2], root[3]) if root else b""
    minifat: list[int] = []
    cur = first_minifat
    for _ in range(n_minifat):
        minifat.extend(
            struct.unpack(f"<{sec_size // 4}I", _sector(data, cur, sec_size))
        )
        cur = fat[cur] if cur < len(fat) else _ENDOFCHAIN

    def read_mini(start: int, size: int) -> bytes:
        return b"".join(
            mini_container[s * mini_size : (s + 1) * mini_size]
            for s in _chain(minifat, start)
        )[:size]

    out: dict[str, bytes] = {}
    for name, etype, start, size in entries:
        if etype != 2:  # streams only
            continue
        out[name] = (
            read_mini(start, size) if size < mini_cutoff else read_chain(start, size)
        )
    return out


# ---------------------------------------------------------------------------
# BIFF8 records
# ---------------------------------------------------------------------------

R_BOF = 0x0809
R_EOF = 0x000A
R_FILEPASS = 0x002F
R_DATEMODE = 0x0022
R_BOUNDSHEET = 0x0085
R_SST = 0x00FC
R_CONTINUE = 0x003C
R_LABELSST = 0x00FD
R_LABEL = 0x0204
R_NUMBER = 0x0203
R_RK = 0x027E
R_MULRK = 0x00BD
R_BOOLERR = 0x0205
R_FORMULA = 0x0006
R_STRING = 0x0207
R_FORMAT = 0x041E
R_XF = 0x00E0


def _records(stream: bytes, start: int = 0):
    """Yield (type, payload_bytes, offset) from a BIFF record stream."""
    pos = start
    n = len(stream)
    while pos + 4 <= n:
        rtype, rlen = struct.unpack_from("<HH", stream, pos)
        if rtype == 0x0000 and rlen == 0:  # zero padding past the last EOF
            break
        payload = stream[pos + 4 : pos + 4 + rlen]
        yield rtype, payload, pos
        pos += 4 + rlen


class _ChunkReader:
    """Reader over SST + CONTINUE payloads. Character data that crosses a
    record boundary RESTARTS with a fresh flags byte (the writer may
    switch between compressed and UTF-16 mid-string); all other fields
    (counts, rich runs, ext data) continue raw across the boundary."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.pos = 0

    def _advance(self) -> None:
        while self.ci < len(self.chunks) and self.pos >= len(self.chunks[self.ci]):
            self.ci += 1
            self.pos = 0

    def at_boundary(self) -> bool:
        self._advance()
        return self.pos == 0 and self.ci > 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance()
            if self.ci >= len(self.chunks):
                raise ValueError("truncated BIFF string data")
            chunk = self.chunks[self.ci]
            take = min(n, len(chunk) - self.pos)
            out += chunk[self.pos : self.pos + take]
            self.pos += take
            n -= take
        return bytes(out)

    def u8(self) -> int:
        return self.read(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.read(2))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.read(4))[0]

    def read_chars(self, cch: int, high: bool) -> str:
        """cch characters, re-reading the flags byte at each record
        boundary crossed mid-characters."""
        parts: list[str] = []
        remaining = cch
        while remaining > 0:
            self._advance()
            if self.ci >= len(self.chunks):
                raise ValueError("truncated BIFF string chars")
            if self.pos == 0 and self.ci > 0:
                # character data beginning in (or continuing into) a
                # CONTINUE record always restarts with a fresh grbit —
                # including when the string's HEADER consumed the prior
                # record exactly (zero chars read yet). A header that
                # starts inside the CONTINUE leaves pos > 0, so this
                # never misfires on same-chunk strings.
                high = bool(self.u8() & 0x01)
            chunk = self.chunks[self.ci]
            avail = len(chunk) - self.pos
            width = 2 if high else 1
            take_chars = min(remaining, avail // width)
            if take_chars == 0:
                if avail == 1 and high:
                    # a UTF-16 char split across records does not occur
                    # (writers align); treat defensively as truncation
                    raise ValueError("split UTF-16 unit at record boundary")
                self.ci += 1
                self.pos = 0
                continue
            raw = self.read(take_chars * width)
            parts.append(raw.decode("utf-16-le" if high else "latin-1"))
            remaining -= take_chars
        return "".join(parts)

    def read_unicode_string(self) -> str:
        """XLUnicodeRichExtendedString (16-bit cch) — SST entries."""
        cch = self.u16()
        flags = self.u8()
        high = bool(flags & 0x01)
        rich_runs = self.u16() if flags & 0x08 else 0
        ext_size = self.u32() if flags & 0x04 else 0
        s = self.read_chars(cch, high)
        if rich_runs:
            self.read(4 * rich_runs)
        if ext_size:
            self.read(ext_size)
        return s


def _short_unicode(payload: bytes, off: int) -> tuple[str, int]:
    """ShortXLUnicodeString (8-bit cch): (string, bytes consumed)."""
    cch = payload[off]
    flags = payload[off + 1]
    if flags & 0x01:
        raw = payload[off + 2 : off + 2 + 2 * cch]
        return raw.decode("utf-16-le"), 2 + 2 * cch
    raw = payload[off + 2 : off + 2 + cch]
    return raw.decode("latin-1"), 2 + cch


def _unicode_string(payload: bytes, off: int) -> tuple[str, int]:
    """XLUnicodeString (16-bit cch, no rich/ext): (string, consumed)."""
    cch = struct.unpack_from("<H", payload, off)[0]
    flags = payload[off + 2]
    if flags & 0x01:
        raw = payload[off + 3 : off + 3 + 2 * cch]
        return raw.decode("utf-16-le"), 3 + 2 * cch
    raw = payload[off + 3 : off + 3 + cch]
    return raw.decode("latin-1"), 3 + cch


def _rk_value(rk: int) -> float | int:
    """RK-encoded number: bit0 = divide by 100, bit1 = 30-bit int."""
    div100 = rk & 0x01
    if rk & 0x02:
        v = rk >> 2
        if v & 0x20000000:  # sign-extend 30-bit
            v -= 0x40000000
        return v / 100 if div100 else v
    v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100 if div100 else v


# 1900 system: serial 1 = 1899-12-31, with the phantom 1900-02-29 — the
# 1899-12-30 epoch used by the xlsx path absorbs both quirks for serials
# ≥ 61, which is every date after 1900-03-01 (same convention as POI).
_EPOCH_1900 = datetime(1899, 12, 30)
_EPOCH_1904 = datetime(1904, 1, 1)


class _BiffWorkbook:
    """Parsed workbook globals + per-sheet cell extraction."""

    def __init__(self, stream: bytes):
        self.stream = stream
        self.sst: list[str] = []
        self.sheets: list[tuple[str, int]] = []  # (name, substream offset)
        self.xf_fmt: list[int] = []  # xf index → numFmtId
        self.formats: dict[int, str] = {}  # custom numFmtId → code
        self.date1904 = False
        self._parse_globals()

    def _parse_globals(self) -> None:
        recs = _records(self.stream)
        sst_chunks: list[bytes] | None = None
        for rtype, payload, _off in recs:
            if rtype == R_FILEPASS:
                # read_xls_rows decrypts FILEPASS-bearing streams before
                # construction; reaching the raw record here means the
                # caller never supplied a password
                raise ValueError(
                    "encrypted .xls workbook (FILEPASS): set the "
                    "workbookPassword option"
                )
            if rtype == R_SST:
                sst_chunks = [payload]
                continue
            if rtype == R_CONTINUE and sst_chunks is not None:
                sst_chunks.append(payload)
                continue
            if sst_chunks is not None and rtype not in (R_SST, R_CONTINUE):
                self._decode_sst(sst_chunks)
                sst_chunks = None
            if rtype == R_DATEMODE:
                self.date1904 = struct.unpack_from("<H", payload, 0)[0] == 1
            elif rtype == R_BOUNDSHEET:
                pos = struct.unpack_from("<I", payload, 0)[0]
                name, _ = _short_unicode(payload, 6)
                self.sheets.append((name, pos))
            elif rtype == R_FORMAT:
                ifmt = struct.unpack_from("<H", payload, 0)[0]
                code, _ = _unicode_string(payload, 2)
                self.formats[ifmt] = code
            elif rtype == R_XF:
                self.xf_fmt.append(struct.unpack_from("<H", payload, 2)[0])
            elif rtype == R_EOF:
                break
        if sst_chunks is not None:
            self._decode_sst(sst_chunks)

    def _decode_sst(self, chunks: list[bytes]) -> None:
        rd = _ChunkReader(chunks)
        rd.u32()  # total refs
        unique = rd.u32()
        for _ in range(unique):
            self.sst.append(rd.read_unicode_string())

    # -- date styling (same classification as the xlsx path) -----------
    def _xf_kind(self, xf: int) -> str:
        from .excel import (
            _BUILTIN_DATE_FMT,
            _BUILTIN_TIME_ONLY,
            _fmt_has_time,
            _fmt_is_date,
        )

        if not (0 <= xf < len(self.xf_fmt)):
            return "none"
        ifmt = self.xf_fmt[xf]
        if ifmt in self.formats:
            code = self.formats[ifmt]
            if _fmt_is_date(code):
                return "datetime" if _fmt_has_time(code) else "date"
            return "none"
        if ifmt in _BUILTIN_DATE_FMT:
            return (
                "datetime" if ifmt in _BUILTIN_TIME_ONLY or ifmt == 22 else "date"
            )
        return "none"

    def _style(self, num: float | int, xf: int) -> object:
        kind = self._xf_kind(xf)
        if kind == "none":
            return num
        epoch = _EPOCH_1904 if self.date1904 else _EPOCH_1900
        dt = epoch + timedelta(seconds=round(num * 86400))
        return dt.date() if kind == "date" else dt

    # -- worksheet cells ----------------------------------------------
    def sheet_rows(self, sheet_name: str | None) -> list[dict[int, object]]:
        from .excel import ErrorCell

        if not self.sheets:
            return []
        pos = None
        for name, p in self.sheets:
            if sheet_name is None or name == sheet_name:
                pos = p
                break
        if pos is None:
            raise ValueError(f"sheet not found: {sheet_name}")
        rows: list[dict[int, object]] = []

        def put(r: int, c: int, v: object) -> None:
            while len(rows) <= r:
                rows.append({})
            rows[r][c] = v

        pending_string_cell: tuple[int, int] | None = None
        depth = 0
        for rtype, payload, _off in _records(self.stream, pos):
            if rtype == R_BOF:
                depth += 1
                continue
            if rtype == R_EOF:
                depth -= 1
                if depth <= 0:
                    break
                continue
            if rtype == R_STRING and pending_string_cell is not None:
                r, c = pending_string_cell
                s, _ = _unicode_string(payload, 0)
                put(r, c, s)
                pending_string_cell = None
                continue
            if rtype == R_LABELSST:
                r, c, _xf, isst = struct.unpack_from("<HHHI", payload, 0)
                put(r, c, self.sst[isst] if isst < len(self.sst) else None)
            elif rtype == R_LABEL:
                r, c = struct.unpack_from("<HH", payload, 0)
                s, _ = _unicode_string(payload, 6)
                put(r, c, s)
            elif rtype == R_NUMBER:
                r, c, xf = struct.unpack_from("<HHH", payload, 0)
                num = struct.unpack_from("<d", payload, 6)[0]
                put(r, c, self._style(_int_if_whole(num), xf))
            elif rtype == R_RK:
                r, c, xf, rk = struct.unpack_from("<HHHI", payload, 0)
                put(r, c, self._style(_rk_value(rk), xf))
            elif rtype == R_MULRK:
                r, c0 = struct.unpack_from("<HH", payload, 0)
                n = (len(payload) - 6) // 6
                for i in range(n):
                    xf, rk = struct.unpack_from("<HI", payload, 4 + i * 6)
                    put(r, c0 + i, self._style(_rk_value(rk), xf))
            elif rtype == R_BOOLERR:
                r, c, _xf, val, is_err = struct.unpack_from("<HHHBB", payload, 0)
                put(r, c, ErrorCell(_ERR_CODES.get(val, f"#ERR{val}"))
                    if is_err else bool(val))
            elif rtype == R_FORMULA:
                r, c, xf = struct.unpack_from("<HHH", payload, 0)
                cached = payload[6:14]
                if cached[6:8] == b"\xff\xff":
                    tag = cached[0]
                    if tag == 0:  # string result in the next STRING record
                        pending_string_cell = (r, c)
                    elif tag == 1:
                        put(r, c, bool(cached[2]))
                    elif tag == 2:
                        put(r, c, ErrorCell(_ERR_CODES.get(cached[2], "#ERR")))
                    else:  # 3 = empty string
                        put(r, c, "")
                else:
                    num = struct.unpack("<d", cached)[0]
                    put(r, c, self._style(_int_if_whole(num), xf))
        return rows


_ERR_CODES = {
    0x00: "#NULL!",
    0x07: "#DIV/0!",
    0x0F: "#VALUE!",
    0x17: "#REF!",
    0x1D: "#NAME?",
    0x24: "#NUM!",
    0x2A: "#N/A",
}


def _int_if_whole(num: float) -> float | int:
    """BIFF stores every number as a double; surface whole values as int
    so .xls and .xlsx workbooks of the same data infer identical types
    (the xlsx path gets ints from the raw '42' cell text)."""
    return int(num) if float(num).is_integer() and abs(num) < 2**53 else num


def read_xls_rows(
    path: str, sheet_name: str | None = None, password: str | None = None
) -> list[dict[int, object]]:
    """Sparse rows from a BIFF8 ``.xls`` workbook — drop-in counterpart
    of ``excel.read_xlsx_rows``. RC4-encrypted workbooks (FILEPASS)
    decrypt via :mod:`.offcrypto` when ``password`` is given."""
    with open(path, "rb") as fh:
        data = fh.read()
    streams = ole_streams(data)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError(
            f"no Workbook stream in OLE container {path!r} "
            f"(streams: {sorted(streams)})"
        )
    from .offcrypto import biff_is_encrypted, decrypt_biff_stream

    if password and biff_is_encrypted(wb):
        decrypted = bytearray(decrypt_biff_stream(wb, password))
        # FILEPASS stays in the decrypted stream; retype it in place to
        # an id the parser ignores (removal would shift the absolute
        # BoundSheet8 lbPlyPos substream offsets). The parser's FILEPASS
        # branch then only fires when no password was supplied.
        off = 0
        while off + 4 <= len(decrypted):
            rid, ln = struct.unpack_from("<HH", decrypted, off)
            if rid == R_FILEPASS:
                struct.pack_into("<H", decrypted, off, 0xFFFF)
                break
            off += 4 + ln
        wb = bytes(decrypted)
    return _BiffWorkbook(wb).sheet_rows(sheet_name)
