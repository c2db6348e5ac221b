#!/usr/bin/env python3
"""Generate legacy .xls (OLE2/CFB + BIFF8) test fixtures.

Driver-side dev tool (like selfcheck.py): writes the committed binary
fixtures under src/test/resources/xls/ that XlsReaderSpec parses with
graft.sources.OfficeParsers.parseXls. This generator is written directly
from the public specs (MS-CFB compound file binary format and MS-XLS
BIFF8 record format) with no Excel library, so it is an independent
implementation from the Scala reader — the spec cross-checks two
separately-written codecs of the same public format.

Fixtures:
  products.xls       small workbook -> stream < 4096 bytes -> lives in the
                     CFB MINI stream (miniFAT path); SST split across a
                     CONTINUE record; a second sheet that must be ignored;
                     16-bit (unicode) and 8-bit strings, NUMBER, RK
                     (integer and /100 forms), BOOLERR, blank gaps.
  products_many.xls  300 rows -> stream > 4096 bytes -> regular FAT
                     sectors; MULRK runs.
"""
import struct
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/xls"

FREE, ENDCHAIN, FATSECT = 0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFD


# ---------------------------------------------------------------- BIFF8

def rec(op, payload=b""):
    return struct.pack("<HH", op, len(payload)) + payload


def bof(dt):
    # vers=0x0600 (BIFF8), build/year arbitrary, history/lowest-version 0
    return rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def unistr16(s):
    """XLUnicodeString: cch(u16) grbit(u8) chars."""
    if all(ord(c) < 256 for c in s):
        return struct.pack("<HB", len(s), 0x00) + s.encode("latin-1")
    return struct.pack("<HB", len(s), 0x01) + s.encode("utf-16-le")


def unistr8(s):
    """ShortXLUnicodeString (sheet names): cch(u8) grbit(u8) chars."""
    if all(ord(c) < 256 for c in s):
        return struct.pack("<BB", len(s), 0x00) + s.encode("latin-1")
    return struct.pack("<BB", len(s), 0x01) + s.encode("utf-16-le")


def sst_records(strings, split_at=None):
    """SST + optional CONTINUE split at a string boundary (a legal early
    split writers do when a record nears the 8224-byte cap)."""
    blobs = [unistr16(s) for s in strings]
    head = struct.pack("<II", len(strings), len(strings))
    if split_at is None or split_at >= len(blobs):
        return rec(0x00FC, head + b"".join(blobs))
    return (rec(0x00FC, head + b"".join(blobs[:split_at]))
            + rec(0x003C, b"".join(blobs[split_at:])))


def rk_int(n):
    """RK-encoded 30-bit signed integer."""
    return ((n << 2) & 0xFFFFFFFF) | 0x02


def rk_div100(n):
    """RK integer form with the div-100 flag (stores n, means n/100)."""
    return ((n << 2) & 0xFFFFFFFF) | 0x03


def rk_double(x):
    """RK 'truncated double' form: top 30 bits of the IEEE double."""
    bits = struct.unpack("<Q", struct.pack("<d", x))[0]
    return (bits >> 34) << 2  # low 2 flag bits zero


def cell_labelsst(r, c, isst):
    return rec(0x00FD, struct.pack("<HHHI", r, c, 0, isst))


def cell_number(r, c, v):
    return rec(0x0203, struct.pack("<HHH", r, c, 0) + struct.pack("<d", v))


def cell_rk(r, c, rk):
    return rec(0x027E, struct.pack("<HHHI", r, c, 0, rk))


def cell_mulrk(r, c0, rks):
    body = struct.pack("<HH", r, c0)
    for rk in rks:
        body += struct.pack("<HI", 0, rk)
    body += struct.pack("<H", c0 + len(rks) - 1)
    return rec(0x00BD, body)


def cell_boolerr(r, c, b):
    return rec(0x0205, struct.pack("<HHHBB", r, c, 0, 1 if b else 0, 0))


def sheet_stream(cells, nrows, ncols):
    out = bof(0x0010)
    out += rec(0x0200, struct.pack("<IIHHH", 0, nrows, 0, ncols, 0))
    out += cells
    out += rec(0x000A)
    return out


def workbook_stream(sst_strings, sheets, sst_split=None):
    """sheets: list of (name, sheet_bytes)."""
    globals_head = bof(0x0005) + rec(0x0042, struct.pack("<H", 0x04B0))
    bs = [rec(0x0085, struct.pack("<IH", 0, 0) + unistr8(n)) for n, _ in sheets]
    tail = sst_records(sst_strings, sst_split) + rec(0x000A)
    globals_len = len(globals_head) + sum(len(b) for b in bs) + len(tail)
    # patch each BOUNDSHEET's lbPlyPos now that the globals length is known
    out, pos = globals_head, globals_len
    for (name, body), b in zip(sheets, bs):
        out += rec(0x0085, struct.pack("<IH", pos, 0) + unistr8(name))
        pos += len(body)
    out += tail
    for _, body in sheets:
        out += body
    return out


# ---------------------------------------------------------------- CFB

def dirent(name, typ, color, left, right, child, start, size):
    n = name.encode("utf-16-le") + b"\x00\x00"
    e = n + b"\x00" * (64 - len(n))
    e += struct.pack("<H", len(n))
    e += struct.pack("<BB", typ, color)
    e += struct.pack("<III", left, right, child)
    e += b"\x00" * 16  # CLSID
    e += struct.pack("<II", 0, 0)  # state bits, creation time lo
    e += b"\x00" * 12  # times
    e += struct.pack("<IQ", start, size)
    return e


def pad_sector(b):
    return b + b"\x00" * (-len(b) % 512)


def cfb(stream, name="Workbook"):
    """Single-stream v3 compound file. Streams < 4096 bytes go through the
    mini stream + miniFAT; larger ones chain regular 512-byte sectors."""
    mini = len(stream) < 4096
    sectors = []  # payload sectors after the 512-byte header

    if mini:
        ministream = pad_sector(stream)[: ((len(stream) + 63) // 64) * 64]
        ministream = ministream + b"\x00" * (-len(ministream) % 64)
        n_mini = len(ministream) // 64
        minifat = b"".join(
            struct.pack("<I", i + 1 if i + 1 < n_mini else ENDCHAIN)
            for i in range(n_mini))
        minifat = pad_sector(minifat + struct.pack("<I", FREE) * 0)
        mini_sectors = [ministream[i:i + 512]
                        for i in range(0, len(ministream), 512)]
        mini_sectors = [pad_sector(s) for s in mini_sectors]
        # layout: 0=FAT, 1=DIR, 2=miniFAT, 3..=ministream
        fat_id, dir_id, minifat_id, ms0 = 0, 1, 2, 3
        n_sect = 3 + len(mini_sectors)
        fat = [FREE] * 128
        fat[fat_id] = FATSECT
        fat[dir_id] = ENDCHAIN
        fat[minifat_id] = ENDCHAIN
        for i in range(len(mini_sectors)):
            fat[ms0 + i] = ms0 + i + 1 if i + 1 < len(mini_sectors) else ENDCHAIN
        root = dirent("Root Entry", 5, 1, FREE, FREE, 1, ms0, len(ministream))
        wb = dirent(name, 2, 1, FREE, FREE, FREE, 0, len(stream))
        directory = pad_sector(root + wb + dirent("", 0, 0, FREE, FREE, FREE, 0, 0) * 2)
        sectors = [b"".join(struct.pack("<I", v) for v in fat),
                   directory, minifat] + mini_sectors
        first_minifat, n_minifat = minifat_id, 1
    else:
        body = pad_sector(stream)
        data_sectors = [body[i:i + 512] for i in range(0, len(body), 512)]
        fat_id, dir_id, d0 = 0, 1, 2
        n_data = len(data_sectors)
        n_fat_entries = 2 + n_data
        n_fat_sectors = (n_fat_entries + 127) // 128  # fixtures stay small -> 1
        assert n_fat_sectors == 1, "fixture too large for the 1-FAT-sector writer"
        fat = [FREE] * 128
        fat[fat_id] = FATSECT
        fat[dir_id] = ENDCHAIN
        for i in range(n_data):
            fat[d0 + i] = d0 + i + 1 if i + 1 < n_data else ENDCHAIN
        root = dirent("Root Entry", 5, 1, FREE, FREE, 1, ENDCHAIN, 0)
        wb = dirent(name, 2, 1, FREE, FREE, FREE, d0, len(stream))
        directory = pad_sector(root + wb + dirent("", 0, 0, FREE, FREE, FREE, 0, 0) * 2)
        sectors = [b"".join(struct.pack("<I", v) for v in fat),
                   directory] + data_sectors
        first_minifat, n_minifat = ENDCHAIN, 0

    difat = [0] + [FREE] * 108  # FAT lives in sector 0
    header = (b"\xD0\xCF\x11\xE0\xA1\xB1\x1A\xE1" + b"\x00" * 16
              + struct.pack("<HHHHHHIIIIIIIII",
                            0x003E, 0x0003, 0xFFFE, 9, 6,
                            0, 0,        # reserved, reserved/numDirSectors(v3=0)
                            0,           # transaction signature
                            1,           # number of FAT sectors
                            1,           # first directory sector
                            0,           # reserved
                            4096,        # mini stream cutoff
                            first_minifat, n_minifat,
                            ENDCHAIN)    # first DIFAT sector
              + struct.pack("<I", 0)     # number of DIFAT sectors
              + b"".join(struct.pack("<I", v) for v in difat))
    assert len(header) == 512, len(header)
    return header + b"".join(pad_sector(s) for s in sectors)


# ---------------------------------------------------------------- fixtures

def products_small():
    sst = ["sku", "name", "price", "in_stock", "qty",
           "widget", "naïve — ünïcode ✓", "gadget"]
    cells = b"".join([
        # header row from the SST
        cell_labelsst(0, 0, 0), cell_labelsst(0, 1, 1), cell_labelsst(0, 2, 2),
        cell_labelsst(0, 3, 3), cell_labelsst(0, 4, 4),
        # r1: widget | unicode name | 19.99 (RK /100) | true | 7 (RK int)
        cell_labelsst(1, 0, 5), cell_labelsst(1, 1, 6),
        cell_rk(1, 2, rk_div100(1999)), cell_boolerr(1, 3, True),
        cell_rk(1, 4, rk_int(7)),
        # r2: gadget | (blank name) | 3.5 NUMBER | false | 12345678 NUMBER
        cell_labelsst(2, 0, 7),
        cell_number(2, 2, 3.5), cell_boolerr(2, 3, False),
        cell_number(2, 4, 12345678.0),
        # r3: negative RK int and RK-double price
        cell_labelsst(3, 0, 5), cell_labelsst(3, 1, 7),
        cell_rk(3, 2, rk_double(2.25)), cell_boolerr(3, 3, True),
        cell_rk(3, 4, rk_int(-3)),
    ])
    main = sheet_stream(cells, 4, 5)
    decoy = sheet_stream(cell_labelsst(0, 0, 0) + cell_number(1, 0, 999.0), 2, 1)
    # SST split after 6 strings -> CONTINUE carries the unicode + "gadget"
    return workbook_stream(sst, [("Data", main), ("Decoy", decoy)], sst_split=6)


def products_many(n=300):
    sst = ["sku", "a", "b", "c"] + [f"row{i}" for i in range(n)]
    cells = b"".join([cell_labelsst(0, 0, 0), cell_labelsst(0, 1, 1),
                      cell_labelsst(0, 2, 2), cell_labelsst(0, 3, 3)])
    for i in range(n):
        cells += cell_labelsst(i + 1, 0, 4 + i)
        cells += cell_mulrk(i + 1, 1, [rk_int(i), rk_int(i * 2), rk_div100(i)])
    main = sheet_stream(cells, n + 1, 4)
    return workbook_stream(sst, [("Big", main)])


if __name__ == "__main__":
    OUT.mkdir(parents=True, exist_ok=True)
    small = cfb(products_small())
    (OUT / "products.xls").write_bytes(small)
    big_stream = products_many()
    assert len(big_stream) >= 4096, len(big_stream)
    (OUT / "products_many.xls").write_bytes(cfb(big_stream))
    print(f"products.xls: {len(small)} bytes (workbook stream "
          f"{len(products_small())} B, mini-stream path)")
    print(f"products_many.xls: workbook stream {len(big_stream)} B, FAT path")
