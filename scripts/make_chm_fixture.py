#!/usr/bin/env python3
"""Generate .chm (ITSF + LZX) test fixtures.

Driver-side dev tool (like make_xls_fixture.py): writes the committed
binary fixtures under src/test/resources/chm/ that ChmReaderSpec parses
with graft.sources.ChmParser. This generator is written directly from the
public specs (the unofficial "Microsoft's HTML Help (.chm) format"
description of the ITSF/ITSP container and [MS-PATCH]'s LZX layer) with no
CHM library, so the spec cross-checks two separately-written codecs of the
same public format — the .xls fixture pattern.

Fixtures:
  help_small.chm   handcrafted HTML entries, single LZX frame, one
                   verbatim block with real matches and R0/R1/R2 repeated
                   offsets; one entry stored raw in content section 0; a
                   .txt entry the text extractor must skip.
  help_blocks.chm  48 generated pages, ~125 KiB -> 4 LZX frames with a
                   2-frame reset interval; block plan per frame: verbatim,
                   aligned-offset, uncompressed, verbatim — covering every
                   block type, frame re-alignment, and a mid-stream state
                   reset.
"""
import struct
from collections import Counter
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/chm"

FRAME = 0x8000

# ---------------------------------------------------------------- bits

class BitWriter:
    """MSB-first within little-endian 16-bit words."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def write(self, val, nbits):
        assert 0 <= val < (1 << nbits), (val, nbits)
        while nbits > 16:  # decoder reads >16-bit fields high-chunk first:
            # (nbits-16) high bits, then the low 16 — e.g. a 17-bit
            # verbatim footer is 1 high bit + 16, a 32-bit E8 size is 16+16
            self.write(val >> 16, nbits - 16)
            nbits = 16
            val &= (1 << nbits) - 1
        self.cur = (self.cur << nbits) | val
        self.n += nbits
        while self.n >= 16:
            w = (self.cur >> (self.n - 16)) & 0xFFFF
            self.n -= 16
            self.cur &= (1 << self.n) - 1
            self.out += struct.pack("<H", w)

    def align16(self):
        if self.n:
            self.write(0, 16 - self.n)

    def align_uncompressed(self):
        # decoder discards buffered bits; when already word-aligned it
        # consumes a full 16-bit pad word
        if self.n:
            self.write(0, 16 - self.n)
        else:
            self.write(0, 16)


# ---------------------------------------------------------------- huffman

def huff_lengths(freq, maxlen):
    """Code lengths (dict sym->len) for the canonical LZX convention."""
    used = sorted(s for s, c in freq.items() if c > 0)
    if not used:
        return {}
    if len(used) == 1:
        return {used[0]: 1}
    import heapq
    depth = {s: 0 for s in used}
    heap = [(freq[s], s, [s]) for s in used]
    heapq.heapify(heap)
    while len(heap) > 1:
        c1, t1, s1 = heapq.heappop(heap)
        c2, t2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, min(t1, t2), s1 + s2))
    # length-limit: clamp, then restore Kraft <= 1 by lengthening the
    # shallowest clamped-free symbols (canonical decode only needs <= 1)
    for s in depth:
        if depth[s] > maxlen:
            depth[s] = maxlen
    def kraft():
        return sum(2 ** -l for l in depth.values())
    while kraft() > 1:
        s = min((s for s in depth if depth[s] < maxlen), key=lambda s: (depth[s], s))
        depth[s] += 1
    return depth


def canonical_codes(lengths):
    """sym -> (code, len); increasing length, ties by symbol index."""
    if not lengths:
        return {}
    maxlen = max(lengths.values())
    bl = Counter(lengths.values())
    first = {}
    c = 0
    for l in range(1, maxlen + 1):
        c = (c + bl.get(l - 1, 0)) << 1
        first[l] = c
    nxt = dict(first)
    codes = {}
    for s in sorted(lengths):
        l = lengths[s]
        codes[s] = (nxt[l], l)
        nxt[l] += 1
    return codes


def write_tree(bw, new, prev):
    """Pretree + delta-coded lengths for one tree region (the two main
    regions and the length tree each call this once)."""
    n = len(new)
    ops = []  # ('s', pretree_sym) | ('b', val, nbits)
    i = 0
    while i < n:
        if new[i] == 0:
            run = 0
            while i + run < n and new[i + run] == 0:
                run += 1
            left = run
            while left >= 20:
                r = min(left, 51)
                ops.append(("s", 18))
                ops.append(("b", r - 20, 5))
                i += r
                left -= r
            while left >= 4:
                r = min(left, 19)
                ops.append(("s", 17))
                ops.append(("b", r - 4, 4))
                i += r
                left -= r
            while left > 0:
                ops.append(("s", prev[i] % 17))
                i += 1
                left -= 1
        else:
            v = new[i]
            z = (prev[i] - v) % 17
            run = 1
            while (i + run < n and new[i + run] == v
                   and prev[i + run] == prev[i] and run < 5):
                run += 1
            if run >= 4:
                ops.append(("s", 19))
                ops.append(("b", run - 4, 1))
                ops.append(("s", z))
                i += run
            else:
                ops.append(("s", z))
                i += 1
    pre_freq = Counter(s for op, s, *_ in [(o[0], o[1]) for o in ops] if op == "s")
    pre_lens = huff_lengths(pre_freq, 15)
    pre_codes = canonical_codes(pre_lens)
    for s in range(20):
        bw.write(pre_lens.get(s, 0), 4)
    for op in ops:
        if op[0] == "s":
            code, l = pre_codes[op[1]]
            bw.write(code, l)
        else:
            bw.write(op[1], op[2])


# ---------------------------------------------------------------- lzx

def extra_bits(slot):
    return min(17, max(0, slot // 2 - 1))


def position_bases(slots):
    base = [0] * slots
    for i in range(1, slots):
        base[i] = base[i - 1] + (1 << extra_bits(i - 1))
    return base


def lz_parse(data, start, end, window_start, frame, max_off):
    """Greedy tokens for data[start:end); matches may reach back to
    window_start but never cross a FRAME boundary forward."""
    tokens = []
    anchors = {}

    def index(p):
        anchors.setdefault(bytes(data[p:p + 3]), []).append(p)

    p = window_start
    while p < start:
        index(p)
        p += 1
    i = start
    while i < end:
        frame_end = ((i // frame) + 1) * frame
        limit = min(end, frame_end, i + 257)
        best_len, best_off = 0, 0
        if i + 3 <= limit:
            for j in reversed(anchors.get(bytes(data[i:i + 3]), [])[-32:]):
                off = i - j
                if off > max_off:
                    continue
                l = 0
                while i + l < limit and data[j + l] == data[i + l]:
                    l += 1
                if l > best_len:
                    best_len, best_off = l, off
        if best_len >= 3:
            tokens.append(("m", best_len, best_off))
            for k in range(i, i + best_len):
                index(k)
            i += best_len
        else:
            tokens.append(("l", data[i]))
            index(i)
            i += 1
    return tokens


def tokens_to_ops(tokens, R, bases):
    """Resolve the repeated-offset stack: per token emit
    (main_sym, len_sym|None, verb|None, extra)."""
    ops = []
    for t in tokens:
        if t[0] == "l":
            ops.append((t[1], None, None, 0))
            continue
        _, length, off = t
        if off == R[0]:
            slot, verb = 0, None
        elif off == R[1]:
            slot, verb = 1, None
            R[0], R[1] = R[1], R[0]
        elif off == R[2]:
            slot, verb = 2, None
            R[0], R[2] = R[2], R[0]
        else:
            fo = off + 2
            slot = max(s for s in range(len(bases)) if bases[s] <= fo)
            verb = fo - bases[slot]
            R[2], R[1], R[0] = R[1], R[0], off
        lenhdr = min(length - 2, 7)
        lensym = (length - 9) if lenhdr == 7 else None
        ops.append((256 + slot * 8 + lenhdr, lensym, verb, extra_bits(slot)))
    return ops


def emit_block(bw, btype, ops, nbytes, main_prev, len_prev, main_syms):
    """One verbatim (1) or aligned (2) block: header, trees, symbols."""
    bw.write(btype, 3)
    bw.write(nbytes >> 8, 16)
    bw.write(nbytes & 0xFF, 8)
    main_freq = Counter(op[0] for op in ops)
    len_freq = Counter(op[1] for op in ops if op[1] is not None)
    al_freq = Counter()
    if btype == 2:
        for _, _, verb, extra in ops:
            if verb is not None and extra >= 3:
                al_freq[verb & 7] += 1
    main_lens_d = huff_lengths(main_freq, 16)
    len_lens_d = huff_lengths(len_freq, 16)
    al_lens_d = huff_lengths(al_freq, 7)
    main_new = [main_lens_d.get(s, 0) for s in range(main_syms)]
    len_new = [len_lens_d.get(s, 0) for s in range(249)]
    if btype == 2:
        for s in range(8):
            bw.write(al_lens_d.get(s, 0), 3)
        al_codes = canonical_codes(al_lens_d)
    write_tree(bw, main_new[:256], main_prev[:256])
    write_tree(bw, main_new[256:], main_prev[256:])
    write_tree(bw, len_new, len_prev)
    main_prev[:] = main_new
    len_prev[:] = len_new
    main_codes = canonical_codes(main_lens_d)
    len_codes = canonical_codes(len_lens_d)
    for sym, lensym, verb, extra in ops:
        code, l = main_codes[sym]
        bw.write(code, l)
        if lensym is not None:
            code, l = len_codes[lensym]
            bw.write(code, l)
        if verb is not None:
            if btype == 2 and extra >= 3:
                if extra > 3:
                    bw.write(verb >> 3, extra - 3)
                code, l = al_codes[verb & 7]
                bw.write(code, l)
            elif extra > 0:
                bw.write(verb, extra)


def e8_translate(data, fsize):
    """Compressor-side E8 call-target translation (relative -> absolute),
    the exact inverse of the decoder's per-frame pass: frames < 32768,
    positions [frame_start, frame_end - 10), 5-byte skip after every 0xE8.
    Only the abs = rel + i >= 0 < fsize case is emitted; any other 0xE8
    payload must fail the DECODER's guard (abs >= -i and abs < fsize) or
    the round trip breaks — asserted here.
    """
    out = bytearray(data)
    for f in range((len(out) + FRAME - 1) // FRAME):
        if f >= 32768:
            break
        fs = f * FRAME
        end = min(len(out), fs + FRAME) - 10
        i = fs
        while i < end:
            if out[i] == 0xE8:
                rel = struct.unpack_from("<i", out, i + 1)[0]
                if 0 <= rel + i < fsize:
                    struct.pack_into("<i", out, i + 1, rel + i)
                else:
                    # untouched payload must not trigger the decoder guard
                    assert not (rel >= -i and rel < fsize), (f, i, rel)
                i += 5
            else:
                i += 1
    return bytes(out)


def lzx_compress(data, window_bits, reset_frames, plan, e8_size=0):
    """Compress `data` as one CHM content section. `plan(frame_idx)` picks
    the block type per frame ('v' | 'a' | 'u'). With e8_size > 0 the E8
    header flag is set (+32-bit translation size) and `data` must already
    be e8_translate'd. Returns (bytes, frame_offsets, max_extra_bits)."""
    slots = {15: 30, 16: 32, 17: 34, 18: 36, 19: 38, 20: 42, 21: 50}[window_bits]
    bases = position_bases(slots)
    main_syms = 256 + slots * 8
    bw = BitWriter()
    offsets = []
    max_extra = 0
    nframes = (len(data) + FRAME - 1) // FRAME
    main_prev = [0] * main_syms
    len_prev = [0] * 249
    R = [1, 1, 1]
    for f in range(nframes):
        if f % reset_frames == 0:
            main_prev = [0] * main_syms
            len_prev = [0] * 249
            R = [1, 1, 1]
            header = True
            interval_start = f * FRAME
        else:
            header = False
        assert bw.n == 0
        offsets.append(len(bw.out))
        if header:
            if e8_size:
                bw.write(1, 1)
                bw.write(e8_size, 32)  # high 16-bit chunk first
            else:
                bw.write(0, 1)  # E8 translation off
        start, end = f * FRAME, min(len(data), (f + 1) * FRAME)
        t = plan(f)
        if t == "u":
            bw.write(3, 3)
            bw.write((end - start) >> 8, 16)
            bw.write((end - start) & 0xFF, 8)
            bw.align_uncompressed()
            bw.out += struct.pack("<III", *R)
            bw.out += data[start:end]
            if (end - start) & 1:
                bw.out += b"\x00"
        else:
            tokens = lz_parse(data, start, end, interval_start, FRAME,
                              (1 << window_bits) - 1)
            ops = tokens_to_ops(tokens, R, bases)
            max_extra = max([max_extra] + [op[3] for op in ops])
            emit_block(bw, 1 if t == "v" else 2, ops, end - start,
                       main_prev, len_prev, main_syms)
        bw.align16()
    return bytes(bw.out), offsets, max_extra


# ---------------------------------------------------------------- itsf

def encint(v):
    parts = []
    while True:
        parts.append(v & 0x7F)
        v >>= 7
        if v == 0:
            break
    out = bytearray()
    for i, p in enumerate(reversed(parts)):
        out.append(p | (0x80 if i < len(parts) - 1 else 0))
    return bytes(out)


def namelist():
    def u16s(s):
        return struct.pack("<H", len(s)) + s.encode("utf-16-le") + b"\x00\x00"
    body = struct.pack("<H", 2) + u16s("Uncompressed") + u16s("MSCompressed")
    total = (2 + len(body)) // 2
    return struct.pack("<H", total) + body


RESET_GUID = "{7FC28940-9D31-11D0-9B27-00A0C91E9C7C}"


def make_chm(path, sec1_entries, sec0_entries, window_units, reset_units,
             plan, e8=False, expect_extra17=False):
    """sec*_entries: list of (name, bytes). Section 1 is LZX-compressed.
    e8=True sets the E8 header flag and pre-translates the blob (single
    reset interval + single frame only, so the decoder's post-decode
    translation sees the whole stream). expect_extra17 asserts that some
    emitted match offset needs a >16-bit verbatim footer (the split-read
    decoder path)."""
    # section-1 uncompressed blob + per-entry offsets
    blob = bytearray()
    dir_entries = []  # (name, section, offset, length)
    for name, content in sec1_entries:
        dir_entries.append((name, 1, len(blob), len(content)))
        blob += content
    window_bits = (window_units * FRAME).bit_length() - 1
    e8_size = 0
    payload = bytes(blob)
    if e8:
        assert len(blob) <= FRAME, "e8 fixtures must be single-frame"
        e8_size = len(blob)
        payload = e8_translate(payload, e8_size)
        assert payload != bytes(blob), "e8 fixture translated nothing"
    compressed, frame_offs, max_extra = lzx_compress(
        payload, window_bits, reset_units, plan, e8_size)
    if expect_extra17:
        assert max_extra > 16, \
            f"fixture emitted no >16-extra-bit offset (max {max_extra})"

    control = struct.pack("<I4sIIII", 6, b"LZXC", 2, reset_units,
                          window_units, window_units)
    reset_tbl = struct.pack("<IIII", 2, len(frame_offs), 8, 0x28)
    reset_tbl += struct.pack("<QQQ", len(blob), len(compressed), FRAME)
    for off in frame_offs:
        reset_tbl += struct.pack("<Q", off)

    sec0 = [("::DataSpace/NameList", namelist()),
            ("::DataSpace/Storage/MSCompressed/ControlData", control),
            (f"::DataSpace/Storage/MSCompressed/Transform/{RESET_GUID}"
             "/InstanceData/ResetTable", reset_tbl),
            ("::DataSpace/Storage/MSCompressed/Content", compressed)]
    sec0 += sec0_entries
    content0 = bytearray()
    for name, content in sec0:
        dir_entries.append((name, 0, len(content0), len(content)))
        content0 += content

    # directory: PMGL chunks of 0x1000
    dir_entries.sort(key=lambda e: e[0])
    encoded = [encint(len(n.encode())) + n.encode() + encint(s) +
               encint(o) + encint(l) for n, s, o, l in dir_entries]
    chunks = []
    cur = bytearray()
    for e in encoded:
        if 0x14 + len(cur) + len(e) > 0x1000 - 8:  # leave quickref room
            chunks.append(bytes(cur))
            cur = bytearray()
        cur += e
    chunks.append(bytes(cur))

    def pmgl(i, body):
        prev = i - 1 if i > 0 else 0xFFFFFFFF
        nxt = i + 1 if i < len(chunks) - 1 else 0xFFFFFFFF
        quickref = 0x1000 - 0x14 - len(body)
        return (b"PMGL" + struct.pack("<IIII", quickref, 0, prev, nxt) +
                body + b"\x00" * quickref)

    dir_data = b"".join(pmgl(i, b) for i, b in enumerate(chunks))
    itsp = (b"ITSP" + struct.pack("<III", 1, 0x54, 0x0A) +
            struct.pack("<IIIIII", 0x1000, 2, 1, 0xFFFFFFFF, 0,
                        len(chunks) - 1) +
            struct.pack("<III", 0xFFFFFFFF, len(chunks), 0x409) +
            b"\x00" * 16 +  # GUID slot
            struct.pack("<IIII", 0x54, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF))
    assert len(itsp) == 0x54

    hs0 = struct.pack("<IIQII", 0x01FE, 0, 0, 0, 0)  # file size patched below
    dir_off = 0x60 + len(hs0)
    dir_len = len(itsp) + len(dir_data)
    content_off = dir_off + dir_len

    header = (b"ITSF" + struct.pack("<IIIII", 3, 0x60, 1, 0, 0x409) +
              b"\x00" * 32 +  # two GUIDs
              struct.pack("<QQQQ", 0x60, len(hs0), dir_off, dir_len) +
              struct.pack("<Q", content_off))
    assert len(header) == 0x60

    total = len(header) + len(hs0) + dir_len + len(content0)
    hs0 = struct.pack("<IIQII", 0x01FE, 0, total, 0, 0)
    out = header + hs0 + itsp + dir_data + bytes(content0)
    path.write_bytes(out)
    print(f"{path.name}: {len(out)} bytes, {len(dir_entries)} entries, "
          f"{len(frame_offs)} frames, compressed {len(compressed)}/{len(blob)}")


# ---------------------------------------------------------------- fixtures

INDEX_HTML = """<html><head><title>Graft Help</title>
<style>body { color: red; }</style>
<script>var x = "should not appear";</script>
</head><body>
<h1>Welcome &amp; Overview</h1>
<p>This is the index page of the help file.</p>
<!-- a comment that must vanish -->
<p>Second paragraph with &lt;angles&gt; and &quot;quotes&quot;.</p>
</body></html>"""

PAGE_HTML = """<html><head><title>Topic %d</title></head><body>
<h1>Topic %d</h1>
<p>Shared boilerplate paragraph that repeats on every topic page so the
compressor finds long matches across entries.</p>
<p>Unique content for topic %d.</p>
</body></html>"""

TOC_HHC = """<html><body><ul>
<li><object type="text/sitemap"><param name="Name" value="Topic 1"></object>
<li><object type="text/sitemap"><param name="Name" value="Topic 2"></object>
</ul></body></html>"""

COVER_HTML = "<html><body><p>Uncompressed cover page.</p></body></html>"


def blocks_page(i):
    return ("<html><body><h1>Page %d</h1>" % i +
            "the quick brown fox jumps over the lazy dog %d " % i * 80 +
            "</body></html>")


def e8_code_entry():
    """An x86-ish binary entry full of E8 call sites: translatable targets
    (abs = rel + i lands in [0, fsize)) plus raw payloads that must FAIL
    the decoder guard and pass through untouched."""
    out = bytearray()
    for k in range(40):
        out += b"\x90\x90\x55\x89"          # filler "code"
        out += b"\xe8" + struct.pack("<i", [0, 16, -5, 0x7FFFFF00][k % 4])
    out += b"\x90" * 16                      # tail: inside the skipped-10 zone
    return bytes(out)


FAR_BODY = ("QXZJ0W9K7QXZ1V8M2QZX" * 100 + "JWQK3ZX5VQ" * 40)  # page-0-only alphabet


def far_filler(i):
    return ("<html><body><h1>Fill %d</h1>" % i +
            "common filler words repeat across pages %d " % i * 120 +
            "</body></html>")


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    make_chm(
        OUT / "help_small.chm",
        sec1_entries=[("/index.htm", INDEX_HTML.encode()),
                      ("/pages/p1.htm", (PAGE_HTML % (1, 1, 1)).encode()),
                      ("/pages/p2.htm", (PAGE_HTML % (2, 2, 2)).encode()),
                      ("/toc.hhc", TOC_HHC.encode()),
                      ("/readme.txt", b"plain text, not extracted")],
        sec0_entries=[("/cover.htm", COVER_HTML.encode())],
        window_units=2, reset_units=2, plan=lambda f: "v")
    make_chm(
        OUT / "help_blocks.chm",
        sec1_entries=[("/p%03d.htm" % i, blocks_page(i).encode())
                      for i in range(48)],
        sec0_entries=[],
        window_units=2, reset_units=2,
        plan=lambda f: {0: "v", 1: "a", 2: "u"}.get(f, "v"))
    # E8 translation ON: single frame, the translated/untranslated call
    # sites round-trip byte-exactly through the decoder's inverse pass
    make_chm(
        OUT / "help_e8.chm",
        sec1_entries=[("/index.htm", INDEX_HTML.encode()),
                      ("/code.bin", e8_code_entry()),
                      ("/pages/p1.htm", (PAGE_HTML % (1, 1, 1)).encode())],
        sec0_entries=[],
        window_units=2, reset_units=2, plan=lambda f: "v", e8=True)
    # windowBits 21 + a match offset past 256 KiB: the verbatim footer
    # needs 17 extra bits, exercising the decoder's split >16-bit read
    far_pages = ([("/far0.htm", ("<html><body>" + FAR_BODY +
                                 "</body></html>").encode())] +
                 [("/fill%02d.htm" % i, far_filler(i).encode())
                  for i in range(96)] +
                 [("/far1.htm", ("<html><body>" + FAR_BODY +
                                 "</body></html>").encode())])
    make_chm(
        OUT / "help_far.chm",
        sec1_entries=far_pages,
        sec0_entries=[],
        window_units=64, reset_units=16, plan=lambda f: "v",
        expect_extra17=True)


if __name__ == "__main__":
    main()
