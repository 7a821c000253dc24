"""Pure-Python PDF text layer — the tier below PyMuPDF for S5
(ref: resources/convertors/pdf_extractor.py:56-101).

Implements the subset of ISO 32000 needed to read the text layer of
ordinary text PDFs, from public spec knowledge only:

- object scan (`N 0 obj` … `endobj`), direct-/Length and scan-to-
  `endstream` stream extraction, FlateDecode inflation;
- /ObjStm (compressed object stream, PDF 1.5) expansion so font dicts
  hidden in object streams resolve;
- page graph: /Type/Page → /Contents streams + /Resources /Font map,
  with /Parent inheritance for resources;
- content-stream text operators: literal strings (nested parens, octal
  escapes, line continuations), hex strings, BT/ET, Td/TD/T*/'/" line
  breaks, and Tf font tracking;
- /ToUnicode CMaps (beginbfchar/beginbfrange) so CID-keyed fonts
  (Identity-H) decode to real text; fonts without a CMap fall back to
  UTF-16BE (BOM) or Latin-1.

- /DecodeParms predictors on Flate and LZW streams: PNG row filters
  10-15 (None/Sub/Up/Average/Paeth per the public PNG spec, the form
  every mainstream producer emits for xref/object streams) and TIFF
  horizontal differencing (Predictor 2, 8-bit components);
- /LZWDecode (ISO 32000 §7.4.4): MSB-first variable-width 9-12 bit
  codes, clear/EOD markers, EarlyChange width switching — the filter
  legacy-producer PDFs carry; ASCIIHex/ASCII85/RunLength transport
  filters and /Filter array chains;
- standard security handler decryption for files that open WITHOUT a
  password (RC4 V1-V4, AESV2, AES-256 AESV3 R5/R6 via the from-scratch
  FIPS-197 AES in functions/aes.py), the empty user password validated
  against /U so wrongly-keyed output is never emitted.

Out of scope (→ the PyMuPDF tier): DCT/JPX/JBIG2/CCITT image filters,
password-required files, Type3 glyph procs, vertical writing.
"""

from __future__ import annotations

import re
import zlib

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_START_RE = re.compile(rb"\bstream\r?\n")
# group(2) present ⇒ indirect length ref and group(1) is the OBJECT NUMBER.
# A single negative-lookahead form backtracks ('/Length 123 0 R' → '12'
# with remainder '3 0 R' escaping the lookahead), so the ref arm is
# matched explicitly instead.
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(\s+\d+\s+R)?")
# integer-valued objects ('12 0 obj 843 endobj') for indirect /Length refs
_INT_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\s+(\d+)\s+endobj")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_NAME_RE = re.compile(rb"/([^\s/<>()\[\]{}%]+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _decode_parm(dict_bytes: bytes, key: bytes, default: int) -> int:
    m = re.search(rb"/" + key + rb"\s+(\d+)", dict_bytes)
    return int(m.group(1)) if m else default


def _png_unfilter(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    """Reverse PNG row filters (type byte per row: 0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth) — the /Predictor >= 10 encoding of ISO 32000
    §7.4.4.4, defined by the public PNG spec."""
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    while i < len(data):
        ftype = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        i += 1 + rowlen
        if len(row) < rowlen:
            row.extend(bytes(rowlen - len(row)))
        if ftype == 1:  # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for j in range(rowlen):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ftype == 3:  # Average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _tiff_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    if bpc != 8:  # sub-byte TIFF differencing: rare, leave untouched
        return data
    rowlen = columns * colors
    out = bytearray(data)
    for r0 in range(0, len(out), rowlen):
        for j in range(r0 + colors, min(r0 + rowlen, len(out))):
            out[j] = (out[j] + out[j - colors]) & 0xFF
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes | None:
    """PDF LZWDecode (ISO 32000 §7.4.4): MSB-first bit stream, 9-bit
    codes growing to 12, code 256 clears the table, 257 ends the data.
    `early` is /EarlyChange (default 1: the code width bumps one code
    before the table strictly requires it)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (bitbuf >> nbits) & ((1 << width) - 1)
            if code == 257:  # EOD
                return bytes(out)
            if code == 256:  # clear table
                table = table[:258]
                width = 9
                prev = None
                continue
            if prev is None:
                if code >= len(table):
                    return None  # first code must be literal
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None  # corrupt stream
            out += entry
            prev = entry
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


# PDF whitespace bytes (ISO 32000 §7.2.2): NUL HT LF FF CR SP — NOT the
# unicode set chr().isspace() would accept (0x85/0xA0 are invalid here)
_PDF_WS = frozenset(b"\x00\t\n\x0c\r ")


def _asciihex_decode(data: bytes) -> bytes | None:
    """ASCIIHexDecode (ISO 32000 §7.4.2): hex pairs, whitespace ignored,
    '>' terminates; an odd final digit is padded with 0."""
    hexdigits = []
    for byte in data:
        ch = chr(byte)
        if ch == ">":
            break
        if byte in _PDF_WS:
            continue
        if ch not in "0123456789abcdefABCDEF":
            return None
        hexdigits.append(ch)
    if len(hexdigits) % 2:
        hexdigits.append("0")
    return bytes.fromhex("".join(hexdigits))


def _ascii85_decode(data: bytes) -> bytes | None:
    """ASCII85Decode (ISO 32000 §7.4.3): base-85 groups of 5 chars →
    4 bytes, 'z' = four zero bytes, '~>' terminates, partial final
    group allowed."""
    out = bytearray()
    group: list[int] = []
    i = 0
    n = len(data)
    while i < n:
        ch = data[i]
        if ch == 0x7E:  # '~' begins the EOD marker
            break
        i += 1
        if ch in _PDF_WS:
            continue
        if ch == 0x7A:  # 'z'
            if group:
                return None  # z inside a group is illegal
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= ch <= 0x75:
            return None
        group.append(ch - 0x21)
        if len(group) == 5:
            val = 0
            for d in group:
                val = val * 85 + d
            if val > 0xFFFFFFFF:
                return None
            out += val.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            return None
        k = len(group)
        group += [84] * (5 - k)
        val = 0
        for d in group:
            val = val * 85 + d
        out += val.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes | None:
    """RunLengthDecode (ISO 32000 §7.4.5): n<128 → copy n+1 literal
    bytes; n>128 → repeat next byte 257-n times; 128 = EOD."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        length = data[i]
        i += 1
        if length == 128:
            break
        if length < 128:
            if i + length + 1 > n:  # truncated literal run
                return None
            out += data[i : i + length + 1]
            i += length + 1
        else:
            if i >= n:
                return None
            out += bytes([data[i]]) * (257 - length)
            i += 1
    return bytes(out)


_FILTER_NAME_RE = re.compile(
    rb"/(FlateDecode|LZWDecode|ASCIIHexDecode|ASCII85Decode|RunLengthDecode"
    rb"|DCTDecode|JPXDecode|JBIG2Decode|CCITTFaxDecode|Crypt)"
)


def _inflate(dict_bytes: bytes, data: bytes) -> bytes | None:
    # filters apply as a CHAIN in written order (a /Filter array like
    # [/ASCII85Decode /FlateDecode] is a transport encoding around a
    # compressed stream); unknown members route the stream to the gated
    # image-codec tier
    names = _FILTER_NAME_RE.findall(dict_bytes)
    if not names:
        return None if b"/Filter" in dict_bytes else data
    raw: bytes | None = data
    for name in names:
        if raw is None:
            return None
        if name == b"FlateDecode":
            try:
                raw = zlib.decompressobj().decompress(raw)
            except zlib.error:
                return None
        elif name == b"LZWDecode":
            early = _decode_parm(dict_bytes, b"EarlyChange", 1)
            raw = _lzw_decode(raw, early)
        elif name == b"ASCIIHexDecode":
            raw = _asciihex_decode(raw)
        elif name == b"ASCII85Decode":
            raw = _ascii85_decode(raw)
        elif name == b"RunLengthDecode":
            raw = _runlength_decode(raw)
        else:
            return None  # DCT/JPX/JBIG2/CCITT/Crypt: unsupported tier
    if raw is None:
        return None
    pred = _decode_parm(dict_bytes, b"Predictor", 1)
    if pred >= 2:
        columns = _decode_parm(dict_bytes, b"Columns", 1)
        colors = _decode_parm(dict_bytes, b"Colors", 1)
        bpc = _decode_parm(dict_bytes, b"BitsPerComponent", 8)
        if pred >= 10:
            raw = _png_unfilter(raw, columns, colors, bpc)
        else:
            raw = _tiff_unpredict(raw, columns, colors, bpc)
    return raw


def _objects(payload: bytes, decrypt=None) -> dict[int, tuple[bytes, bytes | None]]:
    """num → (object dict/body bytes, decoded stream bytes or None).

    Match positions inside an already-consumed object's extent are
    skipped: compressed stream bytes can contain a false 'N 0 obj' that
    would otherwise clobber the real object N parsed earlier.

    `decrypt(num, gen, raw)` is applied to raw stream bytes BEFORE filter
    decoding when the file carries the standard security handler (the
    filters wrap the plaintext, encryption wraps the filtered bytes)."""
    int_objs = {
        int(m.group(1)): int(m.group(2)) for m in _INT_OBJ_RE.finditer(payload)
    }
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    for m in _OBJ_HEAD_RE.finditer(payload):
        if m.start() < pos:
            continue  # inside the previous object's stream/body
        num, gen, start = int(m.group(1)), int(m.group(2)), m.end()
        em = payload.find(b"endobj", start)
        sm = _STREAM_START_RE.search(payload, start, em if em != -1 else len(payload))
        if sm is None:
            end = em if em != -1 else len(payload)
            objs[num] = (payload[start:end], None)
            pos = end + 6 if em != -1 else len(payload)
            continue
        d = payload[start : sm.start()]
        lm = _LENGTH_RE.search(d)
        length = None
        if lm:
            length = (
                int(lm.group(1)) if lm.group(2) is None
                else int_objs.get(int(lm.group(1)))
            )
        if length is not None:
            data_end = sm.end() + length
            data = payload[sm.end() : data_end]
        else:
            data_end = payload.find(b"endstream", sm.end())
            if data_end == -1:
                data_end = len(payload)
            data = payload[sm.end() : data_end].rstrip(b"\r\n")
        em2 = payload.find(b"endobj", data_end)
        pos = em2 + 6 if em2 != -1 else data_end
        if decrypt is not None:
            data = decrypt(num, gen, data)
        objs[num] = (d, _inflate(d, data))
    # expand /ObjStm so dict-only objects inside compressed streams resolve
    for d, data in list(objs.values()):
        if data is None or b"/ObjStm" not in d:
            continue
        mn = re.search(rb"/N\s+(\d+)", d)
        mf = re.search(rb"/First\s+(\d+)", d)
        if not (mn and mf):
            continue
        n, first = int(mn.group(1)), int(mf.group(1))
        header = data[:first].split()
        if len(header) < 2 * n:
            continue
        offs = [int(header[2 * k + 1]) for k in range(n)]
        nums = [int(header[2 * k]) for k in range(n)]
        offs.append(len(data) - first)
        for k in range(n):
            objs.setdefault(
                nums[k], (data[first + offs[k] : first + offs[k + 1]], None)
            )
    return objs


def _resolve(objs, body: bytes, key: bytes) -> bytes | None:
    """Value of /key in an object body: inline dict body or one-level
    dereference of `N 0 R`."""
    m = re.search(rb"/" + key + rb"\s*(<<|\[|\d)", body)
    if not m:
        return None
    at = m.start() + 1 + len(key)
    rest = body[at:]
    rm = re.match(rb"\s*(\d+)\s+\d+\s+R", rest)
    if rm:
        target = objs.get(int(rm.group(1)))
        return target[0] if target else None
    dm = re.match(rb"\s*<<", rest)
    if dm:
        # balanced << >> scan
        i = dm.end()
        depth = 1
        while i < len(rest) and depth:
            if rest[i : i + 2] == b"<<":
                depth += 1
                i += 2
            elif rest[i : i + 2] == b">>":
                depth -= 1
                i += 2
            else:
                i += 1
        return rest[dm.end() : i - 2]
    am = re.match(rb"\s*\[", rest)
    if am:
        j = rest.find(b"]", am.end())
        return rest[am.end() : j if j != -1 else len(rest)]
    return None


# ------------------------------------------------------------- CMap parse

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_CODESPACE_RE = re.compile(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", re.S)


def _u16(hexs: bytes) -> str:
    try:
        raw = bytes.fromhex(hexs.decode("ascii"))
    except ValueError:  # odd digit count in a malformed CMap: degrade
        if len(hexs) < 2:
            return ""
        raw = bytes.fromhex(hexs[: len(hexs) - len(hexs) % 2].decode("ascii"))
    return raw.decode("utf-16-be", "replace")


def _parse_tounicode(stream: bytes) -> dict:
    """CID → unicode map from a ToUnicode CMap; key '_codelen' holds the
    source code width in bytes (2 for Identity-H). The width is taken
    from the bfchar/bfrange SOURCE hex lengths, not codespacerange —
    simple-font writers routinely declare <0000> <FFFF> while emitting
    1-byte sources like <20>."""
    cmap: dict = {}
    src_lens: list[int] = []
    for block in _BFCHAR_RE.finditer(stream):
        hexes = _HEX_RE.findall(block.group(1))
        for k in range(0, len(hexes) - 1, 2):
            src_lens.append(len(hexes[k]) // 2)
            cmap[int(hexes[k], 16)] = _u16(hexes[k + 1])
    for block in _BFRANGE_RE.finditer(stream):
        body = block.group(1)
        # triplets: <lo> <hi> <dst>  |  <lo> <hi> [<d0> <d1> ...]
        for t in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<[0-9A-Fa-f]+>|\[[^\]]*\])",
            body,
        ):
            lo, hi = int(t.group(1), 16), int(t.group(2), 16)
            src_lens.append(len(t.group(1)) // 2)
            dst = t.group(3)
            if dst.startswith(b"["):
                dsts = _HEX_RE.findall(dst)
                for i, code in enumerate(range(lo, hi + 1)):
                    if i < len(dsts):
                        cmap[code] = _u16(dsts[i])
            else:
                base_hex = dst[1:-1]
                base = int(base_hex, 16)
                for code in range(lo, hi + 1):
                    cmap[code] = chr(base + (code - lo)) if base + (code - lo) <= 0x10FFFF else ""
    if src_lens:
        cmap["_codelen"] = max(set(src_lens), key=src_lens.count)
    else:
        m = _CODESPACE_RE.search(stream)
        cmap["_codelen"] = len(m.group(1)) // 2 if m else 2
    return cmap


# --------------------------------------------------------- content stream


def _scan_literal(data: bytes, start: int) -> tuple[bytes, int]:
    """PDF literal string from '(' — nested parens, backslash escapes
    (octal, line continuation) per spec §7.3.4.2. Returns raw bytes."""
    i = start + 1
    depth = 1
    out = bytearray()
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oc = 0
                k = 0
                while k < 3 and i < n and 0x30 <= data[i] <= 0x37:
                    oc = oc * 8 + (data[i] - 0x30)
                    i += 1
                    k += 1
                out.append(oc & 0xFF)
                continue
            mapped = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}
            if e in mapped:
                out.append(mapped[e])
            elif e in (0x0A, 0x0D):  # line continuation
                if e == 0x0D and i + 1 < n and data[i + 1] == 0x0A:
                    i += 1
            else:  # \( \) \\ and anything else: the char itself
                out.append(e)
            i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _decode_shown(raw: bytes, cmap: dict | None) -> str:
    if cmap:
        clen = cmap.get("_codelen", 2)
        out = []
        for k in range(0, len(raw) - clen + 1, clen):
            code = int.from_bytes(raw[k : k + clen], "big")
            # 1-byte unmapped codes: WinAnsi ≈ Latin-1 fallback; 2-byte
            # (CID) unmapped codes have no portable glyph meaning
            dflt = chr(code) if clen == 1 and 0x20 <= code < 0x100 else ""
            out.append(cmap.get(code, dflt))
        return "".join(out)
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    return raw.decode("latin-1")


def _content_text(content: bytes, fontmap: dict[bytes, dict | None]) -> str:
    """Collect text-showing strings in order; Td/TD/T*/'/\"/ET emit
    newlines; Tf switches the active font's ToUnicode map."""
    out: list[str] = []
    i, n = 0, len(content)
    in_text = False
    last_name: bytes | None = None
    cmap: dict | None = None
    while i < n:
        c = content[i : i + 1]
        if c == b"(":
            raw, i = _scan_literal(content, i)
            if in_text:
                out.append(_decode_shown(raw, cmap))
            continue
        if c == b"<" and content[i : i + 2] != b"<<":
            j = content.find(b">", i)
            if j == -1:
                break
            if in_text:
                hexs = re.sub(rb"\s", b"", content[i + 1 : j])
                if len(hexs) % 2:
                    hexs += b"0"
                try:
                    out.append(_decode_shown(bytes.fromhex(hexs.decode("ascii")), cmap))
                except ValueError:
                    pass
            i = j + 1
            continue
        if c == b"/":
            m = _NAME_RE.match(content, i)
            if m:
                last_name = m.group(1)
                i = m.end()
                continue
        m = _OP_RE.match(content, i)
        if m:
            op = m.group()
            if op == b"BI":
                # inline image: raw sample bytes follow ID until EI —
                # binary that can contain fake BT/( tokens; skip past it
                # (EI must be whitespace-delimited per §8.9.7)
                idm = re.compile(rb"\bID[ \r\n]").search(content, m.end())
                if idm is None:
                    break
                eim = re.compile(rb"[ \r\n\t]EI\b").search(content, idm.end())
                if eim is None:
                    break
                i = eim.end()
                continue
            if op == b"BT":
                in_text = True
            elif op == b"ET":
                in_text = False
                out.append("\n")
            elif op == b"Tf" and last_name is not None:
                cmap = fontmap.get(last_name)
            elif op in (b"Td", b"TD", b"T*", b"'", b'"') and in_text:
                out.append("\n")
            i = m.end()
            continue
        i += 1
    lines = [ln.strip() for ln in "".join(out).split("\n")]
    return "\n".join(ln for ln in lines if ln)


# ---------------------------------------------------------------- driver


def _page_fontmap(objs, page_body: bytes, cmap_cache: dict) -> dict[bytes, dict | None]:
    """Resource-name → ToUnicode cmap for one page, walking /Parent for
    inherited /Resources (spec §7.7.3.4)."""
    body = page_body
    res = None
    for _ in range(8):  # bounded parent walk
        res = _resolve(objs, body, b"Resources")
        if res is not None:
            break
        pm = re.search(rb"/Parent\s+(\d+)\s+\d+\s+R", body)
        if not pm or int(pm.group(1)) not in objs:
            break
        body = objs[int(pm.group(1))][0]
    if res is None:
        return {}
    fonts = _resolve(objs, res, b"Font")
    if fonts is None:
        return {}
    fontmap: dict[bytes, dict | None] = {}
    for fm in re.finditer(rb"/([^\s/<>()\[\]{}%]+)\s+(\d+)\s+\d+\s+R", fonts):
        name, ref = fm.group(1), int(fm.group(2))
        font = objs.get(ref)
        fontmap[name] = None
        if font is None:
            continue
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", font[0])
        if tm:
            cref = int(tm.group(1))
            if cref not in cmap_cache:
                cobj = objs.get(cref)
                cmap_cache[cref] = (
                    _parse_tounicode(cobj[1]) if cobj and cobj[1] else None
                )
            fontmap[name] = cmap_cache[cref]
    return fontmap


def _page_content(objs, page_body: bytes) -> bytes:
    """Concatenated decoded /Contents streams of one page. Handles the
    inline-array form ('/Contents[4 0 R 5 0 R]' — '[' is a delimiter, no
    whitespace required), the direct stream ref, and a ref whose target
    is itself an array object of stream refs."""
    m = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", page_body)
    if not m:
        return b""
    parts: list[bytes] = []
    for r in _REF_RE.finditer(m.group(1)):
        target = objs.get(int(r.group(1)))
        if target is None:
            continue
        body, stream = target
        if stream is not None:
            parts.append(stream)
        elif body.lstrip().startswith(b"["):
            # indirect array object: its body lists the stream refs
            parts.extend(
                objs[int(r2.group(1))][1] or b""
                for r2 in _REF_RE.finditer(body)
                if int(r2.group(1)) in objs
            )
    return b"\n".join(parts)


# standard security handler (ISO 32000 §7.6.3): the 32-byte password pad
_PW_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = byte ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _dict_hex_string(d: bytes, key: bytes) -> bytes | None:
    """String value for /key from an object dict: <hex> or (literal)."""
    m = re.search(rb"/" + key + rb"\s*<([0-9a-fA-F\s]*)>", d)
    if m:
        h = re.sub(rb"\s", b"", m.group(1))
        if len(h) % 2:
            h += b"0"
        return bytes.fromhex(h.decode())
    m = re.search(rb"/" + key + rb"\s*\(", d)
    if m:
        s, _end = _scan_literal(d, m.end() - 1)
        return s
    return None


def _trailer_id0(payload: bytes) -> bytes | None:
    """First element of the trailer /ID array — either spelling: hex
    string ``/ID [<...> <...>]`` or the equally-legal literal-string form
    ``/ID [(...) (...)]`` (ISO 32000-1 §14.4; both are file identifiers
    usable in encryption key derivation)."""
    m = re.search(rb"/ID\s*\[\s*<([0-9a-fA-F\s]+)>", payload)
    if m:
        h = re.sub(rb"\s", b"", m.group(1))
        # a whitespace-only hex string would yield b'' here and an empty
        # file ID would silently derive a garbage decryption key — treat
        # it as absent and fall through to the literal form instead
        if h:
            if len(h) % 2:
                h += b"0"
            return bytes.fromhex(h.decode())
    m = re.search(rb"/ID\s*\[\s*\(", payload)
    if m:
        s, _end = _scan_literal(payload, m.end() - 1)
        return s
    return None


def _r6_hash(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B hardened hash (R6): SHA-256 seeded,
    then ≥64 rounds of 64×-repeated input through AES-128-CBC with the
    digest picking SHA-256/384/512 each round."""
    import hashlib

    from . import aes

    k = hashlib.sha256(password + salt + udata).digest()
    rnd = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes.cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


def _encryption_decryptor(payload: bytes):
    """(decrypt_fn | None, supported: bool). Standard security handler
    with an EMPTY user password — the ubiquitous 'permissions-protected'
    document (print/copy restrictions, no open password), common in
    government publications. Supported: RC4 V1/V2 R2/R3, V4/R4 crypt
    filters (RC4 and AESV2), and V5/R6 AES-256 (AESV3). Files that
    genuinely require a user password report unsupported → caller
    yields no text rather than garbage."""
    import hashlib

    from . import aes

    # trailers live at the END of the file (original + incremental
    # updates), so take the LAST /Encrypt occurrence — a content stream
    # earlier in the file that merely mentions '/Encrypt N 0 R' then
    # can't shadow the real trailer entry
    refs = list(re.finditer(rb"/Encrypt\s+(\d+)\s+\d+\s+R", payload))
    direct = list(re.finditer(rb"/Encrypt\s*<<", payload))
    if not refs and not direct:
        return None, True
    d = None
    if refs and (not direct or refs[-1].start() > direct[-1].start()):
        num = int(refs[-1].group(1))
        # an unanchored 'N G obj' can also appear inside compressed
        # stream bytes; accept only a match whose body carries the
        # standard handler marker
        for om in re.finditer(rb"\b%d\s+\d+\s+obj\b" % num, payload):
            body = payload[om.end() : payload.find(b"endobj", om.end())]
            if b"/Standard" in body:
                d = body
                break
    else:
        # direct inline dict in the trailer: scan to the balancing >>
        start = direct[-1].end() - 2
        depth = 0
        i = start
        while i < len(payload) - 1:
            two = payload[i : i + 2]
            if two == b"<<":
                depth += 1
                i += 2
            elif two == b">>":
                depth -= 1
                i += 2
                if depth == 0:
                    break
            else:
                i += 1
        d = payload[start:i]
    if d is None or b"/Standard" not in d:
        return None, False

    def int_entry(key: bytes, default: int) -> int:
        m = re.search(rb"/" + key + rb"\s+(\d+)", d)
        return int(m.group(1)) if m else default

    v = int_entry(b"V", 1)
    r = int_entry(b"R", 2)

    if v == 5:
        # AES-256 (AESV3): file key unwraps from UE via a hash of the
        # (empty) user password — no doc ID involved. R6 (ISO) uses the
        # Algorithm 2.B hardened hash; R5 (Acrobat 9 era) plain SHA-256.
        if r not in (5, 6):
            return None, False
        if r == 6:
            pw_hash = _r6_hash
        else:

            def pw_hash(password: bytes, salt: bytes) -> bytes:
                return hashlib.sha256(password + salt).digest()

        u_entry = _dict_hex_string(d, b"U")
        ue_entry = _dict_hex_string(d, b"UE")
        if u_entry is None or len(u_entry) < 48 or ue_entry is None:
            return None, False
        # validate the empty user password against the U hash BEFORE
        # emitting anything — password-required files must fail closed
        if pw_hash(b"", u_entry[32:40]) != u_entry[:32]:
            return None, False
        ikey = pw_hash(b"", u_entry[40:48])
        file_key = aes.cbc_decrypt_nopad(ikey, bytes(16), ue_entry[:32])

        def decrypt_v5(onum: int, ogen: int, raw: bytes) -> bytes:
            out = aes.cbc_decrypt(file_key, raw)
            return out if out is not None else b""

        return decrypt_v5, True

    use_aes = False
    if v == 4 and r == 4:
        # crypt-filter indirection: /CFM names the cipher
        flat = re.sub(rb"\s+", b"", d)
        if b"/AESV2" in flat:
            use_aes = True
        elif b"/CFM/V2" not in flat:
            return None, False
    elif v not in (1, 2) or r not in (2, 3):
        return None, False
    o_entry = _dict_hex_string(d, b"O")
    pm = re.search(rb"/P\s+(-?\d+)", d)
    id0 = _trailer_id0(payload)
    if o_entry is None or pm is None or id0 is None:
        return None, False
    p_bytes = (int(pm.group(1)) & 0xFFFFFFFF).to_bytes(4, "little")
    lm = re.search(rb"/Length\s+(\d+)", d)
    if lm and r >= 3:
        # top-level /Length is in BITS (40-128); a crypt filter's
        # /Length is in BYTES (5-16) and may match first — magnitude
        # disambiguates
        lval = int(lm.group(1))
        n_key = lval // 8 if lval >= 40 else lval
    else:
        n_key = 5
    meta_suffix = b""
    if r >= 4 and re.search(rb"/EncryptMetadata\s+false", d):
        meta_suffix = b"\xff\xff\xff\xff"
    h = hashlib.md5(_PW_PAD + o_entry[:32] + p_bytes + id0 + meta_suffix).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n_key]).digest()
    key = h[:n_key]

    # Algorithm 6: validate the empty user password against /U so a
    # wrongly-derived key can never emit garbage text. R2 compares the
    # full 32-byte RC4 of the pad; R3/R4 the first 16 bytes of the
    # salted-iterated form.
    u_entry = _dict_hex_string(d, b"U")
    if u_entry is None:
        return None, False
    if r == 2:
        if _rc4(key, _PW_PAD) != u_entry[:32]:
            return None, False
    else:
        x = hashlib.md5(_PW_PAD + id0).digest()
        x = _rc4(key, x)
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in key), x)
        if x != u_entry[:16]:
            return None, False

    # /StmF /Identity: streams are NOT encrypted (a strings-only
    # producer configuration) — nothing for the stream scanner to do
    if v == 4 and re.search(rb"/StmF\s*/Identity\b", d):
        return None, True

    def decrypt(onum: int, ogen: int, raw: bytes) -> bytes:
        salt = b"sAlT" if use_aes else b""
        ok = hashlib.md5(
            key + onum.to_bytes(3, "little") + ogen.to_bytes(2, "little") + salt
        ).digest()[: min(n_key + 5, 16)]
        if use_aes:
            out = aes.cbc_decrypt(ok, raw)
            return out if out is not None else b""
        return _rc4(ok, raw)

    return decrypt, True


def pdf_text(payload: bytes) -> str:
    """Text layer of a PDF, pure Python. Page-graph driven when the page
    objects resolve; otherwise falls back to scanning every inflated
    stream that contains BT text blocks (no font decoding). Files under
    the standard security handler (RC4, empty user password) decrypt
    transparently; unsupported encryption yields no text, never
    garbage."""
    decrypt, supported = _encryption_decryptor(payload)
    if not supported:
        return ""
    objs = _objects(payload, decrypt=decrypt)
    cmap_cache: dict = {}
    pages: list[str] = []
    for num in sorted(objs):
        d, _ = objs[num]
        if not re.search(rb"/Type\s*/Page\b(?!s)", d):
            continue
        fontmap = _page_fontmap(objs, d, cmap_cache)
        t = _content_text(_page_content(objs, d), fontmap)
        if t.strip():
            pages.append(t)
    if pages:
        return "\n".join(pages)
    # fallback: no parsable page graph — scan raw streams
    for _, data in objs.values():
        if data and b"BT" in data:
            t = _content_text(data, {})
            if t.strip():
                pages.append(t)
    return "\n".join(pages)
