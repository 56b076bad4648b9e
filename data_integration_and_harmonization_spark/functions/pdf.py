"""Baseline PDF text extraction + fixture writer, from the public PDF
spec (ISO 32000-1): Flate-compressed content streams and the BT/ET
text-object operators. The same pattern as the engine's other
document codecs (xlsx: stdlib zip+XML; PNG: stdlib zlib) — corpora
are full of PDFs, and a curation pass needs their text without a
rendering dependency.

Scope (deliberately the 80% tier, like the JPEG-baseline /
MP4-metadata codecs): text carried by ``Tj`` / ``TJ`` / ``'`` / ``"``
show operators inside uncompressed or FlateDecode content streams,
with literal-string escapes (octal, specials, line continuations) and
hex strings per the spec's string grammar. Out of scope: encrypted
documents, CID/Type0 composite-font byte mapping (extracted bytes
are taken latin-1), object streams, and layout-accurate positioning —
line structure is approximated by emitting a newline at the
line-advance operators (``Td``/``TD``/``T*``) and at ``ET``, which is
what the common extractors (pdftotext -raw) do for simple documents.
"""

from __future__ import annotations

import re
import struct
import zlib

_OBJ_RE = re.compile(rb"\d+\s+\d+\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)

_ESCAPES = {
    ord("n"): b"\n",
    ord("r"): b"\r",
    ord("t"): b"\t",
    ord("b"): b"\b",
    ord("f"): b"\f",
    ord("("): b"(",
    ord(")"): b")",
    ord("\\"): b"\\",
}

_DELIMS = b"()<>[]{}/%"
_WS = b"\x00\t\n\x0c\r "


def is_pdf(payload: bytes) -> bool:
    return payload is not None and payload[:5] == b"%PDF-"


def _parse_literal(data: bytes, pos: int) -> tuple[bytes, int]:
    """Decode one ``(...)`` literal string starting at ``pos`` (on the
    opening paren). Handles balanced nested parens, the 8 named
    escapes, 1-3 digit octal escapes, and backslash-newline line
    continuations — the full string grammar of ISO 32000-1 §7.3.4.2."""
    out = bytearray()
    depth = 1
    i = pos + 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = chr(e)
                i += 1
                while (
                    len(oct_digits) < 3 and i < n and 0x30 <= data[i] <= 0x37
                ):
                    oct_digits += chr(data[i])
                    i += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # spec: lone backslash is dropped
                out.append(e)
                i += 1
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
        out.append(c)
        i += 1
    return bytes(out), i


def _parse_hex(data: bytes, pos: int) -> tuple[bytes, int]:
    """Decode one ``<...>`` hex string (§7.3.4.3: whitespace ignored,
    odd final digit padded with 0)."""
    end = data.index(b">", pos)
    digits = re.sub(rb"[^0-9A-Fa-f]", b"", data[pos + 1 : end])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")), end + 1


def _extract_from_content(content: bytes, out: list[str]) -> None:
    """Walk one content stream's token sequence, appending shown text
    (Tj/TJ/'/\") and newlines at the line-advance operators."""
    pending: list[bytes] = []
    i = 0
    n = len(content)

    def newline() -> None:
        if out and not out[-1].endswith("\n"):
            out.append("\n")

    while i < n:
        c = content[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x25:  # % comment to end of line
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == 0x28:  # literal string
            s, i = _parse_literal(content, i)
            pending.append(s)
            continue
        if c == 0x3C:  # <...> hex string or << dict
            if i + 1 < n and content[i + 1] == 0x3C:
                i += 2
                continue
            s, i = _parse_hex(content, i)
            pending.append(s)
            continue
        if c in _DELIMS:  # array/dict delimiters, names: skip token
            if c == 0x2F:  # /Name
                i += 1
                while i < n and content[i] not in _WS and content[i] not in _DELIMS:
                    i += 1
            else:
                i += 1
            continue
        # a regular token: number or operator
        j = i
        while j < n and content[j] not in _WS and content[j] not in _DELIMS:
            j += 1
        tok = content[i:j]
        i = j
        if tok in (b"Tj", b"TJ"):
            out.extend(s.decode("latin-1") for s in pending)
            pending.clear()
        elif tok in (b"'", b'"'):
            # §9.4.3: both move to the next line THEN show
            newline()
            out.extend(s.decode("latin-1") for s in pending)
            pending.clear()
        elif tok in (b"Td", b"TD", b"T*"):
            newline()
            pending.clear()
        elif tok in (b"ET", b"BT"):
            newline()
            pending.clear()
        elif not re.fullmatch(rb"[-+.0-9]+", tok or b"x"):
            # any other OPERATOR consumes its operands; numbers stack
            pending.clear()


def extract_pdf_text(payload: bytes) -> str | None:
    """Text of a PDF payload: every content stream's show-operator
    output in file order, newline-separated at line advances (see
    module docstring for scope). None for non-PDF payloads; malformed
    internals degrade to whatever streams decode rather than raising
    (a 100-TB corpus pass quarantines on empty text, it doesn't die)."""
    if not is_pdf(payload):
        return None
    data = bytes(payload)
    out: list[str] = []
    for m in _OBJ_RE.finditer(data):
        body = m.group(1)
        sm = _STREAM_RE.search(body)
        if sm is None:
            continue
        head = body[: sm.start()]
        raw = sm.group(1)
        if b"/FlateDecode" in head:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue
        elif b"/Filter" in head:
            continue  # unsupported filter (DCT/LZW/...) — not text
        if b"BT" not in raw:
            continue
        try:
            _extract_from_content(raw, out)
        except (ValueError, IndexError):
            continue  # torn stream: keep what other streams yield
    txt = "".join(out).strip("\n")
    return txt or None  # text-free payloads surface as NULL (quarantine)


def encode_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Minimal spec-shaped PDF fixture writer: one content stream per
    page (FlateDecode by default), Helvetica, each text line shown
    with ``Tj`` after a ``Td`` line advance; literal strings escaped
    per §7.3.4.2. Round-trips through :func:`extract_pdf_text` as
    ``'\\n'.join(pages)`` with blank lines collapsed — the fixture
    contract the oracle legs rely on."""

    def esc(s: str) -> bytes:
        b = s.encode("latin-1")
        return (
            b.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
        )

    objects: list[bytes] = []  # 1-indexed bodies, object i = objects[i-1]
    n_pages = len(pages)
    # object layout: 1 catalog, 2 pages, 3..2+n page objs,
    # 3+n..2+2n content streams, 3+2n font
    font_num = 3 + 2 * n_pages
    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages)
    )
    for i in range(n_pages):
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (font_num, 3 + n_pages + i)
        )
    for text in pages:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for k, line in enumerate(text.split("\n")):
            if k:
                ops.append(b"0 -14 Td")
            ops.append(b"(%s) Tj" % esc(line))
        ops.append(b"ET")
        content = b"\n".join(ops)
        if compress:
            content = zlib.compress(content)
            filt = b"/Filter /FlateDecode "
        else:
            filt = b""
        objects.append(
            b"<< %s/Length %d >>\nstream\n%s\nendstream"
            % (filt, len(content), content)
        )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objects) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(buf)
