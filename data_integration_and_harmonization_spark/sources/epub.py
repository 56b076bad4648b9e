"""Minimal EPUB text extractor/writer on the stdlib.

EPUB is a public, documented format (the IDPF/W3C EPUB OCF + package
specs): a zip container whose ``mimetype`` member declares
``application/epub+zip``, with ``META-INF/container.xml`` pointing at
an OPF package document whose ``<spine>`` lists the reading-order
content documents (XHTML). Books corpora ship as EPUB, and a curation
front door wants the TEXT in spine order, so this module reads
exactly that chain:

- ``META-INF/container.xml`` -> the first ``rootfile``'s
  ``full-path`` (the OPF);
- OPF ``<manifest>`` id->href (resolved relative to the OPF's
  directory) + ``<spine>`` itemref order;
- each content document parses as XML (XHTML is XML); paragraphs are
  the ``p``/``h1``-``h6``/``li`` elements' text (namespace-agnostic
  local-name match, ``itertext`` so nested spans flatten), joined
  with newlines; a document with none of those blocks degrades to
  its whole-body text. Chapters join with newlines.

Deliberately NOT a general EPUB library: no CSS, no images, no
navigation document, no fixed layout — the curation contract is "the
book's visible text, one string, reading order".
"""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
import zlib
from collections.abc import Sequence
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_BLOCK_TAGS = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li"}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def is_epub(payload: bytes) -> bool:
    """True when the payload is a zip carrying the EPUB ``mimetype``
    declaration or an OCF ``META-INF/container.xml``. Cheap: central
    directory plus at most the (stored) mimetype member."""
    if payload is None or payload[:4] != b"PK\x03\x04":
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            names = set(z.namelist())
            if "mimetype" in names:
                try:
                    return z.read("mimetype").strip() == b"application/epub+zip"
                except (zipfile.BadZipFile, OSError, EOFError,
                    NotImplementedError, RuntimeError, zlib.error):
                    return False
            return "META-INF/container.xml" in names
    except (zipfile.BadZipFile, OSError, EOFError,
                    NotImplementedError, RuntimeError, zlib.error):
        return False


def extract_epub_text(payload: bytes) -> str | None:
    """Visible text of an EPUB payload in spine order (see module
    docstring for the content model). None for non-EPUB payloads and
    text-free books — the same NULL-quarantine contract as the
    pdf/docx extractors; malformed internals degrade to the chapters
    that did parse."""
    if not is_epub(payload):
        return None
    chapters: list[str] = []
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            names = set(z.namelist())
            root = ET.fromstring(z.read("META-INF/container.xml"))
            opf_path = None
            for el in root.iter():
                if _local(el.tag) == "rootfile":
                    opf_path = el.get("full-path")
                    break
            if not opf_path or opf_path not in names:
                return None
            opf_dir = posixpath.dirname(opf_path)
            opf = ET.fromstring(z.read(opf_path))
            hrefs: dict[str, str] = {}
            order: list[str] = []
            for el in opf.iter():
                tag = _local(el.tag)
                if tag == "item" and el.get("id") and el.get("href"):
                    hrefs[el.get("id")] = el.get("href")
                elif tag == "itemref" and el.get("idref"):
                    order.append(el.get("idref"))
            for idref in order:
                href = hrefs.get(idref)
                if not href:
                    continue
                path = posixpath.normpath(posixpath.join(opf_dir, href))
                if path not in names:
                    continue
                try:
                    doc = ET.fromstring(z.read(path))
                except (ET.ParseError, zipfile.BadZipFile, OSError,
                        EOFError, NotImplementedError, RuntimeError,
                        zlib.error):
                    continue  # torn chapter: keep the others
                paras = [
                    "".join(el.itertext())
                    for el in doc.iter()
                    if _local(el.tag) in _BLOCK_TAGS
                ]
                if not paras:
                    body = next(
                        (e for e in doc.iter() if _local(e.tag) == "body"),
                        None,
                    )
                    if body is not None:
                        whole = re.sub(
                            r"\s+", " ", "".join(body.itertext())
                        ).strip()
                        paras = [whole] if whole else []
                txt = "\n".join(p for p in paras if p)
                if txt:
                    chapters.append(txt)
    except (zipfile.BadZipFile, ET.ParseError, KeyError, OSError,
            EOFError, NotImplementedError, RuntimeError, zlib.error):
        return None
    out = "\n".join(chapters).strip("\n")
    return out or None


def encode_epub(chapters: Sequence[str]) -> bytes:
    """Minimal spec-shaped EPUB fixture writer: OCF mimetype (stored
    first, per spec), container.xml, an OPF with one spine item per
    chapter, and XHTML content documents whose paragraphs are the
    ``\\n``-split lines of each entry. Round-trips through
    :func:`extract_epub_text` as ``'\\n'.join(chapters)`` (blank
    lines collapsed) — the fixture contract the oracle legs rely on."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            zipfile.ZipInfo("mimetype"),
            b"application/epub+zip",
            compress_type=zipfile.ZIP_STORED,
        )
        z.writestr(
            "META-INF/container.xml",
            '<?xml version="1.0"?>\n'
            '<container version="1.0" '
            'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
            '<rootfiles><rootfile full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/></rootfiles>'
            "</container>",
        )
        items = "".join(
            f'<item id="ch{i}" href="ch{i}.xhtml" '
            'media-type="application/xhtml+xml"/>'
            for i in range(len(chapters))
        )
        refs = "".join(
            f'<itemref idref="ch{i}"/>' for i in range(len(chapters))
        )
        z.writestr(
            "OEBPS/content.opf",
            '<?xml version="1.0"?>\n'
            '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
            'unique-identifier="uid">'
            '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
            '<dc:identifier id="uid">engine-fixture</dc:identifier>'
            "</metadata>"
            f"<manifest>{items}</manifest><spine>{refs}</spine></package>",
        )
        for i, chap in enumerate(chapters):
            paras = "".join(
                f"<p>{escape(line)}</p>" for line in chap.split("\n")
            )
            z.writestr(
                f"OEBPS/ch{i}.xhtml",
                '<?xml version="1.0" encoding="utf-8"?>\n'
                '<html xmlns="http://www.w3.org/1999/xhtml">'
                f"<head><title>ch{i}</title></head>"
                f"<body>{paras}</body></html>",
            )
    return buf.getvalue()
