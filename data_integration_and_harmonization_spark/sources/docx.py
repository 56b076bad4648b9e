"""Minimal docx (WordprocessingML) text extractor/writer on the stdlib.

docx is a public, documented format (ECMA-376 / ISO 29500): a zip
container of XML parts, the word-processing sibling of the engine's
SpreadsheetML codec (:mod:`.xlsx`). Corpora are full of ``.docx`` and a
curation front door (reference S5 front-door mandate, ref:165-183)
needs the TEXT, not the typography, so this module reads exactly the
run-level content model:

- ``word/document.xml`` in document order: ``w:p`` paragraphs joined
  with newlines (a table cell's paragraphs ride the same walk —
  ``w:tbl/w:tr/w:tc`` nest ordinary ``w:p`` elements);
- inside a paragraph: ``w:t`` run text concatenated, ``w:tab`` ->
  ``\\t``, ``w:br``/``w:cr`` -> ``\\n`` (ECMA-376 §17.3.3);
- everything else (styles, fields, drawings, section properties) is
  formatting and is skipped.

Deliberately NOT a general docx library: no headers/footers/footnotes
(separate parts), no numbering text, no embedded objects — the
curation contract is "the document's visible body text, one string",
and anything richer belongs to a dedicated document-AI stage.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from collections.abc import Sequence
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
</Relationships>"""


def is_docx(payload: bytes) -> bool:
    """True when the payload is a zip carrying ``word/document.xml``
    (the OPC part every WordprocessingML document must have). Cheap:
    reads the zip central directory only, no part is decompressed."""
    if payload is None or payload[:4] != b"PK\x03\x04":
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            return "word/document.xml" in z.namelist()
    except (zipfile.BadZipFile, OSError, EOFError,
            NotImplementedError, RuntimeError, zlib.error):
        return False


def extract_docx_text(payload: bytes) -> str | None:
    """Visible body text of a docx payload, paragraphs
    newline-joined (see module docstring for the content model).
    None for non-docx payloads AND for documents whose body carries
    no text — the same NULL-quarantine contract as
    ``functions.pdf.extract_pdf_text`` (an ``isNotNull`` curation
    filter must exclude text-free documents). Malformed XML degrades
    to None rather than raising (a 100-TB corpus pass quarantines,
    it doesn't die)."""
    if not is_docx(payload):
        return None
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            root = ET.fromstring(z.read("word/document.xml"))
    except (zipfile.BadZipFile, KeyError, ET.ParseError, OSError,
            EOFError, NotImplementedError, RuntimeError, zlib.error):
        return None
    paras: list[str] = []
    for p in root.iter(f"{_W}p"):
        parts: list[str] = []
        for el in p.iter():
            if el.tag == f"{_W}t":
                parts.append(el.text or "")
            elif el.tag == f"{_W}tab":
                parts.append("\t")
            elif el.tag in (f"{_W}br", f"{_W}cr"):
                parts.append("\n")
        paras.append("".join(parts))
    txt = "\n".join(paras).strip("\n")
    return txt or None


def encode_docx(paragraphs: Sequence[str]) -> bytes:
    """Minimal spec-shaped docx fixture writer: one ``w:p`` per entry,
    with ``\\t`` emitted as ``w:tab`` and ``\\n`` as ``w:br`` so the
    fixture exercises the full run content model. Round-trips through
    :func:`extract_docx_text` as ``'\\n'.join(paragraphs)`` (a ``w:br``
    and a paragraph break both read back as a newline) — the fixture
    contract the oracle legs rely on."""
    body: list[str] = []
    for para in paragraphs:
        runs: list[str] = []
        for i, chunk in enumerate(str(para).split("\t")):
            if i:
                runs.append("<w:r><w:tab/></w:r>")
            for j, line in enumerate(chunk.split("\n")):
                if j:
                    runs.append("<w:r><w:br/></w:r>")
                if line:
                    runs.append(
                        '<w:r><w:t xml:space="preserve">'
                        f"{escape(line)}</w:t></w:r>"
                    )
        body.append(f"<w:p>{''.join(runs)}</w:p>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + "".join(body)
        + "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


# ------------------------------------------------------------- pptx
#
# PresentationML is the third ECMA-376 sibling (xlsx: SpreadsheetML,
# docx: WordprocessingML): slides live at ppt/slides/slideN.xml and
# their visible text is DrawingML ``a:t`` runs inside ``a:p``
# paragraphs (ECMA-376 Part 1 §19/§21). Slide decks are a real
# corpus shape (talks, lectures, reports), and the extraction
# contract matches the other documents: visible text only, one
# string, NULL quarantine.

_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"

_PPTX_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>
{overrides}
</Types>"""

_PPTX_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>
</Relationships>"""


def is_pptx(payload: bytes) -> bool:
    """True when the payload is a zip carrying ``ppt/presentation.xml``
    (the OPC part every PresentationML document must have)."""
    if payload is None or payload[:4] != b"PK\x03\x04":
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            return "ppt/presentation.xml" in z.namelist()
    except (zipfile.BadZipFile, OSError, EOFError,
            NotImplementedError, RuntimeError, zlib.error):
        return False


def extract_pptx_text(payload: bytes) -> str | None:
    """Visible text of a pptx payload: slides in numeric order,
    within a slide each ``a:p`` paragraph's ``a:t`` runs concatenated
    (``a:br`` -> newline), paragraphs newline-joined, slides joined
    with a blank line. None for non-pptx, torn, or text-free
    payloads — the shared document quarantine contract."""
    if not is_pptx(payload):
        return None
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            names = sorted(
                (n for n in z.namelist() if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
                key=lambda n: int(re.search(r"(\d+)", n).group(1)),
            )
            slides: list[str] = []
            for name in names:
                root = ET.fromstring(z.read(name))
                paras: list[str] = []
                for p in root.iter(f"{_A}p"):
                    parts: list[str] = []
                    for el in p.iter():
                        if el.tag == f"{_A}t":
                            parts.append(el.text or "")
                        elif el.tag == f"{_A}br":
                            parts.append("\n")
                    paras.append("".join(parts))
                slides.append("\n".join(paras).strip("\n"))
    except (zipfile.BadZipFile, KeyError, ET.ParseError, OSError,
            EOFError, NotImplementedError, RuntimeError, zlib.error):
        return None
    txt = "\n\n".join(s for s in slides if s).strip("\n")
    return txt or None


def encode_pptx(slides: Sequence[str]) -> bytes:
    """Minimal spec-shaped pptx fixture writer: one slide per entry,
    each ``\\n``-separated line its own ``a:p`` paragraph of one
    ``a:t`` run. Round-trips through :func:`extract_pptx_text` as
    ``'\\n\\n'.join(slides)`` (blank slides dropped) — the fixture
    contract the tests rely on."""
    sld_ids = "".join(
        f'<p:sldId id="{256 + i}" r:id="rId{i + 2}"/>' for i in range(len(slides))
    )
    presentation = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:presentation xmlns:p="http://schemas.openxmlformats.org/'
        'presentationml/2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships">'
        f"<p:sldIdLst>{sld_ids}</p:sldIdLst></p:presentation>"
    )
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 2}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/slide\" "
            f'Target="slides/slide{i + 1}.xml"/>'
            for i in range(len(slides))
        )
        + "</Relationships>"
    )
    overrides = "\n".join(
        f'<Override PartName="/ppt/slides/slide{i + 1}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>'
        for i in range(len(slides))
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml", _PPTX_CONTENT_TYPES.format(overrides=overrides)
        )
        z.writestr("_rels/.rels", _PPTX_ROOT_RELS)
        z.writestr("ppt/presentation.xml", presentation)
        z.writestr("ppt/_rels/presentation.xml.rels", pres_rels)
        for i, slide in enumerate(slides):
            paras = "".join(
                "<a:p>"
                + (
                    f'<a:r><a:t xml:space="preserve">{escape(line)}</a:t></a:r>'
                    if line
                    else ""
                )
                + "</a:p>"
                for line in str(slide).split("\n")
            )
            sld = (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<p:sld xmlns:p="http://schemas.openxmlformats.org/'
                'presentationml/2006/main" xmlns:a="http://schemas.'
                'openxmlformats.org/drawingml/2006/main">'
                "<p:cSld><p:spTree><p:sp><p:txBody>"
                f"{paras}"
                "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
            )
            z.writestr(f"ppt/slides/slide{i + 1}.xml", sld)
    return buf.getvalue()
