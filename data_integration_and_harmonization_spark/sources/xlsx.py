"""Minimal xlsx (SpreadsheetML) reader/writer on the stdlib.

xlsx is a public, documented format (ECMA-376 / ISO 29500): a zip
container of XML parts. The engine's Excel scan (S2, ref:172-173)
normally bridges through driver-side pandas, but ``pd.read_excel``
needs the optional ``openpyxl`` dependency — absent in some
deployments. This module implements the small subset the S2 scan
needs with nothing but ``zipfile`` + ``xml.etree``:

- one worksheet, first row = header;
- cell types: number, inline string, shared string, boolean, blank;
- writer emits inline strings only (no sharedStrings part needed).

Deliberately NOT a general xlsx library: no styles, dates-as-serials,
formulas, merged cells, or multiple sheets — the reference only ever
reads small uploaded workbooks, and anything heavier should go
through pandas/openpyxl or the public ``com.crealytics:spark-excel``
datasource at scale.
"""

from __future__ import annotations

import re
import zipfile
from collections.abc import Sequence
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _col_index(ref: str) -> int:
    """Cell reference like 'BC12' -> 0-based column index."""
    letters = re.match(r"[A-Z]+", ref)
    if not letters:
        raise ValueError(f"bad cell reference: {ref!r}")
    idx = 0
    for ch in letters.group(0):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def write_xlsx(path: str, columns: Sequence[str], rows: Sequence[Sequence]) -> None:
    """Write a single-sheet workbook: header row + data rows.

    Numbers are written as numeric cells, everything else as inline
    strings; None becomes a blank cell.
    """
    body: list[str] = ["<sheetData>"]
    all_rows = [list(columns), *[list(r) for r in rows]]
    for rn, row in enumerate(all_rows, start=1):
        body.append(f'<row r="{rn}">')
        for cn, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
                # xsd:double has no nan/inf spelling Excel accepts;
                # blank cell = missing, the same contract as None
                continue
            ref = f"{_col_letter(cn)}{rn}"
            if rn > 1 and isinstance(v, bool):
                body.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
            elif rn > 1 and isinstance(v, (int, float)):
                body.append(f'<c r="{ref}"><v>{v!r}</v></c>')
            else:
                body.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{escape(str(v))}</t></is></c>"
                )
        body.append("</row>")
    body.append("</sheetData>")
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(body)
        + "</worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        node = c.find(f"{_NS}is")
        if node is None:
            return ""
        # iter(): plain <is><t> AND rich-text runs <is><r><t> — the
        # same flattening the sharedStrings path applies
        return "".join(el.text or "" for el in node.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":  # cached formula result, string-typed
        return v.text
    # numeric: int when exact, else float
    try:
        f = float(v.text)
        return int(f) if f.is_integer() and "." not in v.text and "e" not in v.text.lower() else f
    except ValueError:
        return v.text


def read_xlsx(path: str) -> tuple[list[str], list[list]]:
    """Read the first worksheet: returns (header, data_rows), rows
    padded/aligned to the header width by cell reference."""
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheet_names = sorted(
            n for n in names if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheet_names:
            raise ValueError(f"no worksheet found in {path}")
        root = ET.fromstring(z.read(sheet_names[0]))
    raw: list[dict[int, object]] = []
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for c in row.iter(f"{_NS}c"):
            ref = c.get("r")
            ci = _col_index(ref) if ref else len(cells)
            cells[ci] = _cell_value(c, shared)
        raw.append(cells)
    if not raw:
        return [], []
    width = max(max(r, default=-1) for r in raw) + 1
    grid = [[r.get(i) for i in range(width)] for r in raw]
    header = [str(h) if h is not None else f"col_{i}" for i, h in enumerate(grid[0])]
    return header, grid[1:]


def read_xlsx_header(path: str) -> list[str]:
    """Header row ONLY — stops the sheet parse after the first row
    instead of materializing the whole cell grid (schema probes read
    this; a corpus scan's driver should never decode a full workbook
    just to learn column names). Shared strings are resolved lazily:
    the table is loaded only if a header cell references it."""
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        sheet_names = sorted(
            n for n in names if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheet_names:
            raise ValueError(f"no worksheet found in {path}")
        cells: dict[int, object] = {}
        shared: list[str] | None = None
        with z.open(sheet_names[0]) as fh:
            for _, elem in ET.iterparse(fh):
                if elem.tag == f"{_NS}row":
                    for c in elem.iter(f"{_NS}c"):
                        if shared is None and c.get("t") == "s":
                            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
                            shared = [
                                "".join(t.text or "" for t in si.iter(f"{_NS}t"))
                                for si in root.findall(f"{_NS}si")
                            ]
                        ref = c.get("r")
                        ci = _col_index(ref) if ref else len(cells)
                        cells[ci] = _cell_value(c, shared or [])
                    break  # first row only
    if not cells:
        return []
    width = max(cells) + 1
    return [
        str(cells[i]) if cells.get(i) is not None else f"col_{i}"
        for i in range(width)
    ]
