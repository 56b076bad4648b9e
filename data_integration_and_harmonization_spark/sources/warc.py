"""WARC (Web ARChive) ingestion — the format web crawls actually ship
in (ISO 28500; Common Crawl's container). A WARC file is a
concatenation of records: a ``WARC/1.x`` version line, header lines,
a blank line, then ``Content-Length`` bytes of block, then a blank
separator. Response records wrap a full HTTP response (status line +
headers + body); the curation pipeline wants the body (usually HTML —
feed it to ``operators.text.html_to_text``) plus provenance
(target URI, capture date, content type).

Scale shape: ``read_warc`` is a distributed ``binaryFile`` scan (one
executor task per archive — plain WARC is not block-splittable, and
the standard crawl layout is many ~1 GB files, which IS the partition
grain) with ONE Arrow stage parsing records; only the requested
fields and payloads cross back. ``.warc.gz`` decompresses per the
crawl convention of one gzip MEMBER per record (a multi-member stream
— ``zlib`` is looped over ``unused_data``), which also makes
record-level random access possible for index-driven readers.
"""

from __future__ import annotations

import io
import zlib
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; non-gzip
    payloads pass through unchanged."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = bytearray()
    rest = bytes(data)
    while rest[:2] == b"\x1f\x8b":
        o = zlib.decompressobj(47)  # gzip wrapper
        out += o.decompress(rest)
        out += o.flush()
        rest = o.unused_data
    return bytes(out)


def parse_warc_records(payload: bytes) -> list[dict]:
    """Records of one WARC payload (gzip handled):
    ``{'warc_type', 'url', 'date', 'http_content_type', 'body'}`` —
    for response records carrying ``application/http`` the HTTP
    envelope is stripped (status line + headers) and ``body`` is the
    entity bytes with the declared Content-Type; other record types
    (warcinfo, request, metadata, resource) surface their raw block
    as ``body`` with ``http_content_type`` None. Torn trailing
    records degrade to the records already parsed."""
    data = _gunzip_members(bytes(payload))
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos : pos + 2] in (b"\r\n", b"\n\r"):
            pos += 2
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if data[pos : pos + 5] != b"WARC/":
            break  # not a record boundary: stop rather than guess
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.decode("latin-1").strip().lower()] = (
                    v.decode("latin-1").strip()
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        block_start = hdr_end + 4
        block = data[block_start : block_start + clen]
        if len(block) < clen:
            break  # torn final record
        rec = {
            "warc_type": headers.get("warc-type"),
            "url": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
            "http_content_type": None,
            "body": block,
        }
        if rec["warc_type"] == "response" and headers.get(
            "content-type", ""
        ).startswith("application/http"):
            split = block.find(_CRLF2)
            if split >= 0:
                for line in block[:split].split(b"\r\n")[1:]:
                    k, _, v = line.partition(b":")
                    if _ and k.decode("latin-1").strip().lower() == "content-type":
                        rec["http_content_type"] = v.decode("latin-1").strip()
                rec["body"] = block[split + 4 :]
        out.append(rec)
        pos = block_start + clen
    return out


def encode_warc(
    pages: Sequence[tuple[str, str, str]], gzip_members: bool = False
) -> bytes:
    """Spec-shaped WARC fixture writer: a leading warcinfo record,
    then one HTTP-response record per ``(url, date, html)`` entry.
    ``gzip_members=True`` wraps EACH record in its own gzip member —
    the Common Crawl layout. Round-trips through
    :func:`parse_warc_records`."""

    def record(headers: list[tuple[str, str]], block: bytes) -> bytes:
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode("latin-1") for k, v in headers
        )
        return (
            head
            + f"Content-Length: {len(block)}\r\n".encode()
            + b"\r\n"
            + block
            + _CRLF2
        )

    info_block = b"software: data_integration_and_harmonization_spark\r\n"
    recs = [
        record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Date", "2026-01-01T00:00:00Z"),
                ("Content-Type", "application/warc-fields"),
            ],
            info_block,
        )
    ]
    for url, date, html in pages:
        body = html.encode("utf-8")
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(body)}\r\n".encode()
            + b"\r\n"
            + body
        )
        recs.append(
            record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Target-URI", url),
                    ("WARC-Date", date),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                http,
            )
        )
    if not gzip_members:
        return b"".join(recs)
    out = io.BytesIO()
    for r in recs:
        buf = io.BytesIO()
        import gzip as _gzip

        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
            g.write(r)
        out.write(buf.getvalue())
    return out.getvalue()


def read_tar_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Distributed TAR-archive corpus scan — document dumps commonly
    ship as (optionally gzipped) tarballs of per-document files: one
    ``binaryFile`` task per archive, one Arrow stage walking members
    with the stdlib ``tarfile`` (ustar/pax/gnu formats all handled).
    One row per regular-file member: ``(member, payload, _src_file)``
    — feed payloads to ``operators.text.document_text_table`` (pdf/
    docx/pptx dispatch) or the media codecs. Directories, links and
    torn archives degrade to the members that did read."""
    import os

    pattern = os.path.join(path, "*.tar*") if os.path.isdir(path) else path
    bins = (
        spark.read.format("binaryFile").load(pattern).select("content", "path")
    )

    def batches(it):
        import io as _io
        import tarfile

        import pandas as pd

        for pdf in it:
            members, payloads, srcs = [], [], []
            for payload, p in zip(pdf["content"], pdf["path"]):
                src = p.rsplit("/", 1)[-1]
                try:
                    with tarfile.open(fileobj=_io.BytesIO(payload), mode="r:*") as tf:
                        for m in tf:
                            if not m.isfile():
                                continue
                            fh = tf.extractfile(m)
                            if fh is None:
                                continue
                            members.append(m.name)
                            payloads.append(fh.read())
                            srcs.append(src)
                except (tarfile.TarError, OSError, EOFError):
                    continue  # alien or torn archive
            yield pd.DataFrame(
                {"member": members, "payload": payloads, "_src_file": srcs}
            )

    return bins.mapInPandas(
        batches, "member string, payload binary, _src_file string"
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC corpus scan: ``binaryFile`` over
    ``*.warc``/``*.warc.gz`` (one task per archive — the crawl's file
    grain), ONE Arrow stage parsing records. Output one row per
    record: ``(warc_type, url, date, http_content_type, body,
    _src_file)`` with ``body`` binary (decode + ``html_to_text``
    downstream for the text pipeline). Unparseable archives yield the
    records that did parse; a wholly-alien file yields none."""
    import os

    pattern = (
        os.path.join(path, "*.warc*") if os.path.isdir(path) else path
    )
    bins = (
        spark.read.format("binaryFile").load(pattern).select("content", "path")
    )

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = {
                "warc_type": [],
                "url": [],
                "date": [],
                "http_content_type": [],
                "body": [],
                "_src_file": [],
            }
            for payload, p in zip(pdf["content"], pdf["path"]):
                src = p.rsplit("/", 1)[-1]
                try:
                    recs = parse_warc_records(payload)
                except Exception:  # noqa: BLE001 — alien archive
                    recs = []
                for r in recs:
                    rows["warc_type"].append(r["warc_type"])
                    rows["url"].append(r["url"])
                    rows["date"].append(r["date"])
                    rows["http_content_type"].append(r["http_content_type"])
                    rows["body"].append(r["body"])
                    rows["_src_file"].append(src)
            yield pd.DataFrame(rows)

    return bins.mapInPandas(
        batches,
        "warc_type string, url string, date string, "
        "http_content_type string, body binary, _src_file string",
    )
