"""WARC source: read Common-Crawl-style WARC/1.0 files into a
``ray.data.Dataset`` of page rows.

The reference engine reads pre-fetched pond directories; a web-scale
extraction tier starts one step earlier, at the crawler's WARC output.
This reader is a pure-stdlib implementation of the public WARC/1.0
format (ISO 28500): a record is a header block (CRLF-terminated lines,
``WARC/1.0`` first), a blank line, ``Content-Length`` octets of block
content, and a CRLF CRLF separator. ``response`` records carry an HTTP
response message as content; the page body is everything after the
HTTP header block.

Scale shape: one task per WARC file (``ray.data.read_binary_files``
-> ``flat_map`` over records) — exactly how WARC is processed in
practice: files are the parallelism unit, records never need to be
split across tasks. ``.warc.gz`` files are member-concatenated gzip
(one member per record); stdlib ``gzip`` decompresses concatenated
members transparently.

Only public format knowledge is used; no reference code.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

_CRLF = b"\r\n"


def _parse_header_block(blob: bytes) -> dict[str, str]:
    """WARC (or HTTP) header lines -> {lower-case name: value}."""
    headers: dict[str, str] = {}
    for line in blob.split(_CRLF):
        if not line or b":" not in line:
            continue
        name, _, value = line.partition(b":")
        headers[name.strip().lower().decode("latin-1")] = \
            value.strip().decode("latin-1")
    return headers


def iter_warc_records(data: bytes):
    """Yield (warc_headers, content_bytes) per record. Raises
    ValueError on a malformed stream (bad magic, truncated content) —
    the extract stage catches per-file and counts, same contract as
    the HTML/JATS parse failures."""
    if data[:2] == b"\x1f\x8b":  # gzip magic: concatenated members
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"bad WARC record magic at offset {pos}")
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        headers = _parse_header_block(data[pos:head_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record without a valid Content-Length")
        body_start = head_end + 4
        if body_start + length > n:
            raise ValueError("truncated WARC record content")
        yield headers, data[body_start:body_start + length]
        pos = body_start + length


def _dechunk(body: bytes) -> bytes:
    """Transfer-Encoding: chunked -> raw bytes (size line in hex,
    optional extensions after ';', terminated by a 0-size chunk).
    Malformed chunking raises ValueError (caught per file upstream)."""
    out, pos = [], 0
    while True:
        nl = body.find(_CRLF, pos)
        if nl < 0:
            raise ValueError("truncated chunked body")
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError(f"bad chunk size {size_tok!r}")
        pos = nl + 2
        if size == 0:
            break
        if pos + size > len(body):
            raise ValueError("truncated chunk")
        out.append(body[pos:pos + size])
        pos += size + 2  # chunk data + CRLF
    return b"".join(out)


def _http_split(content: bytes) -> tuple[dict[str, str], bytes]:
    """HTTP response message -> (headers, body). A content block
    without an HTTP status line is returned as-is with empty headers
    (some archives store raw payloads). Stored-as-fetched framing is
    undone: chunked transfer-encoding is reassembled and a
    gzip/deflate Content-Encoding is decompressed — both common in
    web archives that save the wire bytes."""
    if not content.startswith(b"HTTP/"):
        return {}, content
    sep = content.find(_CRLF + _CRLF)
    if sep < 0:
        return _parse_header_block(content), b""
    headers = _parse_header_block(content[:sep])
    body = content[sep + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").lower().strip()
    if enc in ("gzip", "x-gzip"):
        body = gzip.GzipFile(fileobj=io.BytesIO(body)).read()
    elif enc == "deflate":
        import zlib

        try:
            body = zlib.decompress(body)
        except zlib.error:  # raw-deflate variant (no zlib wrapper)
            body = zlib.decompress(body, -zlib.MAX_WBITS)
    return headers, body


_CHARSET_HTTP = None  # compiled lazily below
_META_CHARSET = None


def sniff_charset(http_headers: dict[str, str], body: bytes,
                  default: str = "utf-8") -> str:
    """Charset resolution in the order real fetch pipelines use:
    (1) BOM, (2) HTTP Content-Type charset parameter, (3) an HTML
    ``<meta charset>`` / ``http-equiv`` declaration in the first 1024
    bytes (the HTML5 prescan window), (4) ``default``. Unknown
    declared encodings fall through to the next source."""
    import codecs
    import re as _re

    global _CHARSET_HTTP, _META_CHARSET
    if _CHARSET_HTTP is None:
        _CHARSET_HTTP = _re.compile(r"charset\s*=\s*\"?'?([\w.:-]+)")
        _META_CHARSET = _re.compile(
            rb"<meta[^>]+charset\s*=\s*[\"']?([\w.:-]+)", _re.IGNORECASE)

    if body.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if body.startswith(b"\xff\xfe") or body.startswith(b"\xfe\xff"):
        return "utf-16"

    def _valid(name: str | bytes) -> str | None:
        if isinstance(name, bytes):
            name = name.decode("latin-1")
        try:
            codecs.lookup(name)
            return name
        except LookupError:
            return None

    ct = http_headers.get("content-type", "")
    m = _CHARSET_HTTP.search(ct)
    if m and _valid(m.group(1)):
        return m.group(1)
    m = _META_CHARSET.search(body[:1024])
    if m and _valid(m.group(1)):
        return m.group(1).decode("latin-1")
    return default


def warc_date_to_ts(value: str):
    """WARC-Date (ISO-8601 Z) -> naive UTC datetime (the pages
    table's warc_ts convention)."""
    return (datetime.fromisoformat(value.replace("Z", "+00:00"))
            .astimezone(timezone.utc).replace(tzinfo=None))


def parse_warc_bytes(data: bytes, encoding: str | None = "utf-8") -> list[dict]:
    """All ``response`` records of one WARC file as page rows
    (url, warc_ts, html). Non-response records (warcinfo, request,
    metadata) are skipped per the WARC processing convention.
    ``encoding=None`` sniffs per record (BOM -> HTTP Content-Type ->
    HTML meta prescan -> utf-8); a fixed encoding skips the sniff.
    Decode errors never drop a page (``errors='replace'``)."""
    rows = []
    for headers, content in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        http_headers, body = _http_split(content)
        enc = encoding or sniff_charset(http_headers, body)
        rows.append({
            "url": url,
            "warc_ts": warc_date_to_ts(headers.get(
                "warc-date", "1970-01-01T00:00:00Z")),
            "html": body.decode(enc, errors="replace"),
        })
    return rows


def read_warc(paths, encoding: str | None = "utf-8"):
    """WARC file(s) -> Dataset (url, warc_ts, html): one parse task
    per file (``batch_size=1`` over binary file rows) — the file is
    the parallelism unit, so a directory of standard ~1 GB WARC
    segments saturates a cluster without record-level coordination.
    Each task emits ONE Arrow table for its whole file (never
    per-record Python dicts — the map_batches zero-copy path)."""
    import pyarrow as pa
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list = []
        htmls: list[str] = []
        for data in batch["bytes"].to_pylist():
            for r in parse_warc_bytes(data, encoding):
                urls.append(r["url"])
                tss.append(r["warc_ts"])
                htmls.append(r["html"])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.string()),
        })

    return rd.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=1)


def write_warc(rows, path: str, gzip_members: bool = False) -> None:
    """Page rows -> a WARC/1.0 file of ``response`` records (one gzip
    member per record when ``gzip_members``) — the deterministic
    synthesis side used by tests and the round-trip oracle; also a
    correct minimal WARC writer."""
    out = io.BytesIO()
    for r in rows:
        body = r["html"].encode("utf-8")
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + b"Content-Length: " + str(len(body)).encode() + _CRLF
                + _CRLF + body)
        ts = r["warc_ts"]
        date = (ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                if hasattr(ts, "strftime") else str(ts))
        head = (b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                b"WARC-Target-URI: " + r["url"].encode() + _CRLF +
                b"WARC-Date: " + date.encode() + _CRLF +
                b"Content-Type: application/http;msgtype=response\r\n"
                b"Content-Length: " + str(len(http)).encode() + _CRLF +
                _CRLF)
        rec = head + http + _CRLF + _CRLF
        out.write(gzip.compress(rec) if gzip_members else rec)
    with open(path, "wb") as f:
        f.write(out.getvalue())
