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
import zlib
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
    """Yield (warc_headers, content_bytes) per record, STREAMING: a
    ``.warc.gz`` file decompresses member-by-member through
    ``gzip.GzipFile`` as records are consumed, so peak memory is the
    compressed bytes plus ONE record — never the full uncompressed
    segment (a standard ~1 GB gz segment expands 4-5x). Every
    malformed-input mode (bad magic, truncated header/content, gzip /
    zlib stream corruption) raises ValueError — one normalized
    exception type so ``read_warc(skip_malformed=True)`` can catch
    per file, same contract as the HTML/JATS parse failures."""
    stream: io.BufferedIOBase
    if data[:2] == b"\x1f\x8b":  # gzip magic: concatenated members
        stream = gzip.GzipFile(fileobj=io.BytesIO(data))
    else:
        stream = io.BytesIO(data)
    try:
        while True:
            line = stream.readline()
            while line in (b"\r\n", b"\n"):  # inter-record blank lines
                line = stream.readline()
            if not line:
                return
            if not line.startswith(b"WARC/"):
                raise ValueError(
                    f"bad WARC record magic {line[:20]!r}")
            head = [line]
            while True:
                line = stream.readline()
                if not line:
                    raise ValueError("truncated WARC header block")
                if line in (b"\r\n", b"\n"):
                    break
                head.append(line)
            headers = _parse_header_block(b"".join(head))
            try:
                length = int(headers["content-length"])
            except (KeyError, ValueError):
                raise ValueError(
                    "WARC record without a valid Content-Length")
            body = stream.read(length)
            if len(body) != length:
                raise ValueError("truncated WARC record content")
            yield headers, body
    except (EOFError, zlib.error, gzip.BadGzipFile, OSError) as e:
        # gzip member / zlib stream corruption surfaces as these from
        # inside readline()/read(); normalize to the documented
        # malformed-input ValueError
        raise ValueError(f"corrupt WARC gzip stream: {e}") from e


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
        try:
            body = gzip.GzipFile(fileobj=io.BytesIO(body)).read()
        except (EOFError, zlib.error, gzip.BadGzipFile, OSError) as e:
            raise ValueError(
                f"corrupt gzip Content-Encoding body: {e}") from e
    elif enc == "deflate":
        try:
            body = zlib.decompress(body)
        except zlib.error:  # raw-deflate variant (no zlib wrapper)
            try:
                body = zlib.decompress(body, -zlib.MAX_WBITS)
            except zlib.error as e:
                raise ValueError(
                    f"corrupt deflate Content-Encoding body: {e}") from e
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


def read_warc(paths, encoding: str | None = "utf-8",
              skip_malformed: bool = False):
    """WARC file(s) -> Dataset (url, warc_ts, html): one parse task
    per file (``batch_size=1`` over binary file rows) — the file is
    the parallelism unit, so a directory of standard ~1 GB WARC
    segments saturates a cluster without record-level coordination.
    Each task emits ONE Arrow table for its whole file (never
    per-record Python dicts — the map_batches zero-copy path).

    ``skip_malformed=True`` catches the normalized ValueError a
    corrupt file raises (bad framing, truncated record, gzip/zlib
    corruption) and drops THAT FILE, logging its path — one bad
    segment in a 100 TB crawl must not abort the read. The default
    raises (fail-loud for curated inputs)."""
    import pyarrow as pa
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list = []
        htmls: list[str] = []
        paths_col = batch["path"].to_pylist()
        for path, data in zip(paths_col, batch["bytes"].to_pylist()):
            try:
                recs = parse_warc_bytes(data, encoding)
            except ValueError:
                if not skip_malformed:
                    raise
                import logging

                logging.getLogger(__name__).warning(
                    "skipping malformed WARC file %s", path)
                continue
            for r in recs:
                urls.append(r["url"])
                tss.append(r["warc_ts"])
                htmls.append(r["html"])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.string()),
        })

    # The reader must hand over RAW bytes: Ray/pyarrow otherwise
    # auto-gunzip on the .gz extension inside the read task, where a
    # corrupt member aborts the read BEFORE our per-file ValueError
    # contract can catch it (and buffers the whole expansion). The
    # detection re-triggers whenever compression is None, so a
    # datasource subclass opens the stream with decompression
    # explicitly off; our streaming gzip path owns decompression.
    try:
        from ray.data._internal.datasource.binary_datasource import (
            BinaryDatasource)

        class _RawBinaryDatasource(BinaryDatasource):
            def _open_input_source(self, filesystem, path, **open_args):
                return filesystem.open_input_stream(path, compression=None)

        ds = rd.read_datasource(
            _RawBinaryDatasource(paths, include_paths=True))
    except ImportError:  # private module moved: fall back (no skip
        ds = rd.read_binary_files(paths, include_paths=True)  # contract)
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)


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
