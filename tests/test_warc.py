"""WARC source (sources/warc.py): pure-stdlib WARC/1.0 parser +
writer round-trip, malformed-stream contracts, Dataset reader."""

import gzip
from datetime import datetime

import pandas as pd
import pytest

from neurostore_text_extraction_ray.sources.warc import (
    iter_warc_records, parse_warc_bytes, read_warc, warc_date_to_ts,
    write_warc)

ROWS = [
    {"url": "https://a.example/1", "warc_ts": datetime(2020, 1, 1, 0, 0, 7),
     "html": "<html><body>hello</body></html>"},
    {"url": "https://b.example/2", "warc_ts": datetime(2021, 6, 2, 3, 4, 5),
     "html": "<html><body>wörld — utf8</body></html>"},
]


def test_write_read_roundtrip(tmp_path):
    for gz in (False, True):
        p = str(tmp_path / ("x.warc.gz" if gz else "x.warc"))
        write_warc(ROWS, p, gzip_members=gz)
        got = parse_warc_bytes(open(p, "rb").read())
        assert [r["url"] for r in got] == [r["url"] for r in ROWS]
        assert [r["html"] for r in got] == [r["html"] for r in ROWS]
        assert [r["warc_ts"] for r in got] == [r["warc_ts"] for r in ROWS]


def test_gzip_members_are_concatenated(tmp_path):
    """One gzip member per record (the CommonCrawl layout) reads back
    as a whole: stdlib gzip handles concatenated members."""
    p = str(tmp_path / "m.warc.gz")
    write_warc(ROWS, p, gzip_members=True)
    raw = open(p, "rb").read()
    # two independent members, not one stream
    assert raw.count(b"\x1f\x8b\x08") >= 2
    assert len(parse_warc_bytes(raw)) == 2


def test_non_response_records_skipped():
    rec = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
           b"\r\ninfo\r\n\r\n")
    assert parse_warc_bytes(rec) == []
    # iter still yields it (reader-level filtering, not parser-level)
    assert len(list(iter_warc_records(rec))) == 1


def test_malformed_streams_raise():
    with pytest.raises(ValueError, match="magic"):
        list(iter_warc_records(b"NOTWARC/1.0\r\n\r\n"))
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_records(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"))
    with pytest.raises(ValueError, match="truncated WARC record content"):
        list(iter_warc_records(
            b"WARC/1.0\r\nContent-Length: 999\r\n\r\nshort"))


def test_http_headerless_payload_and_dates():
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://c.example/3\r\n"
           b"WARC-Date: 2022-02-02T02:02:02Z\r\n"
           b"Content-Length: 3\r\n\r\nraw\r\n\r\n")
    got = parse_warc_bytes(rec)
    assert got[0]["html"] == "raw"  # no HTTP head: payload as-is
    assert got[0]["warc_ts"] == datetime(2022, 2, 2, 2, 2, 2)
    assert warc_date_to_ts("2020-01-01T00:00:07Z") == \
        datetime(2020, 1, 1, 0, 0, 7)


def test_read_warc_dataset(ray_session, tmp_path):
    write_warc(ROWS, str(tmp_path / "a.warc"), gzip_members=False)
    write_warc([{"url": "https://d.example/4",
                 "warc_ts": datetime(2023, 1, 1),
                 "html": "<p>x</p>"}],
               str(tmp_path / "b.warc.gz"), gzip_members=True)
    df = read_warc(str(tmp_path)).to_pandas()
    assert sorted(df["url"]) == [
        "https://a.example/1", "https://b.example/2", "https://d.example/4"]
    assert set(df.columns) == {"url", "warc_ts", "html"}


def test_charset_sniffing():
    from neurostore_text_extraction_ray.sources.warc import sniff_charset

    # BOM wins over everything
    assert sniff_charset({"content-type": "text/html; charset=latin-1"},
                         b"\xef\xbb\xbfabc") == "utf-8-sig"
    # HTTP Content-Type charset parameter
    assert sniff_charset({"content-type": 'text/html; charset="ISO-8859-1"'},
                         b"<html>") == "ISO-8859-1"
    # meta prescan (first 1024 bytes), http-equiv style
    body = (b'<html><head><meta http-equiv="Content-Type" '
            b'content="text/html; charset=windows-1252"></head>')
    assert sniff_charset({}, body) == "windows-1252"
    # html5 style
    assert sniff_charset({}, b"<meta charset='koi8-r'>") == "koi8-r"
    # unknown declared charset falls through to the default
    assert sniff_charset({"content-type": "text/html; charset=bogus-enc"},
                         b"<html>") == "utf-8"
    # meta past the 1024-byte prescan window is ignored
    assert sniff_charset({}, b" " * 1100 + b"<meta charset='koi8-r'>") == \
        "utf-8"


def test_parse_with_sniffed_encoding():
    from neurostore_text_extraction_ray.sources.warc import parse_warc_bytes

    text = "café"  # latin-1 encodable, invalid utf-8 bytes
    body = text.encode("latin-1")
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=latin-1\r\n\r\n" + body)
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://e.example/5\r\n"
           b"WARC-Date: 2020-01-01T00:00:00Z\r\n"
           b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
           + http + b"\r\n\r\n")
    # sniffed: exact text back
    assert parse_warc_bytes(rec, encoding=None)[0]["html"] == text
    # forced utf-8: replacement char, page not dropped
    assert "�" in parse_warc_bytes(rec, encoding="utf-8")[0]["html"]


def _wrap_record(http: bytes) -> bytes:
    return (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://f.example/6\r\n"
            b"WARC-Date: 2020-01-01T00:00:00Z\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
            + http + b"\r\n\r\n")


def test_chunked_and_content_encoded_payloads():
    import gzip as _gzip
    import zlib

    from neurostore_text_extraction_ray.sources.warc import (
        parse_warc_bytes)

    # chunked transfer-encoding (with a chunk extension)
    body = b"4;ext=1\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n"
    http = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + body)
    assert parse_warc_bytes(_wrap_record(http))[0]["html"] == "Wikipedia"
    # gzip content-encoding
    http = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
            + _gzip.compress(b"<p>zipped</p>"))
    assert parse_warc_bytes(_wrap_record(http))[0]["html"] == "<p>zipped</p>"
    # raw-deflate content-encoding (no zlib wrapper)
    raw = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    payload = raw.compress(b"deflated") + raw.flush()
    http = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + payload)
    assert parse_warc_bytes(_wrap_record(http))[0]["html"] == "deflated"
    # chunked THEN gzip (encodings compose in wire order)
    gz = _gzip.compress(b"both")
    chunk = (hex(len(gz))[2:].encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n")
    http = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
            b"Content-Encoding: gzip\r\n\r\n" + chunk)
    assert parse_warc_bytes(_wrap_record(http))[0]["html"] == "both"
    # malformed chunking raises (caught per file by the extract stage)
    http = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZ\r\nx"
    with pytest.raises(ValueError):
        parse_warc_bytes(_wrap_record(http))


def test_corrupt_gzip_raises_valueerror():
    """Every corruption mode surfaces as the ONE documented exception
    type, so per-file catching is possible (r5 review finding)."""
    import gzip as _gz

    import pytest

    from neurostore_text_extraction_ray.sources.warc import (
        _http_split, parse_warc_bytes)

    # truncated gzip member (EOFError internally)
    good = _gz.compress(b"WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError):
        parse_warc_bytes(good[:10])
    # garbage after the gzip magic
    with pytest.raises(ValueError):
        parse_warc_bytes(b"\x1f\x8bGARBAGE-NOT-GZIP")
    # corrupt gzip Content-Encoding body
    http = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
            b"\x1f\x8bNOT-REALLY-GZIP")
    with pytest.raises(ValueError):
        _http_split(http)
    # corrupt deflate body (neither zlib-wrapped nor raw deflate)
    http2 = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
             b"\x00\x01\x02NOT-DEFLATE-EITHER")
    with pytest.raises(ValueError):
        _http_split(http2)


def test_read_warc_skip_malformed(ray_session, tmp_path):
    """One corrupt segment must not abort the directory read when
    skip_malformed=True; the default still raises."""
    import datetime

    import pytest

    from neurostore_text_extraction_ray.sources.warc import (
        read_warc, write_warc)

    ts = datetime.datetime(2024, 1, 1)
    write_warc([{"url": "https://a.example/1", "warc_ts": ts,
                 "html": "<html>ok</html>"}],
               str(tmp_path / "good.warc.gz"), gzip_members=True)
    (tmp_path / "bad.warc.gz").write_bytes(b"\x1f\x8bTRUNCATED")

    out = read_warc(str(tmp_path), skip_malformed=True).to_pandas()
    assert list(out["url"]) == ["https://a.example/1"]

    with pytest.raises(Exception):  # ray wraps the ValueError
        read_warc(str(tmp_path)).to_pandas()


def test_extract_one_str_payload_normalized():
    """Sources that decode early (read_warc) hand str payloads; the
    extract stage must treat them exactly like utf-8 bytes."""
    from neurostore_text_extraction_ray.stages.extract import extract_one

    html = "<html><body>Hello world.</body></html>"
    a = extract_one(html)
    b = extract_one(html.encode("utf-8"))
    assert not a["parse_failed"] and not b["parse_failed"]
    assert a["extracted_text"] == b["extracted_text"] == "Hello world."


def test_warc_extract_text_byte_identity(ray_session):
    """Crawl tier end to end: WARC segments -> read_warc -> frozen
    html kernel actor pool; extracted text byte-identical to the
    documents table's text column per planted url."""
    import pandas as pd

    from neurostore_text_extraction_ray.pipelines.extras import (
        _warc_extract_text)

    sf = "/root/testdata/sf0.001"
    out = _warc_extract_text(sf).to_pandas()
    docs = pd.read_parquet(sf + "/documents.parquet",
                           columns=["doc_id", "text"])
    docs["url"] = ("https://site" + (docs["doc_id"] % 7).astype(str)
                   + ".example/d/" + docs["doc_id"].astype(str))
    m = out.merge(docs, on="url", validate="one_to_one")
    assert len(m) == len(docs) == len(out)
    assert (m["extracted_text"] == m["text"].fillna("")).all()
