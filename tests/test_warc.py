"""WARC source/sink: hand-crafted wire-format bytes (parser has no help
from our own serializer), gzip multi-member handling, chunked bodies,
garbage tolerance, and a pages→warc→pages roundtrip through Ray."""

import gzip

import pyarrow as pa
import pytest

import ray.data as rd

from graphforge_ray.fixtures import gen_pages_table
from graphforge_ray.sources.warc import (
    build_warc_record,
    parse_warc_bytes,
    read_warc,
    read_warc_records,
    write_warc,
)


def _raw_record(
    wtype=b"response",
    url=b"http://x.test/a",
    payload=b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>hi</p>",
    ctype=b"application/http; msgtype=response",
    extra=b"",
):
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + wtype + b"\r\n"
        b"WARC-Record-ID: <urn:uuid:abc>\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        b"WARC-Target-URI: " + url + b"\r\n"
        b"Content-Type: " + ctype + b"\r\n"
        + extra
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return head + payload + b"\r\n\r\n"


def test_parse_response_record_fields():
    recs = parse_warc_bytes(_raw_record())
    assert len(recs) == 1
    r = recs[0]
    assert r["warc_type"] == "response"
    assert r["url"] == "http://x.test/a"
    assert r["http_status"] == 200
    assert r["content_type"] == "text/html"
    assert r["payload"] == b"<p>hi</p>"
    # 2026-01-02T03:04:05Z
    assert r["warc_ts"] == 1767323045 * 1_000_000


def test_parse_mixed_types_and_garbage_gap():
    data = (
        _raw_record(wtype=b"warcinfo", ctype=b"application/warc-fields",
                    payload=b"software: test\r\n")
        + b"NOT A RECORD AT ALL"
        + b"\r\n"
        + _raw_record(wtype=b"request",
                      payload=b"GET /a HTTP/1.1\r\nHost: x\r\n\r\n",
                      ctype=b"application/http; msgtype=request")
        + _raw_record()
    )
    recs = parse_warc_bytes(data)
    types = [r["warc_type"] for r in recs]
    assert types == ["warcinfo", "invalid", "request", "response"]
    assert recs[1]["payload"].startswith(b"NOT A RECORD")


def test_parse_truncated_tail_is_invalid_not_crash():
    good = _raw_record()
    bad = _raw_record(payload=b"HTTP/1.1 200 OK\r\n\r\nfull-body")[:-20]
    recs = parse_warc_bytes(good + bad)
    assert [r["warc_type"] for r in recs] == ["response", "invalid"]


def test_chunked_transfer_encoding_dechunked():
    body = b"4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n"
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + body
    )
    recs = parse_warc_bytes(_raw_record(payload=payload))
    assert recs[0]["payload"] == b"Wikipedia"


def test_gzip_multi_member():
    raw1, raw2 = _raw_record(url=b"http://x.test/1"), _raw_record(url=b"http://x.test/2")
    data = gzip.compress(raw1, mtime=0) + gzip.compress(raw2, mtime=0)
    recs = parse_warc_bytes(data)
    assert [r["url"] for r in recs] == ["http://x.test/1", "http://x.test/2"]


def test_build_then_parse_roundtrip_single():
    blob = build_warc_record("http://x.test/r", 1_700_000_000 * 1_000_000,
                             b"<html>ok</html>")
    recs = parse_warc_bytes(blob)
    assert recs[0]["url"] == "http://x.test/r"
    assert recs[0]["payload"] == b"<html>ok</html>"
    assert recs[0]["warc_ts"] == 1_700_000_000 * 1_000_000
    # determinism: same inputs → same bytes (gzip mtime pinned)
    assert blob == build_warc_record("http://x.test/r", 1_700_000_000 * 1_000_000,
                                     b"<html>ok</html>")


@pytest.mark.usefixtures("ray_session")
def test_pages_warc_pages_roundtrip(tmp_path):
    pages = gen_pages_table(60)
    write_warc(rd.from_arrow(pages), str(tmp_path / "arc"), records_per_file=25)
    back = read_warc(str(tmp_path / "arc")).to_pandas()
    orig = pages.to_pandas()
    want = set(zip(orig["url"], [bytes(b) for b in orig["html"]]))
    got = set(zip(back["url"], [bytes(b) for b in back["html"]]))
    assert got == want
    # timestamps survive at second precision (WARC-Date granularity)
    ts = dict(zip(orig["url"], orig["warc_ts"]))
    for u, t in zip(back["url"], back["warc_ts"]):
        assert t == ts[u].floor("s")


@pytest.mark.usefixtures("ray_session")
def test_read_warc_ok_only_filters_non_2xx(tmp_path):
    blob = build_warc_record("http://x.test/ok", 0, b"fine") + build_warc_record(
        "http://x.test/gone", 0, b"nope", http_status=404
    )
    p = tmp_path / "arc" / "one.warc.gz"
    p.parent.mkdir()
    p.write_bytes(blob)
    urls = read_warc(str(p.parent)).to_pandas()["url"].tolist()
    assert urls == ["http://x.test/ok"]
    both = read_warc(str(p.parent), ok_only=False).to_pandas()["url"].tolist()
    assert sorted(both) == ["http://x.test/gone", "http://x.test/ok"]
    # records view still exposes everything incl. statuses
    recs = read_warc_records(str(p.parent)).to_pandas()
    assert sorted(recs["http_status"]) == [200, 404]
