"""WARC (Web ARChive, ISO 28500) source and sink.

The reference ingests a folder of documents (document.js:285-328); the
web-scale equivalent input is Common-Crawl-style WARC archives. This
module implements the public WARC/1.0 wire format from scratch:

* ``parse_warc_bytes`` — pure-function record parser (gzip multi-member
  or plain), tolerant of inter-record garbage (emits ``invalid`` records
  rather than dropping bytes silently — the no-silent-caps rule).
* ``read_warc_records`` — Dataset of every WARC record with HTTP
  envelope fields split out (status, content-type, de-chunked body).
* ``read_warc`` — response records as a pages-shaped Dataset
  (PAGES_SCHEMA) that feeds the forge pipeline unchanged.
* ``build_warc_record`` / ``write_warc`` — serializer + Dataset sink
  (one gzip member per record, the Common Crawl layout, so readers can
  seek to records independently).

Scale notes: ``read_binary_files`` makes one block per archive file —
the unit of parallelism is the archive shard, exactly how Common Crawl
distributes (≈1 GB .warc.gz each). Parsing is per-file, driver never
sees payload bytes. Records with chunked transfer-encoding are
de-chunked in the parser (raw HTTP capture keeps the chunk framing).
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pyarrow as pa

import ray.data as rd

from ..schemas import PAGES_SCHEMA

__all__ = [
    "WARC_RECORDS_SCHEMA",
    "parse_warc_bytes",
    "read_warc_records",
    "read_warc",
    "build_warc_record",
    "write_warc",
]

WARC_RECORDS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("warc_type", pa.string()),
        ("record_id", pa.string()),
        ("http_status", pa.int32()),
        ("content_type", pa.string()),
        ("payload", pa.binary()),
    ]
)

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _parse_warc_date(value: str) -> int:
    """``2026-01-02T03:04:05Z`` → microseconds since epoch (0 if bad)."""
    try:
        dt = datetime.strptime(value.strip(), "%Y-%m-%dT%H:%M:%SZ")
        return int((dt.replace(tzinfo=timezone.utc) - _EPOCH).total_seconds()) * 1_000_000
    except ValueError:
        return 0


def _format_warc_date(ts_us: int) -> str:
    dt = datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer-encoding. Raw capture keeps the
    chunk framing, so readers must strip it. Malformed framing returns
    the raw body (better a noisy payload than a dropped record)."""
    out = []
    pos = 0
    try:
        while True:
            eol = body.index(b"\r\n", pos)
            size_token = body[pos:eol].split(b";", 1)[0].strip()
            size = int(size_token, 16)
            if size == 0:
                break
            chunk_start = eol + 2
            out.append(body[chunk_start : chunk_start + size])
            pos = chunk_start + size + 2  # skip chunk + CRLF
    except (ValueError, IndexError):
        return body
    return b"".join(out)


def _split_http_payload(payload: bytes) -> tuple[int, str, bytes]:
    """``application/http`` payload → (status, content_type, body)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return 0, "", payload
    head, body = payload[:sep], payload[sep + 4 :]
    lines = head.split(b"\r\n")
    status = 0
    parts = lines[0].split(b" ")
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype = ""
    chunked = False
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        key = k.strip().lower()
        if key == b"content-type":
            ctype = v.strip().decode("latin-1")
        elif key == b"transfer-encoding" and b"chunked" in v.lower():
            chunked = True
    if chunked:
        body = _dechunk(body)
    return status, ctype, body


def _maybe_gunzip(data: bytes) -> bytes:
    """Decompress ALL gzip members (Common Crawl: one member per record;
    GzipFile loops members, unlike gzip.decompress)."""
    if data[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as f:
            return f.read()
    return data


def parse_warc_bytes(data: bytes) -> list[dict]:
    """WARC/1.0 bytes (plain or gzipped) → list of record dicts keyed by
    WARC_RECORDS_SCHEMA names. Structural garbage between records becomes
    ONE ``warc_type='invalid'`` record per gap (countable downstream,
    never silently skipped); a truncated final record is also ``invalid``.
    """
    data = _maybe_gunzip(data)
    records: list[dict] = []
    pos, n = 0, len(data)

    def invalid(chunk: bytes) -> dict:
        return {
            "url": "",
            "warc_ts": 0,
            "warc_type": "invalid",
            "record_id": "",
            "http_status": 0,
            "content_type": "",
            "payload": chunk,
        }

    while pos < n:
        # Skip record-separator CRLFs; anything else before "WARC/" is a gap.
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            nxt = data.find(b"\r\nWARC/", pos)
            if nxt < 0:
                records.append(invalid(data[pos:]))
                break
            records.append(invalid(data[pos:nxt]))
            pos = nxt + 2
            continue
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            records.append(invalid(data[pos:]))
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            nxt = data.find(b"\r\nWARC/", hdr_end)
            records.append(invalid(data[pos : n if nxt < 0 else nxt]))
            if nxt < 0:
                break
            pos = nxt + 2
            continue
        payload = data[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if len(payload) < clen:
            records.append(invalid(payload))
            break
        wtype = headers.get("warc-type", "")
        status, ctype, body = 0, headers.get("content-type", ""), payload
        if ctype.lower().startswith("application/http"):
            status, ctype, body = _split_http_payload(payload)
        records.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": _parse_warc_date(headers.get("warc-date", "")),
                "warc_type": wtype,
                "record_id": headers.get("warc-record-id", ""),
                "http_status": status,
                "content_type": ctype,
                "payload": body,
            }
        )
    return records


def _records_table(recs: list[dict]) -> pa.Table:
    if not recs:
        return WARC_RECORDS_SCHEMA.empty_table()
    cols = {name: [r[name] for r in recs] for name in WARC_RECORDS_SCHEMA.names}
    return pa.Table.from_arrays(
        [
            pa.array(cols[f.name], type=f.type)
            for f in WARC_RECORDS_SCHEMA
        ],
        schema=WARC_RECORDS_SCHEMA,
    )


def read_warc_records(paths: str | list[str]) -> "rd.Dataset":
    """Archive files → Dataset of all WARC records (WARC_RECORDS_SCHEMA).
    One archive file = one block = one parse task."""
    ds = rd.read_binary_files(
        paths, include_paths=True, file_extensions=["warc", "gz"]
    )

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            _records_table(parse_warc_bytes(blob.as_py()))
            for blob in batch["bytes"]
        ]
        return pa.concat_tables(tables) if tables else WARC_RECORDS_SCHEMA.empty_table()

    return ds.map_batches(parse, batch_format="pyarrow")


def read_warc(paths: str | list[str], ok_only: bool = True) -> "rd.Dataset":
    """Archive files → pages-shaped Dataset (PAGES_SCHEMA) from response
    records, ready for the forge pipeline. ``ok_only`` keeps HTTP 2xx
    only (the Common-Crawl-extract default)."""
    recs = read_warc_records(paths)

    def to_pages(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.equal(batch["warc_type"], "response")
        if ok_only:
            ok = pc.and_(
                pc.greater_equal(batch["http_status"], 200),
                pc.less(batch["http_status"], 300),
            )
            mask = pc.and_(mask, ok)
        kept = batch.filter(mask)
        n = kept.num_rows
        return pa.Table.from_arrays(
            [
                kept["url"],
                kept["warc_ts"],
                kept["payload"].cast(pa.binary()),
                pa.array([""] * n, pa.string()),
                pa.array([""] * n, pa.string()),
            ],
            names=list(PAGES_SCHEMA.names),
        ).cast(PAGES_SCHEMA)

    return recs.map_batches(to_pages, batch_format="pyarrow")


def build_warc_record(
    url: str,
    ts_us: int,
    body: bytes,
    record_id: str = "",
    http_status: int = 200,
    content_type: str = "text/html",
    gzip_member: bool = True,
) -> bytes:
    """Serialize ONE response record (optionally as its own gzip member,
    the Common Crawl layout). Deterministic: gzip mtime pinned to 0."""
    http = (
        f"HTTP/1.1 {http_status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("latin-1") + body
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{record_id or 'rec'}>\r\n"
        f"WARC-Date: {_format_warc_date(ts_us)}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("latin-1")
    raw = head + http + b"\r\n\r\n"
    return gzip.compress(raw, mtime=0) if gzip_member else raw


def write_warc(
    pages_ds: "rd.Dataset", out_dir: str, records_per_file: int = 2000
) -> None:
    """Pages-shaped Dataset → .warc.gz shard files (one gzip member per
    record). Each input block writes its own shard(s) in parallel via
    ``write_parquet``-style task layout (map_batches + per-batch file),
    named by a content-derived key so reruns are idempotent."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        from ..stages.fasthash import md5_hex

        urls = batch["url"].to_pylist()
        if not urls:
            return pa.table({"path": pa.array([], pa.string()), "records": pa.array([], pa.int64())})
        members = []
        ts = batch["warc_ts"].cast(pa.int64()).to_pylist()
        for i, blob in enumerate(batch["html"]):
            members.append(
                build_warc_record(
                    urls[i], ts[i], blob.as_py() or b"", record_id=md5_hex([urls[i]])[0]
                )
            )
        key = md5_hex(["|".join(sorted(urls))])[0][:16]
        path = os.path.join(out_dir, f"part-{key}.warc.gz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(b"".join(members))
        os.replace(tmp, path)
        return pa.table(
            {"path": pa.array([path]), "records": pa.array([len(members)], pa.int64())}
        )

    n = pages_ds.map_batches(
        write_batch, batch_format="pyarrow", batch_size=records_per_file
    ).count()
    assert n >= 0  # consume to drive the writes
