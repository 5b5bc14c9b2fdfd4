"""Pure-stdlib WARC (ISO 28500) record reader — the Common Crawl ingest path.

A 100 TB web corpus arrives as WARC: CRLF header blocks +
Content-Length-delimited payloads, usually with the per-record-gzip
convention (one gzip member per record, members concatenated — the layout
that makes a .warc.gz seekable). Both layers are stdlib-parseable: gzip
members via ``zlib.decompressobj(16+15)``'s ``unused_data`` chaining, the
record grammar via byte slicing. No warcio dependency, same boundary as
the other multimodal parsers in this package.

Hostile-input containment (the multimodal convention): every declared
length is bounds-checked against the remaining bytes BEFORE any slice or
decompress loop, header blocks are capped, and gzip output is capped per
member (a zip-bomb member raises instead of filling the Arrow worker), so
corruption raises ValueError — the containable class ``errors='skip'``
callers can drop.

The fixture generator (``make_warc``) builds structurally-REAL WARC 1.0
bytes — warcinfo + per-page request/response records with HTTP/1.1 header
blocks — so the parser is exercised on genuine record grammar in any
environment.
"""

from __future__ import annotations

import struct as _struct  # noqa: F401  (parity with sibling modules' error tuple)
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

#: a single WARC header block larger than this is corrupt, not merely big
_MAX_HEADER_BYTES = 64 * 1024


def is_gzip(payload: bytes) -> bool:
    return len(payload) >= 2 and payload[:2] == b"\x1f\x8b"


def split_gzip_members(payload: bytes, *, max_member_bytes: int = 1 << 30) -> list[bytes]:
    """Decompress a concatenation of gzip members (the .warc.gz layout) into
    one bytes object per member. ``max_member_bytes`` caps each member's
    DECOMPRESSED size — a crafted bomb raises instead of allocating."""
    out: list[bytes] = []
    rest = payload
    while rest:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            chunk = d.decompress(rest, max_member_bytes)
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member at offset {len(payload) - len(rest)}: {e}")
        if not d.eof:
            if d.unconsumed_tail:
                raise ValueError(
                    f"gzip member exceeds max_member_bytes={max_member_bytes}"
                )
            raise ValueError("truncated gzip member")
        out.append(chunk)
        rest = d.unused_data
    return out


def _parse_header_block(buf: bytes, pos: int) -> tuple[str, dict[str, str], int]:
    """Parse one CRLF header block starting at ``pos``: the version/status
    line, then ``Name: value`` lines until the blank line. Returns
    (first_line, headers, position after the blank line)."""
    end = buf.find(b"\r\n\r\n", pos, pos + _MAX_HEADER_BYTES)
    if end < 0:
        raise ValueError(
            f"no header-block terminator within {_MAX_HEADER_BYTES} bytes at offset {pos}"
        )
    lines = buf[pos:end].split(b"\r\n")
    first = lines[0].decode("utf-8", errors="replace")
    headers: dict[str, str] = {}
    for raw in lines[1:]:
        name, sep, value = raw.partition(b":")
        if not sep:
            raise ValueError(f"malformed header line {raw[:80]!r}")
        headers[name.decode("utf-8", errors="replace").strip().lower()] = (
            value.decode("utf-8", errors="replace").strip()
        )
    return first, headers, end + 4


def parse_warc_records(payload: bytes) -> list[tuple[dict[str, str], bytes]]:
    """Parse plain (non-gzip) WARC bytes into [(headers, content)] — headers
    lower-cased, content exactly ``Content-Length`` bytes. Validates the
    WARC/1.x version line, bounds every Content-Length against the
    remaining payload, and requires the CRLFCRLF record separator."""
    records: list[tuple[dict[str, str], bytes]] = []
    pos, n = 0, len(payload)
    while pos < n:
        first, headers, body = _parse_header_block(payload, pos)
        if not first.startswith("WARC/1."):
            raise ValueError(f"not a WARC record (version line {first[:40]!r})")
        try:
            clen = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC record missing Content-Length")
        except ValueError:
            raise ValueError(
                f"non-integer Content-Length {headers['content-length']!r}"
            )
        if clen < 0 or body + clen > n:
            raise ValueError(
                f"Content-Length {clen} overruns payload ({n - body} bytes left)"
            )
        records.append((headers, payload[body : body + clen]))
        pos = body + clen
        if payload[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError(f"missing record separator at offset {pos}")
        pos += 4
    return records


def _dechunk(body: bytes) -> bytes:
    """Minimal HTTP/1.1 chunked-transfer decoding (hex size lines), bounds-
    checked — captures sometimes store the raw chunked stream."""
    out = bytearray()
    pos, n = 0, len(body)
    while True:
        eol = body.find(b"\r\n", pos, pos + 18)
        if eol < 0:
            raise ValueError("chunked body: missing size line")
        size_str = body[pos:eol].split(b";", 1)[0]
        try:
            size = int(size_str, 16)
        except ValueError:
            raise ValueError(f"chunked body: bad size line {size_str[:20]!r}")
        pos = eol + 2
        if size == 0:
            return bytes(out)
        if pos + size + 2 > n:
            raise ValueError(f"chunk of {size} bytes overruns body")
        out += body[pos : pos + size]
        pos += size + 2  # trailing CRLF


def http_response_parts(content: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split a 'response'-type record's content into (status_code, headers,
    body), dechunking when Transfer-Encoding: chunked is declared."""
    status_line, headers, body_start = _parse_header_block(content, 0)
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"not an HTTP response ({status_line[:40]!r})")
    try:
        status = int(parts[1])
    except ValueError:
        raise ValueError(f"bad HTTP status {parts[1]!r}")
    body = content[body_start:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    return status, headers, body


WARC_RECORD_SCHEMA = (
    "doc_id long, record_idx int, warc_type string, target_uri string, "
    "warc_date string, http_status int, content_type string, body binary"
)


def warc_records(
    binary_df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    errors: str = "fail",
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Explode WARC payloads (plain or per-record-gzip — sniffed per
    payload) into one row per record of the requested ``record_types``,
    with the HTTP envelope split off response records: (doc_id, record_idx,
    warc_type, target_uri, warc_date, http_status, content_type, body).
    ``errors='skip'`` drops undecodable payloads (the multimodal error
    vocabulary).

    Scale: Arrow-batched mapInPandas over (id, payload) — the ingest seam
    of a Common Crawl pipeline; downstream is ``html_to_text_expr`` over
    the decoded body and the cleaning ladder (see PIPELINES.md §1).
    Per-record-gzip members decompress independently, so a pathological
    member is contained to its record's ValueError."""
    if errors not in ("fail", "skip"):
        raise ValueError(f"errors must be fail|skip, got {errors!r}")
    wanted = tuple(t.lower() for t in record_types)

    def decode_one(payload: bytes) -> list[tuple]:
        if is_gzip(payload):
            records = []
            for member in split_gzip_members(payload):
                records.extend(parse_warc_records(member))
        else:
            records = parse_warc_records(payload)
        rows = []
        for i, (h, content) in enumerate(records):
            wtype = h.get("warc-type", "").lower()
            if wtype not in wanted:
                continue
            status, ctype, body = None, None, content
            if wtype == "response":
                status, hh, body = http_response_parts(content)
                ctype = hh.get("content-type")
            rows.append(
                (
                    i,
                    wtype,
                    h.get("warc-target-uri"),
                    h.get("warc-date"),
                    status,
                    ctype,
                    body,
                )
            )
        return rows

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    decoded = decode_one(bytes(payload))
                except (ValueError, IndexError):
                    if errors == "fail":
                        raise
                    continue
                rows.extend((int(did), *r) for r in decoded)
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "record_idx", "warc_type", "target_uri",
                    "warc_date", "http_status", "content_type", "body",
                ],
            )

    return binary_df.select(id_col, payload_col).mapInPandas(
        op, schema=WARC_RECORD_SCHEMA
    )


def _warc_record(headers: list[tuple[str, str]], content: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("utf-8") for k, v in headers
    )
    head += f"Content-Length: {len(content)}\r\n".encode("utf-8")
    return head + b"\r\n" + content + b"\r\n\r\n"


def make_warc(
    doc_id: int,
    pages: list[tuple[str, str]],
    *,
    gzip_records: bool = False,
    chunked_every: int = 0,
) -> bytes:
    """Deterministic structurally-real WARC 1.0 fixture: a warcinfo record,
    then one request + one response record per (url, html) page; response
    bodies are genuine HTTP/1.1 blocks (optionally chunked every
    ``chunked_every``-th page). ``gzip_records=True`` emits the
    .warc.gz-style one-member-per-record concatenation."""
    date = f"2024-01-01T{doc_id % 24:02d}:00:00Z"
    records = [
        _warc_record(
            [("WARC-Type", "warcinfo"), ("WARC-Date", date),
             ("WARC-Record-ID", f"<urn:uuid:info-{doc_id}>")],
            b"software: vitess-cdc-spark fixture\r\n",
        )
    ]
    for i, (url, html) in enumerate(pages):
        records.append(
            _warc_record(
                [("WARC-Type", "request"), ("WARC-Target-URI", url),
                 ("WARC-Date", date),
                 ("WARC-Record-ID", f"<urn:uuid:req-{doc_id}-{i}>")],
                f"GET {url} HTTP/1.1\r\nHost: example\r\n\r\n".encode("utf-8"),
            )
        )
        body = html.encode("utf-8")
        if chunked_every and i % chunked_every == 0 and body:
            half = len(body) // 2 or 1
            chunks = b""
            for part in (body[:half], body[half:]):
                if part:
                    chunks += f"{len(part):x}\r\n".encode() + part + b"\r\n"
            chunks += b"0\r\n\r\n"
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Transfer-Encoding: chunked\r\n\r\n" + chunks
            )
        else:
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
                + body
            )
        records.append(
            _warc_record(
                [("WARC-Type", "response"), ("WARC-Target-URI", url),
                 ("WARC-Date", date),
                 ("WARC-Record-ID", f"<urn:uuid:resp-{doc_id}-{i}>")],
                http,
            )
        )
    if gzip_records:
        out = b""
        for r in records:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            out += co.compress(r) + co.flush()
        return out
    return b"".join(records)
