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

import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

#: a single WARC header block larger than this is corrupt, not merely big
_MAX_HEADER_BYTES = 64 * 1024


def is_gzip(payload: bytes) -> bool:
    return len(payload) >= 2 and payload[:2] == b"\x1f\x8b"


def iter_gzip_members(
    payload: bytes, *, max_member_bytes: int = 1 << 30
) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members (the .warc.gz layout),
    yielding one bytes object per member AS DECODED — so a caller can keep
    the valid prefix when a later member is torn. ``max_member_bytes``
    caps each member's DECOMPRESSED size — a crafted bomb raises instead
    of allocating (asking for cap+1 makes a member of exactly the cap
    legal)."""
    rest = payload
    while rest:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            chunk = d.decompress(rest, max_member_bytes + 1)
        except zlib.error as e:
            raise ValueError(
                f"corrupt gzip member at offset {len(payload) - len(rest)}: {e}"
            )
        if len(chunk) > max_member_bytes:
            raise ValueError(
                f"gzip member exceeds max_member_bytes={max_member_bytes}"
            )
        if not d.eof:
            raise ValueError("truncated gzip member")
        yield chunk
        rest = d.unused_data


def split_gzip_members(payload: bytes, *, max_member_bytes: int = 1 << 30) -> list[bytes]:
    """Eager list form of :func:`iter_gzip_members`."""
    return list(iter_gzip_members(payload, max_member_bytes=max_member_bytes))


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
    last_key: str | None = None
    for raw in lines[1:]:
        if raw[:1] in (b" ", b"\t"):
            # obs-fold continuation (RFC 7230 §3.2.4 — still present in
            # older web captures): append to the previous header's value
            if last_key is None:
                raise ValueError(f"header continuation with no header {raw[:80]!r}")
            headers[last_key] += " " + raw.decode("utf-8", errors="replace").strip()
            continue
        name, sep, value = raw.partition(b":")
        if not sep:
            raise ValueError(f"malformed header line {raw[:80]!r}")
        last_key = name.decode("utf-8", errors="replace").strip().lower()
        headers[last_key] = value.decode("utf-8", errors="replace").strip()
    return first, headers, end + 4


def parse_warc_records(payload: bytes) -> list[tuple[dict[str, str], bytes]]:
    """Eager list form of :func:`iter_warc_records`."""
    return list(iter_warc_records(payload))


def iter_warc_records(payload: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Parse plain (non-gzip) WARC bytes into (headers, content) pairs —
    headers lower-cased, content exactly ``Content-Length`` bytes,
    YIELDED as decoded so a caller can keep the valid prefix when a later
    record is torn. Validates the WARC/1.x version line, bounds every
    Content-Length against the remaining payload, and requires the
    CRLFCRLF record separator."""
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
        end = body + clen
        if payload[end : end + 4] != b"\r\n\r\n":
            raise ValueError(f"missing record separator at offset {end}")
        yield headers, payload[body:end]
        pos = end + 4


def _dechunk(body: bytes) -> bytes:
    """Minimal HTTP/1.1 chunked-transfer decoding (hex size lines, chunk
    extensions after ';' ignored), bounds-checked — captures sometimes
    store the raw chunked stream. Every frame byte is validated: a missing
    trailing CRLF raises rather than silently yielding a body from a
    structurally broken stream. After the last (0-size) chunk, trailer
    header lines (RFC 7230 §4.1.2) are parsed and DISCARDED up to the
    terminating empty line — a capture with trailers still frames
    correctly, and a body that ends mid-trailer raises like any other
    truncation."""
    out = bytearray()
    pos, n = 0, len(body)
    while True:
        # size line: hex digits + optional ';extension' — cap the search so
        # garbage can't force an O(n) scan per bogus line, but keep room
        # for legal extensions (the 1 KiB bound is far above real captures)
        eol = body.find(b"\r\n", pos, min(n, pos + 1024))
        if eol < 0:
            raise ValueError("chunked body: missing size line")
        size_str = body[pos:eol].split(b";", 1)[0]
        try:
            size = int(size_str, 16)
        except ValueError:
            raise ValueError(f"chunked body: bad size line {size_str[:20]!r}")
        pos = eol + 2
        if size == 0:
            # trailer-part: zero or more header lines, then the final CRLF
            while True:
                eol = body.find(b"\r\n", pos)
                if eol < 0:
                    raise ValueError("chunked body: missing trailer terminator")
                if eol == pos:  # empty line ends the trailer-part
                    return bytes(out)
                pos = eol + 2
        if pos + size + 2 > n:
            raise ValueError(f"chunk of {size} bytes overruns body")
        if body[pos + size : pos + size + 2] != b"\r\n":
            raise ValueError("chunked body: chunk data not CRLF-terminated")
        out += body[pos : pos + size]
        pos += size + 2


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

    ``record_idx`` is the record's position within the WHOLE payload —
    every record counts, including warcinfo/request records the
    ``record_types`` filter drops — so emitted values are SPARSE after
    filtering (e.g. responses in the standard info/req/resp layout carry
    idx 2, 4, 6, …). It is a stable within-payload coordinate for joining
    back to the capture, not a dense output ordinal.

    Error containment (``errors='skip'``): framing is sequential, so a
    torn record truncates what is REACHABLE after it — skip keeps every
    record decoded BEFORE the failure. In the per-record-gzip layout a
    member whose WARC CONTENT is corrupt loses only its own records —
    member boundaries come from the gzip framing, so later members still
    decode (the containment that layout provides); a torn gzip STREAM
    ends the member chain (the next boundary is unknowable), and a
    plain-WARC payload keeps its decodable prefix only. ``errors='fail'``
    raises on the first failure either way.

    Scale: Arrow-batched mapInPandas over (id, payload) — the ingest seam
    of a Common Crawl pipeline; downstream is ``html_to_text_expr`` over
    the decoded body and the cleaning ladder (see PIPELINES.md §1)."""
    if errors not in ("fail", "skip"):
        raise ValueError(f"errors must be fail|skip, got {errors!r}")
    wanted = tuple(t.lower() for t in record_types)

    def shape(i: int, h: dict, content: bytes) -> tuple | None:
        wtype = h.get("warc-type", "").lower()
        if wtype not in wanted:
            return None
        status, ctype, body = None, None, content
        if wtype == "response":
            status, hh, body = http_response_parts(content)
            ctype = hh.get("content-type")
        return (
            i, wtype, h.get("warc-target-uri"), h.get("warc-date"),
            status, ctype, body,
        )

    def decode_prefix(payload: bytes) -> tuple[list[tuple], Exception | None]:
        rows: list[tuple] = []
        first_err: Exception | None = None
        idx = 0
        if is_gzip(payload):
            members = iter_gzip_members(payload)
            while True:
                try:
                    member = next(members)
                except StopIteration:
                    break
                except (ValueError, IndexError) as e:
                    # the member CHAIN is torn: nothing after is framable
                    first_err = first_err or e
                    break
                try:
                    for h, content in iter_warc_records(member):
                        r = shape(idx, h, content)
                        idx += 1
                        if r is not None:
                            rows.append(r)
                except (ValueError, IndexError) as e:
                    first_err = first_err or e  # next member still decodes
        else:
            try:
                for h, content in iter_warc_records(payload):
                    r = shape(idx, h, content)
                    idx += 1
                    if r is not None:
                        rows.append(r)
            except (ValueError, IndexError) as e:
                first_err = e
        return rows, first_err

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                decoded, err = decode_prefix(bytes(payload))
                if err is not None and errors == "fail":
                    raise err
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


def attach_warc_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_chars: int | None = None,
    second_page: bool = False,
    page_html_fn: "Callable[[int, str], str] | None" = None,
) -> DataFrame:
    """Deterministic per-doc WARC fixture payloads (the PNG/MP4 attach
    convention, shared by the registry row / scale smoke / tests so their
    generation formulas cannot drift): one response page whose html wraps
    the doc text (``'<html><body><p>' + text + '</p></body></html>'``,
    optionally truncated to ``max_chars``), every 2nd doc in the
    per-record-gzip layout, every 3rd with a chunked HTTP body;
    ``second_page=True`` adds a constant second request/response pair at
    ``<url>/2``. ``page_html_fn`` overrides the page formula with a caller
    ``(doc_id, text) -> html`` (the curation row wraps the text in its own
    richer page shape whose oracle mirror lives beside its SQL)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                text = t if t is not None else ""
                if max_chars is not None:
                    text = text[:max_chars]
                page = (
                    page_html_fn(did, text)
                    if page_html_fn is not None
                    else "<html><body><p>" + text + "</p></body></html>"
                )
                pages = [(f"https://ex/{did}", page)]
                if second_page:
                    pages.append((
                        f"https://ex/{did}/2",
                        "<html><body><p>second page</p></body></html>",
                    ))
                payloads.append(
                    make_warc(
                        did, pages,
                        gzip_records=did % 2 == 0,
                        chunked_every=1 if did % 3 == 0 else 0,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return df.select(id_col, text_col).mapInPandas(
        op, schema="doc_id long, payload binary"
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
