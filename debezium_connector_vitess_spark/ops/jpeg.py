"""Pure-stdlib JPEG/JFIF marker-stream parser: real header decode without PIL.

JPEG metadata (dimensions, component count, sample precision, JFIF pixel
density, baseline-vs-progressive) lives entirely in the length-prefixed
marker segments BEFORE the entropy-coded scan — exactly the bytes a
metadata extractor reads, no Huffman/DCT decode required (the same
no-media-decode boundary as the MP4 sample-table demux in this package:
the pixel decode belongs to the consumer's codec).

``encode_jpeg_shell`` generates deterministic test fixtures: a
structurally-REAL JFIF marker stream (SOI, APP0/JFIF, DQT, SOF0 or SOF2,
DHT, SOS, an entropy payload with correct 0xFF00 byte stuffing, EOI) whose
entropy bytes are deterministic filler, NOT a decodable scan — honest for
this module's scope because the parser under test never decodes entropy,
only walks markers. Every segment length is written correctly, so a parser
that miscounts any length tears the walk and fails loudly.

Hostile-input containment (the multimodal convention): segment lengths are
16-bit by format (cannot size a large allocation) and every read is
bounds-checked against the payload, so truncation and corruption raise
ValueError — the containable class ``errors='skip'`` callers can drop.
"""

from __future__ import annotations

import struct

#: markers that carry frame headers (SOFn); C4/C8/CC are DHT/JPG/DAC, not SOFs
_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)
#: SOFs whose scan order is progressive (spectral-selection / successive
#: approximation): SOF2 (huffman) and SOF10/SOF14 (arithmetic/differential)
_PROGRESSIVE_SOFS = frozenset([0xC2, 0xC6, 0xCA, 0xCE])
#: standalone markers with NO length field
_STANDALONE = frozenset([0x01] + list(range(0xD0, 0xD8)))  # TEM, RST0-7


def is_jpeg(payload: bytes) -> bool:
    return len(payload) >= 3 and payload[:3] == b"\xff\xd8\xff"


def _iter_segments(payload: bytes):
    """Validated marker-segment generator: yields (marker, body) for every
    length-bearing segment up to and INCLUDING SOS (entropy data excluded),
    skipping standalone markers; stops at EOI. Every framing rule — the
    SOI gate, fill-byte handling, the non-marker-byte guard, segment
    extents — lives HERE, the one walker every JPEG parser in this module
    shares (so the metadata and EXIF paths cannot diverge in what they
    accept as a well-formed stream)."""
    if not is_jpeg(payload):
        raise ValueError("not a JPEG (missing SOI marker)")
    n = len(payload)
    pos = 2
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(
                f"expected marker at byte {pos}, found 0x{payload[pos]:02x}"
            )
        # the standard allows any number of 0xFF fill bytes before a marker
        while pos < n and payload[pos] == 0xFF:
            pos += 1
        if pos >= n:
            raise ValueError("truncated marker stream")
        marker = payload[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            return
        if marker in _STANDALONE:
            continue
        if pos + 2 > n:
            raise ValueError("truncated segment length")
        seg_len = struct.unpack(">H", payload[pos : pos + 2])[0]
        if seg_len < 2 or pos + seg_len > n:
            raise ValueError(
                f"segment 0x{marker:02x} declares {seg_len} bytes, "
                f"payload holds {n - pos}"
            )
        yield marker, payload[pos + 2 : pos + seg_len]
        if marker == 0xDA:  # SOS: entropy data follows — headers are done
            return
        pos += seg_len


def parse_jpeg_meta(payload: bytes) -> tuple[int, int, int, int, bool, int, int]:
    """Walk the marker stream up to SOS and return
    ``(width, height, n_components, precision, progressive, density_x,
    density_y)``. Density comes from the APP0 JFIF segment (0 when absent);
    dimensions/precision/components from the first SOFn. Raises ValueError
    on truncation, a missing SOF, or any segment overrunning the payload."""
    meta, _exif = _parse_headers(payload)
    return meta


def _parse_headers(
    payload: bytes,
) -> tuple[tuple[int, int, int, int, bool, int, int], bytes | None]:
    """ONE walk collecting the frame metadata AND the first EXIF APP1 TIFF
    block (None when absent) — the hot-path entry the Arrow extractor uses
    so headers are scanned once, not once per fact."""
    dens_x = dens_y = 0
    sof: tuple[int, int, int, int, bool] | None = None
    exif: bytes | None = None
    for marker, body in _iter_segments(payload):
        if marker == 0xE0 and body[:5] == b"JFIF\x00":
            if len(body) < 12:
                raise ValueError("JFIF APP0 body truncated")
            dens_x, dens_y = struct.unpack(">2H", body[8:12])
        elif marker == 0xE1 and body[:6] == b"Exif\x00\x00" and exif is None:
            exif = body[6:]
        elif marker in _SOF_MARKERS:
            if len(body) < 6:
                raise ValueError("SOF body truncated")
            precision, height, width, n_comp = struct.unpack(">BHHB", body[:6])
            if len(body) < 6 + 3 * n_comp:
                raise ValueError("SOF component table truncated")
            sof = (width, height, n_comp, precision, marker in _PROGRESSIVE_SOFS)
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("SOS before any SOF frame header")
            break
    if sof is None:
        raise ValueError("no SOF frame header in marker stream")
    w, h, n_comp, precision, progressive = sof
    return (w, h, n_comp, precision, progressive, dens_x, dens_y), exif


def parse_jpeg_meta_exif(
    payload: bytes, *, exif_errors: str = "null"
) -> tuple[int, int, int, int, bool, int, int, int | None]:
    """The extractor entry: one header walk returning the
    :func:`parse_jpeg_meta` tuple plus the EXIF orientation (None when
    absent). ``exif_errors='null'`` (default) degrades a CORRUPT EXIF
    block to orientation=None — the dims/density that parsed fine must
    not be discarded because an optional field is broken (real encoders
    ship nonstandard EXIF constantly); 'fail' keeps the strict contract
    of :func:`parse_exif_orientation`."""
    if exif_errors not in ("null", "fail"):
        raise ValueError(f"exif_errors must be null|fail, got {exif_errors!r}")
    meta, exif = _parse_headers(payload)
    orientation: int | None = None
    if exif is not None:
        try:
            orientation = _tiff_orientation(exif)
        except ValueError:
            if exif_errors == "fail":
                raise
    return (*meta, orientation)


def _tiff_orientation(tiff: bytes) -> int | None:
    """Orientation tag (0x0112) from a TIFF block (the APP1 body after
    'Exif\\x00\\x00'): byte-order mark, magic, IFD0 entry count, and every
    read bounds-checked against the block. Returns None when the tag is
    absent; raises ValueError on corruption."""
    if len(tiff) < 8:
        raise ValueError("EXIF TIFF header truncated")
    if tiff[:2] == b"II":
        endian = "<"
    elif tiff[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError(f"EXIF byte-order mark {tiff[:2]!r}")
    magic, ifd_off = struct.unpack(endian + "HI", tiff[2:8])
    if magic != 42:
        raise ValueError(f"EXIF TIFF magic {magic} != 42")
    if ifd_off + 2 > len(tiff):
        raise ValueError("EXIF IFD offset overruns segment")
    (n_entries,) = struct.unpack(endian + "H", tiff[ifd_off : ifd_off + 2])
    if ifd_off + 2 + 12 * n_entries > len(tiff):
        raise ValueError(
            f"EXIF IFD declares {n_entries} entries beyond the segment"
        )
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(endian + "HHI", tiff[e : e + 8])
        if tag == 0x0112:
            if typ != 3 or cnt != 1:  # SHORT, one value
                raise ValueError(f"orientation tag has type {typ} count {cnt}")
            (val,) = struct.unpack(endian + "H", tiff[e + 8 : e + 10])
            if not 1 <= val <= 8:
                raise ValueError(f"orientation {val} outside 1-8")
            return val
    return None  # EXIF present, orientation absent


def parse_exif_orientation(payload: bytes) -> int | None:
    """EXIF orientation (tag 0x0112) from the APP1 segment's TIFF block —
    the rotation a training pipeline must normalize before resize (values
    1-8 per TIFF 6.0; a mirrored/rotated capture whose pixels are fed
    as-stored silently trains on rotated images). Returns None when no
    EXIF APP1 / no orientation tag is present; raises ValueError on a
    corrupt stream or TIFF block — the walk shares :func:`_iter_segments`'
    framing rules, so this parser rejects exactly what
    :func:`parse_jpeg_meta` rejects (the lenient per-field degrade lives
    in :func:`parse_jpeg_meta_exif`)."""
    for marker, body in _iter_segments(payload):
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            return _tiff_orientation(body[6:])
        if marker == 0xDA:
            break
    return None


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg_shell(
    width: int,
    height: int,
    *,
    components: int = 3,
    density: tuple[int, int] = (72, 72),
    progressive: bool = False,
    entropy_bytes: int = 64,
    seed: int = 0,
    orientation: int | None = None,
    exif_little_endian: bool = True,
) -> bytes:
    """Deterministic structurally-real JFIF fixture (see module docstring):
    every marker segment is well-formed with a correct length; the
    entropy payload after SOS is deterministic filler with proper 0xFF00
    stuffing (a raw 0xFF inside scan data would read as a marker).
    ``orientation`` adds a genuine EXIF APP1 segment (TIFF header + one
    IFD0 entry, tag 0x0112) in either byte order."""
    if not 1 <= components <= 4:
        raise ValueError(f"components must be 1-4, got {components}")
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError("JPEG dimensions are 16-bit")
    if orientation is not None and not 1 <= orientation <= 8:
        raise ValueError(f"orientation must be 1-8, got {orientation}")
    app0 = (
        b"JFIF\x00" + bytes([1, 1])  # version 1.01
        + bytes([1])  # density unit: dots/inch
        + struct.pack(">2H", *density)
        + bytes([0, 0])  # no thumbnail
    )
    app1 = b""
    if orientation is not None:
        e = "<" if exif_little_endian else ">"
        bom = b"II" if exif_little_endian else b"MM"
        tiff = (
            bom + struct.pack(e + "HI", 42, 8)  # magic + IFD0 at offset 8
            + struct.pack(e + "H", 1)  # one entry
            + struct.pack(e + "HHI", 0x0112, 3, 1)  # orientation, SHORT, x1
            + struct.pack(e + "H", orientation) + b"\x00\x00"  # value + pad
            + struct.pack(e + "I", 0)  # no next IFD
        )
        app1 = _seg(0xE1, b"Exif\x00\x00" + tiff)
    dqt = bytes([0]) + bytes((3 + i * 2) % 255 + 1 for i in range(64))
    sof_body = struct.pack(">BHHB", 8, height, width, components) + b"".join(
        struct.pack(">BBB", cid + 1, 0x11, 0) for cid in range(components)
    )
    # minimal-valid DHT: one DC table with a single 2-bit code
    dht = bytes([0]) + bytes([0, 1] + [0] * 14) + bytes([0])
    sos = bytes([components]) + b"".join(
        struct.pack(">BB", cid + 1, 0) for cid in range(components)
    ) + bytes([0, 63, 0])
    entropy = bytearray()
    for i in range(entropy_bytes):
        b = (seed * 31 + i * 7) % 256
        entropy.append(b)
        if b == 0xFF:
            entropy.append(0x00)  # byte stuffing
    return (
        b"\xff\xd8"  # SOI
        + _seg(0xE0, app0)
        + app1
        + _seg(0xDB, dqt)
        + _seg(0xC2 if progressive else 0xC0, sof_body)
        + _seg(0xC4, dht)
        + _seg(0xDA, sos)
        + bytes(entropy)
        + b"\xff\xd9"  # EOI
    )
