"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

All three modalities decode REAL container formats with stdlib-only codecs
(no PIL/librosa/ffmpeg in this container): PNG signature/IHDR + pixel
decode/resize (``ops/png.py``), WAV RIFF headers + PCM frames (``wave``
module), and minimal AVI RIFF chunk trees (avih header cross-checked
against movi chunks). Payloads that are not one of these fall back to
deterministic byte-length models so synthetic fixtures still flow. The
Spark plumbing is what matters at 100 TB:

- binary payloads travel as ``BinaryType`` columns with a metadata struct
  (content hash, byte length, declared mime), never decoded driver-side;
- decode / feature-extract run as ``mapInPandas`` over Arrow batches — one
  Python worker pass per partition, batch-vectorized, no per-row serde;
- frame sampling / resizing / chunking are per-row transforms inside the
  same batch iterator, so adding a stage costs no extra shuffle.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not present in this container
    from PIL import Image  # type: ignore

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

IMAGE_META_SCHEMA = (
    "doc_id long, byte_len long, content_md5 string, width int, height int, channels int"
)

FRAME_SAMPLE_SCHEMA = "doc_id long, n_frames long, sampled_frames long"

# What a truncated/malformed RIFF container can raise out of decode_avi_meta:
# explicit validation (ValueError), short slices (struct.error / IndexError).
_AVI_DECODE_ERRORS = (ValueError, IndexError, _struct.error)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stand-in payload: utf-8 bytes of the text column as the 'image' blob.
    (The driver tables carry no real media; the plumbing doesn't care.)"""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
    )


PNG_PAYLOAD_SCHEMA = "doc_id long, payload binary, mime string"


def attach_png_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL image payloads: each doc gets a solid-color PNG
    whose dimensions derive from the text length (width = 8 + len % 24,
    height = 8 + (len//2) % 24) and whose color derives from the doc id —
    encoded with the stdlib codec, so the decode branch downstream parses
    actual PNG bytes in any environment."""
    from .png import encode_png

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                n = len(text.encode("utf-8"))
                w, h = 8 + n % 24, 8 + (n // 2) % 24
                px = bytes([did % 256, (did * 7) % 256, (did * 13) % 256]) * (w * h)
                payloads.append(encode_png(w, h, px, channels=3))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "mime": "image/png",
                }
            )

    return df.select(id_col, text_col).mapInPandas(op, schema=PNG_PAYLOAD_SCHEMA)


JPEG_META_SCHEMA = (
    "doc_id long, width int, height int, n_components int, precision int, "
    "progressive boolean, density_x int, density_y int, orientation int"
)


def attach_jpeg_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic structurally-real JFIF payloads (see
    :func:`~.jpeg.encode_jpeg_shell`): dimensions from the text length
    (width = 8 + n%32, height = 8 + (n//3)%32), JFIF density / progressive
    SOF / component count from the doc id — so the extractor's parse is
    checkable against the generation formulas, the PNG-fixture convention."""
    from .jpeg import encode_jpeg_shell

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                n = len((text or "").encode("utf-8"))
                payloads.append(
                    encode_jpeg_shell(
                        8 + n % 32,
                        8 + (n // 3) % 32,
                        components=1 if did % 7 == 0 else 3,
                        density=(72 + (did % 4) * 24, 72 + (did % 3) * 36),
                        progressive=did % 5 == 0,
                        seed=did,
                        # even docs carry a genuine EXIF APP1 orientation
                        # (alternating byte order); odd docs have none
                        orientation=1 + did % 8 if did % 2 == 0 else None,
                        exif_little_endian=did % 4 == 0,
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "mime": "image/jpeg",
                }
            )

    return df.select(id_col, text_col).mapInPandas(op, schema=PNG_PAYLOAD_SCHEMA)


def extract_jpeg_metadata(binary_df: DataFrame, *, errors: str = "fail") -> DataFrame:
    """Full JPEG header extraction over Arrow batches: dimensions, component
    count, sample precision, progressive flag, JFIF pixel density, and the
    EXIF orientation (NULL when absent OR when the optional EXIF block is
    corrupt — real encoders ship nonstandard EXIF constantly, and a broken
    optional field must not discard the dims/density that parsed fine) —
    the metadata a corpus curator filters/buckets images by without any
    pixel decode. One header walk per payload (``parse_jpeg_meta_exif``).
    ``errors='skip'`` drops payloads whose REQUIRED headers are
    undecodable (the multimodal error vocabulary); 'fail' raises."""
    from .jpeg import parse_jpeg_meta_exif

    if errors not in ("fail", "skip"):
        raise ValueError(f"errors must be fail|skip, got {errors!r}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, nc, prec, prog, dx, dy, orient = parse_jpeg_meta_exif(
                        bytes(payload)
                    )
                except (ValueError, IndexError, _struct.error):
                    if errors == "fail":
                        raise
                    continue
                rows.append((int(did), w, h, nc, prec, prog, dx, dy, orient))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_components", "precision",
                    "progressive", "density_x", "density_y", "orientation",
                ],
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        op, schema=JPEG_META_SCHEMA
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for payloads that are not real images (the
    driver's synthetic tables carry text bytes): dimensions derived from byte
    length. Real images never reach this — see :func:`decode_image_dims`."""
    n = len(payload)
    return (64 + n % 512, 64 + (n // 2) % 512, 3)


def is_jpeg(payload: bytes) -> bool:
    # one sniffer: delegate to the module that owns the marker walker, so
    # the dispatch predicate and the parser's own gate can never drift
    from .jpeg import is_jpeg as _is

    return _is(payload)


def parse_jpeg_dims(payload: bytes) -> tuple[int, int, int]:
    """JPEG dimensions from the SOF frame header (stdlib only) — the
    dims-shaped view over the one marker walker (``ops/jpeg.py``
    ``parse_jpeg_meta``, which also surfaces precision / JFIF density /
    the progressive flag and bounds-checks every segment). Raises
    ValueError on a stream with no frame header (truncated/malformed)."""
    from .jpeg import parse_jpeg_meta

    width, height, components, _prec, _prog, _dx, _dy = parse_jpeg_meta(payload)
    return width, height, components


def is_gif(payload: bytes) -> bool:
    return payload[:6] in (b"GIF87a", b"GIF89a")


def parse_gif_dims(payload: bytes) -> tuple[int, int, int]:
    """GIF logical-screen dimensions: little-endian uint16 pair after the
    6-byte signature. Palette-based → reported as 3-channel RGB."""
    if len(payload) < 10:
        raise ValueError("truncated GIF header")
    width, height = _struct.unpack("<HH", payload[6:10])
    return width, height, 3


def is_bmp(payload: bytes) -> bool:
    # 'BM' alone collides with plain text ("BMW …"); require a known DIB
    # header size at offset 14 so only genuine bitmaps take this branch
    if len(payload) < 30 or payload[:2] != b"BM":
        return False
    (dib,) = _struct.unpack("<I", payload[14:18])
    return dib in (12, 40, 52, 56, 64, 108, 124)


def parse_bmp_dims(payload: bytes) -> tuple[int, int, int]:
    """BMP dimensions from the BITMAPINFOHEADER (int32 LE at offsets 18/22;
    height may be negative for top-down rows); channels from the
    bits-per-pixel field."""
    if len(payload) < 30:
        raise ValueError("truncated BMP header")
    width, height = _struct.unpack("<ii", payload[18:26])
    (bpp,) = _struct.unpack("<H", payload[28:30])
    return width, abs(height), max(1, bpp // 8)


def decode_image_dims(payload: bytes) -> tuple[int, int, int]:
    """REAL decode first, fake fallback last:

    1. PNG → parse the signature/IHDR with the pure-stdlib codec
       (``ops/png.py``) — genuine image decoding, no media library needed;
    2. JPEG/GIF/BMP → stdlib header parse (SOF markers / logical screen /
       BITMAPINFOHEADER);
    3. other formats with PIL present → PIL header decode;
    4. anything else → the deterministic fake (synthetic non-image payloads).
    """
    from .png import is_png, parse_ihdr

    if is_png(payload):
        return parse_ihdr(payload)
    if is_jpeg(payload):
        return parse_jpeg_dims(payload)
    if is_gif(payload):
        return parse_gif_dims(payload)
    if is_bmp(payload):
        return parse_bmp_dims(payload)
    if HAVE_PIL:  # pragma: no cover - PIL not in this container
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height, len(im.getbands())
    return _fake_decode(payload)


def extract_image_metadata(binary_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: per Arrow batch, decode and emit typed
    metadata. PNG payloads decode for real (stdlib codec); PIL covers other
    formats when installed; synthetic non-image payloads fall back to the
    deterministic fake. One batch-vectorized pass, no per-row serde."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = payloads.map(decode_image_dims)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "channels": dims.map(lambda d: d[2]).astype("int32"),
                }
            )

    return binary_df.mapInPandas(op, schema=IMAGE_META_SCHEMA)


def sample_frames(binary_df: DataFrame, *, frame_bytes: int = 256, every: int = 5) -> DataFrame:
    """Frame sampling: keep every k-th frame index. RIFF/AVI payloads use
    their REAL decoded frame count (container chunk scan); headerless
    payloads are modeled as fixed-size byte frames. A payload that claims to
    be AVI but fails container decode (truncated/malformed RIFF) falls back
    to the byte-frame model instead of failing the whole job."""

    def _count(b: bytes) -> int:
        if is_avi(b):
            try:
                return decode_avi_meta(b)[0]
            except _AVI_DECODE_ERRORS:  # malformed container → byte-frame model
                pass
        return (len(b) + frame_bytes - 1) // frame_bytes

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_frames = pdf["payload"].map(_count)
            sampled = n_frames.map(lambda n: len(range(0, int(n), every)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": n_frames.astype("int64"),
                    "sampled_frames": sampled.astype("int64"),
                }
            )

    return binary_df.mapInPandas(op, schema=FRAME_SAMPLE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, target_w int, target_h int, scale double"
)

AUDIO_CHUNK_SCHEMA = "doc_id long, chunk_idx int, start_sample long, n_samples long"

WAV_PAYLOAD_SCHEMA = "doc_id long, payload binary, mime string"

AUDIO_META_SCHEMA = (
    "doc_id long, n_samples long, framerate int, channels int, sampwidth int,"
    " duration_ms long"
)


def _make_wav(doc_id: int, n_text_bytes: int) -> bytes:
    """Deterministic REAL WAV payload: RIFF/WAVE container written by the
    stdlib ``wave`` module. Sample count / rate / channel count derive from
    the doc, PCM content is a deterministic int16 pattern."""
    import io
    import struct
    import wave

    n_samples = 200 + n_text_bytes % 800
    framerate = 8000 + (doc_id % 4) * 4000
    channels = 1 + doc_id % 2
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(framerate)
        vals = [
            ((doc_id * 31 + i * 17) % 65536) - 32768
            for i in range(n_samples * channels)
        ]
        w.writeframes(struct.pack(f"<{len(vals)}h", *vals))
    return buf.getvalue()


def attach_wav_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc deterministic WAV blobs (see :func:`_make_wav`), generated in
    Arrow batches so the downstream decode branch parses actual RIFF bytes."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _make_wav(int(did), len(text.encode("utf-8")))
                for did, text in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "mime": "audio/wav",
                }
            )

    return df.select(id_col, text_col).mapInPandas(op, schema=WAV_PAYLOAD_SCHEMA)


def decode_wav_meta(payload: bytes) -> tuple[int, int, int, int]:
    """REAL audio container decode: parse the RIFF/WAVE header with the
    stdlib ``wave`` module → (n_frames, framerate, channels, sampwidth).
    Raises on non-WAV payloads — callers gate on the RIFF magic."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        return w.getnframes(), w.getframerate(), w.getnchannels(), w.getsampwidth()


def is_wav(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def extract_audio_metadata(binary_df: DataFrame) -> DataFrame:
    """mapInPandas audio metadata: real WAV header decode for RIFF payloads
    (frames, rate, channels, sample width, integer-ms duration); the
    raw-PCM assumption (16-bit mono @ 16 kHz) covers headerless payloads."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                if is_wav(payload):
                    n, rate, ch, width = decode_wav_meta(payload)
                else:
                    n, rate, ch, width = len(payload) // 2, 16000, 1, 2
                rows.append((did, n, rate, ch, width, n * 1000 // rate))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "framerate", "channels", "sampwidth",
                    "duration_ms",
                ],
            ).astype(
                {
                    "doc_id": "int64", "n_samples": "int64", "framerate": "int32",
                    "channels": "int32", "sampwidth": "int32", "duration_ms": "int64",
                }
            )

    return binary_df.mapInPandas(op, schema=AUDIO_META_SCHEMA)


def resize_image_payload(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Real resize for PNG payloads: decode pixels (stdlib codec),
    nearest-neighbor resample, re-encode. Non-PNG payloads pass through
    unchanged (their scale factor is still computed from decoded dims)."""
    from .png import decode_png, encode_png, is_png, resize_nearest

    if not is_png(payload):
        return payload
    w, h, ch, pixels = decode_png(payload)
    return encode_png(
        target_w, target_h, resize_nearest(pixels, w, h, ch, target_w, target_h),
        channels=ch,
    )


def resize_images(binary_df: DataFrame, *, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize: per batch, decode dims (real for PNG/PIL formats, fake for
    synthetic payloads) and compute the aspect-preserving scale factor for a
    target box; :func:`resize_image_payload` does the actual resampling for
    real images at the same mapInPandas seam."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(decode_image_dims)
            w = dims.map(lambda d: d[0]).astype("int32")
            h = dims.map(lambda d: d[1]).astype("int32")
            scale = pd.Series(
                [min(target_w / wi, target_h / hi) for wi, hi in zip(w, h)],
                index=pdf.index,
                dtype="float64",
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "target_w": pd.Series(target_w, index=pdf.index, dtype="int32"),
                    "target_h": pd.Series(target_h, index=pdf.index, dtype="int32"),
                    "scale": scale,
                }
            )

    return binary_df.mapInPandas(op, schema=RESIZE_SCHEMA)


def chunk_audio(binary_df: DataFrame, *, bytes_per_sample: int = 2, chunk_samples: int = 64) -> DataFrame:
    """Audio chunking: one row per fixed-size chunk (the fan-out shape of a
    real ASR/feature pipeline — mapInPandas may yield more rows than it
    consumes, no explode/shuffle). RIFF/WAVE payloads chunk over their REAL
    decoded per-channel frame count; headerless payloads are treated as raw
    PCM at ``bytes_per_sample``."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "chunk_idx": [], "start_sample": [], "n_samples": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                if is_wav(payload):
                    total = decode_wav_meta(payload)[0]
                else:
                    total = len(payload) // bytes_per_sample
                for idx, start in enumerate(range(0, total, chunk_samples)):
                    out["doc_id"].append(did)
                    out["chunk_idx"].append(idx)
                    out["start_sample"].append(start)
                    out["n_samples"].append(min(chunk_samples, total - start))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "chunk_idx": pd.Series(out["chunk_idx"], dtype="int32"),
                    "start_sample": pd.Series(out["start_sample"], dtype="int64"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int64"),
                }
            )

    return binary_df.mapInPandas(op, schema=AUDIO_CHUNK_SCHEMA)


AVI_PAYLOAD_SCHEMA = "doc_id long, payload binary, mime string"

VIDEO_META_SCHEMA = (
    "doc_id long, n_frames int, width int, height int, fps int, duration_ms long"
)


def _make_avi(doc_id: int, n_text_bytes: int) -> bytes:
    """Deterministic REAL (minimal) AVI container: RIFF('AVI ') with a
    LIST('hdrl') holding the 56-byte 'avih' main header and a LIST('movi')
    holding one '00dc' chunk per frame. Frame count / dims / fps derive from
    the doc. The movi chunk payloads are opaque (no codec), but the RIFF
    structure, header fields, and chunk framing are genuine."""
    import struct

    n_frames = 4 + n_text_bytes % 28
    width, height = 16 + doc_id % 16, 16 + (doc_id // 2) % 16
    fps = 10 + doc_id % 3 * 5
    usec_per_frame = 1_000_000 // fps

    avih = struct.pack(
        "<14I",
        usec_per_frame,  # dwMicroSecPerFrame
        0,               # dwMaxBytesPerSec
        0,               # dwPaddingGranularity
        0,               # dwFlags
        n_frames,        # dwTotalFrames
        0,               # dwInitialFrames
        1,               # dwStreams
        0,               # dwSuggestedBufferSize
        width,           # dwWidth
        height,          # dwHeight
        0, 0, 0, 0,      # dwReserved[4]
    )
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    frames = b""
    for i in range(n_frames):
        data = bytes([(doc_id + i) % 256]) * 16
        frames += b"00dc" + struct.pack("<I", len(data)) + data
    movi = b"movi" + frames
    body = (
        b"AVI "
        + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        + b"LIST" + struct.pack("<I", len(movi)) + movi
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def is_avi(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def decode_avi_meta(payload: bytes) -> tuple[int, int, int, int]:
    """REAL video container decode: walk the RIFF chunk tree, read the avih
    main header (total frames, dims, µs/frame) and cross-check the header's
    frame count against the actual '00dc' chunks in movi — a decoder that
    trusts either alone misreads truncated files.
    Returns (n_frames, width, height, fps)."""
    import struct

    if not is_avi(payload):
        raise ValueError("not an AVI RIFF payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    header = None
    movi_frames = 0
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"LIST":
            kind = body[:4]
            if kind == b"hdrl" and body[4:8] == b"avih":
                hsz = struct.unpack("<I", body[8:12])[0]
                header = struct.unpack("<14I", body[12 : 12 + hsz])
            elif kind == b"movi":
                fpos = 4
                while fpos + 8 <= len(body):
                    fsz = struct.unpack("<I", body[fpos + 4 : fpos + 8])[0]
                    if body[fpos : fpos + 4] == b"00dc":
                        movi_frames += 1
                    fpos += 8 + fsz + (fsz & 1)
        pos += 8 + size + (size & 1)
    if header is None:
        raise ValueError("AVI payload missing avih header")
    n_frames, width, height = header[4], header[8], header[9]
    if movi_frames != n_frames:
        raise ValueError(
            f"avih dwTotalFrames={n_frames} but movi holds {movi_frames} frames"
        )
    return n_frames, width, height, 1_000_000 // header[0]


def attach_avi_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc deterministic AVI blobs (see :func:`_make_avi`)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _make_avi(int(did), len(text.encode("utf-8")))
                for did, text in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "mime": "video/x-msvideo",
                }
            )

    return df.select(id_col, text_col).mapInPandas(op, schema=AVI_PAYLOAD_SCHEMA)


def extract_video_metadata(binary_df: DataFrame, *, errors: str = "fail") -> DataFrame:
    """mapInPandas video metadata: real AVI container decode (header +
    chunk-scan cross-check); integer-ms duration = frames·1000/fps.

    ``errors`` mirrors the decode path's E4 failure modes: ``fail`` raises on
    a malformed container (task error → restart from checkpoint), ``null``
    keeps the row with null metadata fields, ``skip`` drops the row — so one
    truncated payload in a 100 TB corpus doesn't kill the job unless asked to.
    """
    if errors not in ("fail", "null", "skip"):
        raise ValueError(f"errors must be fail|null|skip, got {errors!r}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    n, w, h, fps = decode_avi_meta(payload)
                except _AVI_DECODE_ERRORS:
                    if errors == "fail":
                        raise
                    if errors == "skip":
                        continue
                    rows.append((did, None, None, None, None, None))
                    continue
                rows.append((did, n, w, h, fps, n * 1000 // fps))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "width", "height", "fps", "duration_ms"],
            ).astype(
                {
                    "doc_id": "int64", "n_frames": "Int32", "width": "Int32",
                    "height": "Int32", "fps": "Int32", "duration_ms": "Int64",
                }
            )

    return binary_df.mapInPandas(op, schema=VIDEO_META_SCHEMA)


MP4_META_SCHEMA = "doc_id long, duration_ms long, width int, height int, n_tracks int"


def _box(fourcc: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _make_mp4(doc_id: int, n_text_bytes: int) -> bytes:
    """Deterministic REAL (minimal) ISO BMFF / MP4 container: ftyp, then a
    moov with a v0 mvhd (timescale 500 — NOT milliseconds, so the decoder
    must actually convert units) and one tkhd-bearing trak per track (the
    video track carries 16.16 fixed-point dimensions; the optional audio
    track carries zero dims, as real muxers write), then an opaque mdat.
    Duration/dims/track-count derive from the doc. Box framing, version
    fields, and fixed-point encodings are genuine ISO 14496-12 structure.
    """
    import struct

    dur_ms = 2 * (250 + n_text_bytes % 2250)  # even ⇒ exact at timescale 500
    timescale = 500
    dur_units = dur_ms * timescale // 1000
    width, height = 64 + doc_id % 64, 64 + (doc_id // 3) % 64
    n_tracks = 1 + doc_id % 2

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42")
    mvhd = _box(
        b"mvhd",
        struct.pack(
            ">B3s6I",
            0, b"\x00\x00\x00",          # version 0, flags
            0, 0,                        # creation/modification time
            timescale, dur_units,
            0x00010000,                  # rate 1.0 (16.16)
            0x01000000,                  # volume 1.0 (8.8) + 2 reserved bytes
        )
        + struct.pack(">2I", 0, 0)       # reserved[2]
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)  # pre_defined[6]
        + struct.pack(">I", n_tracks + 1),      # next_track_ID (100-byte v0 body)
    )

    def tkhd(track_id: int, w: int, h: int) -> bytes:
        return _box(
            b"tkhd",
            struct.pack(
                ">B3s5I",
                0, b"\x00\x00\x07",      # version 0, flags: enabled|in-movie|in-preview
                0, 0,                    # creation/modification time
                track_id, 0, dur_units,
            )
            + struct.pack(">2I", 0, 0)   # reserved[2]
            + struct.pack(">2H", 0, 0)   # layer, alternate_group
            + struct.pack(">2H", 0, 0)   # volume, reserved
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">2I", w << 16, h << 16),  # 16.16 fixed
        )

    traks = _box(b"trak", tkhd(1, width, height))
    if n_tracks == 2:
        traks += _box(b"trak", tkhd(2, 0, 0))
    moov = _box(b"moov", mvhd + traks)
    mdat = _box(b"mdat", bytes([(doc_id + i) % 256 for i in range(16 * (1 + n_text_bytes % 8))]))
    return ftyp + moov + mdat


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def decode_mp4_meta(payload: bytes) -> tuple[int, int, int, int]:
    """REAL ISO BMFF decode: walk the top-level box tree (validating that
    declared box sizes tile the payload exactly — truncation surfaces as an
    error, not a silent misread), find moov, read mvhd (v0 32-bit or v1
    64-bit times) for timescale+duration, count trak boxes, and take the
    video dimensions from the first tkhd with nonzero 16.16 width/height.
    Returns (duration_ms, width, height, n_tracks)."""
    import struct

    if not is_mp4(payload):
        raise ValueError("not an ISO BMFF payload (no ftyp)")

    # ONE box-framing iterator for the whole MP4 family (size-0 to-EOF,
    # size-1 largesize, tiling validation) — _mp4_walk, shared with the
    # sample-table demux so the safety-critical framing rules cannot drift
    def boxes(buf: bytes, pos: int, end: int):
        return _mp4_walk(buf, pos, end)

    duration_ms = width = height = None
    n_tracks = 0
    for fourcc, body, bend in boxes(payload, 0, len(payload)):
        if fourcc != b"moov":
            continue
        for inner, ib, ie in boxes(payload, body, bend):
            if inner == b"mvhd":
                version = payload[ib]
                if version == 1:
                    _, _, timescale, dur = struct.unpack(">QQIQ", payload[ib + 4 : ib + 32])
                else:
                    _, _, timescale, dur = struct.unpack(">IIII", payload[ib + 4 : ib + 20])
                duration_ms = dur * 1000 // timescale
            elif inner == b"trak":
                n_tracks += 1
                for tb, tb0, _tbe in boxes(payload, ib, ie):
                    if tb == b"tkhd":
                        w16, h16 = struct.unpack(">II", payload[_tbe - 8 : _tbe])
                        if width is None and w16:
                            width, height = w16 >> 16, h16 >> 16
    if duration_ms is None:
        raise ValueError("ISO BMFF payload missing moov/mvhd")
    if n_tracks == 0:
        raise ValueError("ISO BMFF payload has no trak")
    return duration_ms, (width or 0), (height or 0), n_tracks


def attach_mp4_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc deterministic MP4 blobs (see :func:`_make_mp4`)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _make_mp4(int(did), len(text.encode("utf-8")))
                for did, text in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "mime": "video/mp4",
                }
            )

    return df.select(id_col, text_col).mapInPandas(op, schema=AVI_PAYLOAD_SCHEMA)


def extract_mp4_metadata(binary_df: DataFrame, *, errors: str = "fail") -> DataFrame:
    """mapInPandas MP4 metadata: real ISO BMFF box-tree decode; same E4
    ``errors`` contract as :func:`extract_video_metadata`."""
    if errors not in ("fail", "null", "skip"):
        raise ValueError(f"errors must be fail|null|skip, got {errors!r}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    ms, w, h, nt = decode_mp4_meta(bytes(payload))
                except (ValueError, IndexError, EOFError, TypeError):
                    if errors == "fail":
                        raise
                    if errors == "skip":
                        continue
                    rows.append((int(did), None, None, None, None))
                    continue
                rows.append((int(did), ms, w, h, nt))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "duration_ms", "width", "height", "n_tracks"],
            ).astype(
                {
                    "doc_id": "int64", "duration_ms": "Int64",
                    "width": "Int32", "height": "Int32", "n_tracks": "Int32",
                }
            )

    return binary_df.mapInPandas(op, schema=MP4_META_SCHEMA)


MULTIMODAL_PAYLOADS_SCHEMA = "doc_id long, image binary, audio binary, video binary"

MULTIMODAL_META_SCHEMA = (
    "doc_id long, width int, height int, channels int,"
    " target_w int, target_h int, scale double,"
    " n_samples long, framerate int, audio_channels int, sampwidth int,"
    " audio_ms long,"
    " n_frames int, frame_w int, frame_h int, fps int, video_ms long,"
    " sampled_frames long"
)


def attach_multimodal_payloads(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """All three deterministic media payloads (real PNG / WAV / AVI blobs,
    same generation formulas as the per-modality attach_* fixtures) in ONE
    Arrow pass — the typed-media-columns row shape a real pipeline carries:
    one row per document, one binary column per modality."""
    from .png import encode_png

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img, wav, avi = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                did, n = int(did), len(text.encode("utf-8"))
                w, h = 8 + n % 24, 8 + (n // 2) % 24
                px = bytes([did % 256, (did * 7) % 256, (did * 13) % 256]) * (w * h)
                img.append(encode_png(w, h, px, channels=3))
                wav.append(_make_wav(did, n))
                avi.append(_make_avi(did, n))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "image": img,
                    "audio": wav,
                    "video": avi,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        op, schema=MULTIMODAL_PAYLOADS_SCHEMA
    )


def extract_multimodal_metadata(
    payloads: DataFrame,
    *,
    image_col: str = "image",
    audio_col: str = "audio",
    video_col: str = "video",
    target_w: int = 224,
    target_h: int = 224,
    every: int = 5,
    errors: str = "fail",
) -> DataFrame:
    """Image + audio + video metadata in ONE Arrow pass over typed media
    columns: real PNG/JPEG/GIF/BMP dimension decode + aspect-preserving
    resize scale, real WAV header decode (headerless 16-bit/16 kHz raw-PCM
    fallback), real AVI container decode (header/chunk cross-check) +
    every-``every``-th frame sampling. One mapInPandas seam instead of one
    per modality — at 100 TB that is one corpus scan and zero joins versus
    three scans plus five doc_id joins for the per-modality composition
    (the per-modality ops remain the single-column surfaces; all decode
    helpers are shared).

    ``errors`` mirrors the per-modality video op's E4 failure modes for a
    malformed container: ``fail`` raises (task error → restart from
    checkpoint), ``null`` keeps the row with null metadata, ``skip`` drops
    it — one truncated payload in a 100 TB corpus shouldn't kill the job
    unless asked to."""
    if errors not in ("fail", "null", "skip"):
        raise ValueError(f"errors must be fail|null|skip, got {errors!r}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, ib, ab, vb in zip(
                pdf["doc_id"], pdf[image_col], pdf[audio_col], pdf[video_col]
            ):
                try:
                    w, h, ch = decode_image_dims(ib)
                    scale = min(target_w / w, target_h / h)
                    if is_wav(ab):
                        n, rate, c, sw = decode_wav_meta(ab)
                    else:
                        n, rate, c, sw = len(ab) // 2, 16000, 1, 2
                    nf, fw, fh, fps = decode_avi_meta(vb)
                except (*_AVI_DECODE_ERRORS, OSError, EOFError, TypeError):
                    if errors == "fail":
                        raise
                    if errors == "skip":
                        continue
                    rows.append((int(did),) + (None,) * 17)
                    continue
                rows.append(
                    (
                        int(did), w, h, ch, target_w, target_h, scale,
                        n, rate, c, sw, n * 1000 // rate,
                        nf, fw, fh, fps, nf * 1000 // fps,
                        len(range(0, nf, every)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels",
                    "target_w", "target_h", "scale",
                    "n_samples", "framerate", "audio_channels", "sampwidth",
                    "audio_ms",
                    "n_frames", "frame_w", "frame_h", "fps", "video_ms",
                    "sampled_frames",
                ],
            ).astype(
                {
                    # pandas NULLABLE dtypes: errors="null" rows carry NA
                    "doc_id": "int64", "width": "Int32", "height": "Int32",
                    "channels": "Int32", "target_w": "Int32", "target_h": "Int32",
                    "scale": "float64", "n_samples": "Int64", "framerate": "Int32",
                    "audio_channels": "Int32", "sampwidth": "Int32",
                    "audio_ms": "Int64", "n_frames": "Int32", "frame_w": "Int32",
                    "frame_h": "Int32", "fps": "Int32", "video_ms": "Int64",
                    "sampled_frames": "Int64",
                }
            )

    return payloads.mapInPandas(op, schema=MULTIMODAL_META_SCHEMA)


AUDIO_ENERGY_SCHEMA = (
    "doc_id long, chunk_idx int, start_sample long, n_samples long, rms double"
)


def audio_chunk_energy(
    binary_df: DataFrame, *, chunk_samples: int = 64
) -> DataFrame:
    """Per-chunk RMS energy over REAL decoded PCM — the feature-extraction
    step after :func:`chunk_audio`'s geometry (silence trimming, VAD-ish
    gating, and loudness normalization all key on exactly this signal).

    Decodes each RIFF/WAVE payload's frames with the stdlib ``wave``
    module, folds multi-channel frames by averaging channels per sample
    position (the mono-mixdown convention), and emits one row per
    ``chunk_samples`` window with its root-mean-square amplitude in
    int16 units. Non-WAV and non-16-bit payloads are skipped (energy over
    undecodable or mis-width bytes is noise, not a feature). Same Arrow
    fan-out shape as
    chunk_audio: map-only, may yield more rows than it consumes, zero
    shuffle at any size.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "chunk_idx": [], "start_sample": [],
                "n_samples": [], "rms": [],
            }
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                if not is_wav(payload):
                    continue
                with wave.open(io.BytesIO(payload), "rb") as w:
                    ch = w.getnchannels()
                    width = w.getsampwidth()
                    raw = w.readframes(w.getnframes())
                if width != 2:
                    # 8/24/32-bit PCM would mis-parse as int16 pairs (wrong
                    # RMS with no error, or a buffer-size crash on odd byte
                    # counts) — skip like non-WAV rather than score garbage
                    continue
                samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                if ch > 1:
                    samples = samples.reshape(-1, ch).mean(axis=1)
                for idx in range(0, len(samples), chunk_samples):
                    piece = samples[idx : idx + chunk_samples]
                    out["doc_id"].append(did)
                    out["chunk_idx"].append(idx // chunk_samples)
                    out["start_sample"].append(idx)
                    out["n_samples"].append(len(piece))
                    out["rms"].append(float(np.sqrt(np.mean(piece * piece))))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "chunk_idx": pd.Series(out["chunk_idx"], dtype="int32"),
                    "start_sample": pd.Series(out["start_sample"], dtype="int64"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int64"),
                    "rms": pd.Series(out["rms"], dtype="float64"),
                }
            )

    return binary_df.mapInPandas(op, schema=AUDIO_ENERGY_SCHEMA)


IMAGE_STATS_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "mean_r double, mean_g double, mean_b double, brightness double"
)


def image_channel_stats(binary_df: DataFrame) -> DataFrame:
    """Per-image channel statistics over REAL decoded pixels — the image
    twin of :func:`audio_chunk_energy`: mean R/G/B and overall brightness
    (channel-mean average) per document, the gates an image-curation pass
    keys on (all-black/all-white frames, blown exposure, watermark-ish
    uniform fills).

    Decodes PNG payloads with the stdlib codec in :mod:`ops.png` (chunk
    walk, inflate, all five row filters — real pixels, not header fields),
    vectorizes the mean over a numpy view, and skips non-PNG payloads
    (stats over undecodable bytes are noise). Grayscale images report the
    single channel in all three means. Map-only Arrow seam, zero shuffle.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .png import decode_png, is_png

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [], "channels": [],
                "mean_r": [], "mean_g": [], "mean_b": [], "brightness": [],
            }
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                if not is_png(payload):
                    continue
                w, h, ch, px = decode_png(bytes(payload))
                arr = np.frombuffer(px, dtype=np.uint8).reshape(-1, ch)
                means = arr.mean(axis=0)
                if ch <= 2:
                    # grayscale / grayscale+alpha: channel 0 is the gray
                    # value (alpha is not a color — exposure gates ignore it)
                    r = g = b = float(means[0])
                else:
                    # RGB / RGBA: first three channels are the colors
                    r, g, b = (float(means[i]) for i in range(3))
                out["doc_id"].append(did)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["mean_r"].append(r)
                out["mean_g"].append(g)
                out["mean_b"].append(b)
                out["brightness"].append((r + g + b) / 3.0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "channels": pd.Series(out["channels"], dtype="int32"),
                    "mean_r": pd.Series(out["mean_r"], dtype="float64"),
                    "mean_g": pd.Series(out["mean_g"], dtype="float64"),
                    "mean_b": pd.Series(out["mean_b"], dtype="float64"),
                    "brightness": pd.Series(out["brightness"], dtype="float64"),
                }
            )

    return binary_df.mapInPandas(op, schema=IMAGE_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# MP4 sample tables: frame index + frame sampling (round 8)
# ---------------------------------------------------------------------------

FRAME_INDEX_SCHEMA = (
    "doc_id long, frame_idx int, pts_ms long, byte_offset long, n_bytes int, "
    "is_sync boolean"
)

VIDEO_FRAME_SCHEMA = "doc_id long, frame_idx int, pts_ms long, frame bytes".replace(
    "bytes", "binary"
)


def _hdlr_box(handler: bytes) -> bytes:
    import struct

    return _box(
        b"hdlr",
        struct.pack(">B3sI", 0, b"\x00\x00\x00", 0)
        + handler
        + struct.pack(">3I", 0, 0, 0)
        + b"h\x00",
    )


def _make_mp4_samples(doc_id: int, *, audio_first: bool = False) -> bytes:
    """Deterministic REAL MP4 with full sample tables: the `_make_mp4`
    skeleton plus mdia(mdhd + hdlr + minf(stbl(stts/stss/stsc/stsz/stco)))
    per trak — the index structure every real demuxer seeks with. Genuine
    ISO 14496-12 semantics the parser must honor: hdlr declares the handler
    type ('vide'/'soun' — the demux must select by handler, not trak
    order); the MEDIA timescale (12800 video, 48000 audio) differs from the
    movie timescale; video stts is run-length encoded with TWO runs (frame
    duration doubles mid-stream); stsz carries per-sample sizes; each
    track's samples live in one chunk whose stco offset is the absolute
    file position of its first sample byte (so moov is built twice: once to
    learn its own length, once with the real offsets); stss marks every 5th
    video sample as a sync frame. ``audio_first=True`` muxes the AAC-style
    audio trak BEFORE the video trak (the common real-world order that
    breaks first-trak-wins demuxers)."""
    import struct

    n_frames = 8 + doc_id % 17
    media_ts = 12800
    half = n_frames // 2
    runs = [(half, 512), (n_frames - half, 1024)] if half else [(n_frames, 512)]
    sizes = [16 + ((doc_id + i * 7) % 48) for i in range(n_frames)]
    syncs = list(range(1, n_frames + 1, 5))  # 1-based sample numbers
    dur_units_media = sum(n * d for n, d in runs)
    movie_ts = 500
    dur_units_movie = dur_units_media * movie_ts // media_ts
    width, height = 64 + doc_id % 64, 64 + (doc_id // 3) % 64
    a_n, a_size, a_ts = 4, 8, 48000  # audio: 4 fixed-size packets

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42")
    mvhd = _box(
        b"mvhd",
        struct.pack(
            ">B3s6I", 0, b"\x00\x00\x00", 0, 0, movie_ts, dur_units_movie,
            0x00010000, 0x01000000,
        )
        + struct.pack(">2I", 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)
        + struct.pack(">I", 3),
    )

    def tkhd(track_id: int, w: int, h: int) -> bytes:
        return _box(
            b"tkhd",
            struct.pack(">B3s5I", 0, b"\x00\x00\x07", 0, 0, track_id, 0,
                        dur_units_movie)
            + struct.pack(">2I", 0, 0)
            + struct.pack(">2H", 0, 0)
            + struct.pack(">2H", 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">2I", w << 16, h << 16),
        )

    def full(fourcc: bytes, body: bytes) -> bytes:
        return _box(fourcc, struct.pack(">B3s", 0, b"\x00\x00\x00") + body)

    v_stts = full(b"stts", struct.pack(">I", len(runs))
                  + b"".join(struct.pack(">2I", n, d) for n, d in runs))
    v_stss = full(b"stss", struct.pack(">I", len(syncs))
                  + b"".join(struct.pack(">I", s) for s in syncs))
    v_stsc = full(b"stsc", struct.pack(">I", 1) + struct.pack(">3I", 1, n_frames, 1))
    v_stsz = full(b"stsz", struct.pack(">2I", 0, n_frames)
                  + b"".join(struct.pack(">I", s) for s in sizes))
    a_stts = full(b"stts", struct.pack(">I", 1) + struct.pack(">2I", a_n, 1024))
    a_stsc = full(b"stsc", struct.pack(">I", 1) + struct.pack(">3I", 1, a_n, 1))
    a_stsz = full(b"stsz", struct.pack(">2I", a_size, a_n))
    v_mdhd = full(b"mdhd", struct.pack(">4I2H", 0, 0, media_ts,
                                       dur_units_media, 0x55C4, 0))
    a_mdhd = full(b"mdhd", struct.pack(">4I2H", 0, 0, a_ts, a_n * 1024,
                                       0x55C4, 0))

    def trak(tid, w, h, hdlr, mdhd, tables, chunk_off) -> bytes:
        stco = full(b"stco", struct.pack(">2I", 1, chunk_off))
        stbl = _box(b"stbl", tables + stco)
        mdia = _box(b"mdia", mdhd + _hdlr_box(hdlr) + _box(b"minf", stbl))
        return _box(b"trak", tkhd(tid, w, h) + mdia)

    def build_moov(v_off: int, a_off: int) -> bytes:
        v = trak(1, width, height, b"vide", v_mdhd,
                 v_stts + v_stss + v_stsc + v_stsz, v_off)
        a = trak(2, 0, 0, b"soun", a_mdhd, a_stts + a_stsc + a_stsz, a_off)
        return _box(b"moov", mvhd + (a + v if audio_first else v + a))

    moov_len = len(build_moov(0, 0))
    mdat_body = len(ftyp) + moov_len + 8  # +8: mdat box header
    # audio packets first in mdat, then video frames (independent of trak
    # order in moov — offsets are absolute, the demux must not assume)
    a_off = mdat_body
    v_off = mdat_body + a_n * a_size
    moov = build_moov(v_off, a_off)
    assert len(moov) == moov_len
    audio = bytes([(doc_id * 3 + j) % 256 for j in range(a_n * a_size)])
    frames = b"".join(
        bytes([(doc_id + i + j) % 256 for j in range(s)])
        for i, s in enumerate(sizes)
    )
    return ftyp + moov + _box(b"mdat", audio + frames)


def attach_mp4_sample_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc deterministic sample-table-bearing MP4 blobs
    (:func:`_make_mp4_samples` — derived from the id alone; every 3rd doc
    muxes the audio trak first, the real-world order that breaks
    first-trak-wins demuxers). ``text_col`` is accepted for signature
    parity with the other attach fixtures but unused (and therefore
    NULL-safe)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [
                        _make_mp4_samples(int(did), audio_first=did % 3 == 0)
                        for did in pdf[id_col]
                    ],
                    "mime": "video/mp4",
                }
            )

    return df.select(id_col).mapInPandas(op, schema=AVI_PAYLOAD_SCHEMA)


def _mp4_walk(payload: bytes, pos: int, end: int):
    """Box iterator shared by the sample-table parser — same framing rules
    as :func:`decode_mp4_meta` (size-0 to-EOF, size-1 largesize, tiling
    validation)."""
    import struct

    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        size = struct.unpack(">I", payload[pos : pos + 4])[0]
        fourcc = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 0:
            size = end - pos
        elif size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = struct.unpack(">Q", payload[pos + 8 : pos + 16])[0]
            body = pos + 16
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {fourcc!r} size {size} overruns payload")
        yield fourcc, body, pos + size
        pos += size


def _find_box(payload: bytes, pos: int, end: int, path: tuple[bytes, ...]):
    """Descend a fourcc path; returns (body, end) of the first match or
    None."""
    for fourcc, body, bend in _mp4_walk(payload, pos, end):
        if fourcc == path[0]:
            if len(path) == 1:
                return body, bend
            return _find_box(payload, body, bend, path[1:])
    return None


def decode_mp4_frame_table(payload: bytes) -> list[tuple[int, int, int, int, bool]]:
    """REAL sample-table demux: select the VIDEO trak by its hdlr handler
    type ('vide' — trak ORDER is not a selector; real muxers commonly put
    the audio trak first), then decode stts (run-length sample durations →
    per-sample decode time, at the MEDIA timescale from mdhd), stsz
    (per-sample or constant sizes), stsc+stco/co64 (sample→chunk→absolute
    byte offset, 32- or 64-bit chunk offsets — samples are laid out
    back-to-back within a chunk), stss (sync samples; absent table =
    every sample is sync, per ISO 14496-12 §8.6.2), and ctts (composition
    offsets: pts = dts + offset, v0 unsigned / v1 signed per §8.6.1.3 —
    absent table means no B-frame reordering and pts == dts). Payloads
    with no hdlr boxes at all (minimal fixtures) fall back to the first
    trak carrying an stbl. Returns [(frame_idx, pts_ms, byte_offset,
    n_bytes, is_sync)] — exactly what a seek-and-decode frame sampler
    needs, computed without any media decoding.

    Hostile-input containment: every table's entry count is bounded by its
    box's byte extent BEFORE expansion, and run-length sample totals are
    bounded by the payload length (a sample occupies >= 1 byte of mdat, so
    a larger total is corrupt by construction) — a crafted count of
    0xFFFFFFFF raises ValueError instead of allocating multi-GB lists in
    the Arrow worker, so ``errors='skip'`` can actually contain it."""
    import struct

    if not is_mp4(payload):
        raise ValueError("not an ISO BMFF payload (no ftyp)")
    moov = _find_box(payload, 0, len(payload), (b"moov",))
    if moov is None:
        raise ValueError("ISO BMFF payload missing moov")
    candidates: list[tuple[bytes | None, int, int]] = []
    for fourcc, tb, te in _mp4_walk(payload, moov[0], moov[1]):
        if fourcc != b"trak":
            continue
        if _find_box(payload, tb, te, (b"mdia", b"minf", b"stbl")) is None:
            continue
        hdlr = _find_box(payload, tb, te, (b"mdia", b"hdlr"))
        handler = payload[hdlr[0] + 8 : hdlr[0] + 12] if hdlr else None
        candidates.append((handler, tb, te))
    if not candidates:
        raise ValueError("no trak carries a sample table")
    video = [c for c in candidates if c[0] == b"vide"]
    if video:
        chosen = video[0]
    elif all(c[0] is None for c in candidates):
        chosen = candidates[0]  # hdlr-less minimal fixture: first stbl trak
    else:
        raise ValueError(
            f"no video trak: handlers {[c[0] for c in candidates]!r}"
        )
    for _handler, tb, te in [chosen]:
        stbl = _find_box(payload, tb, te, (b"mdia", b"minf", b"stbl"))
        mdhd = _find_box(payload, tb, te, (b"mdia", b"mdhd"))
        if mdhd is None:
            raise ValueError("trak with stbl but no mdhd")
        version = payload[mdhd[0]]
        if version == 1:
            media_ts = struct.unpack(">I", payload[mdhd[0] + 20 : mdhd[0] + 24])[0]
        else:
            media_ts = struct.unpack(">I", payload[mdhd[0] + 12 : mdhd[0] + 16])[0]
        if media_ts == 0:
            raise ValueError("mdhd timescale is 0")
        tables: dict[bytes, tuple[int, int]] = {}
        for bf, bb, be in _mp4_walk(payload, stbl[0], stbl[1]):
            tables[bf] = (bb, be)
        for req in (b"stts", b"stsz", b"stsc"):
            if req not in tables:
                raise ValueError(f"stbl missing {req!r}")
        if b"stco" not in tables and b"co64" not in tables:
            raise ValueError("stbl missing chunk offsets (stco/co64)")

        def full_box(name: bytes) -> int:
            return tables[name][0] + 4  # skip version+flags

        def check_extent(name: bytes, cursor: int, n: int, width: int) -> None:
            # bound a declared entry count by its box's remaining bytes
            # BEFORE any expansion: raw uint32 counts from a corrupt payload
            # must raise (containable), never size an allocation
            avail = tables[name][1] - cursor
            if n * width > avail:
                raise ValueError(
                    f"{name!r} declares {n} entries ({n * width} bytes) but "
                    f"its box holds only {avail}"
                )

        # a real sample occupies at least one byte of mdat: a run-length
        # total beyond the payload length is corrupt, not merely large
        max_samples = len(payload)
        # stts: per-sample durations
        p = full_box(b"stts")
        n_runs = struct.unpack(">I", payload[p : p + 4])[0]
        q = p + 4
        check_extent(b"stts", q, n_runs, 8)
        durations: list[int] = []
        for _ in range(n_runs):
            cnt, delta = struct.unpack(">2I", payload[q : q + 8])
            if len(durations) + cnt > max_samples:
                raise ValueError(
                    f"stts sample total exceeds payload size {max_samples}"
                )
            durations.extend([delta] * cnt)
            q += 8
        # stsz: sizes (constant or per-sample)
        p = full_box(b"stsz")
        const_size, n_samples = struct.unpack(">2I", payload[p : p + 8])
        if n_samples != len(durations):
            # also the bound for the const-size expansion below: stts total
            # is already capped at max_samples
            raise ValueError(
                f"stsz sample count {n_samples} != stts total {len(durations)}"
            )
        if const_size:
            sizes = [const_size] * n_samples
        else:
            check_extent(b"stsz", p + 8, n_samples, 4)
            sizes = list(
                struct.unpack(f">{n_samples}I", payload[p + 8 : p + 8 + 4 * n_samples])
            )
        # stsc: runs of (first_chunk, samples_per_chunk); stco: chunk offsets
        p = full_box(b"stsc")
        n_sc = struct.unpack(">I", payload[p : p + 4])[0]
        check_extent(b"stsc", p + 4, n_sc, 12)
        sc = [
            struct.unpack(">3I", payload[p + 4 + 12 * i : p + 16 + 12 * i])
            for i in range(n_sc)
        ]
        off_box, off_fmt, off_w = (
            (b"stco", "I", 4) if b"stco" in tables else (b"co64", "Q", 8)
        )
        p = full_box(off_box)
        n_chunks = struct.unpack(">I", payload[p : p + 4])[0]
        check_extent(off_box, p + 4, n_chunks, off_w)
        chunk_offs = list(
            struct.unpack(
                f">{n_chunks}{off_fmt}",
                payload[p + 4 : p + 4 + off_w * n_chunks],
            )
        )
        # expand sample→chunk: stsc entry i applies from first_chunk_i to
        # first_chunk_{i+1}-1 (1-based), last entry to the last chunk
        per_chunk: list[int] = []
        for i, (first, spc, _desc) in enumerate(sc):
            last = sc[i + 1][0] - 1 if i + 1 < len(sc) else n_chunks
            per_chunk.extend([spc] * (last - first + 1))
        if sum(per_chunk) != n_samples:
            raise ValueError("stsc/stco chunking does not cover all samples")
        # stss: sync samples (1-based); absent = all sync
        if b"stss" in tables:
            p = full_box(b"stss")
            n_sync = struct.unpack(">I", payload[p : p + 4])[0]
            check_extent(b"stss", p + 4, n_sync, 4)
            sync = set(struct.unpack(f">{n_sync}I", payload[p + 4 : p + 4 + 4 * n_sync]))
        else:
            sync = None
        # ctts: per-sample composition offsets (pts = dts + offset); v0
        # carries unsigned offsets, v1 signed (ISO 14496-12 §8.6.1.3);
        # absent = no B-frame reordering, pts == dts
        comp: list[int] | None = None
        if b"ctts" in tables:
            ver = payload[tables[b"ctts"][0]]
            p = full_box(b"ctts")
            n_ct = struct.unpack(">I", payload[p : p + 4])[0]
            q = p + 4
            check_extent(b"ctts", q, n_ct, 8)
            fmt = ">Ii" if ver == 1 else ">II"
            comp = []
            for _ in range(n_ct):
                cnt, coff = struct.unpack(fmt, payload[q : q + 8])
                if len(comp) + cnt > n_samples:
                    raise ValueError("ctts covers more samples than stsz declares")
                comp.extend([coff] * cnt)
                q += 8
            if len(comp) != n_samples:
                raise ValueError(
                    f"ctts covers {len(comp)} samples, stsz declares {n_samples}"
                )
        out: list[tuple[int, int, int, int, bool]] = []
        idx = 0
        dts = 0
        for chunk_i, spc in enumerate(per_chunk):
            off = chunk_offs[chunk_i]
            for _ in range(spc):
                cts = dts if comp is None else dts + comp[idx]
                out.append(
                    (
                        idx,
                        cts * 1000 // media_ts,
                        off,
                        sizes[idx],
                        True if sync is None else (idx + 1) in sync,
                    )
                )
                off += sizes[idx]
                dts += durations[idx]
                idx += 1
        return out
    raise AssertionError("unreachable: chosen trak always present")


def mp4_frame_index(
    binary_df: DataFrame, *, every: int = 1, errors: str = "fail"
) -> DataFrame:
    """Frame index over sample-table MP4 payloads: one row per (sampled)
    frame with its presentation time and exact byte extent — the
    seek-table a distributed frame extractor partitions work by, computed
    WITHOUT decoding any media. ``every`` keeps frames with
    ``frame_idx % every == 0`` (uniform temporal subsampling);
    ``errors='skip'`` drops undecodable payloads (the multimodal error
    vocabulary).

    Scale: Arrow-batched mapInPandas over (id, payload); output rows are
    five scalars per frame — the payload bytes never fan out (compare
    :func:`sample_video_frames`, which slices the frames out)."""
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")
    if errors not in ("fail", "skip"):
        raise ValueError(f"errors must be fail|skip, got {errors!r}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    table = decode_mp4_frame_table(bytes(payload))
                except (ValueError, IndexError, _struct.error):
                    if errors == "fail":
                        raise
                    continue
                rows.extend(
                    (int(did), i, pts, off, nb, sync)
                    for i, pts, off, nb, sync in table
                    if i % every == 0
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "pts_ms", "byte_offset", "n_bytes",
                    "is_sync",
                ],
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        op, schema=FRAME_INDEX_SCHEMA
    )


def sample_video_frames(
    binary_df: DataFrame, *, every: int = 5, sync_only: bool = False
) -> DataFrame:
    """Slice sampled frame payloads out of sample-table MP4s: the decode
    input a downstream image model consumes (the actual pixel decode is the
    consumer's codec — this engine hands over exact frame byte ranges, the
    same boundary as the reference's opaque-payload convention).
    ``sync_only=True`` keeps only sync (key) frames — the frames a seeking
    decoder can start from."""
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                for i, pts, off, nb, sync in decode_mp4_frame_table(buf):
                    if i % every or (sync_only and not sync):
                        continue
                    rows.append((int(did), i, pts, buf[off : off + nb]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "pts_ms", "frame"]
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        op, schema=VIDEO_FRAME_SCHEMA
    )
