"""Pure-stdlib PNG codec + real-image-decode branch of the multimodal ops."""

from __future__ import annotations

import zlib

import pytest

from debezium_connector_vitess_spark.ops.png import (
    PNG_MAGIC,
    decode_png,
    encode_png,
    is_png,
    parse_ihdr,
    resize_nearest,
)


def gradient(w, h, ch):
    return bytes(((x * 31 + y * 17 + c * 7) % 256) for y in range(h) for x in range(w) for c in range(ch))


class TestCodec:
    @pytest.mark.parametrize("ch", [1, 3, 4])
    def test_round_trip(self, ch):
        px = gradient(13, 9, ch)
        payload = encode_png(13, 9, px, channels=ch)
        assert is_png(payload)
        assert parse_ihdr(payload) == (13, 9, ch)
        w, h, c, out = decode_png(payload)
        assert (w, h, c) == (13, 9, ch)
        assert out == px

    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    def test_all_filter_types_decode(self, ft):
        """The encoder can force each PNG filter; the decoder must undo all
        five (None/Sub/Up/Average/Paeth)."""
        px = gradient(16, 8, 3)
        payload = encode_png(16, 8, px, channels=3, filter_type=ft)
        assert decode_png(payload)[3] == px

    def test_external_png_shape(self):
        """Chunk layout is standards-valid: signature, IHDR first, IEND last,
        CRCs correct."""
        payload = encode_png(4, 4, bytes(48), channels=3)
        assert payload[:8] == PNG_MAGIC
        assert payload[12:16] == b"IHDR"
        assert payload[-8:-4] == b"IEND"
        # IDAT CRC check
        import struct

        off = 8
        while off < len(payload):
            length, tag = struct.unpack(">I4s", payload[off : off + 8])
            body = payload[off + 8 : off + 8 + length]
            crc = struct.unpack(">I", payload[off + 8 + length : off + 12 + length])[0]
            assert crc == zlib.crc32(tag + body) & 0xFFFFFFFF
            off += 12 + length

    def test_not_png_raises(self):
        with pytest.raises(ValueError, match="bad signature"):
            parse_ihdr(b"JFIF....")
        assert not is_png(b"plain text")

    def test_truncated_idat_raises(self):
        payload = bytearray(encode_png(6, 6, gradient(6, 6, 3), channels=3))
        # corrupt the zlib stream length expectation by lying about height
        import struct

        bad = payload[:16] + struct.pack(">II", 6, 7) + payload[24:]
        with pytest.raises((ValueError, zlib.error)):
            decode_png(bytes(bad))

    def test_resize_nearest(self):
        # 2x2 checkerboard upsampled to 4x4 keeps quadrant colors
        px = bytes([255, 0, 0, 0, 0, 255, 0, 0, 255, 255, 0, 0])  # RGB 2x2
        big = resize_nearest(px, 2, 2, 3, 4, 4)
        assert len(big) == 4 * 4 * 3
        assert big[0:3] == bytes([255, 0, 0])  # top-left quadrant
        assert big[(3 * 4 + 3) * 3 : (3 * 4 + 3) * 3 + 3] == bytes([255, 0, 0])


class TestMultimodalRealDecode:
    def test_decode_image_dims_png_branch(self):
        from debezium_connector_vitess_spark.ops.multimodal import decode_image_dims

        payload = encode_png(21, 14, gradient(21, 14, 3), channels=3)
        assert decode_image_dims(payload) == (21, 14, 3)
        # non-image payload falls back to the deterministic fake
        assert decode_image_dims(b"x" * 10) == (64 + 10, 64 + 5, 3)

    def test_resize_image_payload_real(self):
        from debezium_connector_vitess_spark.ops.multimodal import resize_image_payload

        payload = encode_png(20, 10, gradient(20, 10, 3), channels=3)
        out = resize_image_payload(payload, 8, 8)
        assert parse_ihdr(out) == (8, 8, 3)
        # non-PNG passes through
        assert resize_image_payload(b"nope", 8, 8) == b"nope"

    def test_png_metadata_query_end_to_end(self, spark, sf_dir):
        """Real PNG payloads generated per doc; extractor reads actual IHDR."""
        import sys

        sys.path.insert(0, "tests")
        from oracle_harness import compare

        from debezium_connector_vitess_spark import registry

        df = registry.QUERIES["multimodal_metadata"](spark, sf_dir)
        compare(df, registry.ORACLES["multimodal_metadata"], sf_dir)
