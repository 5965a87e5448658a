"""Round-17 seams: the widened PNG envelope.

Round 15 landed an 8-bit-truecolor-only decoder; round 17 completes the
format — every spec-legal (color type, bit depth) combination plus
Adam7 interlacing decodes, so the ``NotImplementedError`` arm shrinks
to the one genuine envelope limit (the raster-size cap) and JPEG
remains the only documented codec gap. The matrix below hand-builds
foreign-style files (zlib deflate, per-pass filtering, MSB-first
sub-byte packing, big-endian 16-bit) straight from the spec — never
from the repo's own encoder — so decode correctness is pinned against
the FORMAT, not against a round-trip.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from reddit_data_engineering_project_spark.operators.multimodal import (
    _ADAM7,
    classify_media,
    decode_png,
)

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(t: bytes, d: bytes) -> bytes:
    return (
        struct.pack(">I", len(d))
        + t
        + d
        + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
    )


def _pack_row(samples: np.ndarray, depth: int) -> bytes:
    """One scanline's samples -> filtered-stream bytes per spec §7.2:
    MSB-first packing for sub-byte depths, big-endian for 16-bit."""
    if depth == 8:
        return samples.astype(np.uint8).tobytes()
    if depth == 16:
        return samples.astype(">u2").tobytes()
    bits = np.zeros(samples.size * depth, dtype=np.uint8)
    for i, v in enumerate(samples.tolist()):
        for b in range(depth):
            bits[i * depth + b] = (v >> (depth - 1 - b)) & 1
    return np.packbits(bits).tobytes()


def _build_png(
    samples: np.ndarray,
    depth: int,
    ctype: int,
    interlace: int = 0,
    plte: bytes | None = None,
) -> bytes:
    """Hand-build a spec-conformant PNG from an (h, w, C) sample grid
    (palette indices for color type 3), filter 0 on every scanline."""
    h, w, _ = samples.shape
    if interlace == 0:
        passes = [samples]
    else:
        passes = [
            samples[y0::dy, x0::dx]
            for x0, y0, dx, dy in _ADAM7
            if samples[y0::dy, x0::dx].size
        ]
    raster = bytearray()
    for sub in passes:
        for row in sub:
            raster += b"\x00" + _pack_row(row.reshape(-1), depth)
    out = _SIG + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    )
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(bytes(raster), 6))
    out += _chunk(b"IEND", b"")
    return out


#: Every spec-legal (color type, depth) pair (PNG spec Table 11.1).
_LEGAL = [
    (0, 1), (0, 2), (0, 4), (0, 8), (0, 16),
    (2, 8), (2, 16),
    (3, 1), (3, 2), (3, 4), (3, 8),
    (4, 8), (4, 16),
    (6, 8), (6, 16),
]


@pytest.mark.parametrize("ctype,depth", _LEGAL)
@pytest.mark.parametrize("interlace", [0, 1])
def test_every_spec_legal_shape_decodes(ctype, depth, interlace):
    rng = np.random.default_rng(ctype * 100 + depth + interlace)
    h, w, c = 11, 13, _CHANNELS[ctype]  # odd dims exercise Adam7 edges
    hi = (1 << depth) - 1
    plte = None
    if ctype == 3:
        n_pal = min(1 << depth, 256)
        plte = rng.integers(0, 256, (n_pal, 3), dtype=np.uint8).tobytes()
        samples = rng.integers(0, n_pal, (h, w, c), dtype=np.uint16)
    else:
        samples = rng.integers(0, hi + 1, (h, w, c), dtype=np.uint16)
    png = _build_png(samples, depth, ctype, interlace, plte)
    got = decode_png(png)
    if ctype == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        expected = pal[samples[:, :, 0]]
        assert got.dtype == np.uint8
    elif depth < 8:
        expected = (samples * (255 // hi)).astype(np.uint8)
        assert got.dtype == np.uint8
    elif depth == 16:
        expected = samples
        assert got.dtype == np.uint16
    else:
        expected = samples.astype(np.uint8)
        assert got.dtype == np.uint8
    assert got.shape == expected.shape
    assert (got == expected).all()


def test_adam7_tiny_images_skip_empty_passes():
    """1x1 and 2x1 interlaced images: five of the seven Adam7 passes
    are EMPTY and must be wholly absent from the raster (spec §8.2) —
    the off-by-one a pass loop gets wrong first."""
    for h, w in ((1, 1), (1, 2), (2, 1), (3, 3)):
        samples = np.arange(h * w * 3, dtype=np.uint16).reshape(
            h, w, 3
        ) % 256
        png = _build_png(samples, 8, 2, interlace=1)
        assert (decode_png(png) == samples.astype(np.uint8)).all()


def test_interlaced_matches_non_interlaced():
    rng = np.random.default_rng(42)
    samples = rng.integers(0, 256, (16, 9, 3), dtype=np.uint16)
    plain = decode_png(_build_png(samples, 8, 2, interlace=0))
    adam7 = decode_png(_build_png(samples, 8, 2, interlace=1))
    assert (plain == adam7).all()


def test_filtered_interlaced_16bit():
    """Non-zero filters inside an interlaced 16-bit image: Sub/Up over
    2-byte-per-sample rows with the per-pass previous-row reset."""
    rng = np.random.default_rng(9)
    h, w = 10, 7
    samples = rng.integers(0, 1 << 16, (h, w, 3), dtype=np.uint16)
    # build with filter 1 (Sub) on every scanline of every pass
    passes = [
        samples[y0::dy, x0::dx]
        for x0, y0, dx, dy in _ADAM7
        if samples[y0::dy, x0::dx].size
    ]
    bpp = 6
    raster = bytearray()
    for sub in passes:
        for row in sub:
            line = np.frombuffer(
                row.reshape(-1).astype(">u2").tobytes(), dtype=np.uint8
            ).astype(np.int64)
            filt = np.zeros(len(line), dtype=np.int64)
            for x in range(len(line)):
                left = line[x - bpp] if x >= bpp else 0
                filt[x] = (line[x] - left) & 0xFF
            raster += b"\x01" + bytes(filt.astype(np.uint8))
    png = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 1))
        + _chunk(b"IDAT", zlib.compress(bytes(raster), 6))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(png) == samples).all()


def test_palette_structural_errors_are_value_errors():
    samples = np.zeros((2, 2, 1), dtype=np.uint16)
    # missing PLTE for color type 3
    png = _build_png(samples, 8, 3, plte=None)
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(png)
    # out-of-range palette index
    idx = np.full((2, 2, 1), 3, dtype=np.uint16)
    png = _build_png(idx, 8, 3, plte=b"\x01\x02\x03" * 2)
    with pytest.raises(ValueError, match="palette index"):
        decode_png(png)
    # invalid PLTE length (not a multiple of 3)
    bad = _SIG + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    ) + _chunk(b"PLTE", b"\x00\x01") + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="PLTE length"):
        decode_png(bad)


def test_illegal_depth_combination_is_value_error():
    """depth 4 truecolor is spec-ILLEGAL — corrupt bytes (ValueError
    quarantine), not an envelope limitation."""
    bad = _SIG + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    ) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="illegal"):
        decode_png(bad)
    img, status, err = classify_media(bad, "image/png")
    assert (img, status, err) == (None, "quarantined", "value_error")


def test_wrong_raster_size_still_caught_per_shape():
    """The bounded-inflate contract survives the widened envelope: a
    grayscale 4-bit image whose IDAT inflates one byte past the
    per-shape expected raster quarantines as ValueError."""
    samples = np.ones((3, 5, 1), dtype=np.uint16)
    png = _build_png(samples, 4, 0)
    # rebuild with one extra raster byte
    raster = bytearray()
    for row in samples:
        raster += b"\x00" + _pack_row(row.reshape(-1), 4)
    raster += b"\x00"
    bad = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 3, 4, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(raster)))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(png).shape == (3, 5, 1)
    with pytest.raises(ValueError, match="past the declared raster"):
        decode_png(bad)


# ---------------------------------------------------------------------------
# Baseline JPEG codec (round 17: the last documented codec gap closes)
# ---------------------------------------------------------------------------

from reddit_data_engineering_project_spark.operators.jpeg import (  # noqa: E402
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _jseg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


class _TestBits:
    """Minimal MSB-first bit writer with JPEG byte stuffing — test-side
    twin so the hand-built streams never touch the repo's encoder."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.put(1, 1)


def _trivial_tables() -> bytes:
    """DHT pair: DC codes 00->cat5, 01->cat0; AC code 0->EOB."""
    dc = _jseg(0xC4, bytes([0x00]) + bytes([0, 2] + [0] * 14) + bytes([5, 0]))
    ac = _jseg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
    return dc + ac


def _ones_dqt(tq: int = 0) -> bytes:
    return _jseg(0xDB, bytes([tq]) + bytes([1] * 64))


class TestJpegCodec:
    def test_hand_built_foreign_stream_exact(self):
        """A fully hand-built 8x8 grayscale stream: quant all-ones,
        one-symbol Huffman tables, DC coefficient 16 -> every pixel
        exactly 130 (16/8 + 128). Pins the decoder against the FORMAT
        (marker layout, Annex C code generation, zigzag, extend, IDCT
        DC path) with zero dependence on the repo's encoder."""
        bits = _TestBits()
        bits.put(0b00, 2)       # DC symbol: category 5
        bits.put(16, 5)         # DC value 16
        bits.put(0, 1)          # AC EOB
        bits.pad()
        payload = (
            b"\xff\xd8"
            + _ones_dqt()
            + _jseg(0xC0, bytes([8]) + (8).to_bytes(2, "big") * 2
                    + bytes([1, 1, 0x11, 0]))
            + _trivial_tables()
            + _jseg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + bytes(bits.out)
            + b"\xff\xd9"
        )
        img = decode_jpeg(payload)
        assert img.shape == (8, 8, 1)
        assert (img == 130).all()

    def test_restart_markers_reset_dc_prediction(self):
        """DRI=1 with two MCUs: the stream pads to a byte, emits RST0,
        and the second MCU's DC predictor restarts from zero — both
        blocks decode to the same 130 even though a predictor carried
        across the restart would halve the second."""
        mcu = _TestBits()
        mcu.put(0b00, 2)
        mcu.put(16, 5)
        mcu.put(0, 1)
        mcu.pad()
        one = bytes(mcu.out)
        payload = (
            b"\xff\xd8"
            + _ones_dqt()
            + _jseg(0xDD, (1).to_bytes(2, "big"))  # DRI = 1 MCU
            + _jseg(0xC0, bytes([8]) + (8).to_bytes(2, "big")
                    + (16).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
            + _trivial_tables()
            + _jseg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + one + b"\xff\xd0" + one
            + b"\xff\xd9"
        )
        img = decode_jpeg(payload)
        assert img.shape == (8, 16, 1)
        assert (img == 130).all()

    def test_hand_built_420_chroma_subsampling(self):
        """4:2:0 MCU structure hand-built: four flat Y blocks + one Cb
        + one Cr (DC diff 0 -> neutral 128 chroma), decoding to a flat
        gray 16x16 RGB image — pins MCU block order, per-component
        sampling geometry, and the chroma upsample."""
        bits = _TestBits()
        bits.put(0b00, 2); bits.put(16, 5); bits.put(0, 1)  # Y block 1
        for _ in range(3):                                   # Y 2-4: diff 0
            bits.put(0b01, 2); bits.put(0, 1)
        for _ in range(2):                                   # Cb, Cr: diff 0
            bits.put(0b01, 2); bits.put(0, 1)
        bits.pad()
        sof = bytes([8]) + (16).to_bytes(2, "big") * 2 + bytes(
            [3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]
        )
        sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
        payload = (
            b"\xff\xd8"
            + _ones_dqt()
            + _jseg(0xC0, sof)
            + _trivial_tables()
            + _jseg(0xDA, sos)
            + bytes(bits.out)
            + b"\xff\xd9"
        )
        img = decode_jpeg(payload)
        assert img.shape == (16, 16, 3)
        # Y=130, Cb=Cr=128 -> R=G=B=130
        assert (img == 130).all()

    def test_roundtrip_flat_color(self):
        import numpy as np

        px = np.full((24, 17, 3), 0, dtype=np.uint8)
        px[:, :, 0] = 200
        px[:, :, 1] = 90
        px[:, :, 2] = 35
        got = decode_jpeg(encode_jpeg(px, quality=90))
        assert got.shape == px.shape
        assert int(np.abs(got.astype(int) - px.astype(int)).max()) <= 2

    def test_roundtrip_gradient_high_quality(self):
        import numpy as np

        y, x = np.mgrid[0:32, 0:40]
        px = np.stack(
            [(y * 3) % 256, (x * 2) % 256, ((x + y) * 2) % 256], axis=2
        ).astype(np.uint8)
        # smooth content at quality 100 (near-all-ones quant): small error
        got = decode_jpeg(encode_jpeg(px, quality=100))
        err = np.abs(got.astype(int) - px.astype(int))
        assert float(err.mean()) < 1.5 and int(err.max()) <= 12

    def test_roundtrip_grayscale(self):
        import numpy as np

        rng = np.random.default_rng(5)
        smooth = np.cumsum(
            rng.integers(-2, 3, (16, 16)), axis=1
        ).astype(np.float64)
        px = np.clip(smooth + 128, 0, 255).astype(np.uint8)[:, :, None]
        got = decode_jpeg(encode_jpeg(px, quality=100))
        assert got.shape == px.shape
        assert int(np.abs(got.astype(int) - px.astype(int)).max()) <= 4

    def test_structural_errors_quarantine(self):
        import numpy as np

        good = encode_jpeg(np.full((8, 8, 1), 99, dtype=np.uint8))
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x00\x00" + good[2:])
        with pytest.raises(ValueError):
            decode_jpeg(good[:-20])  # torn entropy data / missing EOI
        # progressive SOF2 is an envelope limit, not corruption
        prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
        with pytest.raises(NotImplementedError, match="progressive"):
            decode_jpeg(prog)

    def test_annex_k_tables_self_consistent(self):
        """The embedded Annex K specs satisfy the DHT invariant and the
        encoder's streams decode with tables READ FROM THE FILE — a
        transcription error in any bits/values pair would break the
        decode, not silently skew it."""
        import numpy as np

        px = (np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3) * 3) % 256
        got = decode_jpeg(encode_jpeg(px.astype(np.uint8), quality=95))
        assert got.shape == (8, 8, 3)

    def test_zigzag_is_a_permutation(self):
        assert sorted(_ZIGZAG) == list(range(64))
