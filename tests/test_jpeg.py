"""Baseline-JFIF codec tests: a hand-built single-block bitstream pinned
byte-by-byte (Huffman -> extend -> dequant -> IDCT checked against hand
arithmetic), lossy-roundtrip error bounds, subset error paths, and the
decode_image operator integration."""

import struct

import numpy as np
import pytest

from sbustreamspot_core_spark.functions.jpeg import (
    ZIGZAG,
    JpegFormatError,
    jpeg_decode,
    jpeg_encode,
)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _hand_built_jpeg() -> bytes:
    """8x8 grayscale, one block, DC-only: quant[0]=16, DC Huffman table has
    the single symbol {category 2} (code '0', length 1), AC table the single
    symbol {EOB} (code '0', length 1).  Entropy bits: DC code '0', magnitude
    '11' (=3 -> extend(3,2)=3), AC EOB '0' -> 0b0110 + 1-padding = 0x6F."""
    qt = bytes([16] * 64)
    dqt = _seg(0xDB, bytes([0x00]) + qt)
    sof = _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht_dc = _seg(0xC4, bytes([0x00, 1] + [0] * 15) + bytes([2]))
    dht_ac = _seg(0xC4, bytes([0x10, 1] + [0] * 15) + bytes([0x00]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
            + bytes([0x6F]) + b"\xff\xd9")


def test_hand_built_single_block_exact():
    # DC coefficient = extend(0b11, 2) * quant 16 = 48; a DC-only block
    # under the orthonormal IDCT is constant 48/8 = 6 -> level-shift 134
    out = jpeg_decode(_hand_built_jpeg())
    assert out.shape == (8, 8)
    assert np.all(out == 134)


def test_constant_gray_is_exact():
    # constant 128 -> zero-mean block -> every coefficient 0 -> exact
    x = np.full((16, 24), 128, dtype=np.uint8)
    assert np.array_equal(jpeg_decode(jpeg_encode(x, quality=90)), x)


def test_roundtrip_error_bounds():
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:40, 0:56]
    x = np.zeros((40, 56, 3))
    x[..., 0] = (yy * 3 + xx * 2) % 256
    x[..., 1] = (yy * 5) % 256
    x[..., 2] = (xx * 4) % 256
    x = np.clip(x + rng.normal(0, 4, x.shape), 0, 255).astype(np.uint8)
    for q, sub, bound in [(95, 1, 4.0), (90, 1, 4.0), (75, 2, 6.0),
                          (95, 2, 5.0)]:
        out = jpeg_decode(jpeg_encode(x, quality=q, subsample=sub))
        assert out.shape == x.shape
        mae = np.abs(out.astype(float) - x.astype(float)).mean()
        assert mae <= bound, (q, sub, mae)
    # odd (non-multiple-of-16) dims survive both subsampling modes
    x2 = x[:37, :53]
    for sub in (1, 2):
        out = jpeg_decode(jpeg_encode(x2, quality=90, subsample=sub))
        assert out.shape == x2.shape
    # grayscale
    g = np.clip(yy * 4 + rng.normal(0, 3, (40, 56)), 0, 255).astype(np.uint8)
    og = jpeg_decode(jpeg_encode(g, quality=92))
    assert og.shape == g.shape
    assert np.abs(og.astype(float) - g.astype(float)).mean() <= 4.0


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot-pins (T.81 figure 5)
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[63] == 63 and ZIGZAG[33] == 42 and ZIGZAG[35] == 56


def test_error_paths():
    with pytest.raises(JpegFormatError):
        jpeg_decode(b"notajpeg")
    good = jpeg_encode(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(JpegFormatError):
        jpeg_decode(good[:20])                    # truncated mid-segment
    # progressive SOF2 is out of subset
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError):
        jpeg_decode(prog)
    # malformed segment BODIES must surface as JpegFormatError, not
    # struct.error/IndexError/ValueError (documented contract): SOF with a
    # short body, and a DQT shorter than its declared table
    with pytest.raises(JpegFormatError):
        jpeg_decode(b"\xff\xd8\xff\xc0\x00\x03\x08\xff\xd9")
    with pytest.raises(JpegFormatError):
        jpeg_decode(b"\xff\xd8\xff\xdb\x00\x06\x00\x01\x02\x03\xff\xd9")


def test_fill_bytes_before_marker():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    good = jpeg_encode(np.full((8, 8), 77, dtype=np.uint8), quality=90)
    assert b"\xff\xdb" in good
    padded = good.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
    out = jpeg_decode(padded)
    assert np.array_equal(out, jpeg_decode(good))


def test_non_interleaved_scans():
    # one component per SOS (legal baseline layout): planes must persist
    # across scans and the per-scan block grid is the component's own
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:24, 0:40]
    x = np.zeros((24, 40, 3))
    x[..., 0] = (yy * 3 + xx * 2) % 256
    x[..., 1] = (yy * 5) % 256
    x[..., 2] = (xx * 4) % 256
    x = np.clip(x + rng.normal(0, 3, x.shape), 0, 255).astype(np.uint8)
    ni = jpeg_encode(x, quality=92, interleaved=False)
    il = jpeg_encode(x, quality=92, interleaved=True)
    assert ni.count(b"\xff\xda") == 3 and il.count(b"\xff\xda") == 1
    out_ni = jpeg_decode(ni)
    # same quantized blocks, different scan layout -> identical decode
    assert np.array_equal(out_ni, jpeg_decode(il))
    assert np.abs(out_ni.astype(float) - x.astype(float)).mean() <= 4.0
    with pytest.raises(ValueError):
        jpeg_encode(x, subsample=2, interleaved=False)


def test_decode_image_operator_jpeg(spark):
    from sbustreamspot_core_spark.operators.multimodal import decode_image
    rng = np.random.default_rng(3)
    arrs = {i: np.clip(np.mgrid[0:17, 0:21][0] * (i + 3)
                       + rng.normal(0, 3, (17, 21)), 0, 255).astype(np.uint8)
            for i in range(4)}
    rows = [(i, bytearray(jpeg_encode(a, quality=92)))
            for i, a in arrs.items()]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in decode_image(df).collect()}
    assert len(out) == 4
    for i, a in arrs.items():
        r = out[i]
        assert (r.height, r.width, r.channels) == (17, 21, 1)
        dec = np.frombuffer(bytes(r.pixels), dtype=np.uint8).astype(float)
        assert np.abs(dec - a.astype(float).ravel()).mean() <= 4.0
