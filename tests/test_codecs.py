"""Pure-stdlib codec layer (functions/codecs.py): PNG decode/encode and
WAV/PCM, plus the real (non-fake) multimodal operator paths."""

import hashlib
import struct
import zlib
from binascii import crc32

import numpy as np
import pytest
from pyspark.sql import functions as F

from sbustreamspot_core_spark.functions.codecs import (
    PngFormatError,
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)
from sbustreamspot_core_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    sample_frames,
)


def _manual_png(width, height, color_type, raw_scanlines):
    """Build a PNG byte stream directly from the spec (struct + zlib only),
    independent of png_encode, so the decoder is pinned against hand-built
    input, not just our own encoder."""
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF))
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw_scanlines))
            + chunk(b"IEND", b""))


def test_png_decode_hand_built_filters():
    # 3x2 grayscale, hand-computed reconstructions for each filter type
    # row 0: filter 1 (Sub), raw 10,5,7 -> recon 10,15,22
    # row 1: filter 2 (Up),  raw 1,2,3  -> recon 11,17,25
    raw = bytes([1, 10, 5, 7]) + bytes([2, 1, 2, 3])
    img = png_decode(_manual_png(3, 2, 0, raw))
    assert img.shape == (2, 3, 1)
    assert img[:, :, 0].tolist() == [[10, 15, 22], [11, 17, 25]]

    # Average: row0 filter 0 recon 4,8; row1 filter 3 raw 10,10
    #   x0: 10 + (0+4)//2 = 12 ; x1: 10 + (12+8)//2 = 20
    raw = bytes([0, 4, 8]) + bytes([3, 10, 10])
    img = png_decode(_manual_png(2, 2, 0, raw))
    assert img[:, :, 0].tolist() == [[4, 8], [12, 20]]

    # Paeth: row0 filter 0 recon 3,9; row1 filter 4 raw 5,5
    #   x0: a=0,b=3,c=0 -> p=3 pa=3 pb=0 -> pred b=3 -> 8
    #   x1: a=8,b=9,c=3 -> p=14 pa=6 pb=5 pc=11 -> pred b=9 -> 14
    raw = bytes([0, 3, 9]) + bytes([4, 5, 5])
    img = png_decode(_manual_png(2, 2, 0, raw))
    assert img[:, :, 0].tolist() == [[3, 9], [8, 14]]


def test_png_roundtrip_all_color_types_and_filters():
    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(11, 6, c), dtype=np.uint8)
        filters = [y % 5 for y in range(11)]
        assert np.array_equal(png_decode(png_encode(arr, filters)), arr)
        # wraparound-heavy content (all-255 / all-0 alternating rows)
        arr2 = np.tile(
            np.array([255, 0], dtype=np.uint8)[:, None, None], (5, 3, c))
        assert np.array_equal(
            png_decode(png_encode(arr2, [4] * 10)), arr2)


def test_png_errors():
    with pytest.raises(PngFormatError):
        png_decode(b"notapng")
    good = png_encode(np.zeros((2, 2), dtype=np.uint8))
    # corrupt one IDAT byte -> CRC failure
    bad = bytearray(good)
    bad[41] ^= 0xFF
    with pytest.raises(PngFormatError):
        png_decode(bytes(bad))
    # palette color type is out of subset
    raw = bytes([0, 0])
    with pytest.raises(NotImplementedError):
        png_decode(_manual_png(1, 1, 3, raw))
    # input truncated INSIDE a chunk's trailing CRC field (body fully
    # present, CRC bytes short) must raise the documented PngFormatError,
    # not struct.error
    with pytest.raises(PngFormatError):
        png_decode(good[:-2])


def test_wav_roundtrip_and_subset():
    rng = np.random.default_rng(3)
    pcm = rng.integers(-32768, 32768, size=(500, 2)).astype("<i2")
    rate, out = wav_decode(wav_encode(44100, pcm))
    assert rate == 44100 and np.array_equal(out, pcm)
    mono = rng.integers(-32768, 32768, size=301).astype("<i2")
    rate, out = wav_decode(wav_encode(8000, mono))
    assert out.shape == (301, 1) and np.array_equal(out[:, 0], mono)


def test_decode_image_spark_real_path(spark):
    # distributed PNG decode over the committed fixture == the expected
    # source-array dims/md5 computed BEFORE encoding
    imgs = spark.read.parquet("/root/repo/fixtures/png_expected.parquet")
    got = decode_image(imgs.select("id", "payload")).withColumn(
        "got_md5", F.md5("pixels")).drop("pixels")
    joined = got.join(
        imgs.select("id", F.col("width").alias("ew"),
                    F.col("height").alias("eh"),
                    F.col("channels").alias("ec"), "pixel_md5"), "id")
    rows = joined.collect()
    assert len(rows) == 24
    for r in rows:
        assert (r.width, r.height, r.channels) == (r.ew, r.eh, r.ec)
        assert r.got_md5 == r.pixel_md5
    # non-PNG payload on the real path raises cleanly
    bad = spark.createDataFrame([(1, bytearray(b"GIF89a...."))],
                                "id long, payload binary")
    with pytest.raises(Exception, match="no codec for format"):
        decode_image(bad).collect()


def test_decode_audio_and_sample_frames_spark(spark):
    wavs = spark.read.parquet("/root/repo/fixtures/wav_expected.parquet")
    got = decode_audio(wavs.select("id", "payload")).withColumn(
        "got_md5", F.md5("pcm"))
    joined = {r.id: r for r in got.join(
        wavs.select("id", F.col("sample_rate").alias("er"),
                    F.col("n_frames").alias("en"),
                    F.col("channels").alias("ec"), "pcm_md5"),
        "id").collect()}
    assert len(joined) == 8
    for r in joined.values():
        assert (r.sample_rate, r.n_frames, r.channels) == (r.er, r.en, r.ec)
        assert r.got_md5 == r.pcm_md5

    # real frame sampling: every 2nd 1024-sample block, local replica oracle
    frames = sample_frames(wavs.select("id", "payload"), every_n=2).collect()
    local = {r.id: wav_decode(bytes(r.payload))
             for r in wavs.select("id", "payload").collect()}
    seen = set()
    for fr in frames:
        rate_pcm = local[fr.id][1]
        expect = rate_pcm[fr.frame_idx * 1024:(fr.frame_idx + 1) * 1024]
        assert bytes(fr.frame) == expect.tobytes()
        seen.add((fr.id, fr.frame_idx))
    for i, (_, pcm) in local.items():
        n_blocks = max(1, -(-pcm.shape[0] // 1024))
        assert {(i, b) for b in range(0, n_blocks, 2)} <= seen


def test_fixture_md5_is_of_source_arrays():
    # regression guard on the non-circularity claim: decode one committed
    # payload locally and confirm the md5 column matches the decoded pixels
    import pyarrow.parquet as pq
    t = pq.read_table("/root/repo/fixtures/png_expected.parquet").to_pylist()
    r = t[0]
    arr = png_decode(r["payload"])
    assert hashlib.md5(arr.tobytes()).hexdigest() == r["pixel_md5"]
    assert arr.shape == (r["height"], r["width"], r["channels"])
