"""Multimodal plumbing + import-try codec gating.

The container has no image/audio codecs, so the real-codec branch is
exercised by injecting a fake module handle (the dispatch structure is what
matters); the stub branch and the codec-missing error are tested directly.
"""

import io

import pytest

from polars_order_book_spark.operators import multimodal as mm


PNG_MAGIC = b"\x89PNG\r\n\x1a\nrest-of-payload"
WAV_MAGIC = b"RIFF\x24\x00\x00\x00WAVEfmt "
TEXT_PAYLOAD = b"plain utf-8 text payload"


class _FakeImg:
    size = (320, 200)

    def getbands(self):
        return ("R", "G", "B", "A")


class _FakePIL:
    """Duck-typed PIL.Image module: open(file) -> image with size/getbands."""

    def __init__(self):
        self.opened_with = None

    def open(self, fp):
        assert isinstance(fp, io.BytesIO)
        self.opened_with = fp.getvalue()
        return _FakeImg()


class _FakeInfo:
    samplerate = 44100
    frames = 88200
    channels = 2


class _FakeSoundfile:
    def info(self, fp):
        assert isinstance(fp, io.BytesIO)
        return _FakeInfo()


def test_decode_image_stub_is_deterministic():
    a = mm.decode_image_stub(TEXT_PAYLOAD)
    b = mm.decode_image_stub(TEXT_PAYLOAD)
    assert a == b
    assert a["n_bytes"] == len(TEXT_PAYLOAD)
    assert a["fake_width"] == 64 + len(TEXT_PAYLOAD) % 512


def test_decode_image_stub_refuses_real_magic():
    with pytest.raises(NotImplementedError):
        mm.decode_image_stub(PNG_MAGIC)


def test_decode_image_codec_missing_branch():
    # real magic + no codec: the honest NotImplementedError
    with pytest.raises(NotImplementedError, match="no codec"):
        mm.decode_image(PNG_MAGIC, image_module=None)


def test_decode_image_codec_present_branch():
    fake = _FakePIL()
    out = mm.decode_image(PNG_MAGIC, image_module=fake)
    assert fake.opened_with == PNG_MAGIC  # payload reached the codec
    assert out["fake_width"] == 320
    assert out["fake_height"] == 200
    assert out["fake_channels"] == 4
    assert out["n_bytes"] == len(PNG_MAGIC)


def test_decode_image_stub_path_ignores_codec():
    # non-magic payloads never touch the codec, even when one is available
    fake = _FakePIL()
    out = mm.decode_image(TEXT_PAYLOAD, image_module=fake)
    assert fake.opened_with is None
    assert out == mm.decode_image_stub(TEXT_PAYLOAD)


def test_decode_audio_codec_missing_branch():
    with pytest.raises(NotImplementedError, match="no codec"):
        mm.decode_audio(WAV_MAGIC, audio_module=None)


def test_decode_audio_codec_present_branch():
    out = mm.decode_audio(WAV_MAGIC, audio_module=_FakeSoundfile())
    assert out["fake_sample_rate"] == 44100
    assert out["fake_duration_ms"] == 2000
    assert out["fake_channels"] == 2


def test_decode_audio_stub_branch():
    out = mm.decode_audio(TEXT_PAYLOAD, audio_module=None)
    n = len(TEXT_PAYLOAD)
    assert out["n_bytes"] == n
    assert out["fake_sample_rate"] == 8000 * (1 + n % 3)
    assert out["rms_proxy"] == sum(TEXT_PAYLOAD) // n


def test_detected_modules_absent_in_container():
    # documents the container contract the stub branch relies on; if codecs
    # appear, the real branch activates and this pin should be revisited
    assert mm._PIL_IMAGE is None
    assert mm._SOUNDFILE is None


def test_extract_image_features_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "another doc")], ["doc_id", "text"]
    )
    out = mm.extract_image_features(mm.attach_payload(df)).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == len(b"hello world")
    assert by_id[1]["fake_channels"] == 3
    assert by_id[2]["fake_width"] == 64 + len(b"another doc") % 512


def test_ascii_lookalike_magic_is_not_real_media():
    """utf-8 prose starting with GIF8/RIFF/BM/OggS must take the stub path —
    only binary evidence (a NUL in the head) routes to a real codec."""
    for prose in (
        b"BMW recalls several models this year",
        b"GIF89a is an image format from 1989",
        b"RIFF is a container format family",
        b"OggS frames begin every Ogg page",
        b"fLaC is the free lossless audio codec",
    ):
        # no NotImplementedError, no codec call
        out = mm.decode_image(prose, image_module=None)
        assert out == mm.decode_image_stub(prose)
        mm.decode_audio(prose, audio_module=None)  # must not raise


def test_binary_magic_still_routes_to_codec():
    assert mm._has_magic(PNG_MAGIC, mm._IMAGE_MAGIC)       # non-ASCII sig
    assert mm._has_magic(WAV_MAGIC, mm._AUDIO_MAGIC)       # RIFF + NUL bytes
    assert mm._has_magic(b"\xff\xd8\xff\xe1EXIF", mm._IMAGE_MAGIC)  # JPEG/EXIF


def _tiny_png(width=320, height=200, color_type=6):
    import struct
    ihdr = struct.pack(">II", width, height) + bytes([8, color_type, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    )


def _tiny_wav(rate=44100, channels=2, bits=16, n_frames=100):
    import struct
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    data = b"\x00" * (n_frames * block)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_png_header_parse_codec_free():
    """Real PNG bytes yield REAL dimensions without PIL (r5: pure-Python
    IHDR parse replaces NotImplementedError for this format)."""
    out = mm.decode_image(_tiny_png(320, 200, color_type=6), image_module=None)
    assert (out["fake_width"], out["fake_height"], out["fake_channels"]) == (320, 200, 4)
    # band counts per color type match PIL's getbands()
    for ctype, bands in ((0, 1), (2, 3), (3, 1), (4, 2), (6, 4)):
        assert mm.decode_image(_tiny_png(7, 9, ctype), image_module=None)[
            "fake_channels"
        ] == bands
    # truncated / non-IHDR heads still refuse honestly
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\nnot-an-ihdr-chunk", image_module=None)


def test_wav_header_parse_codec_free():
    """Real WAV bytes yield REAL rate/channels/duration without soundfile."""
    out = mm.decode_audio(_tiny_wav(rate=8000, channels=1, n_frames=4000),
                          audio_module=None)
    assert out["fake_sample_rate"] == 8000
    assert out["fake_channels"] == 1
    assert out["fake_duration_ms"] == 500
    # fmt chunk after an unknown chunk still found (RIFF walk, not offsets)
    import struct
    wav = _tiny_wav()
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    walked = wav[:12] + extra + wav[12:]
    assert mm.decode_audio(walked, audio_module=None)["fake_sample_rate"] == 44100
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"RIFF\x10\x00\x00\x00WAVEtrunc", audio_module=None)


def test_real_png_payload_through_spark_pipeline(spark):
    """End-to-end mapInPandas over a REAL PNG payload in a codec-less
    container: the header-parse branch runs on executors."""
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    schema = StructType([
        StructField("doc_id", LongType()), StructField("payload", BinaryType()),
    ])
    df = spark.createDataFrame(
        [(1, bytearray(_tiny_png(64, 48, 2))), (2, bytearray(TEXT_PAYLOAD))], schema
    )
    by_id = {r["doc_id"]: r for r in mm.extract_image_features(df).collect()}
    assert (by_id[1]["fake_width"], by_id[1]["fake_height"], by_id[1]["fake_channels"]) == (64, 48, 3)
    assert by_id[2]["fake_width"] == 64 + len(TEXT_PAYLOAD) % 512  # stub path intact


# --- committed real-format fixtures (no fake-codec injection) ----------------
# tests/fixtures/tiny_rgb_3x2.png: hand-built complete PNG (signature, IHDR
# 3x2 / bit depth 8 / color type 2, zlib IDAT, IEND, correct CRCs).
# tests/fixtures/tiny_pcm16_2ch_8k.wav: complete RIFF/WAVE (PCM16, 2 ch,
# 8000 Hz, 4 frames). These exercise the codec-free header-parse branch with
# REAL container bytes end-to-end through the mapInPandas operators — the
# branch a codec-less cluster takes on genuine media payloads.

import os as _os

_FIXTURES = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "fixtures")


def _fixture_bytes(name):
    with open(_os.path.join(_FIXTURES, name), "rb") as fh:
        return fh.read()


def test_parse_png_header_real_fixture():
    png = _fixture_bytes("tiny_rgb_3x2.png")
    assert mm.parse_png_header(png) == {"width": 3, "height": 2, "channels": 3}
    # real magic routes it away from the stub
    assert mm._has_magic(png, mm._IMAGE_MAGIC)


def test_parse_wav_header_real_fixture():
    wav = _fixture_bytes("tiny_pcm16_2ch_8k.wav")
    assert mm.parse_wav_header(wav) == {
        "sample_rate": 8000, "channels": 2, "frames": 4,
    }
    assert mm._has_magic(wav, mm._AUDIO_MAGIC)


def test_image_features_real_png_end_to_end(spark):
    """The registered multimodal_features machinery (extract_image_features'
    mapInPandas) over a REAL PNG payload: with no codec in the container the
    detected-module branch falls back to parse_png_header and must emit the
    true dimensions; with PIL present it must agree (import-gated assert)."""
    png = _fixture_bytes("tiny_rgb_3x2.png")
    text = b"plain utf-8 payload"
    df = spark.createDataFrame([(1, bytearray(png)), (2, bytearray(text))],
                               "doc_id long, payload binary")
    rows = {r["doc_id"]: r.asDict() for r in mm.extract_image_features(df).collect()}
    assert rows[1]["fake_width"] == 3
    assert rows[1]["fake_height"] == 2
    assert rows[1]["fake_channels"] == 3
    assert rows[1]["n_bytes"] == len(png)
    stub = mm.decode_image_stub(text)
    assert rows[2]["fake_width"] == stub["fake_width"]  # stub tier untouched
    if mm._PIL_IMAGE is not None:  # codec-equipped environments must agree
        out = mm.decode_image(png)
        assert (out["fake_width"], out["fake_height"], out["fake_channels"]) == (3, 2, 3)


def test_audio_features_real_wav_end_to_end(spark):
    wav = _fixture_bytes("tiny_pcm16_2ch_8k.wav")
    df = spark.createDataFrame([(7, bytearray(wav))], "doc_id long, payload binary")
    rows = mm.extract_audio_features_stub(df).collect()
    r = rows[0].asDict()
    assert r["fake_sample_rate"] == 8000
    assert r["fake_channels"] == 2
    assert r["fake_duration_ms"] == 4 * 1000 // 8000  # frames/rate
    if mm._SOUNDFILE is not None:
        out = mm.decode_audio(wav)
        assert out["fake_sample_rate"] == 8000 and out["fake_channels"] == 2


def test_resize_real_png_raises_without_codec(spark):
    """Resizing a REAL image needs pixel decode — header parsing cannot fake
    it, so a codec-less container must fail loudly, not crop bytes."""
    if mm._PIL_IMAGE is not None:
        pytest.skip("PIL present: the real-resize branch applies instead")
    png = _fixture_bytes("tiny_rgb_3x2.png")
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="no codec"):
        mm.resize_image_stub(df).collect()


def test_frame_sample_empty_payload_yields_no_frames(spark):
    """r8 self-review: sequence(0, -1) descends, so an empty payload emitted
    frames 0 and -1 (byte_offset -64). Empty docs now sample zero frames."""
    df = spark.createDataFrame(
        [(1, b"x" * 130), (2, b""), (3, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: (r["frame_no"], r["byte_offset"])
           for r in mm.frame_sample_stub(df).collect()}
    rows = mm.frame_sample_stub(df).collect()
    assert sorted((r["doc_id"], r["frame_no"]) for r in rows) == [
        (1, 0), (1, 1), (1, 2)
    ]
    with pytest.raises(ValueError, match="every_n_bytes"):
        mm.frame_sample_stub(df, every_n_bytes=0)


def test_feature_extract_null_payload_yields_null_row(spark):
    """r8 self-review: attach_payload emits NULL payloads for NULL text;
    the decode UDFs crashed the executor on bytes(None). Now a NULL-feature
    row, 1:1 with input."""
    df = spark.createDataFrame(
        [(1, b"hello world"), (2, None)], "doc_id long, payload binary"
    )
    img = {r["doc_id"]: r["n_bytes"] for r in mm.extract_image_features(df).collect()}
    assert img[1] == 11 and img[2] is None
    aud = {r["doc_id"]: r["n_bytes"]
           for r in mm.extract_audio_features_stub(df).collect()}
    assert aud[1] == 11 and aud[2] is None
    rs = {r["doc_id"]: r["resized_md5"] for r in mm.resize_image_stub(df).collect()}
    assert rs[1] is not None and rs[2] is None
