"""Pure-stdlib image codec tests: the PPM/BMP parsers, the
nearest-neighbor resampler, and the synth fixtures that make the
decoded statistics SQL-replayable."""

from __future__ import annotations

import pytest

from dug_data_ingest_spark.ext.multimodal import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    image_stats,
    nn_resize,
    resize_payload,
    synth_dims,
    synth_image_payload,
    synth_pixels,
)


def _checker(width: int, height: int) -> bytes:
    return bytes(
        255 * ((x + y) % 2) for y in range(height) for x in range(width)
        for _ in range(3)
    )


def test_ppm_round_trip():
    px = synth_pixels(7, 5, 4)
    assert decode_ppm(encode_ppm(5, 4, px)) == (5, 4, px)


def test_ppm_handles_comments_and_whitespace():
    px = _checker(2, 2)
    payload = b"P6\n# a comment\n 2\t2 # trailing\n255\n" + px
    assert decode_ppm(payload) == (2, 2, px)


def test_bmp_round_trip_unpadded_and_padded_rows():
    # width 4 -> 12-byte rows (no padding); width 5 -> 15 -> padded 16.
    for w, h in [(4, 3), (5, 3), (7, 2)]:
        px = synth_pixels(3, w, h)
        assert decode_bmp(encode_bmp(w, h, px)) == (w, h, px)


def test_bmp_layout_is_bottom_up_bgr():
    # One red pixel top-left of a 2x2: in the file it must appear in
    # the LAST row (bottom-up) as BGR (0, 0, 255).
    px = bytes([255, 0, 0] + [0] * 9)
    payload = encode_bmp(2, 2, px)
    row_size = 8  # 2 px * 3 B = 6, padded to 8
    first_file_row = payload[54 : 54 + row_size]
    second_file_row = payload[54 + row_size : 54 + 2 * row_size]
    assert first_file_row[:6] == bytes(6)  # bottom image row: all black
    assert second_file_row[:3] == bytes([0, 0, 255])  # top-left, BGR


def test_decode_image_dispatches_on_magic():
    px = synth_pixels(1, 4, 3)
    assert decode_image(encode_ppm(4, 3, px)) == (4, 3, px)
    assert decode_image(encode_bmp(4, 3, px)) == (4, 3, px)
    with pytest.raises(ValueError, match="magic"):
        decode_image(b"GIF89a...")


def test_nn_resize_matches_index_formula():
    w, h, tw, th = 6, 5, 4, 3
    px = synth_pixels(11, w, h)
    out = nn_resize(px, w, h, tw, th)
    for j in range(th):
        for i in range(tw):
            sx, sy = (i * w) // tw, (j * h) // th
            src = (sy * w + sx) * 3
            dst = (j * tw + i) * 3
            assert out[dst : dst + 3] == px[src : src + 3]


def test_nn_resize_identity():
    px = synth_pixels(2, 5, 4)
    assert nn_resize(px, 5, 4, 5, 4) == px


def test_resize_payload_keeps_container_format():
    ppm, _ = synth_image_payload(2)  # even -> PPM
    bmp, _ = synth_image_payload(3)  # odd -> BMP
    assert resize_payload(ppm, 4, 3)[:2] == b"P6"
    assert resize_payload(bmp, 4, 3)[:2] == b"BM"
    assert len(resize_payload(ppm, 4, 3)) == 11 + 36
    assert len(resize_payload(bmp, 4, 3)) == 54 + 36


def test_image_stats_replays_synth_formula():
    for mid in [0, 1, 6, 13]:
        payload, _ = synth_image_payload(mid)
        w0, h0 = synth_dims(mid)
        vals = [
            (7 * mid + 13 * x + 31 * y + 97 * c) % 256
            for y in range(h0)
            for x in range(w0)
            for c in range(3)
        ]
        w, h, feat = image_stats(payload)
        assert (w, h) == (w0, h0)
        assert feat == [
            float(sum(vals)),
            float(min(vals)),
            float(max(vals)),
            float(len(vals)),
        ]


# ---------------------------------------------------------------------------
# Property-based round-trips (SURVEY §5: the reference's test model is
# round-trip equality; hypothesis widens it over the input space).
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _images(draw):
    w = draw(st.integers(min_value=1, max_value=16))
    h = draw(st.integers(min_value=1, max_value=16))
    px = draw(
        st.binary(min_size=w * h * 3, max_size=w * h * 3)
    )
    return w, h, px


@given(_images())
@settings(max_examples=50, deadline=None)
def test_ppm_round_trip_property(img):
    w, h, px = img
    assert decode_ppm(encode_ppm(w, h, px)) == (w, h, px)


@given(_images())
@settings(max_examples=50, deadline=None)
def test_bmp_round_trip_property(img):
    w, h, px = img
    assert decode_bmp(encode_bmp(w, h, px)) == (w, h, px)


@given(_images(), st.integers(min_value=1, max_value=16),
       st.integers(min_value=1, max_value=16))
@settings(max_examples=50, deadline=None)
def test_nn_resize_property(img, tw, th):
    # output size is exact and every output pixel exists in the source
    w, h, px = img
    out = nn_resize(px, w, h, tw, th)
    assert len(out) == tw * th * 3
    src_px = {px[i : i + 3] for i in range(0, len(px), 3)}
    assert all(out[i : i + 3] in src_px for i in range(0, len(out), 3))


def test_decode_stage_quarantines_malformed_payloads(spark):
    # One junk / truncated payload in a media frame must drop its row,
    # never fail the task (quarantine-by-omission, like the XML
    # parser): a 100 TB decode job survives stray bad blobs.
    from dug_data_ingest_spark.ext.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize,
    )

    good, _ = synth_image_payload(4)
    truncated = good[: len(good) - 5]
    rows = [
        (1, bytearray(good), "image/x-portable-pixmap", len(good), "x"),
        (2, bytearray(b"JUNKJUNK"), "application/octet-stream", 8, "y"),
        (3, bytearray(truncated), "image/x-portable-pixmap", len(truncated), "z"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media).collect()
    assert [r.media_id for r in feats] == [1]
    resized = resize(media, 2, 2).collect()
    assert [r.media_id for r in resized] == [1]


def test_ppm_crlf_separated_header():
    # External P6 writers may terminate header tokens with CRLF; the
    # raster must still start at the right byte even when its first
    # pixel byte is whitespace-valued (0x0A here).
    px = bytes([0x0A, 0x20, 0x0D]) + _checker(2, 2)[3:]
    payload = b"P6\r\n2 2\r\n255\r\n" + px
    assert decode_ppm(payload) == (2, 2, px)


def test_decode_stage_surfaces_programming_bugs(spark):
    # Quarantine swallows ONLY codec errors (ValueError/struct.error/
    # IndexError). A bug in a custom decoder — e.g. an AttributeError —
    # must fail the task loudly, not silently shrink the output.
    from dug_data_ingest_spark.ext.multimodal import extract_features, MEDIA_SCHEMA

    good, _ = synth_image_payload(4)
    media = spark.createDataFrame(
        [(1, bytearray(good), "image/x-portable-pixmap", len(good), "x")],
        MEDIA_SCHEMA,
    )

    def buggy_decoder(payload: bytes):
        return payload.no_such_attribute  # AttributeError, not a codec error

    with pytest.raises(Exception, match="no_such_attribute"):
        extract_features(media, decoder=buggy_decoder).collect()


def test_decode_stage_logs_quarantine_counts(caplog):
    # Drive one Arrow batch in-process (the real batch function the
    # mapInPandas stage runs) and assert the drop count is logged.
    import logging

    import pandas as pd

    from dug_data_ingest_spark.ext.multimodal import (
        FEATURE_SCHEMA,
        _feature_batch,
        image_stats,
    )

    good, _ = synth_image_payload(4)
    batch = pd.DataFrame(
        {"media_id": [1, 2], "payload": [good, b"JUNK"]}
    )
    with caplog.at_level(
        logging.WARNING, logger="dug_data_ingest_spark.ext.multimodal"
    ):
        out = _feature_batch(batch, image_stats, (), FEATURE_SCHEMA)
    assert list(out["media_id"]) == [1]
    assert any("quarantined 1/2" in r.getMessage() for r in caplog.records)


def test_codecs_reject_zero_dimensions():
    with pytest.raises(ValueError, match="dimensions"):
        encode_ppm(0, 3, b"")
    with pytest.raises(ValueError, match="dimensions"):
        encode_bmp(4, 0, b"")
    with pytest.raises(ValueError, match="dimensions"):
        decode_ppm(b"P6\n0 3\n255\n")


# ---------------------------------------------------------------------------
# Audio (RIFF/WAVE PCM16) codec
# ---------------------------------------------------------------------------


def test_wav_round_trip():
    from dug_data_ingest_spark.ext.multimodal import decode_wav, encode_wav

    samples = [0, 100, -100, 32767, -32768, 1, -1]
    sr, n, back = decode_wav(encode_wav(44100, samples))
    assert (sr, n, back) == (44100, len(samples), samples)


def test_wav_chunk_walker_skips_foreign_chunks():
    # external writers insert LIST/INFO chunks between fmt and data;
    # the parser must walk past them (word-aligned) and still find both
    import struct

    from dug_data_ingest_spark.ext.multimodal import decode_wav, encode_wav

    wav = encode_wav(8000, [5, -5, 7])
    fmt_chunk = wav[12:36]
    data_chunk = wav[36:]
    foreign = b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"  # odd size, padded
    doctored = wav[:12] + fmt_chunk + foreign + data_chunk
    sr, n, back = decode_wav(doctored)
    assert (sr, n, back) == (8000, 3, [5, -5, 7])


def test_wav_rejects_malformed():
    import pytest as _pytest

    from dug_data_ingest_spark.ext.multimodal import decode_wav, encode_wav

    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"NOTAWAV")
    wav = encode_wav(8000, [1, 2, 3])
    with _pytest.raises(ValueError, match="truncated"):
        decode_wav(wav[:-2])
    # stereo / non-PCM rejected
    import struct

    stereo_fmt = wav[:12] + b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16
    ) + wav[36:]
    with _pytest.raises(ValueError, match="PCM16 mono"):
        decode_wav(stereo_fmt)


def test_audio_stats_replays_synth_formula():
    from dug_data_ingest_spark.ext.multimodal import (
        AUDIO_SAMPLE_RATE,
        audio_stats,
        encode_wav,
        synth_audio_samples,
    )

    for d in (0, 3, 7, 11):
        s = synth_audio_samples(d)
        sr, n, feats = audio_stats(encode_wav(AUDIO_SAMPLE_RATE, s))
        assert (sr, n) == (8000, 1600 + (d % 5) * 80)
        dur, rms, zc, peak = feats
        assert dur == n / 8.0
        # unrounded by design: rounding is F.round in the projection
        assert rms == (sum(x * x for x in s) / n) ** 0.5
        assert zc == sum(
            1 for i in range(1, n) if (s[i - 1] >= 0) != (s[i] >= 0)
        )
        assert peak == max(abs(x) for x in s)


def test_ppm_whitespace_valued_raster_byte_decodes_exactly():
    # gray 0x20 (ASCII space) as the FIRST raster byte: the decoder
    # must take it as pixel data, not header whitespace
    from dug_data_ingest_spark.ext.multimodal import decode_ppm

    payload = b"P6\n1 1\n255\n" + bytes([0x20, 40, 50])
    assert decode_ppm(payload) == (1, 1, bytes([0x20, 40, 50]))


def test_ppm_trailing_bytes_raise_instead_of_shifting_raster():
    # with trailing junk, the old whitespace-consume loop ate the
    # 0x20 raster byte and returned shifted pixels — silent
    # corruption; now it refuses loudly
    import pytest

    from dug_data_ingest_spark.ext.multimodal import decode_ppm

    payload = b"P6\n1 1\n255\n" + bytes([0x20, 40, 50]) + b"X"
    with pytest.raises(ValueError, match="trailing"):
        decode_ppm(payload)


def test_ppm_trailing_whitespace_tolerated():
    # a file-terminating newline (or any whitespace tail) is a benign
    # writer quirk — the raster start is pinned by the single
    # terminator, so a whitespace tail can't shift pixels and must
    # not quarantine a spec-valid image
    from dug_data_ingest_spark.ext.multimodal import decode_ppm

    payload = b"P6\n1 1\n255\n" + bytes([0x20, 40, 50]) + b"\n"
    assert decode_ppm(payload) == (1, 1, bytes([0x20, 40, 50]))
    payload2 = b"P6\n1 1\n255\n" + bytes([10, 20, 30]) + b" \r\n"
    assert decode_ppm(payload2) == (1, 1, bytes([10, 20, 30]))


def test_ppm_crlf_terminator_tolerated():
    from dug_data_ingest_spark.ext.multimodal import decode_ppm

    payload = b"P6\n1 1\n255\r\n" + bytes([10, 20, 30])
    assert decode_ppm(payload) == (1, 1, bytes([10, 20, 30]))


def test_resize_rejects_invalid_target_dims_loudly(spark):
    # caller-parameter errors are not data errors: resize(df, 0, 5)
    # must raise at stage build, not quarantine 100% of rows into a
    # successful empty job
    import pytest

    from dug_data_ingest_spark.ext.multimodal import resize

    with pytest.raises(ValueError, match="dimensions"):
        resize(spark.range(0), 0, 5)


def test_image_phash_bit_rule_and_cap():
    from dug_data_ingest_spark.ext.multimodal import encode_ppm, image_phash
    import pytest

    # 2x2 image, channel-sums 3,6,9,300 -> total 318, n=4: bit set
    # only where s*4 > 318 (strict), i.e. only the 4th pixel (bit 3)
    px = bytes([1, 1, 1, 2, 2, 2, 3, 3, 3, 100, 100, 100])
    w, h, bits = image_phash(encode_ppm(2, 2, px))
    assert (w, h, bits) == (2, 2, 0b1000)

    # a uniform image sets NO bits (s*n == total, never >)
    uni = bytes([5, 5, 5] * 4)
    assert image_phash(encode_ppm(2, 2, uni))[2] == 0

    # >63 pixels cannot hash into a BIGINT — the documented cap
    big = bytes([0, 0, 0] * 64)
    with pytest.raises(ValueError, match="63-bit"):
        image_phash(encode_ppm(8, 8, big))
