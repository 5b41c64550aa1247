"""Real multimodal codecs (r3): pure-NumPy PPM/BMP/WAV encode-decode
roundtrips, area-average resize, feature extraction, and the Arrow
mapInPandas contract."""

import numpy as np
import pytest

from hexscape_spark import multimodal as mm


def _rand_img(seed, w, h):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (16, 12), (31, 20)])
def test_ppm_roundtrip_exact(w, h):
    img = _rand_img(w * 100 + h, w, h)
    assert (mm.decode_ppm(mm.encode_ppm(img)) == img).all()


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (5, 7), (16, 12)])
def test_bmp_roundtrip_exact(w, h):
    """Includes widths whose rows need 4-byte padding (w=3, 5)."""
    img = _rand_img(w * 100 + h, w, h)
    assert (mm.decode_bmp(mm.encode_bmp(img)) == img).all()


def test_decode_image_sniffs_format():
    img = _rand_img(7, 8, 6)
    assert (mm.decode_image(mm.encode_ppm(img)) == img).all()
    assert (mm.decode_image(mm.encode_bmp(img)) == img).all()
    with pytest.raises(ValueError):
        mm.decode_image(b"GIF89a....")


def test_wav_roundtrip_exact():
    rng = np.random.RandomState(3)
    s = rng.randint(-32768, 32767, size=500, dtype=np.int16)
    rate, ch, got = mm.decode_wav(mm.encode_wav(s, rate=8000))
    assert (rate, ch) == (8000, 1)
    assert (got[:, 0] == s).all()
    stereo = rng.randint(-32768, 32767, size=(200, 2), dtype=np.int16)
    rate, ch, got = mm.decode_wav(mm.encode_wav(stereo, rate=16000))
    assert (rate, ch) == (16000, 2)
    assert (got == stereo).all()


def test_resize_is_area_mean():
    """Downsampling a constant-block image reproduces the block means."""
    img = np.zeros((8, 8, 1))
    img[:4, :4] = 10.0
    img[:4, 4:] = 20.0
    img[4:, :4] = 30.0
    img[4:, 4:] = 40.0
    out = mm.resize_image(img, 2, 2)[:, :, 0]
    assert np.allclose(out, [[10, 20], [30, 40]])


def test_image_features_thumbnail():
    img = np.zeros((12, 16, 3), dtype=np.uint8)
    img[:, 8:] = 255                      # right half white
    w, h, f = mm.image_features(mm.encode_ppm(img))
    assert (w, h) == (16, 12)
    t = np.array(f).reshape(4, 4)
    assert np.allclose(t[:, :2], 0.0) and np.allclose(t[:, 2:], 1.0)


def test_audio_features_sine_energy():
    """A pure sine has near-constant per-segment RMS (~A/sqrt(2)) and its
    FFT energy concentrated in the band containing its frequency."""
    t = np.arange(800) / 8000.0
    s = (np.sin(2 * np.pi * 1000.0 * t) * 12000).astype(np.int16)
    n, ch, f = mm.audio_features(mm.encode_wav(s))
    assert (n, ch) == (800, 1)
    rms = np.array(f[:8])
    want = 12000 / 32768.0 / np.sqrt(2)
    assert np.allclose(rms, want, rtol=0.05)
    bands = np.array(f[8:])
    # 1000 Hz at 8 kHz rate, 800 samples -> bin 100 of 401 -> band 1 of 8
    assert bands.argmax() == 1


def test_extract_features_spark_contract(spark):
    """The Arrow-batched contract over REAL payloads: dims come from the
    actual decoded bytes, features are finite, video still raises the
    honest stub error."""
    df = mm.synth_media(spark, 30)
    out = mm.extract_features(df).toPandas().set_index("media_id")
    assert len(out) == 30
    for i in range(30):
        row = out.loc[i]
        if i % 2 == 0:
            assert row.kind == "image"
            assert (row.width, row.height) == (16 + i % 16, 12 + i % 9)
        else:
            assert row.kind == "audio"
            assert (row.width, row.height) == (400 + i % 200, 1)
        assert np.isfinite(np.array(row.feature)).all()
        assert len(row.feature) == 16
    import pandas as pd
    bad = spark.createDataFrame(
        [(1, "video", bytearray(b"xx"), "video/mp4", 2)],
        mm.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        mm.extract_features(bad).collect()
