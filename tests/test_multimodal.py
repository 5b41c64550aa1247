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


def test_avi_roundtrip_exact():
    """encode_avi -> decode_avi is byte-exact on frames and fps for
    arbitrary dims (incl. row-padding widths w % 4 != 0)."""
    rng = np.random.RandomState(7)
    for nf, h, w in ((1, 3, 4), (5, 7, 9), (8, 6, 13), (3, 11, 8)):
        frames = rng.randint(0, 256, (nf, h, w, 3)).astype(np.uint8)
        fps, back = mm.decode_avi(mm.encode_avi(frames, fps=25))
        assert fps == 25
        assert back.shape == frames.shape and (back == frames).all()


def test_avi_n_bytes_closed_form():
    """The oracle's header-arithmetic formula matches the real encoder:
    n_bytes = 224 + nf*(8 + h*ceil4(3w))."""
    for i in (3, 7, 11, 15, 199):
        nf, w, h = 4 + i % 5, 8 + i % 8, 6 + i % 6
        assert len(mm._synth_video(i)) == \
            224 + nf * (8 + h * ((3 * w + 3) // 4 * 4))


def test_decode_avi_malformed_raises_valueerror():
    good = mm._synth_video(3)
    for bad in (b"nope", good[:40],
                b"RIFF\x00\x00\x00\x00AVI LIST\xff\xff\xff\xff"):
        with pytest.raises(ValueError):
            mm.decode_avi(bad)


def test_video_features_constant_frames():
    """Constant gray frames: per-segment RMS == the gray level, FFT energy
    concentrated in the DC band."""
    frames = np.full((8, 6, 8, 3), 128, dtype=np.uint8)
    w, h, f = mm.video_features(mm.encode_avi(frames))
    assert (w, h) == (8, 6)
    assert np.allclose(np.array(f[:8]), 128 / 255.0, rtol=1e-6)
    assert np.array(f[8:]).argmax() == 0


def test_extract_features_spark_contract(spark):
    """The Arrow-batched contract over REAL payloads: dims come from the
    actual decoded bytes for all THREE kinds (r4: video decode is real),
    features are finite, unknown kinds raise an honest error."""
    df = mm.synth_media(spark, 30)
    out = mm.extract_features(df).toPandas().set_index("media_id")
    assert len(out) == 30
    kinds = set()
    for i in range(30):
        row = out.loc[i]
        kinds.add(row.kind)
        if i % 2 == 0:
            assert row.kind == "image"
            assert (row.width, row.height) == (16 + i % 16, 12 + i % 9)
        elif i % 4 == 1:
            assert row.kind == "audio"
            assert (row.width, row.height) == (400 + i % 200, 1)
        else:
            assert row.kind == "video"
            assert (row.width, row.height) == (8 + i % 8, 6 + i % 6)
        assert np.isfinite(np.array(row.feature)).all()
        assert len(row.feature) == 16
    assert kinds == {"image", "audio", "video"}
    bad = spark.createDataFrame(
        [(1, "hologram", bytearray(b"xx"), "application/x-hologram", 2)],
        mm.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="unknown media kind"):
        mm.extract_features(bad).collect()


def test_decode_avi_deep_nesting_no_recursion():
    """r4 review: crafted deep LIST nesting must raise the documented
    ValueError (iterative walk), never RecursionError."""
    import struct
    inner = b""
    for _ in range(5000):
        inner = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"xxxx" + inner
    payload = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"AVI " + inner
    with pytest.raises(ValueError):
        mm.decode_avi(payload)


def test_sample_frames_roundtrip(spark):
    """sample_frames re-encodes every stride-th AVI frame as a PPM whose
    pixels equal the original frame; non-video rows pass through."""
    df = mm.synth_media(spark, 12)
    out = mm.extract_features(
        mm.sample_frames(df, stride=2).where("kind = 'image'"))
    out.count()                                  # frames feed the image path
    got = mm.sample_frames(df, stride=2).toPandas()
    for i in range(12):
        rows = got[got.media_id == i]
        if i % 2 == 0 or i % 4 == 1:             # image/audio pass-through
            assert len(rows) == 1
            assert rows.iloc[0].frame_idx == 0 and rows.iloc[0].n_frames == 1
            # mime/kind survive pass-through (r4 review)
            assert rows.iloc[0].kind == ("image" if i % 2 == 0 else "audio")
            assert rows.iloc[0].mime is not None
        else:                                    # video
            _, frames = mm.decode_avi(mm._synth_video(i))
            want_idx = list(range(0, len(frames), 2))
            assert list(rows.frame_idx) == want_idx
            assert (rows.n_frames == len(frames)).all()
            for _, r in rows.iterrows():
                assert (mm.decode_ppm(bytes(r.payload)) ==
                        frames[r.frame_idx]).all()


def test_decoders_malformed_raise_valueerror_only():
    """Fuzz-derived contract (r5): truncated/random/bit-flipped payloads
    raise ValueError from every decoder — never struct.error/IndexError/
    AssertionError, and never a giant allocation from a corrupt BMP
    dimension field."""
    import numpy as np

    from hexscape_spark import multimodal as mm
    rng = np.random.RandomState(9)
    samples = {
        "decode_ppm": mm.encode_ppm(np.zeros((6, 5, 3), dtype=np.uint8)),
        "decode_bmp": mm.encode_bmp(np.zeros((6, 5, 3), dtype=np.uint8)),
        "decode_wav": mm.encode_wav(np.zeros(64, dtype=np.int16), 8000),
        "decode_avi": mm.encode_avi(np.zeros((2, 4, 6, 3), dtype=np.uint8),
                                    fps=5),
    }
    for name in ("decode_ppm", "decode_bmp", "decode_image", "decode_wav",
                 "decode_avi"):
        fn = getattr(mm, name)
        blob = samples.get(name)
        cases = []
        if blob is not None:
            cases += [blob[:c] for c in range(0, len(blob), 7)]
            for _ in range(150):
                b = bytearray(blob)
                for _ in range(rng.randint(1, 4)):
                    b[rng.randint(len(b))] ^= 1 << rng.randint(8)
                cases.append(bytes(b))
        cases += [bytes(rng.randint(0, 256, rng.randint(0, 80),
                                    dtype=np.uint8)) for _ in range(250)]
        for c in cases:
            try:
                fn(c)
            except ValueError:
                pass                  # the only acceptable failure mode
    # valid payloads still roundtrip
    assert mm.decode_ppm(samples["decode_ppm"]).shape == (6, 5, 3)
    assert mm.decode_bmp(samples["decode_bmp"]).shape == (6, 5, 3)
