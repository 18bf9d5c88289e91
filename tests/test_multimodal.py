import hashlib

import numpy as np
import pytest

from robokop_build_spark.operators.extract import explode_spans
from robokop_build_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_media_payloads,
    build_bmp,
    build_csv,
    decode_media,
    extract_media_features,
    media_dims,
    media_pixels,
)
from robokop_build_spark.sources.readers import read_fixture


def test_decode_raises_for_codec_less_formats():
    # PNG is genuinely decoded since round 4; garbage bytes are a
    # ValueError there, and only lib-requiring formats stay NotImplemented
    with pytest.raises(ValueError):
        decode_media(b"\x00\x01", "image/png")
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "audio/mpeg")


def test_bmp_roundtrip_recovers_pixels_exactly():
    """The BMP codec is REAL: decode(header+padded bottom-up rows) must
    recover the exact top-down pixel bytes the builder started from."""
    ref = "media://roundtrip"
    w, h = media_dims(ref)
    px = media_pixels(ref, w, h)
    dec = decode_media(build_bmp(ref), "image/bmp")
    assert (int(dec[0]), int(dec[1])) == (w, h)
    assert bytes(dec[2:].astype(np.uint8)) == px


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        decode_media(b"XX" + b"\x00" * 60, "image/bmp")


def test_csv_roundtrip():
    ref = "media://csvcheck"
    dec = decode_media(build_csv(ref), "text/csv")
    d = hashlib.md5(f"{ref}:dims".encode()).digest()
    assert (int(dec[0]), int(dec[1])) == (3 + d[0] % 3, 2 + d[1] % 3)
    assert all(0 <= v <= 255 for v in dec[2:])


def test_media_plumbing_end_to_end(spark, fixture_dir):
    spans = explode_spans(read_fixture(spark, fixture_dir, "documents"))
    media = attach_media_payloads(spans)
    rows = media.limit(5).collect()
    assert rows, "fixtures must contain media spans"
    for r in rows:
        assert r["media_type"] in ("image/bmp", "image/png", "text/csv")
        assert isinstance(r["payload"], (bytes, bytearray))
        if r["media_type"] == "image/bmp":
            assert bytes(r["payload"][:2]) == b"BM"
        assert r["width"] >= 3 and r["height"] >= 2
    feats = extract_media_features(media.limit(50)).collect()
    assert len(feats) == min(50, media.count())
    for f in feats:
        assert len(f["feature"]) == FEATURE_DIM
        assert abs(sum(x * x for x in f["feature"]) - 1.0) < 1e-3


def test_media_features_deterministic(spark, fixture_dir):
    spans = explode_spans(read_fixture(spark, fixture_dir, "documents"))
    media = attach_media_payloads(spans).limit(20)
    a = {
        (r["doc_id"], r["span_pos"]): tuple(r["feature"])
        for r in extract_media_features(media).collect()
    }
    b = {
        (r["doc_id"], r["span_pos"]): tuple(r["feature"])
        for r in extract_media_features(media.repartition(4)).collect()
    }
    assert a == b


def test_png_roundtrip_all_filter_types():
    """build_png cycles all five PNG filter types across rows; the decoder
    must reconstruct the exact pixel-rule bytes through zlib + unfiltering
    for many refs (heights 3..6 guarantee filters 0-4 all appear)."""
    import numpy as np

    from robokop_build_spark.operators.multimodal import (
        build_png,
        decode_media,
        media_dims,
        media_pixels,
    )

    seen_heights = set()
    for i in range(40):
        ref = f"media://img{i}"
        w, h = media_dims(ref)
        seen_heights.add(h)
        dec = decode_media(build_png(ref), "image/png")
        want = np.concatenate(
            [[w, h], np.frombuffer(media_pixels(ref, w, h), np.uint8)]
        ).astype(float)
        assert np.array_equal(dec, want), ref
    assert 6 in seen_heights  # at least one image used filter type 4 (Paeth)


def test_png_decoder_rejects_unsupported():
    import pytest

    from robokop_build_spark.operators.multimodal import build_png, decode_media

    with pytest.raises(ValueError):
        decode_media(b"nope", "image/png")
    # 16-bit depth IHDR → declared boundary
    png = bytearray(build_png("media://x"))
    png[8 + 8 + 8] = 16  # IHDR bit-depth byte
    with pytest.raises(NotImplementedError):
        decode_media(bytes(png), "image/png")


# ---------------------------------------------------------------------------
# audio (RIFF/WAVE)
# ---------------------------------------------------------------------------


def test_wav_roundtrip_recovers_exact_pcm():
    import numpy as np

    from robokop_build_spark.operators.multimodal import (
        audio_params,
        audio_samples,
        build_wav,
        decode_media,
    )

    ref = "au:test1"
    n, rate = audio_params(ref)
    dec = decode_media(build_wav(ref), "audio/wav")
    assert int(dec[0]) == n and int(dec[1]) == rate
    assert np.array_equal(dec[2:].astype(np.int64), audio_samples(ref, n))


def test_wav_decode_uses_stdlib_wave_parser():
    # a truncated/garbage payload must fail in the parser, not return junk
    import pytest as _pytest

    from robokop_build_spark.operators.multimodal import decode_media

    with _pytest.raises(Exception):
        decode_media(b"RIFF\x00\x00\x00\x00WAVEjunk", "audio/wav")


def test_audio_int_features_closed_form():
    import numpy as np

    from robokop_build_spark.operators.multimodal import audio_int_features

    s = np.array([3, -4, 0, 5, -1], dtype=np.int64)
    sum_sq, peak, zc = audio_int_features(s)
    assert sum_sq == 9 + 16 + 0 + 25 + 1
    assert peak == 5
    # strict sign products < 0: (3,-4) yes; (-4,0) no; (0,5) no; (5,-1) yes
    assert zc == 2


def test_attach_and_extract_audio_features(spark):
    from robokop_build_spark.operators.multimodal import (
        attach_audio_payloads,
        audio_int_features,
        audio_params,
        audio_samples,
        extract_audio_features,
    )

    from pyspark.sql import functions as F

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    out = extract_audio_features(attach_audio_payloads(docs)).collect()
    assert out, "expected md5 bucket 0 to select some docs"
    for r in out:
        n, rate = audio_params(r["audio_ref"])
        s, p, z = audio_int_features(audio_samples(r["audio_ref"], n))
        assert (r["n_samples"], r["sample_rate"]) == (n, rate)
        assert (r["sum_sq"], r["peak"], r["zero_crossings"]) == (s, p, z)
