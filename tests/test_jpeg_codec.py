"""Baseline JPEG codec (text/jpeg.py): pure stdlib+numpy encode/decode.

The multimodal plug point's last image stub — now a real codec.  Solid
(DC-only) content must round-trip EXACTLY at q>=95 (the property the
byte-exact SQL oracle in multimodal_jpeg_decode relies on); textured
content must round-trip above a PSNR floor in every mode (4:4:4, 4:2:0,
grayscale, restart intervals, odd dimensions)."""

import numpy as np
import pytest

from cdm_cbioportal_etl_spark.text.jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _textured(h, w, seed=7):
    rng = np.random.default_rng(seed)
    g = np.linspace(0, 255, w)[None, :, None] + np.linspace(0, 60, h)[:, None, None]
    img = np.clip(
        np.repeat(g, 3, axis=2).astype(int) + rng.integers(-8, 8, (h, w, 3)),
        0,
        255,
    )
    return img.astype(np.uint8)


def test_solid_color_roundtrip_exact_both_subsamplings():
    for color in [(0, 0, 0), (255, 255, 255), (200, 64, 10), (17, 254, 128)]:
        img = np.full((16, 24, 3), color, dtype=np.uint8)
        for ss in ("444", "420"):
            out = decode_jpeg_baseline(
                encode_jpeg_baseline(img, 95, subsampling=ss)
            )
            assert out.shape == img.shape
            assert np.array_equal(out, img), (color, ss)


def test_block_solid_roundtrip_exact():
    # per-8x8-block solid colors: every block DC-only -> exact at q95
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    for by in range(2):
        for bx in range(2):
            for c in range(3):
                img[by * 8 :][:8, bx * 8 : bx * 8 + 8, c] = (
                    37 + bx * 19 + by * 23 + c * 41
                ) % 256
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, 95))
    assert np.array_equal(out, img)


@pytest.mark.parametrize("h,w", [(45, 67), (8, 8), (33, 16), (17, 19)])
def test_textured_roundtrip_psnr(h, w):
    img = _textured(h, w)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, 90))
    assert out.shape == (h, w, 3)
    assert _psnr(out, img) > 30


def test_420_and_restart_modes():
    img = _textured(45, 67)
    for kw in (
        dict(subsampling="420"),
        dict(restart_interval=3),
        dict(subsampling="420", restart_interval=2),
    ):
        out = decode_jpeg_baseline(encode_jpeg_baseline(img, 90, **kw))
        assert out.shape == img.shape
        assert _psnr(out, img) > 30, kw


def test_grayscale_roundtrip():
    gray = _textured(40, 56)[..., 0]
    out = decode_jpeg_baseline(encode_jpeg_baseline(gray, 90))
    assert out.shape == (40, 56, 3)
    assert np.array_equal(out[..., 0], out[..., 1])  # replicated channels
    assert _psnr(out[..., 0], gray) > 32


def test_quality_tradeoff_monotone():
    img = _textured(48, 48)
    sizes, errs = [], []
    for q in (30, 60, 90):
        p = encode_jpeg_baseline(img, q)
        out = decode_jpeg_baseline(p)
        sizes.append(len(p))
        errs.append(np.mean(np.abs(out.astype(int) - img.astype(int))))
    assert sizes[0] < sizes[1] < sizes[2]
    assert errs[0] > errs[2]


def test_rejections():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"not a jpeg")
    img = _textured(16, 16)
    p = bytearray(encode_jpeg_baseline(img, 90))
    # flip SOF0 -> SOF2 (progressive): honest NotImplementedError
    i = p.find(b"\xff\xc0")
    p[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive|non-baseline"):
        decode_jpeg_baseline(bytes(p))
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg_baseline(img.astype(np.int32), 90)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg_baseline(img, 90, subsampling="411")


def test_mapinpandas_decode_features_path(spark):
    """The Spark-side plumbing: synth_jpeg_media -> decode_features
    (Arrow batches through mapInPandas) matches the closed form."""
    from cdm_cbioportal_etl_spark.text.multimodal import (
        decode_features,
        synth_jpeg_media,
    )

    ids = spark.createDataFrame([(i,) for i in range(6)], "media_id long")
    rows = decode_features(synth_jpeg_media(ids)).collect()
    assert len(rows) == 6
    for r in rows:
        mid = r["media_id"]
        for ci, f in enumerate(("f1", "f2", "f3")):
            expect = np.mean(
                [
                    (mid * 37 + bx * 19 + by * 23 + ci * 41) % 256
                    for bx in range(2)
                    for by in range(2)
                ]
            )
            assert abs(r[f] - expect) < 1e-9, (mid, f)
