"""DiffJPEG: self-consistency + cross-check against real cv2 JPEG."""

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from instarevive_tpu.ops.diffjpeg import (
    _dct8x8,
    _idct8x8,
    jpeg_compress_decompress,
    quality_to_factor,
)


def test_quality_factor_values():
    f = np.asarray(quality_to_factor(jnp.asarray([10.0, 50.0, 90.0, 100.0])))
    np.testing.assert_allclose(f, [5.0, 1.0, 0.2, 0.01], atol=1e-6)


def test_dct_roundtrip():
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(rng.random((1, 4, 8, 8), dtype=np.float32) * 255.0)
    rec = _idct8x8(_dct8x8(blocks))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(blocks), atol=1e-3)


def _smooth_img(seed, size=64):
    import cv2

    rng = np.random.default_rng(seed)
    base = rng.random((8, 8, 3)).astype(np.float32)
    return cv2.resize(base, (size, size), interpolation=cv2.INTER_CUBIC).clip(0, 1)


def test_high_quality_is_near_lossless():
    # smooth image: high-quality JPEG error is dominated by chroma subsample
    img = jnp.asarray(_smooth_img(1)[None])
    out = jpeg_compress_decompress(img, 100.0, differentiable=False)
    assert np.abs(np.asarray(out) - np.asarray(img)).mean() < 0.03


def test_low_quality_degrades_more():
    img = jnp.asarray(_smooth_img(2)[None])
    e90 = np.abs(np.asarray(jpeg_compress_decompress(img, 90.0)) - np.asarray(img)).mean()
    e20 = np.abs(np.asarray(jpeg_compress_decompress(img, 20.0)) - np.asarray(img)).mean()
    assert e20 > e90 * 1.5


def test_close_to_cv2_jpeg():
    """DiffJPEG should track real JPEG closely on a smooth natural-ish image."""
    rng = np.random.default_rng(3)
    base = rng.random((8, 8, 3), dtype=np.float32)
    img = cv2.resize(base, (64, 64), interpolation=cv2.INTER_CUBIC).clip(0, 1)

    for q in (30, 70):
        enc = cv2.imencode(".jpg", (img[..., ::-1] * 255).astype(np.uint8), [cv2.IMWRITE_JPEG_QUALITY, q])[1]
        ref = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1].astype(np.float32) / 255.0
        out = np.asarray(
            jpeg_compress_decompress(jnp.asarray(img[None]), float(q), differentiable=False)
        )[0]
        # not bit-exact (libjpeg integer DCT, different chroma filters) but
        # closely tracking — same ballpark as the torch DiffJPEG reference
        assert np.abs(out - ref).mean() < 0.035, q


def test_per_sample_quality_and_grad():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))

    out = jpeg_compress_decompress(img, jnp.asarray([20.0, 95.0]))
    assert out.shape == img.shape

    def loss(x):
        return jnp.sum(jpeg_compress_decompress(x, 50.0) ** 2)

    g = jax.grad(loss)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
