"""Golden tests: wavelet/adain color fix vs torch transcriptions; YCbCr."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from instarevive_tpu.ops.color import (
    adain_color_fix,
    rgb2ycbcr_matlab,
    rgb_to_ycbcr,
    wavelet_color_fix,
    ycbcr_to_rgb,
)

_KVALS = [[0.0625, 0.125, 0.0625], [0.125, 0.25, 0.125], [0.0625, 0.125, 0.0625]]


def _torch_wavelet_blur(image, radius):
    kernel = torch.tensor(_KVALS, dtype=image.dtype)[None, None].repeat(3, 1, 1, 1)
    image = F.pad(image, (radius,) * 4, mode="replicate")
    return F.conv2d(image, kernel, groups=3, dilation=radius)


def _torch_wavelet_decomposition(image, levels=5):
    high = torch.zeros_like(image)
    for i in range(levels):
        radius = 2**i
        low = _torch_wavelet_blur(image, radius)
        high += image - low
        image = low
    return high, low


def test_wavelet_color_fix_matches_torch():
    rng = np.random.default_rng(0)
    content = rng.random((1, 64, 64, 3), dtype=np.float32)
    style = rng.random((1, 64, 64, 3), dtype=np.float32)

    tc = torch.from_numpy(np.transpose(content, (0, 3, 1, 2)))
    ts = torch.from_numpy(np.transpose(style, (0, 3, 1, 2)))
    chigh, _ = _torch_wavelet_decomposition(tc)
    _, slow = _torch_wavelet_decomposition(ts)
    ref = np.transpose((chigh + slow).numpy(), (0, 2, 3, 1))

    out = np.asarray(wavelet_color_fix(jnp.asarray(content), jnp.asarray(style)))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_adain_matches_torch():
    rng = np.random.default_rng(1)
    content = rng.random((2, 32, 32, 3), dtype=np.float32)
    style = rng.random((2, 32, 32, 3), dtype=np.float32)

    def calc(feat):
        b, c = feat.shape[:2]
        var = feat.reshape(b, c, -1).var(dim=2) + 1e-5
        std = var.sqrt().reshape(b, c, 1, 1)
        mean = feat.reshape(b, c, -1).mean(dim=2).reshape(b, c, 1, 1)
        return mean, std

    tc = torch.from_numpy(np.transpose(content, (0, 3, 1, 2)))
    ts = torch.from_numpy(np.transpose(style, (0, 3, 1, 2)))
    sm, ss = calc(ts)
    cm, cs = calc(tc)
    ref = ((tc - cm) / cs) * ss + sm
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))

    out = np.asarray(adain_color_fix(jnp.asarray(content), jnp.asarray(style)))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_jpeg_ycbcr_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.random((1, 16, 16, 3), dtype=np.float32) * 255.0
    out = np.asarray(ycbcr_to_rgb(rgb_to_ycbcr(jnp.asarray(img))))
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_rgb2ycbcr_matlab_known_values():
    # white -> Y = (65.481+128.553+24.966+16)/255 = 235/255
    white = jnp.ones((1, 1, 1, 3))
    y = np.asarray(rgb2ycbcr_matlab(white, y_only=True))
    np.testing.assert_allclose(y, 235.0 / 255.0, atol=1e-5)
    black = jnp.zeros((1, 1, 1, 3))
    y = np.asarray(rgb2ycbcr_matlab(black, y_only=True))
    np.testing.assert_allclose(y, 16.0 / 255.0, atol=1e-5)
