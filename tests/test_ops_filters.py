"""Golden tests: filter2d / gaussian blur / USM vs torch re-implementations."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from instarevive_tpu.ops.filters import (
    filter2d,
    gaussian_blur,
    gaussian_kernel1d,
    gaussian_kernel2d,
    usm_sharpen,
)


def _torch_filter2d(img_nchw, kernel_bkk):
    """Independent torch implementation of per-sample reflect-pad filtering."""
    b, c, h, w = img_nchw.shape
    k = kernel_bkk.size(-1)
    ph = k // 2
    x = F.pad(img_nchw, (ph, ph, ph, ph), mode="reflect")
    x = x.reshape(1, b * c, h + 2 * ph, w + 2 * ph)
    kern = kernel_bkk.repeat_interleave(c, dim=0).unsqueeze(1)
    out = F.conv2d(x, kern, groups=b * c)
    return out.view(b, c, h, w)


def test_filter2d_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.random((2, 24, 24, 3), dtype=np.float32)
    kernels = rng.random((2, 7, 7), dtype=np.float32)
    kernels /= kernels.sum(axis=(1, 2), keepdims=True)

    out = filter2d(jnp.asarray(img), jnp.asarray(kernels))
    ref = _torch_filter2d(
        torch.from_numpy(np.transpose(img, (0, 3, 1, 2))), torch.from_numpy(kernels)
    )
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_filter2d_pallas_matches_conv_path():
    """The Pallas shifted-FMA plane kernel == the XLA grouped-conv path.

    Exercised in interpret mode (the suite runs on CPU); on TPU the same
    kernel is the default filter2d path for degradation-canvas shapes.
    """
    from instarevive_tpu.ops.filters import _filter2d_pallas

    rng = np.random.default_rng(1)
    for (b, h, w, c), k in [((2, 128, 128, 3), 21), ((1, 160, 256, 3), 13)]:
        img = rng.random((b, h, w, c), dtype=np.float32)
        kernels = rng.random((b, k, k), dtype=np.float32)
        kernels /= kernels.sum(axis=(1, 2), keepdims=True)
        ref = filter2d(jnp.asarray(img), jnp.asarray(kernels))
        out = _filter2d_pallas(jnp.asarray(img), jnp.asarray(kernels), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


def test_filter2d_strips_matches_conv_path():
    """The strip-fold depthwise reformulation == the plain conv path (exact:
    strips carry real halo rows). This is the default filter2d path on TPU."""
    from instarevive_tpu.ops.filters import _filter2d_strips, _pick_strips

    rng = np.random.default_rng(2)
    for (b, h, w, c), k in [((2, 128, 128, 3), 21), ((1, 160, 96, 3), 13)]:
        img = rng.random((b, h, w, c), dtype=np.float32)
        kernels = rng.random((b, k, k), dtype=np.float32)
        kernels /= kernels.sum(axis=(1, 2), keepdims=True)
        s = _pick_strips(h, b * c)
        assert s is not None and s > 1
        ref = filter2d(jnp.asarray(img), jnp.asarray(kernels))
        out = _filter2d_strips(jnp.asarray(img), jnp.asarray(kernels), s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


def test_gaussian_kernel_matches_cv2():
    import cv2

    for ksize, sigma in [(51, 0.0), (21, 3.0), (7, 1.5)]:
        ref = cv2.getGaussianKernel(ksize, sigma).astype(np.float32).ravel()
        ours = gaussian_kernel1d(ksize, sigma)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_gaussian_blur_preserves_mean_ish():
    rng = np.random.default_rng(0)
    img = rng.random((1, 64, 64, 3), dtype=np.float32)
    out = np.asarray(gaussian_blur(jnp.asarray(img), 21, 2.0))
    assert abs(out.mean() - img.mean()) < 1e-2
    assert out.std() < img.std()  # blur reduces variance


def test_usm_sharpen_matches_torch_reference_math():
    """Check against a direct torch transcription of the USM formula."""
    rng = np.random.default_rng(3)
    img = rng.random((1, 40, 40, 3), dtype=np.float32)
    k2 = gaussian_kernel2d(51, 0.0)

    timg = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
    tk = torch.from_numpy(k2)[None]
    blur = _torch_filter2d(timg, tk)
    residual = timg - blur
    mask = (residual.abs() * 255 > 10).float()
    soft = _torch_filter2d(mask, tk)
    sharp = (timg + 0.5 * residual).clamp(0, 1)
    ref = soft * sharp + (1 - soft) * timg
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))

    out = np.asarray(usm_sharpen(jnp.asarray(img)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
