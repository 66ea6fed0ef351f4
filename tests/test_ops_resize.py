"""Golden tests: resize ops vs torch.nn.functional.interpolate and PIL."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

import jax.numpy as jnp

from instarevive_tpu.ops.resize import imresize_matlab, interpolate


def _rand_img(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((1, h, w, c), dtype=np.float32)


def _to_torch(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _from_torch(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("mode", ["nearest", "bilinear", "bicubic", "area"])
@pytest.mark.parametrize("shape", [((32, 48), (64, 96)), ((64, 64), (23, 31)), ((40, 40), (40, 40))])
def test_interpolate_matches_torch(mode, shape):
    (ih, iw), (oh, ow) = shape
    x = _rand_img(ih, iw)
    kwargs = {"align_corners": False} if mode in ("bilinear", "bicubic") else {}
    ref = F.interpolate(_to_torch(x), size=(oh, ow), mode=mode, **kwargs)
    out = interpolate(jnp.asarray(x), (oh, ow), mode=mode)
    np.testing.assert_allclose(np.asarray(out), _from_torch(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("scale", [0.5, 0.37, 2.0])
def test_interpolate_antialias_matches_torch(scale):
    x = _rand_img(64, 64)
    oh = ow = int(64 * scale)
    ref = F.interpolate(
        _to_torch(x), size=(oh, ow), mode="bicubic", align_corners=False, antialias=True
    )
    out = interpolate(jnp.asarray(x), (oh, ow), mode="bicubic", antialias=True)
    np.testing.assert_allclose(np.asarray(out), _from_torch(ref), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("out_size", [(128, 128), (48, 72), (200, 150)])
def test_pil_semantics_match_torch_aa_and_pil(out_size):
    # PIL BICUBIC == cubic a=-0.5, antialiased, renormalized edge taps.
    # torch's antialias path implements the same math in float; PIL itself
    # uses 8-bit fixed-point coefficients, so we assert bit-parity vs torch
    # and statistical closeness vs PIL (the reference's auto_resize path).
    rng = np.random.default_rng(1)
    img8 = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    x = jnp.asarray(img8[None].astype(np.float32) / 255.0)
    out = np.asarray(imresize_matlab(x, out_size, boundary="renorm"))[0]

    taa = F.interpolate(
        _to_torch(np.asarray(x)),
        size=out_size,
        mode="bicubic",
        align_corners=False,
        antialias=True,
    )
    np.testing.assert_allclose(out, _from_torch(taa)[0], atol=2e-5, rtol=1e-4)

    pil = Image.fromarray(img8).resize((out_size[1], out_size[0]), Image.BICUBIC)
    ref = np.asarray(pil).astype(np.float32) / 255.0
    assert np.abs(out - ref).mean() < 3e-3


def test_matlab_bicubic_identity():
    x = _rand_img(32, 32)
    out = imresize_matlab(jnp.asarray(x), (32, 32))
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)


def test_resize_preserves_constant():
    x = jnp.ones((2, 33, 47, 3))
    for mode in ["nearest", "bilinear", "bicubic", "area"]:
        out = interpolate(x, (20, 20), mode=mode)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)
    out = imresize_matlab(x, (20, 20))
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize(
    "shape", [((32, 48), (64, 96)), ((64, 64), (23, 31)), ((7, 9), (14, 18)), ((5, 5), (1, 1))]
)
def test_interpolate_align_corners_matches_torch(mode, shape):
    """align_corners=True path (DPT fusion upsamples, midas/blocks.py:335)."""
    (ih, iw), (oh, ow) = shape
    x = _rand_img(ih, iw)
    ref = F.interpolate(_to_torch(x), size=(oh, ow), mode=mode, align_corners=True)
    out = interpolate(jnp.asarray(x), (oh, ow), mode=mode, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), _from_torch(ref), atol=2e-5, rtol=1e-4)
