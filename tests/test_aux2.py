"""Second aux batch: masking, face helper, ISP, T5 cleaning."""

import numpy as np

import jax
import jax.numpy as jnp

from instarevive_tpu.models.t5 import clean_caption
from instarevive_tpu.ops.isp import apply_ccm, gamma_compression, interp1d, raw2rgb
from instarevive_tpu.ops.masking import (
    get_mask_indices,
    mask_out_tokens,
    unmask_tokens,
)
from instarevive_tpu.utils.face_helper import (
    FFHQ_TEMPLATE_512,
    align_face,
    paste_face_back,
    umeyama_similarity,
    warp_affine,
)


def test_token_masking_roundtrip():
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (2, 16, 8))
    for mt in ("random", "fft", "laplacian"):
        keep, restore = get_mask_indices(rng, x, 0.5, mt, hw=(4, 4))
        assert keep.shape == (2, 8)
        kept = mask_out_tokens(x, keep)
        assert kept.shape == (2, 8, 8)
        token = jnp.zeros((8,))
        full = unmask_tokens(kept, restore, token, 16)
        assert full.shape == x.shape
        # kept positions hold their original values
        x_np, keep_np, full_np = map(np.asarray, (x, keep, full))
        for b in range(2):
            for pos in keep_np[b]:
                assert np.allclose(full_np[b, pos], x_np[b, pos], atol=1e-6)


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.random((5, 2)).astype(np.float32) * 100
    theta, scale, t = 0.3, 1.7, np.array([10.0, -5.0])
    r = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    dst = scale * src @ r.T + t
    m = umeyama_similarity(src, dst)
    mapped = src @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(mapped, dst, atol=1e-3)


def test_face_align_and_paste_roundtrip():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((256, 256, 3), dtype=np.float32))
    # synthetic landmarks: shrunk template placed in the image
    lm = FFHQ_TEMPLATE_512 * 0.3 + 60.0
    face, m = align_face(img, lm, face_size=128)
    assert face.shape == (128, 128, 3)
    out = paste_face_back(img, face * 0.0 + 0.5, m, feather=8)
    assert out.shape == img.shape
    # pasted region changed, far corners untouched
    assert not np.allclose(np.asarray(out), np.asarray(img))
    np.testing.assert_allclose(np.asarray(out)[0, 0], np.asarray(img)[0, 0], atol=1e-4)


def test_warp_affine_identity():
    img = jnp.asarray(np.random.default_rng(2).random((32, 32, 3), dtype=np.float32))
    m = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    out = warp_affine(img, m, (32, 32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_interp1d_matches_numpy():
    x = jnp.asarray([[0.0, 1.0, 2.0, 3.0]] * 2)
    y = jnp.asarray([[0.0, 10.0, 20.0, 30.0], [0.0, 1.0, 4.0, 9.0]])
    xn = jnp.asarray([[0.5, 2.5], [1.5, 2.9]])
    out = np.asarray(interp1d(xn, x, y))
    want = np.stack([
        np.interp([0.5, 2.5], [0, 1, 2, 3], [0, 10, 20, 30]),
        np.interp([1.5, 2.9], [0, 1, 2, 3], [0, 1, 4, 9]),
    ])
    np.testing.assert_allclose(out, want, atol=1e-5)

    # differentiable (the torchinterp1d custom-autograd replacement)
    g = jax.grad(lambda q: interp1d(q, x, y).sum())(xn)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_raw2rgb_pipeline():
    rng = jax.random.key(0)
    bayer = jnp.clip(jax.random.uniform(rng, (2, 16, 16, 4)), 0, 1)
    ccm = jnp.broadcast_to(jnp.eye(3)[None], (2, 3, 3))
    out = raw2rgb(bayer, jnp.asarray([1.9, 2.1]), jnp.asarray([1.5, 1.6]), ccm)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # CRF path
    crf_i = jnp.linspace(0, 1, 32)
    crf_b = jnp.sqrt(crf_i)
    out2 = raw2rgb(bayer, jnp.asarray([1.9, 2.1]), jnp.asarray([1.5, 1.6]), ccm,
                   crf_i=crf_i, crf_b=crf_b)
    assert np.isfinite(np.asarray(out2)).all()


def test_clean_caption():
    s = clean_caption("Hello &amp; WORLD!!  https://x.com/abc  {weird}#tags")
    assert "http" not in s and "&" not in s and "{" not in s
    assert "hello" in s and "world" in s
