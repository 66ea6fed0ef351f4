"""Fold/unfold patch diffusion ops (reference ddpm.py:680-767)."""

import numpy as np
import pytest
import torch

from instarevive_tpu.ops.patching import (delta_border, fold, patch_weighting,
                                          patched_apply, unfold)


def test_unfold_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12, 16, 3)).astype(np.float32)
    ks, st = (6, 6), (3, 5)
    ours = np.asarray(unfold(x, ks, st))  # (B, L, kh, kw, C)

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    tu = torch.nn.functional.unfold(tx, kernel_size=ks, stride=st)  # (B, C*kh*kw, L)
    l = tu.shape[-1]
    tu = tu.reshape(2, 3, ks[0], ks[1], l).permute(0, 4, 2, 3, 1).numpy()
    assert ours.shape == tu.shape
    np.testing.assert_allclose(ours, tu, rtol=0, atol=0)


def test_fold_unfold_roundtrip_with_weighting():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 16, 16, 2)).astype(np.float32)
    ks, st = (8, 8), (4, 4)
    p = unfold(x, ks, st)
    ly = (16 - 8) // 4 + 1
    w = patch_weighting(8, 8, ly, ly)
    y = np.asarray(fold(p, (16, 16), st, weighting=w))
    np.testing.assert_allclose(y, x, rtol=1e-5, atol=1e-5)
    # unweighted + normalized also reconstructs
    y2 = np.asarray(fold(p, (16, 16), st))
    np.testing.assert_allclose(y2, x, rtol=1e-5, atol=1e-5)


def test_delta_border_properties():
    d = delta_border(9, 9)
    assert d[0, 0] == 0.0 and d[0, 4] == 0.0 and d[4, 0] == 0.0
    assert d[4, 4] == pytest.approx(0.5)
    assert d.max() <= 0.5


def test_patched_apply_identity_and_scale():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)

    y = np.asarray(patched_apply(lambda p: p, x, (8, 8), (4, 4)))
    np.testing.assert_allclose(y, x, rtol=1e-5, atol=1e-5)

    # uf=2 nearest upscale patch-wise == full-image nearest upscale
    # (nearest is seam-free, so feathered recombination is exact)
    def up2(p):
        return p.repeat(2, axis=1).repeat(2, axis=2)

    y2 = np.asarray(patched_apply(up2, x, (8, 8), (4, 4), uf=2))
    np.testing.assert_allclose(y2, np.asarray(up2(x)), rtol=1e-5, atol=1e-5)

    # df=2 average-pool patch-wise == full-image pool
    def down2(p):
        return p.reshape(p.shape[0], p.shape[1] // 2, 2, p.shape[2] // 2, 2, -1).mean((2, 4))

    y3 = np.asarray(patched_apply(down2, x, (8, 8), (4, 4), df=2))
    np.testing.assert_allclose(y3, np.asarray(down2(x)), rtol=1e-5, atol=1e-5)


def test_patched_apply_validates_scale():
    x = np.zeros((1, 16, 16, 1), np.float32)
    with pytest.raises(ValueError):
        patched_apply(lambda p: p[:, ::2, ::2], x, (8, 8), (4, 4), uf=1)
    with pytest.raises(ValueError):
        patched_apply(lambda p: p, x, (8, 8), (4, 4), uf=2, df=2)
