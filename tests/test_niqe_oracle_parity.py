"""NIQE parity vs a basicsr transcription oracle (tests/niqe_oracle.py).

The reference's metrics CLI scores NIQE via pyiqa (reference:
evaluate_img.py:15), whose implementation is numerically matched to
basicsr's.  These tests run the native implementation
(instarevive_tpu/utils/niqe.py) and the oracle end to end on shared
inputs — feature extraction, pristine-model fit, and final Mahalanobis
score — so a drifting estimator, wrong boundary mode, or wrong Y-channel
convention fails loudly instead of silently shifting published-score
comparability.
"""

import math

import numpy as np
import pytest

from instarevive_tpu.utils.niqe import (NiqePristineModel, _block_features,
                                        _to_gray_255, niqe, niqe_features)

from niqe_oracle import (oracle_compute_feature, oracle_niqe,
                         oracle_niqe_features, oracle_to_y_channel)


def _smooth(seed, shape=(192, 192), blur=2.0):
    from scipy.ndimage import gaussian_filter

    r = np.random.default_rng(seed)
    im = gaussian_filter(r.random(shape) * 255.0, blur)
    return np.round((im - im.min()) / (np.ptp(im) + 1e-9) * 255.0)


def test_block_features_match_oracle():
    r = np.random.default_rng(0)
    for _ in range(3):
        block = r.normal(0.0, 1.0, (48, 48))
        ours = _block_features(block)
        ref = np.asarray(oracle_compute_feature(block))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_y_channel_matches_oracle():
    r = np.random.default_rng(1)
    rgb01 = r.random((8, 8, 3))
    ours = _to_gray_255(rgb01)
    ref = np.round(oracle_to_y_channel(rgb01 * 255.0))
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_features_match_oracle_both_scales():
    img = _smooth(2, shape=(192, 288))
    ours = niqe_features(img)  # row-major block order, (nbh*nbw, 36)
    ref = oracle_niqe_features(img)  # column-major block order
    nbh, nbw = img.shape[0] // 96, img.shape[1] // 96
    ours_cm = ours.reshape(nbh, nbw, 36).transpose(1, 0, 2).reshape(-1, 36)
    # scale-1 features (cols 0:18) share the exact same input; scale-2
    # (cols 18:36) go through our f32 imresize_matlab vs the reference's
    # f32 imresize_np — identical algorithm, different op order.
    np.testing.assert_allclose(ours_cm[:, :18], ref[:, :18], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ours_cm[:, 18:], ref[:, 18:], rtol=1e-4, atol=1e-6)


def test_niqe_score_matches_oracle():
    from instarevive_tpu.utils.niqe import fit_pristine_model

    model = fit_pristine_model([_smooth(i) for i in range(4)])
    img = _smooth(50, shape=(288, 192))
    s_ours = niqe(img, model)
    s_ref = oracle_niqe(img, model.mu, model.cov)
    assert math.isfinite(s_ours)
    assert s_ours == pytest.approx(s_ref, rel=1e-4)

    # end-to-end from RGB: our niqe() applies to_y_channel itself
    rgb01 = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], -1) / 255.0
    s_rgb = niqe(rgb01, model)
    s_rgb_ref = oracle_niqe(np.round(oracle_to_y_channel(rgb01 * 255.0)),
                            model.mu, model.cov)
    assert s_rgb == pytest.approx(s_rgb_ref, rel=1e-4)
