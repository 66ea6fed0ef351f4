"""NIQE no-reference metric (reference evaluate_img.py:15 via pyiqa).

Validates the statistical estimators against known distributions and the
end metric's monotonicity under distortion — the properties NIQE's
published behavior rests on.
"""

import numpy as np
import pytest

from instarevive_tpu.utils.niqe import (NiqePristineModel, _aggd_fit,
                                        _ggd_fit, fit_pristine_model, niqe,
                                        niqe_features)


def _smooth_noise(seed, shape=(192, 192), blur=2.0):
    from scipy.ndimage import gaussian_filter

    r = np.random.default_rng(seed)
    im = gaussian_filter(r.random(shape) * 255.0, blur)
    return (im - im.min()) / (np.ptp(im) + 1e-9) * 255.0


def test_ggd_fit_recovers_gaussian_and_laplacian():
    r = np.random.default_rng(0)
    a_gauss, sig2 = _ggd_fit(r.normal(0.0, 1.5, 200_000))
    assert abs(a_gauss - 2.0) < 0.05
    assert abs(sig2 - 2.25) < 0.05
    a_lap, _ = _ggd_fit(r.laplace(0.0, 1.0, 200_000))
    assert abs(a_lap - 1.0) < 0.05


def test_aggd_fit_recovers_asymmetry():
    import math

    r = np.random.default_rng(1)
    # true AGGD with alpha=2, beta_l=1, beta_r=2: half-gaussian halves with
    # conditional sigma = beta*sqrt(G(3/a)/G(1/a)) and mass split bl:(bl+br)
    n = 400_000
    bl, br = 1.0, 2.0
    s = math.sqrt(math.gamma(1.5) / math.gamma(0.5))
    side = r.random(n) < bl / (bl + br)
    x = np.where(
        side,
        -np.abs(r.normal(0.0, bl * s, n)),
        np.abs(r.normal(0.0, br * s, n)),
    )
    alpha, beta_l, beta_r = _aggd_fit(x)
    assert abs(alpha - 2.0) < 0.1
    assert abs(beta_l - bl) < 0.05
    assert abs(beta_r - br) < 0.05


def test_feature_shape_and_finiteness():
    feats = niqe_features(_smooth_noise(2), block_size=96)
    assert feats.shape == (4, 36)  # 2x2 blocks of 96 in a 192^2 image
    assert np.isfinite(feats).all()


def test_niqe_ranks_distortions():
    from scipy.ndimage import gaussian_filter

    model = fit_pristine_model([_smooth_noise(i) for i in range(6)])
    assert np.isfinite(model.mu).all() and np.isfinite(model.cov).all()

    clean = _smooth_noise(100)
    noisy = np.clip(clean + np.random.default_rng(1).normal(0, 40, clean.shape), 0, 255)
    blurry = gaussian_filter(clean, 6.0)
    s_clean = niqe(clean, model)
    assert niqe(noisy, model) > s_clean
    assert niqe(blurry, model) > s_clean
    # RGB [0,1] input resolves through pyiqa's limited-range to_y_channel
    rgb = np.stack([clean / 255.0] * 3, axis=-1)
    y_limited = np.round(clean / 255.0 * (65.481 + 128.553 + 24.966) + 16.0)
    assert niqe(rgb, model) == pytest.approx(niqe(y_limited, model), rel=1e-6)


def test_pris_params_npz_roundtrip(tmp_path):
    from instarevive_tpu.utils.niqe import load_pris_params

    model = fit_pristine_model([_smooth_noise(7)])
    p = tmp_path / "niqe_pris_params.npz"
    np.savez(p, mu_pris_param=model.mu[None], cov_pris_param=model.cov)
    loaded = load_pris_params(str(p))
    assert isinstance(loaded, NiqePristineModel)
    np.testing.assert_allclose(loaded.mu, model.mu)
    np.testing.assert_allclose(loaded.cov, model.cov)
    img = _smooth_noise(8)
    assert niqe(img, loaded) == pytest.approx(niqe(img, model))


def test_too_small_image_raises():
    with pytest.raises(ValueError):
        niqe_features(np.zeros((64, 64)), block_size=96)
