"""Numpy transcription of basicsr's NIQE as a numerical oracle.

The reference's metrics CLI calls ``pyiqa.create_metric('niqe')``
(reference: evaluate_img.py:15); pyiqa's NIQE is a torch re-implementation
numerically matched to basicsr's ``basicsr/metrics/niqe.py`` (itself a
port of the official MATLAB release).  This module transcribes that
algorithm faithfully — AGGD moment matching on the gam grid, 'nearest'
boundary convolution for the local stats, column-major block iteration,
MATLAB bicubic antialiased half-downscale — so tests can parity-check
``instarevive_tpu.utils.niqe`` against an independent implementation.

The half-downscale uses the REFERENCE repo's own MATLAB-style
``imresize_np`` (reference: utils/util_image.py:312-446), imported with
stubbed heavy deps, making the resize leg a true reference-code oracle.
"""

from __future__ import annotations

import importlib.util
import math
import sys
import types

import numpy as np
from scipy.ndimage import convolve
from scipy.special import gamma as _gamma

_REF = "/root/reference"


def _load_ref_util_image():
    if "ref_util_image" in sys.modules:
        return sys.modules["ref_util_image"]
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.img_as_ubyte = lambda x: np.clip(x * 255.0 + 0.5, 0, 255).astype(np.uint8)
        sk.img_as_float32 = lambda x: np.asarray(x, np.float32) / 255.0
        sys.modules["skimage"] = sk
    spec = importlib.util.spec_from_file_location(
        "ref_util_image", f"{_REF}/utils/util_image.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_util_image"] = mod
    spec.loader.exec_module(mod)
    return mod


def oracle_to_y_channel(img: np.ndarray) -> np.ndarray:
    """basicsr ``to_y_channel`` on HWC float [0, 255] → Y in [0, 255].

    Limited-range BT.601: y = 65.481 R' + 128.553 G' + 24.966 B' + 16,
    with R'G'B' in [0, 1].
    """
    img = np.asarray(img, np.float64) / 255.0
    return img @ np.array([65.481, 128.553, 24.966]) + 16.0


def oracle_estimate_aggd_param(block: np.ndarray):
    block = block.flatten()
    gam = np.arange(0.2, 10.001, 0.001)
    gam_reciprocal = np.reciprocal(gam)
    r_gam = np.square(_gamma(gam_reciprocal * 2)) / (
        _gamma(gam_reciprocal) * _gamma(gam_reciprocal * 3)
    )
    left_std = np.sqrt(np.mean(block[block < 0] ** 2))
    right_std = np.sqrt(np.mean(block[block > 0] ** 2))
    gammahat = left_std / right_std
    rhat = (np.mean(np.abs(block))) ** 2 / np.mean(block**2)
    rhatnorm = (rhat * (gammahat**3 + 1) * (gammahat + 1)) / (
        (gammahat**2 + 1) ** 2
    )
    array_position = np.argmin((r_gam - rhatnorm) ** 2)
    alpha = gam[array_position]
    beta_l = left_std * np.sqrt(_gamma(1 / alpha) / _gamma(3 / alpha))
    beta_r = right_std * np.sqrt(_gamma(1 / alpha) / _gamma(3 / alpha))
    return alpha, beta_l, beta_r


def oracle_compute_feature(block: np.ndarray) -> list:
    feat = []
    alpha, beta_l, beta_r = oracle_estimate_aggd_param(block)
    feat.extend([alpha, (beta_l + beta_r) / 2])
    shifts = [[0, 1], [1, 0], [1, 1], [1, -1]]
    for shift in shifts:
        shifted_block = np.roll(block, shift, axis=(0, 1))
        alpha, beta_l, beta_r = oracle_estimate_aggd_param(block * shifted_block)
        mean = (beta_r - beta_l) * (_gamma(2 / alpha) / _gamma(1 / alpha))
        feat.extend([alpha, mean, beta_l, beta_r])
    return feat


def oracle_gaussian_window(size: int = 7, sigma: float = 7.0 / 6.0) -> np.ndarray:
    half = (size - 1) / 2.0
    coords = np.arange(size) - half
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    w = np.outer(g, g)
    return w / w.sum()


def oracle_niqe_features(
    img: np.ndarray, block_size_h: int = 96, block_size_w: int = 96
) -> np.ndarray:
    """Per-block 36-dim features, basicsr block order (column-major)."""
    ref = _load_ref_util_image()
    img = np.asarray(img, np.float64)
    h, w = img.shape
    num_block_h = math.floor(h / block_size_h)
    num_block_w = math.floor(w / block_size_w)
    img = img[0 : num_block_h * block_size_h, 0 : num_block_w * block_size_w]
    gaussian_window = oracle_gaussian_window()

    distparam = []
    for scale in (1, 2):
        mu = convolve(img, gaussian_window, mode="nearest")
        sigma = np.sqrt(
            np.abs(convolve(np.square(img), gaussian_window, mode="nearest") - np.square(mu))
        )
        img_nomalized = (img - mu) / (sigma + 1)
        feat = []
        for idx_w in range(num_block_w):
            for idx_h in range(num_block_h):
                block = img_nomalized[
                    idx_h * block_size_h // scale : (idx_h + 1) * block_size_h // scale,
                    idx_w * block_size_w // scale : (idx_w + 1) * block_size_w // scale,
                ]
                feat.append(oracle_compute_feature(block))
        distparam.append(np.array(feat))
        if scale == 1:
            img = ref.imresize_np(img[:, :, None] / 255.0, scale=0.5)[:, :, 0]
            img = img * 255.0
    return np.concatenate(distparam, axis=1)


def oracle_niqe(
    img: np.ndarray,
    mu_pris_param: np.ndarray,
    cov_pris_param: np.ndarray,
    block_size_h: int = 96,
    block_size_w: int = 96,
) -> float:
    """basicsr ``niqe`` main: grayscale [0,255] (already Y + rounded)."""
    distparam = oracle_niqe_features(img, block_size_h, block_size_w)
    mu_distparam = np.nanmean(distparam, axis=0)
    distparam_no_nan = distparam[~np.isnan(distparam).any(axis=1)]
    cov_distparam = np.cov(distparam_no_nan, rowvar=False)
    invcov_param = np.linalg.pinv((cov_pris_param + cov_distparam) / 2)
    diff = mu_pris_param.reshape(-1) - mu_distparam
    quality = np.matmul(np.matmul(diff, invcov_param), diff.T)
    return float(np.sqrt(quality))
