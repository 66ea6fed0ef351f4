"""Degradation synthesis: kernels vs numpy/scipy reference math; noise stats."""

import math

import numpy as np
import pytest
from scipy import special

import jax
import jax.numpy as jnp

from instarevive_tpu.ops.degradation import (
    KernelConfig,
    bessel_j1,
    bivariate_gaussian,
    bivariate_generalized_gaussian,
    bivariate_plateau,
    circular_lowpass_kernel,
    generate_gaussian_noise,
    random_add_gaussian_noise,
    random_add_poisson_noise,
    sample_final_sinc_kernel,
    sample_stage_kernel,
)


def _np_mesh_grid(k):
    ax = np.arange(-k // 2 + 1.0, k // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    return np.stack([xx, yy], axis=-1)


def _np_bivariate_gaussian(k, sx, sy, theta, iso):
    grid = _np_mesh_grid(k)
    if iso:
        sigma = np.array([[sx**2, 0], [0, sx**2]])
    else:
        d = np.array([[sx**2, 0], [0, sy**2]])
        u = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
        sigma = u @ d @ u.T
    inv = np.linalg.inv(sigma)
    kern = np.exp(-0.5 * np.sum((grid @ inv) * grid, 2))
    return kern / kern.sum()


@pytest.mark.parametrize("iso", [True, False])
def test_bivariate_gaussian_matches_numpy(iso):
    out = np.asarray(bivariate_gaussian(21, 2.0, 0.7, 0.8, isotropic=iso))
    ref = _np_bivariate_gaussian(21, 2.0, 0.7, 0.8, iso)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_generalized_gaussian_and_plateau_match_numpy():
    grid = _np_mesh_grid(21)
    d = np.array([[1.5**2, 0], [0, 0.9**2]])
    u = np.array([[np.cos(0.3), -np.sin(0.3)], [np.sin(0.3), np.cos(0.3)]])
    inv = np.linalg.inv(u @ d @ u.T)
    q = np.sum((grid @ inv) * grid, 2)

    ref_g = np.exp(-0.5 * np.power(q, 1.7))
    ref_g /= ref_g.sum()
    out_g = np.asarray(
        bivariate_generalized_gaussian(21, 1.5, 0.9, 0.3, 1.7, isotropic=False)
    )
    np.testing.assert_allclose(out_g, ref_g, atol=1e-6)

    ref_p = 1.0 / (np.power(q, 1.3) + 1.0)
    ref_p /= ref_p.sum()
    out_p = np.asarray(bivariate_plateau(21, 1.5, 0.9, 0.3, 1.3, isotropic=False))
    np.testing.assert_allclose(out_p, ref_p, atol=1e-6)


def test_bessel_j1_matches_scipy():
    x = np.linspace(-30, 30, 501)
    np.testing.assert_allclose(np.asarray(bessel_j1(jnp.asarray(x))), special.j1(x), atol=5e-6)


@pytest.mark.parametrize("ksize,cutoff", [(21, np.pi / 3), (13, 2.0), (7, np.pi)])
def test_sinc_kernel_matches_reference_formula(ksize, cutoff):
    # reference circular_lowpass_kernel (utils/degradation.py:390)
    with np.errstate(divide="ignore", invalid="ignore"):
        ref = np.fromfunction(
            lambda x, y: cutoff
            * special.j1(
                cutoff * np.sqrt((x - (ksize - 1) / 2) ** 2 + (y - (ksize - 1) / 2) ** 2)
            )
            / (2 * np.pi * np.sqrt((x - (ksize - 1) / 2) ** 2 + (y - (ksize - 1) / 2) ** 2)),
            [ksize, ksize],
        )
    ref[(ksize - 1) // 2, (ksize - 1) // 2] = cutoff**2 / (4 * np.pi)
    ref = ref / ref.sum()
    out = np.asarray(circular_lowpass_kernel(cutoff, ksize))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_masked_sinc_equals_padded_small_sinc():
    # active_size masking on the 21-grid == synthesize at 13 then zero-pad.
    small = np.asarray(circular_lowpass_kernel(2.0, 13))
    padded = np.pad(small, ((4, 4), (4, 4)))
    masked = np.asarray(circular_lowpass_kernel(2.0, 21, active_size=13))
    np.testing.assert_allclose(masked, padded, atol=1e-6)


def test_sampled_kernels_are_valid():
    cfg = KernelConfig()
    keys = jax.random.split(jax.random.key(0), 16)
    kernels = jax.vmap(lambda k: sample_stage_kernel(k, cfg))(keys)
    assert kernels.shape == (16, 21, 21)
    np.testing.assert_allclose(np.asarray(kernels.sum(axis=(1, 2))), 1.0, atol=1e-4)

    finals = jax.vmap(lambda k: sample_final_sinc_kernel(k, cfg, 0.8))(keys)
    np.testing.assert_allclose(np.asarray(finals.sum(axis=(1, 2))), 1.0, atol=1e-4)


def test_gaussian_noise_stats():
    key = jax.random.key(1)
    img = jnp.full((2, 64, 64, 3), 0.5)
    sigma = jnp.asarray([10.0, 20.0])
    gray = jnp.asarray([0.0, 1.0])
    noise = np.asarray(generate_gaussian_noise(key, img, sigma, gray))
    assert abs(noise[0].std() * 255 - 10.0) < 0.5
    assert abs(noise[1].std() * 255 - 20.0) < 1.0
    # gray noise identical across channels
    np.testing.assert_allclose(noise[1][..., 0], noise[1][..., 1])
    assert not np.allclose(noise[0][..., 0], noise[0][..., 1])


def test_noise_pipelines_run_and_clip():
    key = jax.random.key(2)
    img = jnp.clip(jax.random.uniform(key, (2, 32, 32, 3)), 0, 1)
    g = random_add_gaussian_noise(key, img, (1.0, 30.0), gray_prob=0.4)
    p = random_add_poisson_noise(key, img, (0.05, 3.0), gray_prob=0.4)
    for out in (g, p):
        out = np.asarray(out)
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert out.shape == (2, 32, 32, 3)
