"""End-to-end restoration pipeline + CLI tests (tiny config, CPU)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instarevive_tpu.config import load_config
from instarevive_tpu.pipelines.build import build_pipeline, init_params
from instarevive_tpu.pipelines.restore import sliding_offsets, tile_grid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny():
    cfg = load_config(os.path.join(REPO, "configs", "tiny.yaml"))
    pipe = build_pipeline(cfg)
    params = init_params(pipe, seed=0)
    y = jnp.zeros((1, pipe.dit.model_max_length, pipe.dit.caption_channels))
    return pipe, params, y


def test_sliding_offsets_match_reference_semantics():
    # _sliding_windows(h=100, tile=64, stride=56) -> [0, 100-64]
    assert list(sliding_offsets(100, 64, 56)) == [0, 36]
    assert list(sliding_offsets(64, 64, 56)) == [0]
    assert list(sliding_offsets(200, 64, 56)) == [0, 56, 112, 136]
    assert tile_grid(128, 192, 64, 56).shape == (3 * 4, 2)


def test_auto_tile_geometry():
    from instarevive_tpu.pipelines.restore import auto_tile_geometry

    # 1024^2: 576/512 covers in 4 tiles (1.27x work) vs 512/448's 9 (2.25x)
    assert auto_tile_geometry(1024, 1024) == (576, 512)
    # 2048^2: 16x576^2 (1.27x) beats 25x512^2 and 16x640^2 (both 1.56x)
    assert auto_tile_geometry(2048, 2048) == (576, 512)
    # rectangular: valid geometry, fits the short edge
    t, s = auto_tile_geometry(832, 1472)
    assert t <= 832 and s == t - 64 and t % 64 == 0
    # image smaller than all candidates: one full ×64 tile
    t, s = auto_tile_geometry(448, 448)
    assert t == 448 and s <= t
    # picked geometry actually tiles: every latent offset in range
    for h, w in ((1024, 1024), (832, 1472), (1088, 1088)):
        t, s = auto_tile_geometry(h, w)
        offs = tile_grid(h // 8, w // 8, t // 8, s // 8)
        assert (offs[:, 0] + t // 8 <= h // 8).all()
        assert (offs[:, 1] + t // 8 <= w // 8).all()


def test_process_shapes_and_finite(tiny):
    pipe, params, y = tiny
    lq = jnp.clip(jax.random.uniform(jax.random.key(1), (1, 128, 128, 3)), 0, 1)
    out = pipe.process(params, lq, y)
    assert out.shape == lq.shape
    assert np.isfinite(np.asarray(out)).all()
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_process_tiled_matches_untiled_when_single_tile(tiny):
    pipe, params, y = tiny
    lq = jnp.clip(jax.random.uniform(jax.random.key(2), (1, 128, 128, 3)), 0, 1)
    full = pipe.process(params, lq, y, color_fix="wavelet")
    tiled = pipe.process_tiled(params, lq, y, tile_size=128, tile_stride=128)
    np.testing.assert_allclose(np.asarray(full), np.asarray(tiled), atol=1e-5)


def test_process_tiled_overlap_runs(tiny):
    pipe, params, y = tiny
    lq = jnp.clip(jax.random.uniform(jax.random.key(3), (1, 192, 128, 3)), 0, 1)
    out = pipe.process_tiled(params, lq, y, tile_size=128, tile_stride=64)
    assert out.shape == lq.shape
    assert np.isfinite(np.asarray(out)).all()


def test_color_fix_and_preprocess_flags(tiny):
    pipe, params, y = tiny
    lq = jnp.clip(jax.random.uniform(jax.random.key(4), (1, 64, 64, 3)), 0, 1)
    a = pipe.process(params, lq, y, color_fix="none")
    b = pipe.process(params, lq, y, color_fix="adain")
    c = pipe.process(params, lq, y, use_swinir=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_cli_end_to_end(tmp_path):
    out_dir = tmp_path / "out"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "inference.py"),
            "--config", os.path.join(REPO, "configs", "tiny.yaml"),
            "--input", "/root/reference/assets/inputs/6.jpg",
            "--output", str(out_dir),
            "--random_init",
            "--sr_scale", "0.25",
            "--seed", "231",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert (out_dir / "6.png").exists()
    from PIL import Image

    img = Image.open(out_dir / "6.png")
    assert min(img.size) >= 512  # auto_resize upscales short edge to 512
