"""Data-parallel inference: sharded multi-chip process == single-device.

``RestorationPipeline.jitted_sharded`` runs ONE jitted program with the
batch sharded over the ('data','fsdp') mesh and params replicated (the
serving-scale path, serve.py --data_parallel). On the 8-virtual-device
CPU mesh (conftest sets xla_force_host_platform_device_count) we assert
the sharded program's outputs match the unsharded reference per sample.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs a multi-device mesh")
def test_sharded_process_matches_unsharded():
    from instarevive_tpu.config import load_config
    from instarevive_tpu.parallel.mesh import make_mesh
    from instarevive_tpu.pipelines.build import build_pipeline, init_params

    cfg = load_config(os.path.join(REPO, "configs", "tiny.yaml"))
    pipe = build_pipeline(cfg)
    params = init_params(pipe, seed=0)

    n = 4
    mesh = make_mesh(data=n, devices=jax.devices()[:n])
    b = n  # one sample per device
    lq = jnp.asarray(
        np.random.default_rng(0).uniform(0.2, 0.8, (b, 64, 64, 3)), jnp.float32
    )
    y = jnp.zeros((b, pipe.dit.model_max_length, pipe.dit.caption_channels))

    sharded = pipe.jitted_sharded(mesh, color_fix="wavelet")
    out_sh = np.asarray(sharded(params, lq, y))

    ref = pipe.process(params, lq, y, color_fix="wavelet")
    np.testing.assert_allclose(out_sh, np.asarray(ref), atol=2e-4, rtol=2e-4)
    assert out_sh.shape == (b, 64, 64, 3)
