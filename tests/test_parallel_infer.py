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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs a multi-device mesh")
def test_tensor_parallel_process_matches_unsharded():
    """Megatron-style TP (beyond reference — SURVEY §2.5 'Other
    parallelism: none'): params sharded over the 'tensor' axis, attention
    split per head, XLA inserting the per-block all-reduces. Sharded
    output must match the single-device pipeline."""
    from instarevive_tpu.config import load_config
    from instarevive_tpu.parallel.mesh import make_mesh
    from instarevive_tpu.pipelines.build import build_pipeline, init_params

    cfg = load_config(os.path.join(REPO, "configs", "tiny.yaml"))
    pipe = build_pipeline(cfg)
    params = init_params(pipe, seed=0)

    mesh = make_mesh(data=2, tensor=4, devices=jax.devices()[:8])
    b = 2
    lq = jnp.asarray(
        np.random.default_rng(1).uniform(0.2, 0.8, (b, 64, 64, 3)), jnp.float32
    )
    y = jnp.zeros((b, pipe.dit.model_max_length, pipe.dit.caption_channels))

    tp_fn = pipe.jitted_tp(mesh, color_fix="wavelet")
    out_tp = np.asarray(tp_fn(params, lq, y))
    ref = pipe.process(params, lq, y, color_fix="wavelet")
    np.testing.assert_allclose(out_tp, np.asarray(ref), atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs a multi-device mesh")
def test_pipeline_parallel_process_matches_unsharded():
    """GPipe serving path (beyond reference — parallel/pp.py via
    RestorationPipeline.jitted_pp, serve.py --pipeline_parallel): the DiT
    stage-resident over 'pipe' with the blocks stripped from the
    replicated tree, full restore output == single-device pipeline. Second
    call exercises the stack-once cache."""
    from instarevive_tpu.config import load_config
    from instarevive_tpu.parallel.pp import make_pipe_mesh
    from instarevive_tpu.pipelines.build import build_pipeline, init_params

    cfg = load_config(os.path.join(REPO, "configs", "tiny.yaml"))
    pipe = build_pipeline(cfg)
    params = init_params(pipe, seed=0)

    mesh = make_pipe_mesh(2)  # tiny.yaml depth=2 -> one block per stage
    b = 2
    lq = jnp.asarray(
        np.random.default_rng(2).uniform(0.2, 0.8, (b, 64, 64, 3)), jnp.float32
    )
    y = jnp.zeros((b, pipe.dit.model_max_length, pipe.dit.caption_channels))

    pp_fn = pipe.jitted_pp(mesh, microbatches=2, color_fix="wavelet")
    out_pp = np.asarray(pp_fn(params, lq, y))
    ref = pipe.process(params, lq, y, color_fix="wavelet")
    np.testing.assert_allclose(out_pp, np.asarray(ref), atol=2e-4, rtol=2e-4)
    # cached-stack second call, different input
    out2 = np.asarray(pp_fn(params, lq[::-1], y))
    np.testing.assert_allclose(out2, np.asarray(ref)[::-1], atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs a multi-device mesh")
def test_sequence_parallel_process_matches_unsharded():
    """SP serving path (beyond reference — parallel/sp.py via
    RestorationPipeline.jitted_sp, serve.py --seq_parallel): the DiT's
    latent token axis sharded with per-block K/V all-gathers, full restore
    output == single-device pipeline."""
    from instarevive_tpu.config import load_config
    from instarevive_tpu.parallel.sp import make_seq_mesh
    from instarevive_tpu.pipelines.build import build_pipeline, init_params

    cfg = load_config(os.path.join(REPO, "configs", "tiny.yaml"))
    pipe = build_pipeline(cfg)
    params = init_params(pipe, seed=0)

    mesh = make_seq_mesh(4)  # 16 latent tokens -> 4 per device
    b = 2
    lq = jnp.asarray(
        np.random.default_rng(3).uniform(0.2, 0.8, (b, 64, 64, 3)), jnp.float32
    )
    y = jnp.zeros((b, pipe.dit.model_max_length, pipe.dit.caption_channels))

    sp_fn = pipe.jitted_sp(mesh, color_fix="wavelet")
    out_sp = np.asarray(sp_fn(params, lq, y))
    ref = pipe.process(params, lq, y, color_fix="wavelet")
    np.testing.assert_allclose(out_sp, np.asarray(ref), atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs a multi-device mesh")
def test_tp_shards_params_and_splits_heads():
    """The TP layout is real: row/column-parallel kernels are actually
    sharded, the compiled program carries tensor-axis all-reduces, and the
    attention runs with H/t heads per device (the constrain_heads hook —
    without it GSPMD may keep the whole attention replicated)."""
    import re

    from jax.sharding import NamedSharding, PartitionSpec as P

    from instarevive_tpu.models.pixart import PixArt
    from instarevive_tpu.parallel.mesh import make_mesh
    from instarevive_tpu.parallel.tp import shard_params_tp, tp_shardings

    m = PixArt(input_size=64, patch_size=2, in_channels=4, hidden_size=64,
               depth=2, num_heads=4, mlp_ratio=2.0, caption_channels=64,
               model_max_length=16, pred_sigma=True)
    x = jnp.zeros((2, 64, 64, 4))
    t = jnp.zeros((2,))
    y = jnp.zeros((2, 16, 64))
    params = m.init(jax.random.key(0), x, t, y)
    mesh = make_mesh(data=2, tensor=4, devices=jax.devices()[:8])

    sp = shard_params_tp(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(sp)[0]

    def pstr(path):
        return "/".join(str(getattr(k, "key", k)) for k in path)

    sharded = {pstr(p) for p, l in flat if not l.sharding.is_fully_replicated}
    # per block: attn proj, cross proj, fc1 kernel+bias, fc2 = 5 leaves
    assert "params/blocks_0/attn/proj/kernel" in sharded
    assert "params/blocks_0/cross_attn/proj/kernel" in sharded
    assert "params/blocks_1/mlp/fc1/kernel" in sharded
    assert "params/blocks_1/mlp/fc2/kernel" in sharded
    assert "params/blocks_0/attn/qkv/kernel" not in sharded  # packed: replicated

    ps = tp_shardings(params, mesh)
    bs = NamedSharding(mesh, P(("data", "fsdp")))
    with mesh:
        jf = jax.jit(m.apply, in_shardings=(ps, bs, NamedSharding(mesh, P()), bs))
        txt = jf.lower(params, x, t, y).compile().as_text()
        assert "all-reduce" in txt
        # heads split: 4 heads / tp=4 -> per-device head dim 1, head_dim 16
        assert re.search(r"f32\[\d+,1,\d+,16\]", txt), "attention not head-split"
        out = jf(params, x, t, y)
    ref = m.apply(params, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
