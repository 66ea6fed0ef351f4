"""Pipeline parallelism (parallel/pp.py): GPipe over a 'pipe' mesh axis.

Beyond reference — SURVEY §2.5 "Other parallelism: none". The pipelined
PixArt forward (blocks stacked + sharded over 'pipe', shard_map microbatch
schedule with ppermute hops) must match the monolithic single-device
forward, the per-stage weights must physically live on their stage's
device, and the compiled program must carry the neighbor collective.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instarevive_tpu.models.pixart import PixArt

TOY = dict(
    input_size=8,
    patch_size=2,
    hidden_size=64,
    depth=4,
    num_heads=4,
    caption_channels=32,
    model_max_length=6,
    mlp_ratio=2.0,
)


def _toy(depth=4, **over):
    cfg = dict(TOY, depth=depth, **over)
    model = PixArt(**cfg)
    b = 4
    x = jax.random.normal(jax.random.key(0), (b, 8, 8, 4))
    t = jnp.full((b,), 400.0)
    y = jax.random.normal(jax.random.key(1), (b, cfg["model_max_length"], cfg["caption_channels"])) * 0.1
    params = model.init(jax.random.key(2), x[:1], t[:1], y[:1])["params"]
    return model, params, x, t, y


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs a multi-device mesh")
@pytest.mark.parametrize("stages,microbatches", [(4, 2), (2, 4), (4, 1)])
def test_pp_forward_matches_monolithic(stages, microbatches):
    from instarevive_tpu.parallel.pp import make_pipe_mesh, pixart_pp_forward

    model, params, x, t, y = _toy()
    mesh = make_pipe_mesh(stages)
    out_pp = np.asarray(
        pixart_pp_forward(model, params, mesh, x, t, y, microbatches=microbatches)
    )
    ref = np.asarray(model.apply({"params": params}, x, t, y))
    np.testing.assert_allclose(out_pp, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs a multi-device mesh")
def test_pp_forward_with_kv_mask_matches():
    from instarevive_tpu.parallel.pp import make_pipe_mesh, pixart_pp_forward

    model, params, x, t, y = _toy()
    mask = jnp.asarray(
        np.random.default_rng(3).random((x.shape[0], y.shape[1])) < 0.7
    )
    mask = mask.at[:, 0].set(True)  # no fully-masked row
    mesh = make_pipe_mesh(4)
    out_pp = np.asarray(
        pixart_pp_forward(model, params, mesh, x, t, y, mask, microbatches=2)
    )
    ref = np.asarray(model.apply({"params": params}, x, t, y, mask))
    np.testing.assert_allclose(out_pp, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs a multi-device mesh")
def test_pp_weights_are_stage_resident_and_program_has_permute():
    """Each device holds exactly depth/S blocks of every stacked leaf, and
    the jitted pipeline program contains the ppermute neighbor hop."""
    from instarevive_tpu.parallel.pp import (
        make_pipe_mesh,
        pixart_pp_forward,
        shard_stacked,
        stack_block_params,
    )

    model, params, x, t, y = _toy()
    mesh = make_pipe_mesh(4)
    stacked = shard_stacked(stack_block_params(params, model.depth), mesh)

    qkv = stacked["attn"]["qkv"]["kernel"]  # (depth, in, out)
    assert qkv.shape[0] == model.depth
    for shard in qkv.addressable_shards:
        assert shard.data.shape[0] == model.depth // 4  # blocks per stage
    # distinct stages hold distinct block slices (device 0 vs last)
    d0 = np.asarray(qkv.addressable_shards[0].data)
    dl = np.asarray(qkv.addressable_shards[-1].data)
    assert not np.allclose(d0, dl)

    fn = jax.jit(
        lambda p, st, xx, tt, yy: pixart_pp_forward(
            model, p, mesh, xx, tt, yy, microbatches=2, stacked=st
        )
    )
    txt = fn.lower(params, stacked, x, t, y).compile().as_text()
    assert "collective-permute" in txt, "pipeline hop missing from compiled program"
    out = np.asarray(fn(params, stacked, x, t, y))
    ref = np.asarray(model.apply({"params": params}, x, t, y))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_pp_rejects_heterogeneous_stacks():
    from instarevive_tpu.parallel.pp import make_pipe_mesh, pixart_pp_forward

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    model, params, x, t, y = _toy(window_size=4, window_block_indexes=(1,))
    mesh = make_pipe_mesh(2)
    with pytest.raises(NotImplementedError):
        pixart_pp_forward(model, params, mesh, x, t, y)
