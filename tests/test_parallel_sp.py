"""Sequence/context parallelism (parallel/sp.py): token axis over 'seq'.

Beyond reference — SURVEY §5 "Long-context mechanisms" lists only
architectural levers (windows/KV-compress/masking/tiling); this adds the
distributed one. The sharded forward (local queries, all-gathered K/V)
must match the monolithic single-device forward exactly, and the compiled
program must carry the all-gather.
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
    depth=3,
    num_heads=4,
    caption_channels=32,
    model_max_length=6,
    mlp_ratio=2.0,
)


def _toy(**over):
    cfg = dict(TOY, **over)
    model = PixArt(**cfg)
    b = 2
    x = jax.random.normal(jax.random.key(0), (b, 8, 8, 4))
    t = jnp.full((b,), 400.0)
    y = jax.random.normal(jax.random.key(1), (b, cfg["model_max_length"], cfg["caption_channels"])) * 0.1
    params = model.init(jax.random.key(2), x[:1], t[:1], y[:1])["params"]
    return model, params, x, t, y


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs a multi-device mesh")
@pytest.mark.parametrize("shards", [2, 4])
def test_sp_forward_matches_monolithic(shards):
    from instarevive_tpu.parallel.sp import make_seq_mesh, pixart_sp_forward

    model, params, x, t, y = _toy()
    mesh = make_seq_mesh(shards)
    out_sp = np.asarray(pixart_sp_forward(model, params, mesh, x, t, y))
    ref = np.asarray(model.apply({"params": params}, x, t, y))
    np.testing.assert_allclose(out_sp, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs a multi-device mesh")
def test_sp_forward_with_kv_mask_and_program_has_gather():
    from instarevive_tpu.parallel.sp import make_seq_mesh, pixart_sp_forward

    model, params, x, t, y = _toy()
    mask = jnp.asarray(np.random.default_rng(3).random((x.shape[0], y.shape[1])) < 0.7)
    mask = mask.at[:, 0].set(True)
    mesh = make_seq_mesh(4)
    fn = jax.jit(lambda p, xx, tt, yy, mm: pixart_sp_forward(model, p, mesh, xx, tt, yy, mm))
    txt = fn.lower(params, x, t, y, mask).compile().as_text()
    assert "all-gather" in txt, "K/V sequence all-gather missing from compiled program"
    out_sp = np.asarray(fn(params, x, t, y, mask))
    ref = np.asarray(model.apply({"params": params}, x, t, y, mask))
    np.testing.assert_allclose(out_sp, ref, atol=1e-5, rtol=1e-5)


def test_sp_rejects_heterogeneous_stacks():
    from instarevive_tpu.parallel.sp import make_seq_mesh, pixart_sp_forward

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    model, params, x, t, y = _toy(
        kv_compress_sampling="uniform", kv_compress_ratio=2, kv_compress_layers=(1,)
    )
    mesh = make_seq_mesh(2)
    with pytest.raises(NotImplementedError):
        pixart_sp_forward(model, params, mesh, x, t, y)


def test_seq_parallel_flag_is_inert_single_device():
    """seq_parallel=False (the default everywhere) is bit-identical to the
    pre-flag model — the parity-critical guarantee."""
    model, params, x, t, y = _toy()
    a = model.apply({"params": params}, x, t, y)
    b = PixArt(**TOY).apply({"params": params}, x, t, y)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
