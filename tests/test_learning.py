"""Learning validation: the DMD distillation loop reduces its losses.

(The reference's training loop was never released — SURVEY.md; this guards
our reconstruction end-to-end: generator + frozen teacher + fake score,
two optimizers, EMA.)
"""

import numpy as np

import jax
import jax.numpy as jnp

from instarevive_tpu.diffusion.one_step import eps_to_x0
from instarevive_tpu.diffusion.schedules import make_schedule
from instarevive_tpu.models.pixart import PixArt
from instarevive_tpu.train.distill import make_dmd_train_step
from instarevive_tpu.train.optim import build_optimizer, constant_with_warmup
from instarevive_tpu.train.state import TrainState


def test_dmd_loop_learns():
    sched = make_schedule("linear", 1000)
    dit = PixArt(input_size=8, patch_size=2, hidden_size=64, depth=2, num_heads=4,
                 caption_channels=32, model_max_length=8, mlp_ratio=2.0)
    y = jnp.zeros((8, 8, 32))

    def gen_fn(p, z, t, **cond):
        out = dit.apply({"params": p}, z, t.astype(jnp.float32), cond["y"])
        return out[..., : z.shape[-1]]

    k = jax.random.key(0)
    init = dit.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)), y[:1])["params"]
    teacher = jax.tree_util.tree_map(jnp.copy, init)

    def real_fn(z, t, **cond):
        return gen_fn(teacher, z, t, **cond)

    tx = build_optimizer("adamw", constant_with_warmup(2e-4, 20), grad_clip_norm=10.0)
    gen_state = TrainState.create(init, tx, ema=True)
    fake_state = TrainState.create(jax.tree_util.tree_map(jnp.copy, init), tx, ema=False)
    step = jax.jit(make_dmd_train_step(sched, gen_fn, real_fn, gen_fn, TrainState, maxt=400))

    noise = jax.random.normal(jax.random.key(1), (8, 8, 8, 4))
    target = jax.random.normal(jax.random.key(2), (8, 8, 8, 4)) * 0.3
    batch = {"noise": noise, "latent": target}

    key = jax.random.key(3)
    first = None
    for i in range(120):
        key, sk = jax.random.split(key)
        gen_state, fake_state, m = step(gen_state, fake_state, batch, sk, {"y": y})
        if i == 0:
            first = float(m["regression"])

    t = jnp.full((8,), 400, dtype=jnp.int32)
    eps = gen_fn(gen_state.params, noise, t, y=y)
    x0 = eps_to_x0(sched, eps, noise, t)
    final = float(jnp.mean((x0 - target) ** 2))
    assert np.isfinite(final)
    assert final < first * 0.6, (first, final)
    # EMA params track but lag
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(gen_state.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(gen_state.params)[0]),
    )
