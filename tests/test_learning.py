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


def test_cfg_real_fn_changes_dm_gradient():
    """Teacher CFG is load-bearing: with a non-zero cond/uncond gap the
    distribution-matching gradient differs between cfg_scale=1 and 3
    (reference trains with --cfg 3, scripts/run_pixart_dmd.py:95)."""
    from instarevive_tpu.train.distill import dmd_generator_loss, make_cfg_real_fn

    sched = make_schedule("linear", 1000)
    dit = PixArt(input_size=8, patch_size=2, hidden_size=64, depth=2, num_heads=4,
                 caption_channels=32, model_max_length=8, mlp_ratio=2.0)
    y = jax.random.normal(jax.random.key(10), (2, 8, 32))
    y_null = jax.random.normal(jax.random.key(11), (8, 32))

    def gen_fn(p, z, t, **cond):
        out = dit.apply({"params": p}, z, t.astype(jnp.float32), cond["y"])
        return out[..., : z.shape[-1]]

    init = dit.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                    y[:1])["params"]
    teacher = jax.tree_util.tree_map(jnp.copy, init)

    def teacher_fn(z, t, **cond):
        return gen_fn(teacher, z, t, **cond)

    batch = {
        "noise": jax.random.normal(jax.random.key(1), (2, 8, 8, 4)),
        "latent": jax.random.normal(jax.random.key(2), (2, 8, 8, 4)) * 0.3,
    }

    def grad_for(scale):
        real = make_cfg_real_fn(teacher_fn, y_null, scale)

        def loss(p):
            l, _ = dmd_generator_loss(
                sched, gen_fn, real, gen_fn, p, teacher, batch,
                jax.random.key(3), use_regression=False, cond={"y": y},
            )
            return l

        return jax.grad(loss)(init)

    g1, g3 = grad_for(1.0), grad_for(3.0)
    diffs = [
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g3))
    ]
    assert max(diffs) > 1e-6, max(diffs)
    # cfg_scale=1 short-circuits to the raw teacher (no 2B batching)
    assert make_cfg_real_fn(teacher_fn, y_null, 1.0) is teacher_fn


def test_kill_resume_bitwise(tmp_path):
    """Full train-state checkpointing (VERDICT r1 item 4): save at step 5,
    restore into freshly-created states, continue to step 10 — bitwise equal
    to an uninterrupted 10-step run (params, EMA, optimizer moments, fake
    score state, RNG). Reference restores optimizer/scheduler/epoch
    (diffusion/utils/checkpoint.py:40-85)."""
    from instarevive_tpu.train import checkpoint as ckpt

    sched = make_schedule("linear", 1000)
    dit = PixArt(input_size=8, patch_size=2, hidden_size=32, depth=1, num_heads=2,
                 caption_channels=16, model_max_length=8, mlp_ratio=2.0)
    y = jnp.zeros((2, 8, 16))

    def gen_fn(p, z, t, **cond):
        out = dit.apply({"params": p}, z, t.astype(jnp.float32), cond["y"])
        return out[..., : z.shape[-1]]

    init = dit.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                    y[:1])["params"]
    teacher = jax.tree_util.tree_map(jnp.copy, init)

    def real_fn(z, t, **cond):
        return gen_fn(teacher, z, t, **cond)

    def fresh_states():
        tx = build_optimizer("adamw", constant_with_warmup(1e-3, 5), grad_clip_norm=10.0)
        gen = TrainState.create(jax.tree_util.tree_map(jnp.copy, init), tx, ema=True)
        fake = TrainState.create(jax.tree_util.tree_map(jnp.copy, init), tx, ema=False)
        return (gen, fake)

    step = jax.jit(make_dmd_train_step(sched, gen_fn, real_fn, gen_fn, TrainState))
    batch = {
        "noise": jax.random.normal(jax.random.key(1), (2, 8, 8, 4)),
        "latent": jax.random.normal(jax.random.key(2), (2, 8, 8, 4)) * 0.3,
    }

    def run(states, key, n):
        for _ in range(n):
            key, sk = jax.random.split(key)
            g, f, _ = step(states[0], states[1], batch, sk, {"y": y})
            states = (g, f)
        return states, key

    # uninterrupted 10 steps
    ref_states, _ = run(fresh_states(), jax.random.key(7), 10)

    # interrupted: 5 steps -> save -> restore into fresh states -> 5 steps
    mid_states, mid_key = run(fresh_states(), jax.random.key(7), 5)
    path = str(tmp_path / "ck5")
    ckpt.save_train_state(path, mid_states, mid_key, 5)
    restored, key2, step_i = ckpt.restore_train_state(path, fresh_states(), jax.random.key(7))
    assert step_i == 5
    fin_states, _ = run(restored, key2, 5)

    for a, b in zip(
        jax.tree_util.tree_leaves(ref_states), jax.tree_util.tree_leaves(fin_states)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_legacy_params_only(tmp_path):
    """Old {params, ema} checkpoints still load via the fallback path."""
    from instarevive_tpu.train import checkpoint as ckpt

    dit = PixArt(input_size=8, patch_size=2, hidden_size=32, depth=1, num_heads=2,
                 caption_channels=16, model_max_length=8, mlp_ratio=2.0)
    y = jnp.zeros((1, 8, 16))
    init = dit.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                    y)["params"]
    tx = build_optimizer("adamw", constant_with_warmup(1e-3, 5), grad_clip_norm=10.0)
    state = TrainState.create(init, tx, ema=True)
    mutated = jax.tree_util.tree_map(lambda x: x + 1.0, init)
    path = str(tmp_path / "legacy")
    ckpt.save_checkpoint(path, jax.device_get({"params": mutated, "ema": mutated}))

    (restored,), key, step_i = ckpt.restore_train_state(
        path, (state,), jax.random.key(3)
    )
    assert step_i == 0
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(mutated)[0]),
    )


def test_adamw_lowmem_matches_optax_adamw():
    """bf16-moment AdamW (the XL-2 single-chip HBM-fit knob) tracks optax
    adamw closely over steps; state is stored in bf16."""
    import jax
    import jax.numpy as jnp
    import optax

    from instarevive_tpu.train.optim import adamw_lowmem

    params = {"w": jnp.linspace(-1, 1, 64).reshape(8, 8), "b": jnp.ones((8,))}
    lr = 1e-2
    ref_tx = optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=0.01)
    low_tx = adamw_lowmem(lr, b1=0.9, b2=0.999, weight_decay=0.01,
                          moment_dtype=jnp.bfloat16)
    rp, lp = params, params
    rs, ls = ref_tx.init(rp), low_tx.init(lp)
    assert ls.mu["w"].dtype == jnp.bfloat16 and ls.nu["b"].dtype == jnp.bfloat16
    for i in range(5):
        g = jax.tree_util.tree_map(
            lambda p: 0.1 * jnp.cos(p + i), rp
        )
        ru, rs = ref_tx.update(g, rs, rp)
        rp = optax.apply_updates(rp, ru)
        lu, ls = low_tx.update(g, ls, lp)
        lp = optax.apply_updates(lp, lu)
    for k in rp:
        np.testing.assert_allclose(np.asarray(lp[k]), np.asarray(rp[k]),
                                   atol=5e-3, rtol=5e-3)


def test_train_state_ema_dtype_bf16():
    import jax.numpy as jnp
    import optax

    from instarevive_tpu.train.state import TrainState

    params = {"w": jnp.ones((4, 4))}
    st = TrainState.create(params, optax.sgd(0.1), ema=True, ema_dtype=jnp.bfloat16)
    assert st.ema_params["w"].dtype == jnp.bfloat16
    st2 = st.apply_gradients({"w": jnp.ones((4, 4))})
    assert st2.ema_params["w"].dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(st2.ema_params["w"], np.float32)).all()


def test_save_restore_with_lowmem_optimizer(tmp_path):
    """Full-state checkpoint round-trip with AdamWLowMemState (bf16
    moments) + bf16 EMA — the --lowmem production config must resume
    bitwise like the default one."""
    import jax
    import jax.numpy as jnp

    from instarevive_tpu.train.checkpoint import restore_train_state, save_train_state
    from instarevive_tpu.train.optim import build_optimizer, constant_with_warmup
    from instarevive_tpu.train.state import TrainState

    tx = build_optimizer("adamw", constant_with_warmup(1e-3, 5),
                         grad_clip_norm=1.0, moment_dtype=jnp.bfloat16)
    params = {"w": jnp.linspace(0, 1, 16).reshape(4, 4)}
    st = TrainState.create(params, tx, ema=True, ema_dtype=jnp.bfloat16)
    for i in range(3):
        st = st.apply_gradients({"w": jnp.full((4, 4), 0.1 * (i + 1))})
    key = jax.random.key(7)
    path = str(tmp_path / "ck")
    save_train_state(path, (st,), key, step_i=3)

    fresh = TrainState.create(params, tx, ema=True, ema_dtype=jnp.bfloat16)
    (restored,), rkey, step_i = restore_train_state(path, (fresh,), jax.random.key(0))
    assert step_i == 3
    assert restored.opt_state[-1].mu["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(st.params["w"]))
    np.testing.assert_array_equal(
        np.asarray(restored.ema_params["w"], np.float32),
        np.asarray(st.ema_params["w"], np.float32))
    np.testing.assert_array_equal(
        np.asarray(restored.opt_state[-1].nu["w"], np.float32),
        np.asarray(st.opt_state[-1].nu["w"], np.float32))
