"""Loss-second-moment timestep sampling through the cldm eps loss
(reference diffusion/model/timestep_sampler.py:27-120 + --t_sampler flag)."""

import jax
import jax.numpy as jnp
import numpy as np

from instarevive_tpu.diffusion.timestep_sampler import (
    loss_second_moment_init, loss_second_moment_sample,
    loss_second_moment_update, loss_second_moment_weights)


def test_sampler_warmup_then_importance():
    T, H = 16, 4
    state = loss_second_moment_init(T, history_per_term=H)
    # before warmup: uniform
    w = loss_second_moment_weights(state)
    np.testing.assert_allclose(np.asarray(w), 1.0 / T, rtol=1e-6)

    # feed a loss profile where late timesteps hurt 10x more
    rng = jax.random.key(0)
    for i in range(H * 16):
        rng, k = jax.random.split(rng)
        t = jax.random.randint(k, (8,), 0, T)
        losses = jnp.where(t >= T // 2, 10.0, 1.0)
        state = loss_second_moment_update(state, t, losses)
    w = np.asarray(loss_second_moment_weights(state))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
    # importance concentrates on the high-loss half
    assert w[T // 2 :].sum() > 3 * w[: T // 2].sum()

    # sampled weights are the inverse-probability correction
    t, iw = loss_second_moment_sample(jax.random.key(1), state, 64)
    assert t.shape == (64,) and iw.shape == (64,)
    np.testing.assert_allclose(np.asarray(iw), 1.0 / (T * w[np.asarray(t)]), rtol=1e-5)


def test_eps_loss_accepts_external_t_and_weights():
    from instarevive_tpu.diffusion.schedules import make_schedule
    from instarevive_tpu.models.unet import UNetBackbone
    from instarevive_tpu.models.swinir import SwinIR
    from instarevive_tpu.models.vae import AutoencoderKL
    from instarevive_tpu.train.cldm import ControlLDMTask

    unet = UNetBackbone(model_channels=32, num_head_channels=16, context_dim=32,
                        channel_mult=(1, 2), attention_ds=(1, 2))
    cnet = UNetBackbone(in_channels=8, model_channels=32, num_head_channels=16,
                        context_dim=32, channel_mult=(1, 2), attention_ds=(1, 2),
                        is_controlnet=True)
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    swinir = SwinIR(embed_dim=60, depths=(1,), num_heads=(6,), sf=8)
    sched = make_schedule("linear", 16)
    task = ControlLDMTask(unet, cnet, vae, swinir, sched)

    k = jax.random.key(0)
    b = 4
    params = {
        "unet": unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                          jnp.zeros((1, 4, 32)))["params"],
        "controlnet": cnet.init(k, jnp.zeros((1, 8, 8, 8)), jnp.zeros((1,)),
                                jnp.zeros((1, 4, 32)))["params"],
    }
    frozen = {
        "vae": vae.init(k, jnp.zeros((1, 16, 16, 3)))["params"],
        "swinir": swinir.init(k, jnp.zeros((1, 64, 64, 3)))["params"],
    }
    batch = {
        "hq": jnp.zeros((b, 16, 16, 3)),
        "lq": jnp.full((b, 16, 16, 3), 0.5),
        "context": jnp.zeros((b, 4, 32)),
    }
    state = loss_second_moment_init(sched.num_timesteps)
    t, w = loss_second_moment_sample(jax.random.key(1), state, b)
    loss, aux = task.eps_loss(params, frozen, batch, jax.random.key(2),
                              t=t, loss_weights=w)
    assert np.isfinite(float(loss))
    assert aux["per_sample_loss"].shape == (b,)
    np.testing.assert_array_equal(np.asarray(aux["t"]), np.asarray(t))
    # history update closes the loop
    state2 = loss_second_moment_update(state, aux["t"], aux["per_sample_loss"])
    assert int(np.asarray(state2.counts).sum()) >= int(np.asarray(state.counts).sum())
