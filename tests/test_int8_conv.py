"""ops/int8_conv.py: quantized-conv numerics + the IR_INT8_DECODE wiring.

The int8 decode is an opt-in perf experiment (VERDICT r4 item 6); these
tests pin (a) the dequantization math against a numpy reference, (b) the
quantization error bound vs the f32 conv, and (c) that the env flag swaps
the decoder ResnetBlock convs without touching the encoder or the param
tree (checkpoints interchange)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instarevive_tpu.ops.int8_conv import conv2d_int8


def _ref_int8_conv(x, w, b):
    """Numpy reference of the exact scheme: per-tensor act scale,
    per-out-channel weight scales, s32 accumulation."""
    xs = max(np.abs(x).max(), 1e-8) / 127.0
    xq = np.clip(np.round(x / xs), -127, 127).astype(np.int32)
    ws = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-8) / 127.0
    wq = np.clip(np.round(w / ws), -127, 127).astype(np.int32)
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    n, h, ww, ci = x.shape
    co = w.shape[-1]
    y = np.zeros((n, h, ww, co), np.int64)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy:dy + h, dx:dx + ww, :]
            y += np.einsum("nhwc,co->nhwo", patch, wq[dy, dx], dtype=np.int64)
    return y.astype(np.float64) * (xs * ws)[None, None, None, :] + b


def test_int8_conv_matches_numpy_reference():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 16, 24)) * 0.1).astype(np.float32)
    b = rng.standard_normal(24).astype(np.float32)
    got = np.asarray(conv2d_int8(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    want = _ref_int8_conv(x, w, b)
    assert np.abs(got - want).max() < 1e-3, np.abs(got - want).max()


def test_int8_conv_error_vs_f32_bounded():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 16, 16, 32)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 32, 32)) * 0.08).astype(np.float32)
    b = np.zeros(32, np.float32)
    exact = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    q = conv2d_int8(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    rel = float(jnp.sqrt(jnp.mean((q - exact) ** 2) / jnp.mean(exact ** 2)))
    # two int8 quantizers at ~0.45% RMS each over a 288-term dot
    assert rel < 2e-2, rel


@pytest.mark.parametrize("flag", ["0", "1"])
def test_int8_decode_flag_swaps_decoder_only(monkeypatch, flag):
    from instarevive_tpu.models.vae import AutoencoderKL

    monkeypatch.setenv("IR_INT8_DECODE", flag)
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        z_channels=4, embed_dim=4)
    z = jnp.asarray(np.random.default_rng(2).standard_normal((1, 8, 8, 4)),
                    jnp.float32)
    params = vae.init(jax.random.key(0), z, method=vae.decode)["params"]
    out = vae.apply({"params": params}, z, method=vae.decode)
    assert out.shape == (1, 16, 16, 3) and bool(jnp.isfinite(out).all())
    if flag == "1":
        # same param tree as the f32 path: checkpoints interchange
        monkeypatch.setenv("IR_INT8_DECODE", "0")
        params_f32 = vae.init(jax.random.key(0), z, method=vae.decode)["params"]
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_f32)
        out_f32 = vae.apply({"params": params_f32}, z, method=vae.decode)
        rel = float(jnp.sqrt(jnp.mean((out - out_f32) ** 2)
                             / jnp.maximum(jnp.mean(out_f32 ** 2), 1e-12)))
        assert rel < 5e-2, rel  # quantization noise, not structural drift


def test_int8_decode_never_touches_encoder(monkeypatch):
    from instarevive_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        z_channels=4, embed_dim=4)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 16, 16, 3)),
                    jnp.float32)
    params = vae.init(jax.random.key(0), x, method=vae.encode)["params"]
    monkeypatch.setenv("IR_INT8_DECODE", "0")
    m0 = vae.apply({"params": params}, x, method=vae.encode)[0]
    monkeypatch.setenv("IR_INT8_DECODE", "1")
    m1 = vae.apply({"params": params}, x, method=vae.encode)[0]
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))


def test_int8_upsample_conv_error_bounded():
    from instarevive_tpu.ops.conv_fused import upsample2x_conv3x3
    from instarevive_tpu.ops.int8_conv import upsample2x_conv3x3_int8

    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 12, 12, 24)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 24, 24)) * 0.1).astype(np.float32)
    b = rng.standard_normal(24).astype(np.float32)
    exact = upsample2x_conv3x3(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    q = upsample2x_conv3x3_int8(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    assert q.shape == exact.shape == (1, 24, 24, 24)
    rel = float(jnp.sqrt(jnp.mean((q - exact) ** 2) / jnp.mean(exact ** 2)))
    assert rel < 2e-2, rel
