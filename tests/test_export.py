"""Checkpoint EXPORT round trips: flax -> torch state_dict -> flax == id.

torch_export.py is the exact inverse of torch_import.py (pure numpy
transposes/splits), so init -> export -> import must reproduce the
original tree bit-for-bit for every model family. This pins the two key
maps together — any drift in either direction fails here.
"""

import numpy as np

import jax
import jax.numpy as jnp

from instarevive_tpu.convert import torch_export as E
from instarevive_tpu.convert import torch_import as I


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _assert_tree_equal(a, b):
    fa, fb = _flatten(a), _flatten(b)
    assert set(fa) == set(fb), sorted(set(fa) ^ set(fb))[:10]
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_swinir_roundtrip():
    from instarevive_tpu.models.swinir import SwinIR

    model = SwinIR(embed_dim=60, depths=(2, 2), num_heads=(6, 6), window=8,
                   mlp_ratio=2.0, sf=8, unshuffle=True, unshuffle_scale=8)
    p = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]
    sd = E.swinir_params_to_torch(p, depths=(2, 2), sf=8, unshuffle=True)
    back = I.swinir_params_from_torch(sd, depths=(2, 2), sf=8)
    _assert_tree_equal(p, back)


def test_vae_roundtrip():
    from instarevive_tpu.models.vae import AutoencoderKL

    model = AutoencoderKL(ch=32, ch_mult=(1, 2, 2), num_res_blocks=2,
                          z_channels=4, embed_dim=4)
    p = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))["params"]
    sd = E.vae_params_to_torch(p, ch_mult=(1, 2, 2), num_res_blocks=2)
    back = I.vae_params_from_torch(sd, ch_mult=(1, 2, 2), num_res_blocks=2)
    _assert_tree_equal(p, back)


def _tiny_pixart_params(control_depth=0):
    from instarevive_tpu.models.pixart import PixArt

    model = PixArt(input_size=16, patch_size=2, in_channels=4, hidden_size=64,
                   depth=4, num_heads=4, mlp_ratio=2.0, caption_channels=32,
                   model_max_length=8)
    kw = dict(control_depth=control_depth) if control_depth else {}
    p = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 8, 32)),
        **({"c": jnp.zeros((1, 16, 16, 4))} if control_depth else {}),
        **kw,
    )["params"]
    return p


def test_pixart_native_roundtrip():
    p = _tiny_pixart_params()
    sd = E.pixart_params_to_torch(p, depth=4)
    back = I.pixart_params_from_torch(sd, depth=4)
    _assert_tree_equal(p, back)


def test_pixart_diffusers_roundtrip():
    p = _tiny_pixart_params()
    sd = E.pixart_params_to_diffusers(p, depth=4)
    back = I.pixart_params_from_diffusers(sd, depth=4)
    _assert_tree_equal(p, back)


def test_pixart_controlnet_roundtrip():
    p = _tiny_pixart_params(control_depth=2)
    sd = E.pixart_params_to_torch(p, depth=4)
    back = I.pixart_params_from_torch(sd, depth=4)
    _assert_tree_equal(p, back)


def test_export_cli_selects_params_from_any_checkpoint_layout():
    """tools/export_checkpoint.py reads raw trees, legacy {params, ema},
    and full train-state checkpoints ({'states': [...], ...})."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "export_checkpoint",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "export_checkpoint.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    raw = {"x_embedder": {"kernel": np.ones(1)}}
    assert mod._select_params(raw, 0, "params") is raw
    legacy = {"params": raw, "ema": {"x": np.zeros(1)}}
    assert mod._select_params(legacy, 0, "params") is raw
    assert mod._select_params(legacy, 0, "ema") is legacy["ema"]
    full = {"states": [{"step": 3, "params": raw, "opt_state": {}, "ema": None},
                       {"step": 3, "params": {"fake": 1}, "opt_state": {}, "ema": None}],
            "rng": np.zeros(2), "step_i": 3}
    assert mod._select_params(full, 0, "params") is raw
    assert mod._select_params(full, 1, "params") == {"fake": 1}
    import pytest

    with pytest.raises(SystemExit):
        mod._select_params(full, 0, "ema")


def test_swinir_export_loads_into_reference_model():
    """The exported state_dict drives the ACTUAL reference torch SwinIR to
    the same outputs as our flax model holding the same weights.

    Weights originate from a torch-initialized instance (trunc-normal 0.02
    — well-conditioned; raw flax lecun-normal init at dim 60 gives 6x
    larger attention scores whose softmax chaos amplifies f32 ordering
    differences to ~1e-1) and travel torch#1 -> import -> flax -> EXPORT
    -> torch#2; torch#2's params are additionally asserted bit-identical
    to torch#1's, so the export map is exercised independently of the
    import-parity already covered by tests/test_swinir.py."""
    import torch

    from instarevive_tpu.models.swinir import SwinIR
    from tests.oracles import load_reference_swinir_module

    cfg = dict(embed_dim=60, depths=(2, 2), num_heads=(6, 6), window=8,
               mlp_ratio=2.0, sf=8, unshuffle=True, unshuffle_scale=8)
    ref_kw = dict(
        img_size=64, patch_size=1, in_chans=3, embed_dim=cfg["embed_dim"],
        depths=list(cfg["depths"]), num_heads=list(cfg["num_heads"]),
        window_size=cfg["window"], mlp_ratio=cfg["mlp_ratio"], sf=cfg["sf"],
        img_range=1.0, upsampler="nearest+conv", resi_connection="1conv",
        unshuffle=True, unshuffle_scale=8,
    )
    mod = load_reference_swinir_module()
    torch.manual_seed(0)
    src = mod.SwinIR(**ref_kw).eval()
    p = I.swinir_params_from_torch(src.state_dict(), depths=cfg["depths"],
                                   sf=cfg["sf"])
    sd = E.swinir_params_to_torch(p, depths=cfg["depths"], sf=cfg["sf"],
                                  unshuffle=True)

    torch.manual_seed(123)  # different init — must be fully overwritten
    ref = mod.SwinIR(**ref_kw).eval()
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    # only derived buffers may be absent from the export
    assert all(
        any(s in k for s in ("relative_position_index", "attn_mask", "mean"))
        for k in missing
    ), missing
    for k, v in ref.state_dict().items():
        np.testing.assert_array_equal(
            v.numpy(), src.state_dict()[k].numpy(), err_msg=k
        )

    ours = SwinIR(**cfg)
    x = np.random.default_rng(2).random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    want = np.transpose(want, (0, 2, 3, 1))
    got = np.asarray(ours.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_unet_roundtrip():
    from instarevive_tpu.models.unet import UNetBackbone

    model = UNetBackbone(model_channels=32, num_head_channels=16,
                         context_dim=64, channel_mult=(1, 2, 4, 4),
                         attention_ds=(1, 2, 4))
    p = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1,)), jnp.zeros((1, 7, 64)),
    )["params"]
    sd = E.unet_params_to_torch(p)
    back = I.unet_params_from_torch(sd)
    _assert_tree_equal(p, back)
