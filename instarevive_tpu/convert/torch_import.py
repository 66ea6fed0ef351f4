"""PyTorch checkpoint -> flax params converters.

Checkpoint fidelity is a hard requirement (SURVEY.md §7 "hard parts"):
the released weights come in three foreign formats (Lightning ``.ckpt``,
PixArt ``.pth``, diffusers). These converters do the key surgery into our
flax trees. Layout rules:

  * conv:   torch OIHW        -> flax HWIO   (transpose 2,3,1,0)
  * dense:  torch (out, in)   -> flax (in, out) (transpose)
  * norm:   weight -> scale, bias -> bias

Tensors are accepted as anything with ``.numpy()`` or ndarray-convertible,
so callers can feed ``torch.load(..., map_location='cpu')`` state dicts
without this module importing torch.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach()
    if hasattr(t, "numpy"):
        t = t.numpy()
    return np.asarray(t)


def conv_kernel(t) -> np.ndarray:
    """OIHW -> HWIO."""
    return _np(t).transpose(2, 3, 1, 0)


def dense_kernel(t) -> np.ndarray:
    return _np(t).transpose(1, 0)


def strip_prefixes(sd: Mapping[str, Any], prefixes=("module.", "model.")) -> Dict[str, Any]:
    """Strip a leading wrapper prefix if every key carries it
    (cf. reference utils/common.py:34-51 'module.' stripping)."""
    out = dict(sd)
    for p in prefixes:
        if out and all(k.startswith(p) for k in out):
            out = {k[len(p):]: v for k, v in out.items()}
    return out


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _conv(tree, flax_path, sd, torch_path):
    _set(tree, flax_path + "/kernel", conv_kernel(sd[torch_path + ".weight"]))
    _set(tree, flax_path + "/bias", _np(sd[torch_path + ".bias"]))


def _dense(tree, flax_path, sd, torch_path):
    _set(tree, flax_path + "/kernel", dense_kernel(sd[torch_path + ".weight"]))
    _set(tree, flax_path + "/bias", _np(sd[torch_path + ".bias"]))


def _norm(tree, flax_path, sd, torch_path):
    _set(tree, flax_path + "/scale", _np(sd[torch_path + ".weight"]))
    _set(tree, flax_path + "/bias", _np(sd[torch_path + ".bias"]))


def swinir_params_from_torch(
    sd: Mapping[str, Any],
    depths=(6,) * 8,
    upsampler: str = "nearest+conv",
    sf: int = 8,
) -> Dict[str, Any]:
    """Map the reference SwinIR state_dict (diffusion/model/swinir.py) to our
    flax ``SwinIR`` param tree. Buffers (mean, relative_position_index,
    attn_mask) are dropped; bias tables are copied as-is."""
    sd = strip_prefixes(sd)
    p: Dict[str, Any] = {}

    # conv_first is Sequential(PixelUnshuffle, Conv) when unshuffle else Conv
    first = "conv_first.1" if "conv_first.1.weight" in sd else "conv_first"
    _conv(p, "conv_first", sd, first)
    _norm(p, "patch_norm", sd, "patch_embed.norm")

    for i, depth in enumerate(depths):
        base = f"layers.{i}.residual_group.blocks"
        for j in range(depth):
            blk = f"layers_{i}/blocks_{j}"
            t = f"{base}.{j}"
            _norm(p, f"{blk}/norm1", sd, f"{t}.norm1")
            _norm(p, f"{blk}/norm2", sd, f"{t}.norm2")
            _dense(p, f"{blk}/attn/qkv", sd, f"{t}.attn.qkv")
            _dense(p, f"{blk}/attn/proj", sd, f"{t}.attn.proj")
            _set(
                p,
                f"{blk}/attn/relative_position_bias_table",
                _np(sd[f"{t}.attn.relative_position_bias_table"]),
            )
            _dense(p, f"{blk}/mlp/fc1", sd, f"{t}.mlp.fc1")
            _dense(p, f"{blk}/mlp/fc2", sd, f"{t}.mlp.fc2")
        _conv(p, f"layers_{i}/conv", sd, f"layers.{i}.conv")

    _norm(p, "norm", sd, "norm")
    _conv(p, "conv_after_body", sd, "conv_after_body")
    if upsampler == "nearest+conv":
        _conv(p, "conv_before_upsample", sd, "conv_before_upsample.0")
        ups = {4: ("conv_up1", "conv_up2"), 8: ("conv_up1", "conv_up2", "conv_up3")}.get(
            sf, ("conv_up1",)
        )
        for name in ups:
            _conv(p, name, sd, name)
        _conv(p, "conv_hr", sd, "conv_hr")
    _conv(p, "conv_last", sd, "conv_last")
    return p


def _resblock(tree, flax_path, sd, torch_path, has_shortcut):
    _norm(tree, f"{flax_path}/norm1", sd, f"{torch_path}.norm1")
    _conv(tree, f"{flax_path}/conv1", sd, f"{torch_path}.conv1")
    _norm(tree, f"{flax_path}/norm2", sd, f"{torch_path}.norm2")
    _conv(tree, f"{flax_path}/conv2", sd, f"{torch_path}.conv2")
    if has_shortcut:
        _conv(tree, f"{flax_path}/nin_shortcut", sd, f"{torch_path}.nin_shortcut")


def _attnblock(tree, flax_path, sd, torch_path):
    _norm(tree, f"{flax_path}/norm", sd, f"{torch_path}.norm")
    for n in ("q", "k", "v", "proj_out"):
        _conv(tree, f"{flax_path}/{n}", sd, f"{torch_path}.{n}")


def vae_params_from_torch(
    sd: Mapping[str, Any],
    ch_mult=(1, 2, 4, 4),
    num_res_blocks: int = 2,
) -> Dict[str, Any]:
    """Map a CompVis/SD ``AutoencoderKL`` state_dict (ldm/models/autoencoder.py,
    weight-compatible with sd-vae-ft-ema) to our flax ``AutoencoderKL`` tree."""
    sd = strip_prefixes(sd)
    p: Dict[str, Any] = {}

    _conv(p, "encoder/conv_in", sd, "encoder.conv_in")
    for i in range(len(ch_mult)):
        for j in range(num_res_blocks):
            tp = f"encoder.down.{i}.block.{j}"
            _resblock(p, f"encoder/down_{i}_block_{j}", sd, tp, f"{tp}.nin_shortcut.weight" in sd)
        if f"encoder.down.{i}.downsample.conv.weight" in sd:
            _conv(p, f"encoder/down_{i}_downsample", sd, f"encoder.down.{i}.downsample.conv")
    _resblock(p, "encoder/mid_block_1", sd, "encoder.mid.block_1", False)
    _attnblock(p, "encoder/mid_attn_1", sd, "encoder.mid.attn_1")
    _resblock(p, "encoder/mid_block_2", sd, "encoder.mid.block_2", False)
    _norm(p, "encoder/norm_out", sd, "encoder.norm_out")
    _conv(p, "encoder/conv_out", sd, "encoder.conv_out")

    _conv(p, "decoder/conv_in", sd, "decoder.conv_in")
    _resblock(p, "decoder/mid_block_1", sd, "decoder.mid.block_1", False)
    _attnblock(p, "decoder/mid_attn_1", sd, "decoder.mid.attn_1")
    _resblock(p, "decoder/mid_block_2", sd, "decoder.mid.block_2", False)
    for i in range(len(ch_mult)):
        for j in range(num_res_blocks + 1):
            tp = f"decoder.up.{i}.block.{j}"
            _resblock(p, f"decoder/up_{i}_block_{j}", sd, tp, f"{tp}.nin_shortcut.weight" in sd)
        if f"decoder.up.{i}.upsample.conv.weight" in sd:
            _conv(p, f"decoder/up_{i}_upsample", sd, f"decoder.up.{i}.upsample.conv")
    _norm(p, "decoder/norm_out", sd, "decoder.norm_out")
    _conv(p, "decoder/conv_out", sd, "decoder.conv_out")

    _conv(p, "quant_conv", sd, "quant_conv")
    _conv(p, "post_quant_conv", sd, "post_quant_conv")
    return p


def _pixart_block(p, flax_blk, sd, torch_blk, kv_sampling=None):
    _set(p, f"{flax_blk}/scale_shift_table", _np(sd[f"{torch_blk}.scale_shift_table"]))
    _dense(p, f"{flax_blk}/attn/qkv", sd, f"{torch_blk}.attn.qkv")
    _dense(p, f"{flax_blk}/attn/proj", sd, f"{torch_blk}.attn.proj")
    if f"{torch_blk}.attn.sr.weight" in sd:
        _conv(p, f"{flax_blk}/attn/sr", sd, f"{torch_blk}.attn.sr")
        _norm(p, f"{flax_blk}/attn/norm", sd, f"{torch_blk}.attn.norm")
    if f"{torch_blk}.attn.q_norm.weight" in sd:
        _norm(p, f"{flax_blk}/attn/q_norm", sd, f"{torch_blk}.attn.q_norm")
        _norm(p, f"{flax_blk}/attn/k_norm", sd, f"{torch_blk}.attn.k_norm")
    _dense(p, f"{flax_blk}/cross_attn/q_linear", sd, f"{torch_blk}.cross_attn.q_linear")
    _dense(p, f"{flax_blk}/cross_attn/kv_linear", sd, f"{torch_blk}.cross_attn.kv_linear")
    _dense(p, f"{flax_blk}/cross_attn/proj", sd, f"{torch_blk}.cross_attn.proj")
    _dense(p, f"{flax_blk}/mlp/fc1", sd, f"{torch_blk}.mlp.fc1")
    _dense(p, f"{flax_blk}/mlp/fc2", sd, f"{torch_blk}.mlp.fc2")


def pixart_params_from_torch(sd: Mapping[str, Any], depth: int = 28) -> Dict[str, Any]:
    """Map the reference PixArt state_dict (diffusion/model/nets/PixArt.py,
    .pth checkpoints per diffusion/utils/checkpoint.py) to our flax tree.
    ``pos_embed`` buffers are dropped (we compute PE per shape, matching the
    reference's own load behavior, checkpoint.py:54-56)."""
    sd = strip_prefixes(sd)
    p: Dict[str, Any] = {}
    _conv(p, "x_embedder", sd, "x_embedder.proj")
    _dense(p, "t_embedder/fc1", sd, "t_embedder.mlp.0")
    _dense(p, "t_embedder/fc2", sd, "t_embedder.mlp.2")
    _dense(p, "t_block", sd, "t_block.1")
    _dense(p, "y_embedder/y_proj/fc1", sd, "y_embedder.y_proj.fc1")
    _dense(p, "y_embedder/y_proj/fc2", sd, "y_embedder.y_proj.fc2")
    if "y_embedder.y_embedding" in sd:
        _set(p, "y_embedder/y_embedding", _np(sd["y_embedder.y_embedding"]))
    for i in range(depth):
        _pixart_block(p, f"blocks_{i}", sd, f"blocks.{i}")
    _set(p, "final_scale_shift_table", _np(sd["final_layer.scale_shift_table"]))
    _dense(p, "final_linear", sd, "final_layer.linear")

    # ControlNet-Half blocks if present (pixart_controlnet.py)
    j = 0
    while f"controlnet.{j}.copied_block.scale_shift_table" in sd:
        _pixart_block(p, f"controlnet_{j}", sd, f"controlnet.{j}.copied_block")
        _dense(p, f"controlnet_{j}_after_proj", sd, f"controlnet.{j}.after_proj")
        if j == 0:
            _dense(p, "controlnet_before_proj", sd, "controlnet.0.before_proj")
        j += 1
    return p


def _fuse_dense(tree, flax_path, sd, paths, axis=0):
    """Concatenate several torch Linear weights into one fused flax Dense."""
    w = np.concatenate([_np(sd[p + ".weight"]) for p in paths], axis=axis)
    b = np.concatenate([_np(sd[p + ".bias"]) for p in paths], axis=0)
    _set(tree, flax_path + "/kernel", w.transpose(1, 0))
    _set(tree, flax_path + "/bias", b)


def _diffusers_block(p, flax_blk, sd, tb):
    _set(p, f"{flax_blk}/scale_shift_table", _np(sd[f"{tb}.scale_shift_table"]))
    _fuse_dense(p, f"{flax_blk}/attn/qkv", sd,
                [f"{tb}.attn1.to_q", f"{tb}.attn1.to_k", f"{tb}.attn1.to_v"])
    _dense(p, f"{flax_blk}/attn/proj", sd, f"{tb}.attn1.to_out.0")
    _dense(p, f"{flax_blk}/cross_attn/q_linear", sd, f"{tb}.attn2.to_q")
    _fuse_dense(p, f"{flax_blk}/cross_attn/kv_linear", sd,
                [f"{tb}.attn2.to_k", f"{tb}.attn2.to_v"])
    _dense(p, f"{flax_blk}/cross_attn/proj", sd, f"{tb}.attn2.to_out.0")
    _dense(p, f"{flax_blk}/mlp/fc1", sd, f"{tb}.ff.net.0.proj")
    _dense(p, f"{flax_blk}/mlp/fc2", sd, f"{tb}.ff.net.2")


def pixart_params_from_diffusers(sd: Mapping[str, Any], depth: int = 28) -> Dict[str, Any]:
    """Map a diffusers ``Transformer2DModel`` state_dict (the PixArt-DMD /
    InstaRevive_v1.ckpt format loaded at test_scripts/inference.py:238-242,
    optionally wrapped by ControlTransformerHalf with ``base_block`` key
    rewrites, transformer_controlnet.py:177-189) to our flax PixArt tree."""
    sd = strip_prefixes(sd)
    # ControlTransformerHalf saves base blocks as transformer_blocks.N.base_block.*
    sd = {k.replace(".base_block.", "."): v for k, v in sd.items()}
    p: Dict[str, Any] = {}
    _conv(p, "x_embedder", sd, "pos_embed.proj")
    _dense(p, "t_embedder/fc1", sd, "adaln_single.emb.timestep_embedder.linear_1")
    _dense(p, "t_embedder/fc2", sd, "adaln_single.emb.timestep_embedder.linear_2")
    _dense(p, "t_block", sd, "adaln_single.linear")
    _dense(p, "y_embedder/y_proj/fc1", sd, "caption_projection.linear_1")
    _dense(p, "y_embedder/y_proj/fc2", sd, "caption_projection.linear_2")
    if "caption_projection.y_embedding" in sd:
        _set(p, "y_embedder/y_embedding", _np(sd["caption_projection.y_embedding"]))
    for i in range(depth):
        _diffusers_block(p, f"blocks_{i}", sd, f"transformer_blocks.{i}")
    _set(p, "final_scale_shift_table", _np(sd["scale_shift_table"]))
    _dense(p, "final_linear", sd, "proj_out")

    # ControlTransformerHalf controller blocks (transformer_controlnet.py)
    j = 0
    while f"controlnet.{j}.copied_block.scale_shift_table" in sd:
        _diffusers_block(p, f"controlnet_{j}", sd, f"controlnet.{j}.copied_block")
        _dense(p, f"controlnet_{j}_after_proj", sd, f"controlnet.{j}.after_proj")
        if j == 0:
            _dense(p, "controlnet_before_proj", sd, "controlnet.0.before_proj")
        j += 1
    return p


def _unet_resblock(p, flax_path, sd, tp):
    _norm(p, f"{flax_path}/in_norm", sd, f"{tp}.in_layers.0")
    _conv(p, f"{flax_path}/in_conv", sd, f"{tp}.in_layers.2")
    _dense(p, f"{flax_path}/emb_proj", sd, f"{tp}.emb_layers.1")
    _norm(p, f"{flax_path}/out_norm", sd, f"{tp}.out_layers.0")
    _conv(p, f"{flax_path}/out_conv", sd, f"{tp}.out_layers.3")
    if f"{tp}.skip_connection.weight" in sd:
        _conv(p, f"{flax_path}/skip", sd, f"{tp}.skip_connection")


def _dense_nobias(tree, flax_path, sd, torch_path):
    _set(tree, flax_path + "/kernel", dense_kernel(sd[torch_path + ".weight"]))


def _unet_st(p, flax_path, sd, tp, depth=1):
    _norm(p, f"{flax_path}/norm", sd, f"{tp}.norm")
    _dense(p, f"{flax_path}/proj_in", sd, f"{tp}.proj_in")
    for d in range(depth):
        bb = f"{tp}.transformer_blocks.{d}"
        fb = f"{flax_path}/block_{d}"
        for n in ("norm1", "norm2", "norm3"):
            _norm(p, f"{fb}/{n}", sd, f"{bb}.{n}")
        for an in ("attn1", "attn2"):
            _dense_nobias(p, f"{fb}/{an}_q", sd, f"{bb}.{an}.to_q")
            _dense_nobias(p, f"{fb}/{an}_k", sd, f"{bb}.{an}.to_k")
            _dense_nobias(p, f"{fb}/{an}_v", sd, f"{bb}.{an}.to_v")
            _dense(p, f"{fb}/{an}_out", sd, f"{bb}.{an}.to_out.0")
        _dense(p, f"{fb}/ff_proj", sd, f"{bb}.ff.net.0.proj")
        _dense(p, f"{fb}/ff_out", sd, f"{bb}.ff.net.2")
    _dense(p, f"{flax_path}/proj_out", sd, f"{tp}.proj_out")


def unet_params_from_torch(
    sd: Mapping[str, Any],
    channel_mult=(1, 2, 4, 4),
    num_res_blocks: int = 2,
    attention_ds=(1, 2, 4),
    is_controlnet: bool = False,
) -> Dict[str, Any]:
    """Map the SD UNetModel / DiffBIR ControlNet state_dict
    (ldm/modules/diffusionmodules/openaimodel.py, diffusion/cldm.py:59-293)
    to our flax UNetBackbone tree. Mirrors the construction loop so torch
    sequential indices line up with our named blocks."""
    sd = strip_prefixes(sd)
    p: Dict[str, Any] = {}
    _dense(p, "time_embed_0", sd, "time_embed.0")
    _dense(p, "time_embed_2", sd, "time_embed.2")
    _conv(p, "input_conv", sd, "input_blocks.0.0")
    if is_controlnet:
        _conv(p, "zero_conv_0", sd, "zero_convs.0.0")

    ds, ti, zi = 1, 1, 1
    for level in range(len(channel_mult)):
        for j in range(num_res_blocks):
            _unet_resblock(p, f"in_{ti}_res", sd, f"input_blocks.{ti}.0")
            if ds in attention_ds:
                _unet_st(p, f"in_{ti}_st", sd, f"input_blocks.{ti}.1")
            if is_controlnet:
                _conv(p, f"zero_conv_{zi}", sd, f"zero_convs.{zi}.0")
            ti += 1
            zi += 1
        if level != len(channel_mult) - 1:
            _conv(p, f"down_{level}", sd, f"input_blocks.{ti}.0.op")
            if is_controlnet:
                _conv(p, f"zero_conv_{zi}", sd, f"zero_convs.{zi}.0")
            ds *= 2
            ti += 1
            zi += 1

    _unet_resblock(p, "mid_res1", sd, "middle_block.0")
    _unet_st(p, "mid_st", sd, "middle_block.1")
    _unet_resblock(p, "mid_res2", sd, "middle_block.2")
    if is_controlnet:
        _conv(p, "zero_conv_mid", sd, "middle_block_out.0")
        return p

    oi = 0
    for level in reversed(range(len(channel_mult))):
        for j in range(num_res_blocks + 1):
            _unet_resblock(p, f"out_{oi}_res", sd, f"output_blocks.{oi}.0")
            sub = 1
            if ds in attention_ds:
                _unet_st(p, f"out_{oi}_st", sd, f"output_blocks.{oi}.1")
                sub = 2
            if level and j == num_res_blocks:
                _conv(p, f"up_{level}", sd, f"output_blocks.{oi}.{sub}.conv")
                ds //= 2
            oi += 1

    _norm(p, "out_norm", sd, "out.0")
    _conv(p, "out_conv", sd, "out.2")
    return p


def pixart_ms_extra_params_from_torch(p: Dict[str, Any], sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Add PixArtMS micro-conditioning embedders (PixArtMS.py:142-143)."""
    sd = strip_prefixes(sd)
    if "csize_embedder.mlp.0.weight" in sd:
        _dense(p, "csize_embedder/fc1", sd, "csize_embedder.mlp.0")
        _dense(p, "csize_embedder/fc2", sd, "csize_embedder.mlp.2")
        _dense(p, "ar_embedder/fc1", sd, "ar_embedder.mlp.0")
        _dense(p, "ar_embedder/fc2", sd, "ar_embedder.mlp.2")
    return p


# ----------------------------------------------------------------- MiDaS ---


def _ws_conv(tree, flax_path, sd, torch_path, eps=1e-8, bias=False):
    """StdConv2dSame: fold timm's runtime weight standardization (biased
    variance over (I,kH,kW), eps 1e-8 in vision_transformer_hybrid) into
    the stored kernel."""
    w = _np(sd[torch_path + ".weight"]).astype(np.float64)
    m = w.mean(axis=(1, 2, 3), keepdims=True)
    v = w.var(axis=(1, 2, 3), keepdims=True)
    w = ((w - m) / np.sqrt(v + eps)).astype(np.float32)
    _set(tree, flax_path + "/kernel", w.transpose(2, 3, 1, 0))
    if bias:
        _set(tree, flax_path + "/bias", _np(sd[torch_path + ".bias"]))


def _conv_nobias(tree, flax_path, sd, torch_path):
    _set(tree, flax_path + "/kernel", conv_kernel(sd[torch_path + ".weight"]))


def dpt_params_from_torch(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """Reference DPTDepthModel state_dict (ISL midas dpt_{large,hybrid}
    checkpoints; midas/dpt_depth.py + midas/vit.py key layout) -> flax
    params for ``models.dpt.DPTDepthModel``.

    ``cfg`` is a ``models.dpt.DPTConfig`` (shape bookkeeping only — the
    mapping is width-generic). ConvTranspose reassemble weights (I,O,k,k)
    become dense kernels (I, k*k*O) for the depth-to-space formulation;
    the hybrid backbone's StdConv weights are standardization-folded.
    """
    sd = strip_prefixes(sd)
    p: Dict[str, Any] = {}
    vit = "pretrained.model."

    _set(p, "cls_token", _np(sd[vit + "cls_token"]))
    _set(p, "pos_embed", _np(sd[vit + "pos_embed"]))

    if cfg.hybrid:
        bb = vit + "patch_embed.backbone."
        _ws_conv(p, "backbone/stem_conv", sd, bb + "stem.conv")
        _norm(p, "backbone/stem_norm/gn", sd, bb + "stem.norm")
        for si, depth in enumerate(cfg.rn_layers):
            for bi in range(depth):
                tb = f"{bb}stages.{si}.blocks.{bi}."
                fb = f"backbone/stage{si}_block{bi}"
                for ci in (1, 2, 3):
                    _ws_conv(p, f"{fb}/conv{ci}", sd, f"{tb}conv{ci}")
                    _norm(p, f"{fb}/norm{ci}/gn", sd, f"{tb}norm{ci}")
                if f"{tb}downsample.conv.weight" in sd:
                    _ws_conv(p, f"{fb}/downsample_conv", sd, f"{tb}downsample.conv")
                    _norm(p, f"{fb}/downsample_norm/gn", sd, f"{tb}downsample.norm")
        w = _np(sd[vit + "patch_embed.proj.weight"])  # (D, C, 1, 1)
        _set(p, "patch_proj/kernel", w[:, :, 0, 0].transpose(1, 0))
        _set(p, "patch_proj/bias", _np(sd[vit + "patch_embed.proj.bias"]))
    else:
        w = conv_kernel(sd[vit + "patch_embed.proj.weight"])  # (p,p,C,D)
        _set(p, "patch_proj/kernel", w.reshape(-1, w.shape[-1]))
        _set(p, "patch_proj/bias", _np(sd[vit + "patch_embed.proj.bias"]))

    for i in range(cfg.vit_depth):
        tb, fb = f"{vit}blocks.{i}.", f"block{i}"
        _norm(p, f"{fb}/norm1", sd, tb + "norm1")
        _dense(p, f"{fb}/qkv", sd, tb + "attn.qkv")
        _dense(p, f"{fb}/proj", sd, tb + "attn.proj")
        _norm(p, f"{fb}/norm2", sd, tb + "norm2")
        _dense(p, f"{fb}/fc1", sd, tb + "mlp.fc1")
        _dense(p, f"{fb}/fc2", sd, tb + "mlp.fc2")
    # pretrained.model.norm.* is unused: DPT hooks fire on raw block outputs

    # reassemble (act_postprocess; hybrid uses identity for levels 1/2)
    start = 2 if cfg.hybrid else 0
    for li in range(start, 4):
        ap = f"pretrained.act_postprocess{li + 1}."
        fb = f"post{li + 1}"
        if cfg.readout == "project":
            _dense(p, f"{fb}/readout/project", sd, ap + "0.project.0")
        _conv(p, f"{fb}/conv", sd, ap + "3")
        if li < 2:  # ConvTranspose k=s -> dense + depth-to-space
            w = _np(sd[ap + "4.weight"])  # (I, O, k, k)
            i_, o, k, _ = w.shape
            _set(p, f"{fb}/up/kernel", w.transpose(0, 2, 3, 1).reshape(i_, k * k * o))
            _set(p, f"{fb}/up/bias", np.tile(_np(sd[ap + "4.bias"]), k * k))
        elif li == 3:
            _conv(p, f"{fb}/down", sd, ap + "4")

    for li in range(4):
        _conv_nobias(p, f"layer{li + 1}_rn", sd, f"scratch.layer{li + 1}_rn")
    for ri in range(1, 5):
        rb, fb = f"scratch.refinenet{ri}.", f"refinenet{ri}"
        _conv(p, f"{fb}/out_conv", sd, rb + "out_conv")
        for ui, fu in ((1, "rcu1"), (2, "rcu2")):
            _conv(p, f"{fb}/{fu}/conv1", sd, f"{rb}resConfUnit{ui}.conv1")
            _conv(p, f"{fb}/{fu}/conv2", sd, f"{rb}resConfUnit{ui}.conv2")
    _conv(p, "head_conv1", sd, "scratch.output_conv.0")
    _conv(p, "head_conv2", sd, "scratch.output_conv.2")
    _conv(p, "head_conv3", sd, "scratch.output_conv.4")
    return p


# ------------------------------------------------------------- LLaVA-MPT ---


def mpt_params_from_torch(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """MPT / LLaVA-MPT state_dict (reference diffusion/model/llava/mpt/
    modeling_mpt.py key layout; 'transformer.'-prefixed for the CausalLM
    wrapper) -> flax params for ``models.llava_mpt.MPTModel``.

    Handles ``no_bias`` checkpoints (bias keys absent), tied word
    embeddings (no separate lm_head), alibi (no wpe), qk_ln, and the LLaVA
    ``mm_projector``. ``cfg`` is a ``models.llava_mpt.MPTConfig``.
    """
    sd = strip_prefixes(sd, ("module.",))
    if any(k.startswith("transformer.") for k in sd):
        sd = {k[len("transformer."):]: v for k, v in sd.items()
              if k.startswith("transformer.")}
    p: Dict[str, Any] = {}

    def _maybe_norm(flax_path, torch_path):
        _set(p, flax_path + "/scale", _np(sd[torch_path + ".weight"]))
        if torch_path + ".bias" in sd:
            _set(p, flax_path + "/bias", _np(sd[torch_path + ".bias"]))

    def _maybe_dense(flax_path, torch_path):
        _set(p, flax_path + "/kernel", dense_kernel(sd[torch_path + ".weight"]))
        if torch_path + ".bias" in sd:
            _set(p, flax_path + "/bias", _np(sd[torch_path + ".bias"]))

    _set(p, "wte/embedding", _np(sd["wte.weight"]))
    if "wpe.weight" in sd:
        _set(p, "wpe/embedding", _np(sd["wpe.weight"]))
    for i in range(cfg.n_layers):
        tb, fb = f"blocks.{i}.", f"block{i}"
        _maybe_norm(f"{fb}/norm1", tb + "norm_1")
        _maybe_dense(f"{fb}/attn/Wqkv", tb + "attn.Wqkv")
        if cfg.qk_ln:
            _maybe_norm(f"{fb}/attn/q_ln", tb + "attn.q_ln")
            _maybe_norm(f"{fb}/attn/k_ln", tb + "attn.k_ln")
        _maybe_dense(f"{fb}/attn/out_proj", tb + "attn.out_proj")
        _maybe_norm(f"{fb}/norm2", tb + "norm_2")
        _maybe_dense(f"{fb}/up_proj", tb + "ffn.up_proj")
        _maybe_dense(f"{fb}/down_proj", tb + "ffn.down_proj")
    _maybe_norm("norm_f", "norm_f")
    if "mm_projector.weight" in sd:
        _maybe_dense("mm_projector", "mm_projector")
    return p


def _bn_fold_conv(tree, flax_path, sd, conv_path, bn_path, eps=1e-5):
    """Fold eval-mode BatchNorm (gamma, beta, running stats) into the
    preceding bias-free conv: w' = w * g/sqrt(v+eps), b' = b - m*g/sqrt(v+eps)."""
    w = _np(sd[conv_path + ".weight"]).astype(np.float64)  # OIHW
    g = _np(sd[bn_path + ".weight"]).astype(np.float64)
    b = _np(sd[bn_path + ".bias"]).astype(np.float64)
    m = _np(sd[bn_path + ".running_mean"]).astype(np.float64)
    v = _np(sd[bn_path + ".running_var"]).astype(np.float64)
    s = g / np.sqrt(v + eps)
    _set(tree, flax_path + "/kernel",
         (w * s[:, None, None, None]).astype(np.float32).transpose(2, 3, 1, 0))
    _set(tree, flax_path + "/bias", (b - m * s).astype(np.float32))


def midas_v21_params_from_torch(sd: Mapping[str, Any], layers=(3, 4, 23, 3)) -> Dict[str, Any]:
    """Reference MidasNet state_dict (midas/midas_net.py + the torchvision
    ResNeXt101-WSL encoder split by _make_resnet_backbone, blocks.py:101-111:
    pretrained.layer1 = Sequential(conv1, bn1, relu, maxpool, layer1)) ->
    flax params for ``models.dpt.MidasNet``. BatchNorms are folded."""
    sd = strip_prefixes(sd)
    p: Dict[str, Any] = {}
    _bn_fold_conv(p, "backbone/stem_conv", sd, "pretrained.layer1.0", "pretrained.layer1.1")
    for si, depth in enumerate(layers):
        base = f"pretrained.layer{si + 1}." + ("4." if si == 0 else "")
        for bi in range(depth):
            tb = f"{base}{bi}."
            fb = f"backbone/layer{si + 1}_block{bi}"
            for ci in (1, 2, 3):
                _bn_fold_conv(p, f"{fb}/conv{ci}", sd, f"{tb}conv{ci}", f"{tb}bn{ci}")
            if f"{tb}downsample.0.weight" in sd:
                _bn_fold_conv(p, f"{fb}/downsample", sd, f"{tb}downsample.0", f"{tb}downsample.1")
    for li in range(4):
        _conv_nobias(p, f"layer{li + 1}_rn", sd, f"scratch.layer{li + 1}_rn")
    for ri in range(1, 5):
        rb, fb = f"scratch.refinenet{ri}.", f"refinenet{ri}"
        for ui, fu in ((1, "rcu1"), (2, "rcu2")):
            _conv(p, f"{fb}/{fu}/conv1", sd, f"{rb}resConfUnit{ui}.conv1")
            _conv(p, f"{fb}/{fu}/conv2", sd, f"{rb}resConfUnit{ui}.conv2")
    _conv(p, "head_conv1", sd, "scratch.output_conv.0")
    _conv(p, "head_conv2", sd, "scratch.output_conv.2")
    _conv(p, "head_conv3", sd, "scratch.output_conv.4")
    return p


def midas_v21_small_params_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference MidasNet_small state_dict (midas/midas_net_custom.py:12-105
    with the torch.hub tf_efficientnet_lite3 encoder split by
    _make_efficientnet_backbone, blocks.py:88-98: pretrained.layer1 =
    Sequential(conv_stem, bn1, act1, blocks[0], blocks[1]); layer2 =
    blocks[2]; layer3 = blocks[3:5]; layer4 = blocks[5:9]) -> flax params
    for ``models.dpt.MidasNetSmall``. BatchNorms fold with the tf_ variant
    eps 1e-3 (gen-efficientnet BN_EPS_TF_DEFAULT)."""
    from ..models.dpt import LITE3_STAGES

    sd = strip_prefixes(sd)
    p: Dict[str, Any] = {}
    eps = 1e-3
    # torch Sequential slot of each effnet stage inside pretrained.layerN
    stage_prefix = {
        0: "pretrained.layer1.3", 1: "pretrained.layer1.4",
        2: "pretrained.layer2.0", 3: "pretrained.layer3.0",
        4: "pretrained.layer3.1", 5: "pretrained.layer4.0",
        6: "pretrained.layer4.1",
    }
    _bn_fold_conv(p, "backbone/conv_stem", sd,
                  "pretrained.layer1.0", "pretrained.layer1.1", eps=eps)
    for si, (reps, _, _, _, e) in enumerate(LITE3_STAGES):
        for bi in range(reps):
            tb = f"{stage_prefix[si]}.{bi}."
            fb = f"backbone/stage{si}_block{bi}"
            if e == 1:  # depthwise-separable: conv_dw+bn1, conv_pw+bn2
                _bn_fold_conv(p, f"{fb}/conv_dw", sd, tb + "conv_dw", tb + "bn1", eps=eps)
                _bn_fold_conv(p, f"{fb}/conv_pw", sd, tb + "conv_pw", tb + "bn2", eps=eps)
            else:  # inverted residual: conv_pw+bn1, conv_dw+bn2, conv_pwl+bn3
                _bn_fold_conv(p, f"{fb}/conv_pw", sd, tb + "conv_pw", tb + "bn1", eps=eps)
                _bn_fold_conv(p, f"{fb}/conv_dw", sd, tb + "conv_dw", tb + "bn2", eps=eps)
                _bn_fold_conv(p, f"{fb}/conv_pwl", sd, tb + "conv_pwl", tb + "bn3", eps=eps)
    for li in range(4):
        _conv_nobias(p, f"layer{li + 1}_rn", sd, f"scratch.layer{li + 1}_rn")
    for ri in range(1, 5):
        rb, fb = f"scratch.refinenet{ri}.", f"refinenet{ri}"
        for ui, fu in ((1, "rcu1"), (2, "rcu2")):
            _conv(p, f"{fb}/{fu}/conv1", sd, f"{rb}resConfUnit{ui}.conv1")
            _conv(p, f"{fb}/{fu}/conv2", sd, f"{rb}resConfUnit{ui}.conv2")
        _conv(p, f"{fb}/out_conv", sd, f"{rb}out_conv")
    _conv(p, "head_conv1", sd, "scratch.output_conv.0")
    _conv(p, "head_conv2", sd, "scratch.output_conv.2")
    _conv(p, "head_conv3", sd, "scratch.output_conv.4")
    return p


def clip_rn50_params_from_torch(sd: Mapping[str, Any]):
    """OpenAI CLIP ModifiedResNet state dict (the ``RN50`` checkpoint key
    schema: visual.conv1..3/bn1..3 stem, visual.layerL.B bottlenecks with
    avgpool downsample at ``downsample.0/1``, visual.attnpool q/k/v/c_proj,
    plus the text transformer) -> (visual_params, text_params, logit_scale,
    meta) for ``models.clip_rn50``. BatchNorms fold into conv scale/bias
    (eval-mode inference). Hyperparameters are inferred from tensor shapes
    the way pyiqa/openai ``build_model`` does."""
    sd = strip_prefixes(sd)
    # -- meta from shapes ----------------------------------------------------
    layers = tuple(
        1 + max(int(k.split(".")[2]) for k in sd
                if k.startswith(f"visual.layer{li}."))
        for li in (1, 2, 3, 4)
    )
    vision_width = int(_np(sd["visual.conv1.weight"]).shape[0]) * 2
    embed_dim = int(_np(sd["text_projection"]).shape[1])
    grid = int(round((_np(sd["visual.attnpool.positional_embedding"]).shape[0] - 1) ** 0.5))
    meta = {
        "layers": layers,
        "embed_dim": embed_dim,
        "vision_width": vision_width,
        "vision_heads": vision_width * 32 // 64,
        "image_size": grid * 32,
        "text_width": int(_np(sd["ln_final.weight"]).shape[0]),
        "text_layers": 1 + max(int(k.split(".")[2]) for k in sd
                               if k.startswith("transformer.resblocks.")),
        "text_heads": int(_np(sd["ln_final.weight"]).shape[0]) // 64,
        "vocab_size": int(_np(sd["token_embedding.weight"]).shape[0]),
        "context_length": int(_np(sd["positional_embedding"]).shape[0]),
    }
    # -- image tower ----------------------------------------------------------
    v: Dict[str, Any] = {}
    for ci in (1, 2, 3):
        _bn_fold_conv(v, f"conv{ci}", sd, f"visual.conv{ci}", f"visual.bn{ci}")
    for si, depth in enumerate(layers):
        for bi in range(depth):
            tb = f"visual.layer{si + 1}.{bi}."
            fb = f"layer{si + 1}_block{bi}"
            for ci in (1, 2, 3):
                _bn_fold_conv(v, f"{fb}/conv{ci}", sd, f"{tb}conv{ci}", f"{tb}bn{ci}")
            if f"{tb}downsample.0.weight" in sd:
                _bn_fold_conv(v, f"{fb}/downsample", sd,
                              f"{tb}downsample.0", f"{tb}downsample.1")
    _set(v, "attnpool/positional_embedding",
         _np(sd["visual.attnpool.positional_embedding"]))
    for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
        _dense(v, f"attnpool/{proj}", sd, f"visual.attnpool.{proj}")
    # -- text tower -----------------------------------------------------------
    t: Dict[str, Any] = {}
    _set(t, "token_embedding", _np(sd["token_embedding.weight"]))
    _set(t, "positional_embedding", _np(sd["positional_embedding"]))
    for i in range(meta["text_layers"]):
        tb = f"transformer.resblocks.{i}."
        fb = f"resblock_{i}"
        _norm(t, f"{fb}/ln_1", sd, f"{tb}ln_1")
        _norm(t, f"{fb}/ln_2", sd, f"{tb}ln_2")
        _set(t, f"{fb}/in_proj/kernel", dense_kernel(sd[f"{tb}attn.in_proj_weight"]))
        _set(t, f"{fb}/in_proj/bias", _np(sd[f"{tb}attn.in_proj_bias"]))
        _dense(t, f"{fb}/out_proj", sd, f"{tb}attn.out_proj")
        _dense(t, f"{fb}/c_fc", sd, f"{tb}mlp.c_fc")
        _dense(t, f"{fb}/c_proj", sd, f"{tb}mlp.c_proj")
    _norm(t, "ln_final", sd, "ln_final")
    _set(t, "text_projection", _np(sd["text_projection"]))
    logit_scale = float(_np(sd["logit_scale"]))
    return v, t, logit_scale, meta
