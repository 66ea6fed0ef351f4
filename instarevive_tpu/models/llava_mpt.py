"""LLaVA-MPT captioner stack in flax.linen: MPT decoder + multimodal splice.

Parity target: reference ``diffusion/model/llava/`` — ``mpt/modeling_mpt.py``
(MPTModel/MPTForCausalLM), ``mpt/blocks.py`` (MPTBlock/MPTMLP),
``mpt/attention.py`` (MultiheadAttention / MultiQueryAttention, ALiBi bias
builders), ``mpt/norm.py`` (LPLayerNorm/RMSNorm), ``llava_mpt.py:92-168``
(CLIP-feature splice into the token stream). The reference uses this
vendored LLaVA(MPT-7B) for auto-captioning training images.

TPU-first choices:
- generation is a single jitted program: fixed-shape KV cache ring updated
  with ``lax.dynamic_update_slice`` and a ``lax.scan`` over decode steps —
  no per-token retrace, no host round-trips (the reference's HF
  ``generate`` loop is Python-per-token);
- ALiBi is applied as a precomputed additive bias following the torch-impl
  semantics exactly (masked_fill with finfo.min, ``attention.py:36-44``);
- the multimodal splice is a vmapped ``dynamic_update_slice`` at the first
  <im_patch> position (the reference's per-sample Python loop,
  ``llava_mpt.py:130-165``, requires the patch run to be consecutive — the
  same invariant, enforced structurally here);
- the CLIP vision tower is pluggable (HF FlaxCLIPVisionModel in
  ``tools/extract_caption.py``), mirroring ``mm_vision_select_layer``
  hidden-state selection + cls-drop (``llava_mpt.py:106-125``).

Weights: ``convert.torch_import.mpt_params_from_torch`` consumes MPT /
LLaVA-MPT state dicts (tied word embeddings, ``no_bias`` checkpoints).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MPTConfig:
    """configuration_mpt.py:7-117 (fields the forward path consumes)."""

    d_model: int = 768
    n_heads: int = 12
    n_layers: int = 12
    expansion_ratio: int = 4
    max_seq_len: int = 2048
    vocab_size: int = 50368
    attn_type: str = "multihead_attention"  # | multiquery_attention
    qk_ln: bool = False
    clip_qkv: Optional[float] = None
    softmax_scale: Optional[float] = None
    alibi: bool = True
    alibi_bias_max: int = 8
    no_bias: bool = True
    norm_type: str = "low_precision_layernorm"  # | rmsnorm variants
    logit_scale: Optional[float] = None
    embedding_fraction: float = 1.0
    # llava extras (llava_mpt.py:55, 76-79)
    mm_hidden_size: Optional[int] = None


# MPT-7B / LLaVA-MPT-7B shape (mosaicml/mpt-7b config.json)
MPT_7B = MPTConfig(d_model=4096, n_heads=32, n_layers=32, vocab_size=50432)


def gen_slopes(n_heads: int, alibi_bias_max: int = 8) -> np.ndarray:
    """attention.py:259-266."""
    nh = 2 ** math.ceil(math.log2(n_heads))
    m = np.arange(1, nh + 1, dtype=np.float32) * (alibi_bias_max / nh)
    slopes = 1.0 / np.power(2, m)
    if nh != n_heads:
        slopes = np.concatenate([slopes[1::2], slopes[::2]])[:n_heads]
    return slopes.reshape(1, n_heads, 1, 1)


def build_alibi_bias(n_heads: int, seq_len: int, alibi_bias_max: int = 8) -> np.ndarray:
    """Causal-form ALiBi bias (1, h, 1, S) (attention.py:268-275, full=False),
    for KEYS at distances (k - (S-1)) — the reference slices the last s_k
    entries for shorter sequences."""
    dist = np.arange(1 - seq_len, 1, dtype=np.float32).reshape(1, 1, 1, seq_len)
    return dist * gen_slopes(n_heads, alibi_bias_max)


class RMSNorm(nn.Module):
    """norm.py:27-41 (stats in f32, no bias). NOTE: the vendored MPT
    rms_norm computes ``x / torch.rsqrt(ms + eps)`` — i.e. it MULTIPLIES by
    the RMS (inverted scaling, a quirk of that release). Replicated
    verbatim: checkpoints trained with that code expect it. MPT-7B /
    LLaVA-MPT use low_precision_layernorm, so this path is config-opt-in."""

    dim: int

    @nn.compact
    def __call__(self, x):
        w = self.param("scale", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        y = xf * jnp.sqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-5)
        return (y * w).astype(x.dtype)


def _make_norm(cfg: MPTConfig, name: str):
    if cfg.norm_type.lower().endswith("rmsnorm"):
        return RMSNorm(cfg.d_model, name=name)
    # LPLayerNorm == LayerNorm outside autocast (norm.py:15-26); no_bias
    # strips the bias param (modeling_mpt.py:54-59)
    return nn.LayerNorm(epsilon=1e-5, use_bias=not cfg.no_bias, name=name)


def _mpt_attention_scores(q, k, v, bias_slice, key_mask, causal_mask, scale):
    """attention.py:19-52 torch impl: scores + bias, masked_fill(finfo.min)
    for padding (already folded into bias_slice) and causality."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias_slice is not None:
        s = s + bias_slice
    if key_mask is not None:
        fmin = jnp.finfo(s.dtype).min
        s = jnp.where(key_mask[:, None, None, :], s, fmin)
    if causal_mask is not None:
        fmin = jnp.finfo(s.dtype).min
        s = jnp.where(causal_mask, s, fmin)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", a, v)


class MPTAttention(nn.Module):
    """Multihead / multiquery self-attention (attention.py:115-232)."""

    cfg: MPTConfig

    @nn.compact
    def __call__(self, x, alibi_bias, key_mask, cache=None, position=None):
        cfg = self.cfg
        b, s, d = x.shape
        h = cfg.n_heads
        dh = d // h
        mq = cfg.attn_type == "multiquery_attention"
        hk = 1 if mq else h
        kv_dim = dh if mq else d
        use_bias = not cfg.no_bias

        qkv = nn.Dense(d + 2 * kv_dim, use_bias=use_bias, name="Wqkv")(x)
        if cfg.clip_qkv:
            qkv = jnp.clip(qkv, -cfg.clip_qkv, cfg.clip_qkv)
        q, k, v = jnp.split(qkv, [d, d + kv_dim], axis=-1)
        if cfg.qk_ln:
            # LN over the full projection width (attention.py:160-163,220-223)
            q = nn.LayerNorm(epsilon=1e-5, use_bias=use_bias, name="q_ln")(q)
            k = nn.LayerNorm(epsilon=1e-5, use_bias=use_bias, name="k_ln")(k)

        q = q.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, hk, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, hk, dh).transpose(0, 2, 1, 3)
        scale = cfg.softmax_scale or 1.0 / math.sqrt(dh)

        if cache is None:
            # full (prefill/training) pass: causal over the s x s block
            causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
            bias = None
            if alibi_bias is not None:
                bias = alibi_bias[:, :, :, -s:]  # (1,h,1,s) broadcast rows
            o = _mpt_attention_scores(q, k, v, bias, key_mask, causal, scale)
            new_cache = (k, v)
        else:
            # single-token decode against the fixed-size cache
            k_cache, v_cache = cache
            k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, 0, position, 0))
            v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, 0, position, 0))
            S = k_cache.shape[2]
            idx = jnp.arange(S)
            # ALiBi distances are (k - t) for the query at position t
            bias = None
            if alibi_bias is not None:
                slopes = jnp.asarray(
                    gen_slopes(self.cfg.n_heads, self.cfg.alibi_bias_max)
                )
                bias = (idx - position).astype(jnp.float32)[None, None, None, :] * slopes
            valid = (idx <= position)[None, None, None, :]
            mask = valid & (
                key_mask[:, None, None, :] if key_mask is not None else True
            )
            o = _mpt_attention_scores(
                q, k_cache, v_cache, bias, None, mask, scale
            )
            new_cache = (k_cache, v_cache)

        if mq:
            o = jnp.broadcast_to(o, (b, h, o.shape[2], dh)) if o.shape[1] == 1 else o
        o = o.transpose(0, 2, 1, 3).reshape(b, -1, d)
        return nn.Dense(d, use_bias=use_bias, name="out_proj")(o), new_cache


class MPTBlock(nn.Module):
    """blocks.py:20-40: pre-norm attn + GELU MLP."""

    cfg: MPTConfig

    @nn.compact
    def __call__(self, x, alibi_bias, key_mask, cache=None, position=None):
        cfg = self.cfg
        a = _make_norm(cfg, "norm1")(x)
        o, new_cache = MPTAttention(cfg, name="attn")(
            a, alibi_bias, key_mask, cache, position
        )
        x = x + o
        m = _make_norm(cfg, "norm2")(x)
        use_bias = not cfg.no_bias
        y = nn.Dense(cfg.expansion_ratio * cfg.d_model, use_bias=use_bias, name="up_proj")(m)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(cfg.d_model, use_bias=use_bias, name="down_proj")(y)
        return x + y, new_cache


class MPTModel(nn.Module):
    """modeling_mpt.py:27-205 core forward (inference path: no dropout)."""

    cfg: MPTConfig

    def setup(self):
        cfg = self.cfg
        self.wte = nn.Embed(cfg.vocab_size, cfg.d_model, name="wte")
        if not cfg.alibi:
            self.wpe = nn.Embed(cfg.max_seq_len, cfg.d_model, name="wpe")
        self.blocks = [MPTBlock(cfg, name=f"block{i}") for i in range(cfg.n_layers)]
        self.norm_f_mod = _make_norm(cfg, "norm_f")
        if cfg.mm_hidden_size:
            self.mm_projector = nn.Dense(cfg.d_model, name="mm_projector")
        self._alibi = (
            jnp.asarray(build_alibi_bias(cfg.n_heads, cfg.max_seq_len, cfg.alibi_bias_max))
            if cfg.alibi
            else None
        )

    def embed(self, input_ids):
        return self.wte(input_ids)

    def splice_images(self, tok_emb, input_ids, image_features, im_patch_token):
        """llava_mpt.py:150-165 (consecutive <im_patch> run replaced by the
        projected CLIP features), as a vmapped dynamic_update_slice."""
        feats = self.mm_projector(image_features)

        start = jnp.argmax((input_ids == im_patch_token).astype(jnp.int32), axis=1)

        def upd(emb, f, s):
            return jax.lax.dynamic_update_slice(emb, f.astype(emb.dtype), (s, 0))

        return jax.vmap(upd)(tok_emb, feats, start)

    def __call__(self, input_ids=None, key_mask=None, tok_emb=None,
                 caches=None, position=None):
        cfg = self.cfg
        if tok_emb is None:
            tok_emb = self.wte(input_ids)
        x = tok_emb
        if not cfg.alibi:
            s = x.shape[1]
            if position is None:
                pos = jnp.arange(s)[None]
                if key_mask is not None:
                    # left-padding correction (modeling_mpt.py:175-177)
                    pos = jnp.maximum(
                        pos - jnp.cumsum((~key_mask).astype(jnp.int32), axis=1), 0
                    )
            else:
                pos = jnp.full((1, s), position)
                if key_mask is not None:
                    npad = jnp.sum((~key_mask).astype(jnp.int32), axis=1)
                    pos = jnp.maximum(pos - npad[:, None], 0)
            x = x + self.wpe(pos)
        if cfg.embedding_fraction != 1.0:
            x = x * cfg.embedding_fraction + jax.lax.stop_gradient(x) * (
                1 - cfg.embedding_fraction
            )
        new_caches = []
        for i, blk in enumerate(self.blocks):
            cache = caches[i] if caches is not None else None
            x, c = blk(x, self._alibi, key_mask, cache, position)
            new_caches.append(c)
        x = self.norm_f_mod(x)
        return x, new_caches

    def logits(self, hidden):
        """MPTForCausalLM tied-embedding head (modeling_mpt.py:256-260)."""
        out = self.wte.attend(hidden)
        if self.cfg.logit_scale is not None:
            out = out * self.cfg.logit_scale
        return out

    def lm(self, input_ids, key_mask=None, tok_emb=None):
        h, _ = self(input_ids, key_mask, tok_emb)
        return self.logits(h)


def lm_loss(logits, labels):
    """modeling_mpt.py:262-265: roll(-1) labels, ignore_index -100."""
    labels = jnp.roll(labels, -1, axis=1).at[:, -1].set(-100)
    valid = labels != -100
    lab = jnp.where(valid, labels, 0)
    ll = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(ll, lab[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


# ------------------------------------------------------------ generation ---


def _decode_loop(model, params, tok0, caches, s0, key_mask, max_new_tokens,
                 eos_id):
    """Shared jittable decode: fixed-size KV cache + lax.scan over steps."""
    cfg = model.cfg
    b = tok0.shape[0]
    S = s0 + max_new_tokens
    mq = cfg.attn_type == "multiquery_attention"
    hk = 1 if mq else cfg.n_heads
    dh = cfg.d_model // cfg.n_heads

    full = []
    for (k, v) in caches:
        kf = jnp.zeros((b, hk, S, dh), k.dtype).at[:, :, :s0].set(k)
        vf = jnp.zeros((b, hk, S, dh), v.dtype).at[:, :, :s0].set(v)
        full.append((kf, vf))
    mask_full = (
        jnp.concatenate(
            [key_mask.astype(bool), jnp.ones((b, max_new_tokens), bool)], axis=1
        )
        if key_mask is not None
        else jnp.ones((b, S), bool)
    )

    def step(carry, i):
        tok, cch, done = carry
        pos = s0 + i
        emb = model.apply({"params": params}, tok[:, None], method="embed")
        h, ncch = model.apply(
            {"params": params}, None, mask_full, tok_emb=emb,
            caches=cch, position=pos,
        )
        logit = model.apply({"params": params}, h[:, -1:], method="logits")
        nxt = jnp.argmax(logit[:, 0], axis=-1).astype(jnp.int32)
        if eos_id is not None:
            nxt = jnp.where(done, eos_id, nxt)
            done = done | (nxt == eos_id)
        return (nxt, ncch, done), tok

    done0 = (tok0 == eos_id) if eos_id is not None else jnp.zeros((b,), bool)
    _, toks = jax.lax.scan(step, (tok0, full, done0), jnp.arange(max_new_tokens))
    return toks.transpose(1, 0)  # (B, max_new_tokens)


def greedy_generate(model: MPTModel, params, input_ids, key_mask,
                    max_new_tokens: int, eos_id: Optional[int] = None):
    """Greedy decoding as ONE jitted program: prefill fills a fixed-size KV
    cache, then lax.scan appends tokens with dynamic_update_slice. The
    prompt must be right-aligned if padded (left padding), matching the
    reference's generation contract (modeling_mpt.py:281-283).

    Returns (B, max_new_tokens) int32 tokens (post-EOS positions repeat
    EOS when ``eos_id`` is given — trim host-side)."""
    h, caches = model.apply({"params": params}, input_ids, key_mask)
    logit = model.apply({"params": params}, h[:, -1:], method="logits")
    tok0 = jnp.argmax(logit[:, 0], axis=-1).astype(jnp.int32)
    return _decode_loop(model, params, tok0, caches, input_ids.shape[1],
                        key_mask, max_new_tokens, eos_id)


# ------------------------------------------------------------------ LLaVA ---


def clip_select_features(vision_outputs_hidden_states, select_layer: int = -1):
    """llava_mpt.py:106-125: pick a hidden-state layer, drop the cls token."""
    return vision_outputs_hidden_states[select_layer][:, 1:]


class LlavaMPT:
    """Functional wrapper pairing an MPTModel(+mm_projector) with a
    pluggable vision encoder (e.g. HF FlaxCLIPVisionModel) for captioning.

    ``vision_fn(images) -> (B, num_patches, mm_hidden)`` already
    layer-selected and cls-dropped (see ``clip_select_features``)."""

    def __init__(self, model: MPTModel, params, vision_fn, im_patch_token: int):
        assert model.cfg.mm_hidden_size, "cfg.mm_hidden_size required for LLaVA"
        self.model = model
        self.params = params
        self.vision_fn = vision_fn
        self.im_patch_token = im_patch_token

    def multimodal_embed(self, input_ids, images):
        feats = self.vision_fn(images)
        return self.model.apply(
            {"params": self.params}, input_ids, feats,
            method=lambda mdl, ids, f: mdl.splice_images(
                mdl.wte(ids), ids, f, self.im_patch_token
            ),
        )

    def caption_logits(self, input_ids, images, key_mask=None):
        tok_emb = self.multimodal_embed(input_ids, images)
        return self.model.apply(
            {"params": self.params}, None, key_mask, tok_emb=tok_emb,
            method="lm",
        )

    def generate(self, input_ids, images, key_mask, max_new_tokens, eos_id=None):
        # prefill with the spliced embeddings, then the shared decode loop
        tok_emb = self.multimodal_embed(input_ids, images)
        h, caches = self.model.apply(
            {"params": self.params}, None, key_mask, tok_emb=tok_emb
        )
        logit = self.model.apply({"params": self.params}, h[:, -1:], method="logits")
        tok0 = jnp.argmax(logit[:, 0], axis=-1).astype(jnp.int32)
        return _decode_loop(self.model, self.params, tok0, caches,
                            input_ids.shape[1], key_mask, max_new_tokens, eos_id)
