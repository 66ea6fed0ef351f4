"""PixArt DiT backbone + ControlNet-Half (flax.linen, NHWC latents, TPU-first).

Parity targets:
  * ``diffusion/model/nets/PixArt.py:25-315`` (PixArt / PixArt_XL_2: adaLN-
    single conditioning, per-block scale_shift_table, T5 cross-attention),
  * ``diffusion/model/nets/PixArt_blocks.py`` (AttentionKVCompress 61-158,
    MultiHeadCrossAttention 28-59, T2IFinalLayer 259-275, TimestepEmbedder,
    CaptionEmbedder 432-464),
  * ``diffusion/model/nets/PixArtMS.py`` (runtime per-(h,w) sincos position
    embedding — our ``PixArt`` computes PE per input shape, subsuming both),
  * ``diffusion/model/nets/pixart_controlnet.py:17-250`` (ControlPixArtHalf:
    first-N copied blocks, zero-init before/after projections).

TPU design:
  * latents are NHWC; patch-embed is a strided conv; tokens (B, N, D);
  * self-attention over N=4096 tokens dispatches to the Pallas flash kernel
    on TPU (ops/attention.py) — no N x N score materialization;
  * the reference's xformers BlockDiagonalMask variable-length text trick is
    replaced by a padded key mask — mathematically identical, static shapes;
  * fp32 softmax is always on (the reference's fp32_attention NaN guard);
  * position embeddings are trace-time numpy constants per (h, w) — no
    recompute per step, folded into the graph.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from instarevive_tpu.nn.layers import Mlp, timestep_embedding
from instarevive_tpu.ops.attention import attention, sdpa


@lru_cache(maxsize=32)
def sincos_pos_embed_2d(
    dim: int, h: int, w: int, pe_interpolation: float = 1.0, base_size: int = 16
) -> np.ndarray:
    """2-D sin-cos PE, PixArt convention (PixArt.py:258-307): tokens are
    row-major over (h, w); the FIRST half of the dim encodes the (scaled)
    column coordinate, the second half the row; each half is [sin | cos]."""
    gh = np.arange(h, dtype=np.float64) / (h / base_size) / pe_interpolation
    gw = np.arange(w, dtype=np.float64) / (w / base_size) / pe_interpolation
    grid_w, grid_h = np.meshgrid(gw, gh)  # each (h, w); row-major flatten

    def embed_1d(pos):
        omega = np.arange(dim // 4, dtype=np.float64) / (dim / 4.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate([embed_1d(grid_w), embed_1d(grid_h)], axis=1)
    return emb.astype(np.float32)  # (h*w, dim)


class TimestepEmbedder(nn.Module):
    """sinusoid(256) -> MLP (PixArt_blocks.py TimestepEmbedder)."""

    hidden: int
    freq_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        emb = timestep_embedding(t, self.freq_dim)
        emb = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(emb)


class SizeEmbedder(nn.Module):
    """Micro-conditioning embedder (PixArt_blocks.py SizeEmbedder): each
    scalar (image h/w, aspect ratio) -> sinusoid(256) -> MLP -> out_dim."""

    out_dim: int
    freq_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s):
        """s: (B, K) scalars -> (B, K * out_dim)."""
        b, k = s.shape
        emb = timestep_embedding(s.reshape(-1), self.freq_dim)
        emb = nn.Dense(self.out_dim, dtype=self.dtype, name="fc1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(emb)
        return emb.reshape(b, k * self.out_dim)


class CaptionEmbedder(nn.Module):
    """T5-feature projection with uncond-embedding dropout for CFG."""

    hidden: int
    in_channels: int = 4096
    token_num: int = 120
    uncond_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, drop_ids: Optional[jnp.ndarray] = None, train: bool = False, rng=None):
        """y: (B, L, in_ch); drop_ids: (B,) bool to force uncond rows."""
        y_embedding = self.param(
            "y_embedding",
            lambda key, shape: jax.random.normal(key, shape) / self.in_channels**0.5,
            (self.token_num, self.in_channels),
        )
        if drop_ids is None and train and self.uncond_prob > 0 and rng is not None:
            drop_ids = jax.random.uniform(rng, (y.shape[0],)) < self.uncond_prob
        if drop_ids is not None:
            y = jnp.where(drop_ids[:, None, None], y_embedding[None].astype(y.dtype), y)
        return Mlp(self.hidden, out_features=self.hidden, dtype=self.dtype, name="y_proj")(y)


class SelfAttention(nn.Module):
    """AttentionKVCompress (PixArt_blocks.py:61-158): qkv + optional KV
    spatial downsample (conv/ave/uniform) + optional qk-norm."""

    dim: int
    num_heads: int
    sampling: Optional[str] = None  # 'conv' | 'ave' | 'uniform' | None
    sr_ratio: int = 1
    qk_norm: bool = False
    window_size: int = 0  # >0: ViT-det windowed attention (PixArt_blocks:161)
    dtype: jnp.dtype = jnp.float32
    # sequence parallelism (parallel/sp.py): tokens arrive sharded over a
    # 'seq' shard_map axis; K/V are all-gathered so every local query
    # attends over the FULL sequence (exact attention, 2 gathers/block).
    # No param-structure or numeric change when False (the default).
    seq_parallel: bool = False

    @nn.compact
    def __call__(self, x, hw: Optional[Tuple[int, int]] = None):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.qk_norm:
            q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="q_norm")(q)
            k = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="k_norm")(k)

        if self.window_size > 0:
            # local windows over the token grid (diffusion/model/utils.py:74-120
            # window_partition semantics): attention confined to win x win
            # patches — the DiT-side long-sequence scaling mechanism.
            from instarevive_tpu.ops import window as W

            gh, gw = hw if hw is not None else (int(n**0.5), int(n**0.5))
            win = self.window_size

            def to_windows(t):
                t = t.reshape(b, gh, gw, c)
                t, _, _ = W.pad_to_multiple(t, win, mode="constant")
                return W.window_partition(t, win)  # (B*nW, win^2, c)

            qw, kw, vw = to_windows(q), to_windows(k), to_windows(v)
            bw, nw_tokens, _ = qw.shape

            def heads_w(t):
                return jnp.transpose(t.reshape(bw, -1, h, hd), (0, 2, 1, 3))

            out = attention(heads_w(qw), heads_w(kw), heads_w(vw), scale=hd**-0.5)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(bw, nw_tokens, c)
            ph = -(-gh // win) * win
            pw = -(-gw // win) * win
            out = W.window_reverse(out, win, ph, pw)[:, :gh, :gw].reshape(b, n, c)
            return nn.Dense(c, dtype=self.dtype, name="proj")(out)

        if self.sr_ratio > 1 and self.sampling is not None:
            gh, gw = hw if hw is not None else (int(n**0.5), int(n**0.5))
            k = self._downsample(k, gh, gw)
            v = self._downsample(v, gh, gw)

        if self.seq_parallel:
            # x (and so q/k/v) holds only this device's token shard; gather
            # the full K/V so local queries see the exact global attention
            k = jax.lax.all_gather(k, "seq", axis=1, tiled=True)
            v = jax.lax.all_gather(v, "seq", axis=1, tiled=True)

        def heads(t):
            # constrain_heads: no-op single-device; under a 'tensor' mesh
            # axis it pins H/t heads per device (parallel/tp.py layout)
            from instarevive_tpu.parallel.mesh import constrain_heads

            return constrain_heads(jnp.transpose(t.reshape(b, -1, h, hd), (0, 2, 1, 3)))

        out = attention(heads(q), heads(k), heads(v), scale=hd**-0.5, fp32_softmax=True)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)

    def _downsample(self, t, gh, gw):
        b, n, c = t.shape
        r = self.sr_ratio
        x = t.reshape(b, gh, gw, c)
        if self.sampling == "uniform":
            x = x[:, ::r, ::r]
        elif self.sampling == "ave":
            # F.interpolate nearest with 1/r: picks every r-th pixel
            x = x[:, ::r, ::r]
        elif self.sampling == "conv":
            x = nn.Conv(
                c, (r, r), strides=(r, r), feature_group_count=c, dtype=self.dtype, name="sr"
            )(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        else:
            raise ValueError(self.sampling)
        return x.reshape(b, -1, c)


class CrossAttention(nn.Module):
    """Image-token queries over padded text keys (PixArt_blocks.py:28-59);
    the padded kv_mask replaces xformers BlockDiagonalMask.from_seqlens."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, kv_mask=None):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        q = nn.Dense(c, dtype=self.dtype, name="q_linear")(x)
        kv = nn.Dense(2 * c, dtype=self.dtype, name="kv_linear")(cond)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            from instarevive_tpu.parallel.mesh import constrain_heads

            return constrain_heads(jnp.transpose(t.reshape(b, -1, h, hd), (0, 2, 1, 3)))

        # auto-dispatches to the flash kernel on TPU (300 text keys are
        # padded inside the kernel) — no f32 score materialization
        out = attention(heads(q), heads(k), heads(v), kv_mask=kv_mask, scale=hd**-0.5)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class PixArtBlock(nn.Module):
    """DiT block with adaLN-single (PixArt.py:25-57)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    sampling: Optional[str] = None
    sr_ratio: int = 1
    qk_norm: bool = False
    window_size: int = 0
    dtype: jnp.dtype = jnp.float32
    seq_parallel: bool = False  # see SelfAttention.seq_parallel

    @nn.compact
    def __call__(self, x, y, t6, kv_mask=None, hw=None):
        """x: (B,N,D) tokens; y: (B,L,D) text; t6: (B, 6, D) shared adaLN."""
        b, n, c = x.shape
        table = self.param(
            "scale_shift_table",
            lambda key, shape: jax.random.normal(key, shape) / self.dim**0.5,
            (6, self.dim),
        )
        from instarevive_tpu.parallel.mesh import replicate_grad

        # replicate_grad: the batch-reduced table cotangent otherwise carries
        # a degenerate size-1-dim batch sharding into the param-grad reshape
        # (SPMD 'involuntary full rematerialization', round-2 dryrun).
        mods = replicate_grad(table[None]) + t6  # (B, 6, D)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            mods[:, i][:, None] for i in range(6)
        ]

        h1 = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False, dtype=self.dtype, name="norm1")(x)
        h1 = h1 * (1 + scale_msa) + shift_msa
        x = x + gate_msa * SelfAttention(
            self.dim, self.num_heads, self.sampling, self.sr_ratio, self.qk_norm,
            self.window_size, self.dtype, self.seq_parallel, name="attn",
        )(h1, hw=hw)
        x = x + CrossAttention(self.dim, self.num_heads, self.dtype, name="cross_attn")(
            x, y, kv_mask
        )
        h2 = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False, dtype=self.dtype, name="norm2")(x)
        h2 = h2 * (1 + scale_mlp) + shift_mlp
        x = x + gate_mlp * Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(h2)
        return x


class PixArt(nn.Module):
    """PixArt(MS) DiT. XL-2 config: depth 28, hidden 1152, patch 2, heads 16.

    Position embeddings are computed per input (h, w) at trace time, which
    covers both the fixed-grid PixArt and the multi-scale PixArtMS
    (PixArtMS.py:177-182) behaviors.
    """

    input_size: int = 64
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    pred_sigma: bool = True
    caption_channels: int = 4096
    model_max_length: int = 120
    class_dropout_prob: float = 0.1
    pe_interpolation: float = 1.0
    qk_norm: bool = False
    kv_compress_sampling: Optional[str] = None
    kv_compress_ratio: int = 1
    kv_compress_layers: Sequence[int] = ()
    window_size: int = 0  # ViT-det windowed attention on selected blocks
    window_block_indexes: Sequence[int] = ()
    micro_condition: bool = False  # PixArtMS img_hw + aspect-ratio embeds
    grad_checkpoint: bool = False
    # jax.checkpoint policy name for grad_checkpoint blocks: 'full' rematerializes
    # everything (min HBM); 'dots' = dots_with_no_batch_dims_saveable keeps
    # matmul outputs (no matmul recompute in bwd — trades HBM for MFU, fits
    # XL-2 b1 on one v5e, BENCH.md train table)
    remat_policy: str = "full"
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self):
        return self.in_channels * 2 if self.pred_sigma else self.in_channels

    @nn.compact
    def __call__(self, x, timestep, y, y_mask=None, c=None, control_depth: int = 0,
                 train: bool = False, y_drop_rng=None, data_info=None):
        """x: (B, H, W, C) latent NHWC; timestep: (B,); y: (B, L, 4096);
        y_mask: (B, L) bool; c: optional ControlNet condition latent
        (B, H, W, C) — enables the ControlNet-Half path (control_depth > 0).

        Returns (B, H, W, out_channels)."""
        b, hh, ww, _ = x.shape
        p = self.patch_size
        gh, gw = hh // p, ww // p
        base_size = self.input_size // p

        x_embedder = nn.Conv(
            self.hidden_size, (p, p), strides=(p, p), dtype=self.dtype, name="x_embedder"
        )
        pe = jnp.asarray(
            sincos_pos_embed_2d(self.hidden_size, gh, gw, self.pe_interpolation, base_size)
        )
        tokens = x_embedder(x).reshape(b, gh * gw, self.hidden_size)
        tokens = tokens + pe[None].astype(tokens.dtype)
        c_tokens = None
        if c is not None:
            # forward_c (pixart_controlnet.py:78-86): shared patch embed + PE
            c_tokens = x_embedder(c).reshape(b, gh * gw, self.hidden_size)
            c_tokens = c_tokens + pe[None].astype(c_tokens.dtype)

        t_emb = TimestepEmbedder(self.hidden_size, dtype=self.dtype, name="t_embedder")(timestep)
        if self.micro_condition:
            # PixArtMS micro-conditioning (PixArtMS.py:117-137): size + AR
            # embeds added to the timestep embedding
            d3 = self.hidden_size // 3
            if data_info is None:
                hw_in = jnp.full((b, 2), float(hh), jnp.float32).at[:, 1].set(float(ww))
                ar_in = jnp.full((b, 1), float(hh) / float(ww), jnp.float32)
            else:
                hw_in, ar_in = data_info["img_hw"], data_info["aspect_ratio"]
            csize = SizeEmbedder(d3, dtype=self.dtype, name="csize_embedder")(hw_in)
            ar = SizeEmbedder(self.hidden_size - 2 * d3, dtype=self.dtype, name="ar_embedder")(ar_in)
            t_emb = t_emb + jnp.concatenate([csize, ar], axis=-1)
        # pin the adaLN conditioning's sharding: left ambiguous, XLA chose a
        # resharding in the FSDP backward ('involuntary full
        # rematerialization' in the round-1 dryrun); no-op without a mesh.
        # The flat (B, 6D) activation is constrained too so the *transposed*
        # reshape in the backward keeps batch sharding — otherwise the t_block
        # bias-grad sharding propagates up through the reshape and SPMD falls
        # back to full rematerialization (round-2 dryrun warnings).
        from instarevive_tpu.parallel.mesh import constrain_batch, replicate_grad

        # replicate_grad between the Dense and the reshape: the summed
        # per-block t6 cotangent is batch-sharded while the t_block bias-grad
        # reduce wants it fsdp-sharded, and SPMD cannot reshard across the
        # transposed reshape (it falls back to full rematerialization — an
        # implicit all-gather). Constraining the cotangent replicated at this
        # point is the same all-gather, made explicit and warning-free.
        t6 = replicate_grad(
            nn.Dense(6 * self.hidden_size, dtype=self.dtype, name="t_block")(nn.silu(t_emb))
        )
        t6 = constrain_batch(t6.reshape(b, 6, self.hidden_size))

        y_tokens = CaptionEmbedder(
            self.hidden_size,
            self.caption_channels,
            self.model_max_length,
            self.class_dropout_prob,
            self.dtype,
            name="y_embedder",
        )(y, train=train, rng=y_drop_rng)

        block_cls = PixArtBlock
        if self.grad_checkpoint:
            policy = None
            if self.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            block_cls = nn.remat(PixArtBlock, static_argnums=(5,), policy=policy)

        def make_block(i, name=None):
            sr = (
                self.kv_compress_ratio
                if i in tuple(self.kv_compress_layers)
                else 1
            )
            win = self.window_size if i in tuple(self.window_block_indexes) else 0
            return block_cls(
                self.hidden_size,
                self.num_heads,
                self.mlp_ratio,
                self.kv_compress_sampling if sr > 1 else None,
                sr,
                self.qk_norm,
                win,
                self.dtype,
                name=name or f"blocks_{i}",
            )

        if c_tokens is None:
            for i in range(self.depth):
                tokens = make_block(i)(tokens, y_tokens, t6, y_mask, (gh, gw))
        else:
            # ControlNet-Half (pixart_controlnet.py:120-146): base block 0,
            # then copy_blocks with zero-init skips feeding blocks 1..N.
            c = c_tokens
            tokens = make_block(0)(tokens, y_tokens, t6, y_mask, (gh, gw))
            for i in range(1, control_depth + 1):
                j = i - 1
                if j == 0:
                    before = nn.Dense(
                        self.hidden_size,
                        kernel_init=nn.initializers.zeros,
                        dtype=self.dtype,
                        name="controlnet_before_proj",
                    )(c)
                    c = tokens + before
                c = make_block(j, name=f"controlnet_{j}")(c, y_tokens, t6, y_mask, (gh, gw))
                c_skip = nn.Dense(
                    self.hidden_size,
                    kernel_init=nn.initializers.zeros,
                    dtype=self.dtype,
                    name=f"controlnet_{j}_after_proj",
                )(c)
                tokens = make_block(i)(tokens + c_skip, y_tokens, t6, y_mask, (gh, gw))
            for i in range(control_depth + 1, self.depth):
                tokens = make_block(i)(tokens, y_tokens, t6, y_mask, (gh, gw))

        # T2IFinalLayer (PixArt_blocks.py:259-275)
        final_table = self.param(
            "final_scale_shift_table",
            lambda key, shape: jax.random.normal(key, shape) / self.hidden_size**0.5,
            (2, self.hidden_size),
        )
        from instarevive_tpu.parallel.mesh import replicate_grad

        mods = replicate_grad(final_table[None]) + t_emb[:, None]
        shift, scale = mods[:, 0][:, None], mods[:, 1][:, None]
        out = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False, dtype=self.dtype, name="norm_final")(
            tokens
        )
        out = out * (1 + scale) + shift
        out = nn.Dense(p * p * self.out_channels, dtype=self.dtype, name="final_linear")(out)

        # unpatchify -> NHWC
        out = out.reshape(b, gh, gw, p, p, self.out_channels)
        out = jnp.transpose(out, (0, 1, 3, 2, 4, 5)).reshape(
            b, gh * p, gw * p, self.out_channels
        )
        return out


def pixart_xl_2(**kwargs) -> PixArt:
    """PixArt_XL_2 (PixArt.py:313-315)."""
    return PixArt(depth=28, hidden_size=1152, patch_size=2, num_heads=16, **kwargs)


def pixart_ms_xl_2(**kwargs) -> PixArt:
    """PixArtMS_XL_2 (PixArtMS.py:289-292): runtime per-(h,w) PE + conv
    patch embed; enable ``micro_condition=True`` for the size/AR embeds."""
    return PixArt(depth=28, hidden_size=1152, patch_size=2, num_heads=16, **kwargs)


def pixart_ms_controlnet_xl_2(**kwargs) -> PixArt:
    """PixArtMS_controlnet (controlnet.py:86-290).

    Despite its name, the reference class's forward (controlnet.py:165-211)
    contains NO control wiring — it is a functional duplicate of PixArtMS
    (runtime per-(h,w) PE, conv patch embed, optional micro-conditioning),
    parity-tested as such in tests/test_pixart.py. It maps to the same
    unified PixArt module; pass ``c=``/``control_depth=`` at call time for
    the functional ControlNet-Half path (pixart_controlnet.py) instead.
    """
    return PixArt(depth=28, hidden_size=1152, patch_size=2, num_heads=16, **kwargs)
