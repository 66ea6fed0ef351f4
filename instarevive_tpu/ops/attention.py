"""Attention ops: XLA reference path + Pallas TPU flash-attention kernel.

Replaces the reference's external CUDA attention (xformers
``memory_efficient_attention`` in ``diffusion/model/nets/PixArt_blocks.py:53,153,207``
and torch SDPA) with:

  * ``sdpa``          — fused-by-XLA reference attention, fp32 softmax
                        (the reference's ``fp32_attention`` stability flag,
                        PixArt_blocks.py:145-147, is the default here),
  * ``flash_attention`` — a Pallas online-softmax kernel for long sequences
                        (DiT self-attention: 4096 tokens at 64x64 latents),
                        O(N) memory instead of materializing N x N scores.

Layout: (B, H, N, D). Variable-length text cross-attention is expressed as a
boolean key mask (replacing xformers BlockDiagonalMask at PixArt_blocks.py:52).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    fp32_softmax: bool = True,
) -> jnp.ndarray:
    """Reference scaled-dot-product attention.

    q: (B,H,Nq,D), k/v: (B,H,Nk,D); bias broadcastable to (B,H,Nq,Nk);
    kv_mask: (B,Nk) True=keep. Returns (B,H,Nq,D) in q.dtype.
    """
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    acc_t = jnp.float32 if fp32_softmax else q.dtype
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=acc_t)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(acc_t)
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
        jnp.float32 if fp32_softmax else q.dtype
    )
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v.astype(probs.dtype), preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, m_scratch, l_scratch, acc_scratch, *, scale, has_mask
):
    """Online-softmax flash attention block step.

    Grid: (BH, num_q_blocks, num_k_blocks); the k axis is innermost so the
    (m, l, acc) scratch carries across k blocks of one q block.
    """
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]  # (bk, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    s = s * scale
    if has_mask:
        keep = mask_ref[0] > 0  # (1, bk) int mask
        s = jnp.where(keep, s, _NEG_INF)

    m_prev = m_scratch[:, :1]  # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (bq, bk)

    l_prev = l_scratch[:, :1]
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    acc = acc_scratch[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)
    acc_scratch[:] = acc

    @pl.when(kb == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scratch[:] / jnp.maximum(l_scratch[:, :1], 1e-30)).astype(o_ref.dtype)


import os

# Defaults from tools/flash_sweep.py on v5e at the DiT hot shape
# (BH=16, n=4096, d=72): large block_k wins — (512,2048) is ~12% faster
# than (512,1024); small-nk cross-attention is protected by the
# round_up(nk,128) clamp below.
_BLOCK_Q = int(os.environ.get("FLASH_BLOCK_Q", "512"))
_BLOCK_K = int(os.environ.get("FLASH_BLOCK_K", "2048"))


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "fp32_softmax")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = _BLOCK_Q,
    block_k: int = _BLOCK_K,
    fp32_softmax: bool = True,  # kernel always reduces in f32
) -> jnp.ndarray:
    """Pallas flash attention. q:(B,H,N,D), k/v:(B,H,Nk,D), kv_mask:(B,Nk).

    Ragged sizes are handled by internal padding: q rows are padded (and
    sliced off the output); padded keys are masked out — so any (nq, nk)
    works, e.g. the 300-token T5 cross-attention."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    scale = d**-0.5 if scale is None else scale

    def round_up(x, m):
        return -(-x // m) * m

    # large head dims blow VMEM at the default blocks (q/k/v/acc scale with
    # d); shrink to stay under the ~16MB scoped limit even for f32 inputs
    if d >= 256:
        block_q = min(block_q, 256)
        block_k = min(block_k, 512)
    block_q = min(block_q, round_up(nq, 128))
    block_k = min(block_k, round_up(nk, 128))
    nq_pad = round_up(nq, block_q)
    nk_pad = round_up(nk, block_k)
    if nq_pad != nq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, nq_pad - nq), (0, 0)))
    if nk_pad != nk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, nk_pad - nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, nk_pad - nk), (0, 0)))
        if kv_mask is None:
            kv_mask = jnp.ones((b, nk), dtype=bool)
    if kv_mask is not None and kv_mask.shape[1] != nk_pad:
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, nk_pad - kv_mask.shape[1])))

    qf = q.reshape(b * h, nq_pad, d)
    kf = k.reshape(b * h, nk_pad, d)
    vf = v.reshape(b * h, nk_pad, d)
    if kv_mask is None:
        maskf = jnp.ones((b * h, 1, nk_pad), dtype=jnp.int32)
        has_mask = False
    else:
        maskf = jnp.repeat(kv_mask.astype(jnp.int32)[:, None, :], h, axis=0).reshape(
            b * h, 1, nk_pad
        )
        has_mask = True
    nq_orig, nq, nk = nq, nq_pad, nk_pad

    grid = (b * h, nq // block_q, nk // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, has_mask=has_mask),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda bh, i, j: (bh, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(qf, kf, vf, maskf)
    out = out.reshape(b, h, nq, d)
    return out[:, :, :nq_orig] if nq_orig != nq else out


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    fp32_softmax: bool = True,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatch: Pallas flash kernel on TPU for long unbiased sequences,
    XLA reference otherwise (CPU tests, small windows, biased attention)."""
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        # flash for any long-query attention (kernel pads ragged k lengths);
        # biased attention (rel-pos windows) stays on the XLA path
        impl = "flash" if (on_tpu and q.shape[2] >= 1024 and bias is None) else "xla"
    if impl == "flash":
        return flash_attention(q, k, v, kv_mask=kv_mask, scale=scale)
    return sdpa(q, k, v, bias=bias, kv_mask=kv_mask, scale=scale, fp32_softmax=fp32_softmax)
