#!/usr/bin/env python
"""On-TPU numerics checks for the Pallas kernels (not part of pytest —
pytest runs CPU-only; this exercises the real Mosaic-compiled kernels).

    python tools/tpu_checks.py
"""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from instarevive_tpu.ops.attention import flash_attention, sdpa

    assert jax.default_backend() == "tpu", "run on TPU"
    rng = np.random.default_rng(0)

    checks = []
    for (b, h, nq, nk, d), mask_len in [
        ((1, 16, 4096, 4096, 72), None),   # DiT self-attention shape
        ((1, 1, 4096, 4096, 512), None),   # VAE mid-attention shape
        ((2, 8, 1024, 2048, 64), 1500),    # masked kv
    ]:
        q = jnp.asarray(rng.standard_normal((b, h, nq, d), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((b, h, nk, d), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((b, h, nk, d), dtype=np.float32))
        kv_mask = None
        if mask_len is not None:
            m = np.zeros((b, nk), bool)
            m[:, :mask_len] = True
            kv_mask = jnp.asarray(m)
        ref = sdpa(q, k, v, kv_mask=kv_mask)
        out = flash_attention(q, k, v, kv_mask=kv_mask)
        err = float(jnp.abs(out - ref).max())
        ok = err < 1e-3  # f32 online-softmax vs XLA reduction-order tolerance
        checks.append(ok)
        print(f"flash {b}x{h}x{nq}x{nk}x{d} mask={mask_len}: max_err={err:.2e} {'OK' if ok else 'FAIL'}")

    # bf16 path
    q = jnp.asarray(rng.standard_normal((1, 16, 4096, 72), dtype=np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 16, 4096, 72), dtype=np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 16, 4096, 72), dtype=np.float32), jnp.bfloat16)
    ref = sdpa(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    out = flash_attention(q, k, v).astype(jnp.float32)
    err = float(jnp.abs(out - ref).max())
    ok = err < 2e-2
    checks.append(ok)
    print(f"flash bf16: max_err={err:.2e} {'OK' if ok else 'FAIL'}")

    if not all(checks):
        raise SystemExit(1)
    print("ALL TPU KERNEL CHECKS PASSED")


if __name__ == "__main__":
    main()
