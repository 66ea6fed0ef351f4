"""Train state pytree with EMA (flax.struct).

Parity target: the reference's EMA-as-first-class checkpoints
(``ldm/modules/ema.py:LitEma`` warmup decay; ``ema_rate 0.9999`` in
``configs/PixArt_xl2_internal.py:50``; ``state_dict_ema`` in
``diffusion/utils/checkpoint.py``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)
    ema_rate: float = struct.field(pytree_node=False, default=0.9999)
    ema_warmup: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(cls, params, tx, ema: bool = True, ema_rate: float = 0.9999,
               ema_dtype=None):
        """``ema_dtype`` (e.g. bf16) stores the EMA shadow tree compactly —
        an HBM-fit knob for single-chip XL-2 DMD; the EMA update itself
        runs in f32 and casts back."""
        def mk_ema(p):
            return p.astype(ema_dtype) if ema_dtype is not None else jnp.copy(p)

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(mk_ema, params) if ema else None,
            tx=tx,
            ema_rate=ema_rate,
        )

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        step = self.step + 1
        ema = self.ema_params
        if ema is not None:
            # LitEma warmup: decay = min(rate, (1+n)/(10+n))
            decay = self.ema_rate
            if self.ema_warmup:
                n = step.astype(jnp.float32)
                decay = jnp.minimum(self.ema_rate, (1.0 + n) / (10.0 + n))
            ema = jax.tree_util.tree_map(
                lambda e, p: (
                    e.astype(jnp.float32) * decay
                    + p.astype(jnp.float32) * (1.0 - decay)
                ).astype(e.dtype),
                ema, new_params,
            )
        return self.replace(step=step, params=new_params, opt_state=new_opt, ema_params=ema)
