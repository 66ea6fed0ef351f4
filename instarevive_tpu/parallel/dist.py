"""Multi-host runtime initialization + host-level helpers.

Parity target: reference ``diffusion/utils/dist_utils.py`` env-rendezvous
init (:39-67 local groups of 8) and ``scripts/run_pixart_dmd.py:39-45``
(MASTER_ADDR/PORT/RANK/WORLD_SIZE launcher plumbing). On TPU pods this
collapses into ``jax.distributed.initialize`` (auto on Cloud TPU) + mesh
axes; cross-host value sync uses ``jax.experimental.multihost_utils``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime.

    On Cloud TPU all arguments are discovered automatically; the env-var
    form (MASTER_ADDR/WORLD_SIZE/RANK, the reference launcher's contract)
    is honored when set.

    Must run before anything touches the XLA backend — so the
    already-initialized check inspects the distributed client state
    rather than calling jax.process_count() (which would initialize the
    backend and forbid jax.distributed.initialize afterwards).
    """
    if _already_initialized():
        return
    coordinator_address = coordinator_address or _env_coordinator()
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()  # TPU auto-discovery
        except Exception:
            pass  # single-process
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("WORLD_SIZE", 1)),
        process_id=process_id if process_id is not None else int(os.environ.get("RANK", 0)),
    )


def _already_initialized() -> bool:
    """True if jax.distributed.initialize already ran (backend-safe probe)."""
    try:
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:
        return False


def _env_coordinator() -> Optional[str]:
    addr = os.environ.get("MASTER_ADDR")
    port = os.environ.get("MASTER_PORT", "1234")
    return f"{addr}:{port}" if addr else None


def get_dist_info():
    """(rank, world_size) — mmcv get_dist_info analog at the process level."""
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_device_group() -> list:
    """This host's devices (the reference's 'local group of 8')."""
    return jax.local_devices()


def broadcast_from_main(tree: Any) -> Any:
    """Host-level broadcast of a pytree from process 0 (dist_utils broadcast)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def sync_global_mean(tree: Any) -> Any:
    """Cross-host mean of host-local metric values (reduce_dict analog)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    summed = multihost_utils.process_allgather(tree)
    return jax.tree_util.tree_map(lambda x: np.mean(x, axis=0), summed)
