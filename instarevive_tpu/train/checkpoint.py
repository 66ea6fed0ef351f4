"""Checkpoint IO: orbax native format + foreign PyTorch checkpoint import.

Parity targets: reference ``diffusion/utils/checkpoint.py:8-85`` (PixArt
.pth with state_dict/state_dict_ema/optimizer/scheduler/epoch; pos_embed
dropped on load), Lightning ``.ckpt`` handling (``utils/common.py:34-51``
'module.'/'model.' stripping), and the DMD ``accelerate_save_state``
(save-model-only option).

Native checkpoints are orbax (async-capable, multi-host safe); foreign
formats go through instarevive_tpu.convert converters.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (params / train state) with orbax StandardCheckpointer."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, target=target)
        return ckptr.restore(path)


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a torch .pth/.ckpt on host CPU and unwrap common containers."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, Mapping):
        for key in ("state_dict", "state_dict_ema", "model", "module"):
            if key in obj and isinstance(obj[key], Mapping):
                obj = obj[key]
                break
    return dict(obj)


def load_null_embed(path: str) -> np.ndarray:
    """Load the cached T5 null-prompt embedding (reference
    test_scripts/inference.py:256-259, a .pth with shape (1?, L, 4096))."""
    if path.endswith((".npy", ".npz")):
        arr = np.load(path)
        if hasattr(arr, "files"):
            arr = arr[arr.files[0]]
    else:
        import torch

        t = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(t, Mapping):
            t = next(iter(t.values()))
        arr = t.detach().float().numpy()
    arr = np.asarray(arr, dtype=np.float32)
    while arr.ndim > 2:
        arr = arr[0]
    return arr  # (L, 4096)
