"""CLIP text encoders for the LDM stack's conditioning.

Parity target: reference ``ldm/modules/encoders/modules.py`` —
FrozenCLIPEmbedder (:88) and FrozenOpenCLIPEmbedder with penultimate-layer
output (:134, the cldm.yaml:88-92 conditioning). Uses HuggingFace Flax CLIP
so the encoder runs jitted on TPU; weights must be local (zero-egress).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


class FrozenCLIPEmbedder:
    """CLIP text encoder; ``layer='last'|'penultimate'`` matches the
    reference's layer selection (penultimate == OpenCLIP convention)."""

    def __init__(self, model_dir: str, max_length: int = 77, layer: str = "penultimate"):
        self.model_dir = model_dir
        self.max_length = max_length
        self.layer = layer
        self._model = None
        self._tokenizer = None

    def _load(self):
        if self._model is None:
            from transformers import AutoTokenizer, FlaxCLIPTextModel

            self._tokenizer = AutoTokenizer.from_pretrained(self.model_dir)
            self._model = FlaxCLIPTextModel.from_pretrained(self.model_dir)

    def encode(self, texts: List[str]) -> np.ndarray:
        self._load()
        tok = self._tokenizer(
            texts, max_length=self.max_length, padding="max_length",
            truncation=True, return_tensors="np",
        )
        out = self._model(
            input_ids=tok["input_ids"], attention_mask=tok["attention_mask"],
            output_hidden_states=True,
        )
        if self.layer == "penultimate":
            return np.asarray(out.hidden_states[-2])
        return np.asarray(out.last_hidden_state)


def build_cond_stage(cfg: dict):
    """Construct the cldm conditioning encoder from a ``cond_stage`` config
    block (configs/cldm.yaml; reference cldm.yaml:88-92 cond_stage_config).

    Returns a FrozenCLIPEmbedder, or None when no local model_dir is set
    (callers then fall back to precomputed features / zero context).
    ``layer='penultimate'`` reproduces FrozenOpenCLIPEmbedder's output
    convention — the OpenCLIP ViT-H text tower in HF format loads through
    the same Flax CLIP text model.
    """
    if not cfg or not cfg.get("model_dir"):
        return None
    kind = cfg.get("type", "clip")
    if kind not in ("clip", "open_clip"):
        raise ValueError(f"unknown cond_stage type {kind!r}")
    return FrozenCLIPEmbedder(
        model_dir=cfg["model_dir"],
        max_length=int(cfg.get("max_length", 77)),
        layer=cfg.get("layer", "penultimate"),
    )


class ClassEmbedder:
    """Class-id -> embedding with uncond dropout (modules.py ClassEmbedder)."""

    def __init__(self, embed_dim: int, n_classes: int = 1000, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.table = rng.normal(0, 0.02, (n_classes + 1, embed_dim)).astype(np.float32)
        self.n_classes = n_classes

    def __call__(self, class_ids: np.ndarray, drop: np.ndarray = None) -> np.ndarray:
        ids = np.asarray(class_ids)
        if drop is not None:
            ids = np.where(drop, self.n_classes, ids)
        return self.table[ids]
