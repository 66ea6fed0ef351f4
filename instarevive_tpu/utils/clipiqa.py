"""CLIP-IQA — no-reference quality via CLIP antonym prompts.

Fills the pyiqa dependency of the reference's metrics CLI (reference
evaluate_img.py:17 ``pyiqa.create_metric('clipiqa')``): Wang et al.,
"Exploring CLIP for Assessing the Look and Feel of Images" (AAAI 2023).
The score for an image is softmax over the CLIP similarities to an
antonym prompt pair — default ("Good photo.", "Bad photo.") — so no
IQA-specific pretrained weights are needed beyond a local CLIP
checkpoint (zero-egress: pass a downloaded HF CLIP dir).

Backbones: pass ``model_dir`` as an HF Flax CLIP directory (ViT family),
or as an OpenAI CLIP **RN50** state dict file (.pt/.pth) — pyiqa's
default backbone, served natively by models/clip_rn50.py (plus
``tokenizer_dir`` for the BPE vocab); with RN50 weights the absolute
scores are pyiqa-comparable. The multi-prompt "+" variant is supported
via ``prompts=[(pos, neg), ...]`` (scores averaged).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

# CLIP preprocessing constants (openai/CLIP preprocess)
_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

DEFAULT_PROMPTS: Tuple[Tuple[str, str], ...] = (("Good photo.", "Bad photo."),)


class CLIPIQA:
    """Callable: NHWC float [0,1] images -> quality scores in [0,1]."""

    def __init__(
        self,
        model_dir: str | None = None,
        model=None,
        tokenizer=None,
        prompts: Sequence[Tuple[str, str]] = DEFAULT_PROMPTS,
        tokenizer_dir: str | None = None,
    ):
        if model is None or tokenizer is None:
            from transformers import AutoTokenizer

            if model_dir and model_dir.endswith((".pt", ".pth")):
                # an OpenAI CLIP RN50 state dict file: pyiqa's default
                # backbone, served by the native ModifiedResNet towers
                # (models/clip_rn50.py) — absolute scores become
                # pyiqa-comparable. The BPE tokenizer comes from any local
                # HF CLIP dir (same vocab across all OpenAI CLIP models).
                from instarevive_tpu.models.clip_rn50 import OpenAICLIP

                model = OpenAICLIP.from_torch(model_dir)
                if tokenizer is None:
                    if not tokenizer_dir:
                        raise ValueError(
                            "RN50 checkpoints need --clipiqa_tokenizer "
                            "(a local HF CLIP tokenizer dir)")
                    tokenizer = AutoTokenizer.from_pretrained(tokenizer_dir)
            else:
                from transformers import FlaxCLIPModel

                model = FlaxCLIPModel.from_pretrained(model_dir)
                tokenizer = AutoTokenizer.from_pretrained(tokenizer_dir or model_dir)
        self.model = model
        self.tokenizer = tokenizer
        self.prompts = list(prompts)
        self._text_embeds = None
        # pyiqa's clipiqa scales cosine similarities by the checkpoint's
        # logit_scale.exp() (pyiqa/archs/clipiqa_arch.py); for clamped
        # pretrained OpenAI CLIP that is exactly 100. Read it from the
        # params so non-OpenAI checkpoints score identically to pyiqa.
        try:
            self.logit_scale = float(np.exp(np.asarray(model.params["logit_scale"])))
        except (KeyError, TypeError, AttributeError):
            self.logit_scale = 100.0

    # -- pieces --------------------------------------------------------------

    def _embed_prompts(self) -> np.ndarray:
        """(P, 2, D) L2-normalized text embeddings for the antonym pairs."""
        if self._text_embeds is None:
            flat: List[str] = [p for pair in self.prompts for p in pair]
            tok = self.tokenizer(flat, padding=True, return_tensors="np")
            emb = np.asarray(
                self.model.get_text_features(
                    input_ids=tok["input_ids"],
                    attention_mask=tok.get("attention_mask"),
                )
            )
            emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
            self._text_embeds = emb.reshape(len(self.prompts), 2, -1)
        return self._text_embeds

    def _preprocess(self, images01: np.ndarray) -> np.ndarray:
        """[0,1] NHWC -> CLIP NCHW at the vision tower's native size."""
        import jax.numpy as jnp

        from instarevive_tpu.ops.resize import pil_resize_bicubic

        size = int(self.model.config.vision_config.image_size)
        x = jnp.asarray(images01, jnp.float32)
        if x.shape[1] != size or x.shape[2] != size:
            x = jnp.clip(pil_resize_bicubic(x, (size, size)), 0.0, 1.0)
        x = (x - _MEAN) / _STD
        return np.asarray(jnp.transpose(x, (0, 3, 1, 2)))

    # -- public --------------------------------------------------------------

    def __call__(self, images01: np.ndarray) -> np.ndarray:
        """images01: (N, H, W, 3) in [0,1]. Returns (N,) scores in [0,1]."""
        pix = self._preprocess(np.asarray(images01))
        img = np.asarray(self.model.get_image_features(pixel_values=pix))
        img = img / np.linalg.norm(img, axis=-1, keepdims=True)
        txt = self._embed_prompts()  # (P, 2, D)
        # logits = logit_scale.exp() * cos-sim (== 100 for pretrained
        # OpenAI CLIP); softmax over the (pos, neg) pair -> probability
        # of the positive prompt
        sims = self.logit_scale * np.einsum("nd,pkd->npk", img, txt)
        e = np.exp(sims - sims.max(axis=-1, keepdims=True))
        probs = e[..., 0] / e.sum(axis=-1)  # (N, P)
        return probs.mean(axis=-1)
