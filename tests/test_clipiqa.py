"""CLIP-IQA metric (reference evaluate_img.py:17 via pyiqa) on a tiny
random-initialized Flax CLIP (no pretrained weights in this env)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from instarevive_tpu.utils.clipiqa import CLIPIQA  # noqa: E402


class _Tok:
    """Minimal tokenizer stub: maps each prompt to a distinct id row."""

    def __call__(self, texts, padding=True, return_tensors="np"):
        ids = np.stack(
            [np.arange(5, dtype=np.int32) + 7 * (1 + sum(map(ord, t)) % 100)
             for t in texts]
        ) % 900
        return {"input_ids": ids, "attention_mask": np.ones_like(ids)}


def _tiny_clip():
    import jax
    import numpy as onp
    from transformers import CLIPConfig, FlaxCLIPModel

    cfg = CLIPConfig(
        text_config={"hidden_size": 32, "intermediate_size": 64,
                     "num_hidden_layers": 2, "num_attention_heads": 2,
                     "vocab_size": 1000, "max_position_embeddings": 16},
        vision_config={"hidden_size": 32, "intermediate_size": 64,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "image_size": 32, "patch_size": 8},
        projection_dim=16,
    )
    m = FlaxCLIPModel(cfg, seed=0)
    # HF Flax CLIP random-init zeroes every LayerNorm scale, which makes the
    # whole model constant-output; set them to ones so the toy is non-degenerate
    def fix(path, leaf):
        name = "/".join(str(p) for p in path)
        if "layer_norm" in name.lower() or "layernorm" in name.lower() or "post_layernorm" in name.lower() or "pre_layrnorm" in name.lower() or "final_layer_norm" in name.lower():
            if "scale" in name and float(onp.asarray(leaf).std()) == 0.0:
                return onp.ones_like(onp.asarray(leaf))
        return leaf

    m.params = jax.tree_util.tree_map_with_path(
        lambda p, l: fix([getattr(k, "key", k) for k in p], l), m.params
    )
    return m


def test_scores_shape_range_and_determinism():
    metric = CLIPIQA(model=_tiny_clip(), tokenizer=_Tok())
    imgs = np.random.default_rng(0).random((3, 48, 40, 3)).astype(np.float32)
    s1 = metric(imgs)
    s2 = metric(imgs)
    assert s1.shape == (3,)
    assert np.all((s1 >= 0) & (s1 <= 1))
    np.testing.assert_allclose(s1, s2)
    # non-degenerate: prompts and images must actually influence the score
    assert not np.allclose(s1, 0.5)
    assert s1.std() > 0


def test_prompt_swap_flips_score():
    m_fwd = CLIPIQA(model=_tiny_clip(), tokenizer=_Tok(),
                    prompts=[("Good photo.", "Bad photo.")])
    imgs = np.random.default_rng(1).random((2, 32, 32, 3)).astype(np.float32)
    s = m_fwd(imgs)
    # swapping the antonym order must give 1 - score (softmax symmetry)
    m_rev = CLIPIQA(model=m_fwd.model, tokenizer=m_fwd.tokenizer,
                    prompts=[("Good photo.", "Bad photo.")])
    m_rev._text_embeds = m_fwd._embed_prompts()[:, ::-1]
    np.testing.assert_allclose(m_rev(imgs), 1.0 - s, atol=1e-5)


def test_multi_prompt_average():
    model, tok = _tiny_clip(), _Tok()
    single = CLIPIQA(model=model, tokenizer=tok,
                     prompts=[("Sharp photo.", "Blurry photo.")])
    multi = CLIPIQA(model=model, tokenizer=tok,
                    prompts=[("Sharp photo.", "Blurry photo."),
                             ("Sharp photo.", "Blurry photo.")])
    imgs = np.random.default_rng(2).random((1, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(single(imgs), multi(imgs), atol=1e-6)
