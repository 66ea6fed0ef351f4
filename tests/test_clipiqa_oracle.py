"""Numeric oracle for CLIP-IQA (reference evaluate_img.py:17 via
pyiqa.create_metric('clipiqa')): the same tiny CLIP weights driven through
HF *torch* CLIPModel plus a torch transcription of the pyiqa scoring rule
(softmax over 100x cosine similarity to the antonym prompt pair, averaged
over pairs for the "+" variant), compared against our Flax CLIPIQA path.

This closes the last IQA metric without a cross-framework numeric check
(NIQE/LPIPS/MUSIQ/MANIQA already have transcription oracles). It verifies
the CLIP preprocess constants, the flax<->torch feature equivalence (incl.
the text pooling argmax convention), and the scoring math end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_clipiqa import _Tok, _tiny_clip  # noqa: E402

from instarevive_tpu.utils.clipiqa import _MEAN, _STD, CLIPIQA  # noqa: E402


@pytest.fixture(scope="module")
def clip_pair():
    """(flax model, torch model with the SAME weights, tokenizer stub)."""
    from transformers import CLIPModel
    from transformers.modeling_flax_pytorch_utils import (
        load_flax_weights_in_pytorch_model,
    )

    m = _tiny_clip()
    mt = CLIPModel(m.config)
    load_flax_weights_in_pytorch_model(mt, m.params)
    return m, mt.eval(), _Tok()


def _torch_clipiqa(model_t, tok, imgs01_nchw_native, prompts):
    """pyiqa clipiqa scoring transcription (pyiqa/archs/clipiqa_arch.py):
    probs = softmax(100 * cos(img, [pos, neg]))[:, 0], averaged over the
    prompt pairs. Images arrive already at the vision tower's native size,
    CLIP-normalized, NCHW (resize semantics are tested separately)."""
    with torch.no_grad():
        f_img = model_t.get_image_features(pixel_values=imgs01_nchw_native)
        f_img = f_img / f_img.norm(dim=-1, keepdim=True)
        flat = [p for pair in prompts for p in pair]
        t = tok(flat, padding=True, return_tensors="np")
        f_txt = model_t.get_text_features(
            input_ids=torch.from_numpy(t["input_ids"]).long(),
            attention_mask=torch.from_numpy(t["attention_mask"]).long(),
        )
        f_txt = f_txt / f_txt.norm(dim=-1, keepdim=True)
        f_txt = f_txt.reshape(len(prompts), 2, -1)
        # pyiqa scales by the checkpoint's logit_scale.exp() (== 100 only
        # for clamped pretrained OpenAI CLIP) — derive it, don't hardcode,
        # so the oracle catches divergence on arbitrary checkpoints.
        scale = torch.exp(model_t.logit_scale)
        logits = scale * torch.einsum("nd,pkd->npk", f_img, f_txt)
        probs = torch.softmax(logits, dim=-1)[..., 0]  # (N, P)
        return probs.mean(dim=-1).numpy()


def _normalize_nchw(imgs01):
    return torch.from_numpy((imgs01 - _MEAN) / _STD).permute(0, 3, 1, 2)


def test_clipiqa_scores_match_torch_oracle(clip_pair):
    m, mt, tok = clip_pair
    size = int(m.config.vision_config.image_size)
    imgs = np.random.default_rng(0).random((3, size, size, 3)).astype(np.float32)
    metric = CLIPIQA(model=m, tokenizer=tok)
    ours = metric(imgs)
    ref = _torch_clipiqa(mt, tok, _normalize_nchw(imgs), metric.prompts)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_clipiqa_plus_multiprompt_matches_torch_oracle(clip_pair):
    """The clipiqa+ multi-pair variant: scores are the mean over pairs."""
    m, mt, tok = clip_pair
    size = int(m.config.vision_config.image_size)
    prompts = [
        ("Good photo.", "Bad photo."),
        ("Sharp image.", "Blurry image."),
        ("Noise-free image.", "Noisy image."),
    ]
    imgs = np.random.default_rng(1).random((2, size, size, 3)).astype(np.float32)
    ours = CLIPIQA(model=m, tokenizer=tok, prompts=prompts)(imgs)
    ref = _torch_clipiqa(mt, tok, _normalize_nchw(imgs), prompts)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_clipiqa_resize_path_matches_pil_ground_truth(clip_pair):
    """Non-native-size input: our preprocess resizes with PIL-parity
    bicubic; the oracle resizes with PIL itself (uint8-free float path via
    Image.resize on each channel), then runs the same torch scoring."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    m, mt, tok = clip_pair
    size = int(m.config.vision_config.image_size)
    imgs = np.random.default_rng(2).random((2, 57, 41, 3)).astype(np.float32)

    resized = np.stack(
        [
            np.stack(
                [
                    np.asarray(
                        Image.fromarray(im[..., c], mode="F").resize(
                            (size, size), Image.BICUBIC
                        )
                    )
                    for c in range(3)
                ],
                axis=-1,
            )
            for im in imgs
        ]
    ).clip(0.0, 1.0)

    metric = CLIPIQA(model=m, tokenizer=tok)
    ours = metric(imgs)
    ref = _torch_clipiqa(mt, tok, _normalize_nchw(resized), metric.prompts)
    # PIL's float path and our jax bicubic agree to ~1e-6 per pixel; the
    # score difference stays well under the softmax's sensitivity here.
    np.testing.assert_allclose(ours, ref, atol=5e-4)
