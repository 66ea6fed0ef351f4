"""Forward-output parity of the IQA nets vs torch oracle transcriptions
(VERDICT r3 item 4): the same standard every other model in the repo meets
via tests/oracles.py. Random weights flow torch -> state_dict ->
params_from_torch -> our forward, and outputs are compared against the
torch forward — catching transposed kernels, wrong qkv split order, and
padding-semantics drift that the key-list tests cannot.

Reduced widths/depths keep the CPU cost sane; the layouts/op semantics
under test are width-independent (the torch oracle and the JAX net scale
together from the same constants).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from iqa_oracles import (  # noqa: E402
    TorchMANIQA,
    TorchMUSIQ,
    torch_decode,
    torch_decode_landm,
    torch_nms,
    torch_priorbox,
)


def _randomize_zero_params(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            if float(p.abs().max()) == 0.0:
                p.normal_(0.0, 0.02, generator=g)
    return model


def test_musiq_forward_parity_vs_torch_oracle(monkeypatch):
    from instarevive_tpu.utils import musiq as MU

    monkeypatch.setattr(MU, "_LAYERS", 3)
    torch.manual_seed(0)
    oracle = _randomize_zero_params(TorchMUSIQ(layers=3, head_out=1)).eval()
    params = MU.params_from_torch(
        {k: v.clone() for k, v in oracle.state_dict().items()}
    )

    rng = np.random.default_rng(0)
    img = rng.random((96, 128, 3)).astype(np.float32)
    patches, hidx, sid, mask = MU.musiq_prepare(img)
    # trim padded slots (mask-invariance is tested separately); keeps the
    # 3-layer transformer cheap on CPU
    patches, hidx, sid = patches[mask], hidx[mask], sid[mask]
    ones = np.ones(len(patches), bool)

    ours = np.asarray(
        MU.musiq_forward(
            params, jnp.asarray(patches)[None], jnp.asarray(hidx)[None],
            jnp.asarray(sid)[None], jnp.asarray(ones)[None],
        )
    )
    with torch.no_grad():
        ref = oracle(
            torch.from_numpy(patches)[None], torch.from_numpy(hidx).long()[None],
            torch.from_numpy(sid).long()[None], torch.from_numpy(ones)[None],
        ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_musiq_ava_head_parity_vs_torch_oracle(monkeypatch):
    """The 10-way AVA distribution head reduces to its softmax-weighted
    mean identically on both sides."""
    from instarevive_tpu.utils import musiq as MU

    monkeypatch.setattr(MU, "_LAYERS", 2)
    torch.manual_seed(1)
    oracle = _randomize_zero_params(TorchMUSIQ(layers=2, head_out=10), 1).eval()
    params = MU.params_from_torch(
        {k: v.clone() for k, v in oracle.state_dict().items()}
    )
    rng = np.random.default_rng(1)
    img = rng.random((64, 64, 3)).astype(np.float32)
    patches, hidx, sid, mask = MU.musiq_prepare(img)
    patches, hidx, sid = patches[mask], hidx[mask], sid[mask]
    ones = np.ones(len(patches), bool)
    ours = np.asarray(
        MU.musiq_forward(
            params, jnp.asarray(patches)[None], jnp.asarray(hidx)[None],
            jnp.asarray(sid)[None], jnp.asarray(ones)[None],
        )
    )
    with torch.no_grad():
        ref = oracle(
            torch.from_numpy(patches)[None], torch.from_numpy(hidx).long()[None],
            torch.from_numpy(sid).long()[None], torch.from_numpy(ones)[None],
        ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_maniqa_forward_parity_vs_torch_oracle(monkeypatch):
    from instarevive_tpu.utils import maniqa as M

    # reduced width/depth; same graph. grid 16 keeps the swin window-4
    # partition exact and the TAB attention 256x256.
    monkeypatch.setattr(M, "_VIT_DEPTH", 4)
    monkeypatch.setattr(M, "_VIT_DIM", 192)
    monkeypatch.setattr(M, "_VIT_HEADS", 3)
    monkeypatch.setattr(M, "_FEAT_BLOCKS", (0, 1, 2, 3))
    monkeypatch.setattr(M, "_EMBED", 192)
    monkeypatch.setattr(M, "_DIM_MLP", 192)
    monkeypatch.setattr(M, "_IMG", 128)
    monkeypatch.setattr(M, "_GRID", 16)

    torch.manual_seed(0)
    oracle = _randomize_zero_params(
        TorchMANIQA(vit_dim=192, vit_depth=4, vit_heads=3, patch=8, img=128,
                    feat_blocks=(0, 1, 2, 3), dim_mlp=192)
    ).eval()
    params = M.params_from_torch(
        {k: v.clone() for k, v in oracle.state_dict().items()}
    )

    rng = np.random.default_rng(0)
    img = rng.random((2, 128, 128, 3)).astype(np.float32)
    ours = np.asarray(M.maniqa_forward(params, jnp.asarray(img)))
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_retinaface_priors_and_decode_parity():
    """Anchor generation + box/landmark decode vs the official
    biubug6/Pytorch_Retinaface box_utils/prior_box transcriptions."""
    from instarevive_tpu.utils import retinaface as R

    h, w = 160, 224
    priors = R.prior_boxes(h, w)
    ref_priors = torch_priorbox(h, w).numpy()
    np.testing.assert_allclose(priors, ref_priors, rtol=1e-6, atol=1e-7)

    rng = np.random.default_rng(0)
    loc = rng.normal(0, 1, (len(priors), 4)).astype(np.float32)
    landm = rng.normal(0, 1, (len(priors), 10)).astype(np.float32)

    boxes = R.decode(loc, priors)
    ref_boxes = torch_decode(torch.from_numpy(loc), torch.from_numpy(ref_priors)).numpy()
    np.testing.assert_allclose(boxes, ref_boxes, rtol=1e-5, atol=1e-6)

    lm = R.decode_landm(landm, priors)
    ref_lm = torch_decode_landm(
        torch.from_numpy(landm), torch.from_numpy(ref_priors)
    ).numpy()
    np.testing.assert_allclose(lm, ref_lm, rtol=1e-5, atol=1e-6)


def test_retinaface_nms_parity():
    from instarevive_tpu.utils import retinaface as R

    rng = np.random.default_rng(1)
    n = 200
    cxy = rng.random((n, 2)) * 200
    wh = rng.random((n, 2)) * 60 + 5
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], 1).astype(np.float32)
    scores = rng.random(n).astype(np.float32)
    keep = R.nms(boxes, scores, 0.4)
    ref = torch_nms(torch.from_numpy(boxes), torch.from_numpy(scores), 0.4)
    assert keep == ref


def test_lpips_parity_vs_torch_oracle():
    """LPIPS 'alex' (utils/metrics.LPIPS) vs the lpips-package transcription
    with shared random weights through the importer — same standard as the
    other IQA nets (reference evaluate_img.py:23 pyiqa 'lpips')."""
    import numpy as np
    import torch
    import jax.numpy as jnp

    from tests.iqa_oracles import TorchLPIPSAlex
    from instarevive_tpu.utils.metrics import LPIPS

    torch.manual_seed(0)
    oracle = TorchLPIPSAlex().eval()
    # lpips lin weights are non-negative in the real ckpt; keep random
    # positive so layer contributions don't cancel by accident
    with torch.no_grad():
        for lin in oracle.lins:
            lin.weight.abs_()
    alexnet_sd, lpips_sd = oracle.lpips_state_dicts()
    params = LPIPS.alexnet_feature_params_from_torch(alexnet_sd, lpips_sd)
    metric = LPIPS(params)

    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                      torch.from_numpy(b.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(metric(jnp.asarray(a), jnp.asarray(b)))
    assert got.shape == want.shape == (2,)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
