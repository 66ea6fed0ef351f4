"""MUSIQ / MANIQA architectures (VERDICT r1 item 7): structure + importer
contract tests. Pretrained weights are unavailable (zero egress), so these
guard the shape contract, determinism, multi-resolution handling, and the
torch-import key mapping — the parity-vs-pyiqa check activates the moment
real checkpoints are provided (same pattern as LPIPS/CLIP importers)."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_musiq_multiscale_shapes_and_determinism():
    from instarevive_tpu.utils.musiq import MUSIQ, init_random_params

    m = MUSIQ(init_random_params(0))
    rng = np.random.default_rng(0)
    img = rng.random((300, 420, 3), np.float32)  # non-square, non-multiple of 32
    s1 = m(img)
    s2 = m(img)
    assert s1.shape == (1,)
    assert np.isfinite(s1).all()
    np.testing.assert_array_equal(s1, s2)
    # a different image scores differently (the patches actually matter)
    s3 = m(rng.random((300, 420, 3), np.float32))
    assert abs(float(s3[0] - s1[0])) > 1e-7


def test_musiq_mask_invariance_to_padding():
    """Padded patch slots are masked: enlarging the canvas with the pad
    convention must not change the score path for the same patch set."""
    from instarevive_tpu.utils.musiq import musiq_forward, musiq_prepare, init_random_params

    p = init_random_params(1)
    rng = np.random.default_rng(1)
    img = rng.random((128, 128, 3), np.float32)
    patches, hidx, sid, mask = musiq_prepare(img)
    base = musiq_forward(p, jnp.asarray(patches)[None], jnp.asarray(hidx)[None],
                         jnp.asarray(sid)[None], jnp.asarray(mask)[None])
    # corrupt the masked (padding) slots: score must be unchanged
    patches2 = patches.copy()
    patches2[~mask] = 123.0
    got = musiq_forward(p, jnp.asarray(patches2)[None], jnp.asarray(hidx)[None],
                        jnp.asarray(sid)[None], jnp.asarray(mask)[None])
    np.testing.assert_allclose(np.asarray(base), np.asarray(got), rtol=1e-5)


def test_maniqa_shapes_and_range():
    from instarevive_tpu.utils.maniqa import MANIQA, init_random_params

    m = MANIQA(init_random_params(0))
    rng = np.random.default_rng(0)
    img = rng.random((1, 224, 224, 3), np.float32)
    s = m(img)
    assert s.shape == (1,)
    assert np.isfinite(s).all() and s[0] >= 0  # relu'd weighted average
    # larger inputs go through the crop path
    s2 = m(rng.random((1, 280, 300, 3), np.float32))
    assert np.isfinite(s2).all()


def test_maniqa_torch_importer_roundtrip():
    """Build a synthetic torch state dict with the official module names and
    check the importer consumes every key and matches the functional net's
    shape contract."""
    torch = pytest.importorskip("torch")
    from instarevive_tpu.utils import maniqa as M

    ref = M.init_random_params(2)
    sd = {}

    def put_lin(src, dst):
        sd[f"{src}.weight"] = torch.from_numpy(np.asarray(ref[f"{dst}/kernel"]).T.copy())
        sd[f"{src}.bias"] = torch.from_numpy(np.asarray(ref[f"{dst}/bias"]).copy())

    def put_ln(src, dst):
        sd[f"{src}.weight"] = torch.from_numpy(np.asarray(ref[f"{dst}/scale"]).copy())
        sd[f"{src}.bias"] = torch.from_numpy(np.asarray(ref[f"{dst}/bias"]).copy())

    sd["vit.patch_embed.proj.weight"] = torch.from_numpy(
        np.asarray(ref["vit/patch_embed/kernel"]).transpose(3, 2, 0, 1).copy())
    sd["vit.patch_embed.proj.bias"] = torch.from_numpy(
        np.asarray(ref["vit/patch_embed/bias"]).copy())
    sd["vit.cls_token"] = torch.from_numpy(np.asarray(ref["vit/cls_token"])[None].copy())
    sd["vit.pos_embed"] = torch.from_numpy(np.asarray(ref["vit/pos_embed"]).copy())
    for i in range(12):
        put_ln(f"vit.blocks.{i}.norm1", f"vit/block{i}/norm1")
        put_lin(f"vit.blocks.{i}.attn.qkv", f"vit/block{i}/attn/qkv")
        put_lin(f"vit.blocks.{i}.attn.proj", f"vit/block{i}/attn/proj")
        put_ln(f"vit.blocks.{i}.norm2", f"vit/block{i}/norm2")
        put_lin(f"vit.blocks.{i}.mlp.fc1", f"vit/block{i}/mlp1")
        put_lin(f"vit.blocks.{i}.mlp.fc2", f"vit/block{i}/mlp2")
    for i in range(2):
        for pre, dst in (("tablock1", "tab1"), ("tablock2", "tab2")):
            put_lin(f"{pre}.{i}.c_q", f"{dst}_{i}/c_q")
            put_lin(f"{pre}.{i}.c_k", f"{dst}_{i}/c_k")
            put_lin(f"{pre}.{i}.c_v", f"{dst}_{i}/c_v")
    for conv in ("conv1", "conv2"):
        sd[f"{conv}.weight"] = torch.from_numpy(
            np.asarray(ref[f"{conv}/kernel"]).transpose(3, 2, 0, 1).copy())
        sd[f"{conv}.bias"] = torch.from_numpy(np.asarray(ref[f"{conv}/bias"]).copy())
    for stage, src in (("swin1", "swintransformer1"), ("swin2", "swintransformer2")):
        for d in range(2):
            put_ln(f"{src}.layers.{d}.norm1", f"{stage}/block{d}/norm1")
            put_lin(f"{src}.layers.{d}.attn.qkv", f"{stage}/block{d}/attn/qkv")
            put_lin(f"{src}.layers.{d}.attn.proj", f"{stage}/block{d}/attn/proj")
            put_ln(f"{src}.layers.{d}.norm2", f"{stage}/block{d}/norm2")
            put_lin(f"{src}.layers.{d}.mlp.fc1", f"{stage}/block{d}/mlp1")
            put_lin(f"{src}.layers.{d}.mlp.fc2", f"{stage}/block{d}/mlp2")
    put_lin("fc_score.0", "fc_score1")
    put_lin("fc_score.3", "fc_score2")
    put_lin("fc_weight.0", "fc_weight1")
    put_lin("fc_weight.3", "fc_weight2")

    got = M.params_from_torch(sd)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-6)


def test_musiq_npz_roundtrip(tmp_path):
    from instarevive_tpu.utils import musiq as Mu

    p = Mu.init_random_params(3)
    path = str(tmp_path / "musiq.npz")
    Mu.save_params_npz(path, p)
    q = Mu.params_from_npz(path)
    assert set(q) == set(p)


def test_retinaface_structure_and_detection_path():
    """RetinaFace graph (VERDICT r1 item 7): anchors/decode/NMS plumbing on
    random weights — N(priors) matches the head outputs, detection runs
    end-to-end, landmarks have the (K, 5, 2) contract the face helper
    consumes (reference facexlib get_face_landmarks_5)."""
    from instarevive_tpu.utils.retinaface import (
        RetinaFace, init_random_params, prior_boxes, retinaface_forward,
    )

    p = init_random_params(0)
    img = jnp.asarray(np.random.default_rng(0).random((1, 96, 128, 3), np.float32))
    loc, conf, landm = retinaface_forward(p, img)
    n_priors = prior_boxes(96, 128).shape[0]
    assert loc.shape == (1, n_priors, 4)
    assert conf.shape == (1, n_priors, 2)
    assert landm.shape == (1, n_priors, 10)
    np.testing.assert_allclose(np.asarray(conf.sum(-1)), 1.0, rtol=1e-5)

    det = RetinaFace(p)
    faces, landmarks = det(np.random.default_rng(1).random((90, 120, 3), np.float32),
                           conf_thresh=0.3)
    assert faces.ndim == 2 and faces.shape[1] == 5
    assert landmarks.shape[1:] == (5, 2)


def test_retinaface_torch_importer_roundtrip():
    """Synthetic biubug6-named state dict (conv+BN pairs) -> folded params:
    importer consumes every key and the folded conv equals conv+BN."""
    torch = pytest.importorskip("torch")
    from instarevive_tpu.utils import retinaface as R

    rng = np.random.default_rng(2)
    sd = {}

    def add_conv_bn(name, cin, cout, k=3, groups=1):
        sd[f"{name}.0.weight"] = torch.from_numpy(
            rng.standard_normal((cout, cin // groups, k, k)).astype(np.float32) * 0.1)
        for suffix, val in (
            ("weight", 1 + 0.1 * rng.standard_normal(cout)),
            ("bias", 0.1 * rng.standard_normal(cout)),
            ("running_mean", 0.1 * rng.standard_normal(cout)),
            ("running_var", 1 + 0.1 * rng.random(cout)),
        ):
            sd[f"{name}.1.{suffix}"] = torch.from_numpy(val.astype(np.float32))
        sd[f"{name}.1.num_batches_tracked"] = torch.tensor(0)

    def add_dw(name, cin, cout):
        add_conv_bn(name, cin, cin, 3, groups=cin)
        # pointwise lives at indices 3/4
        sd[f"{name}.3.weight"] = torch.from_numpy(
            rng.standard_normal((cout, cin, 1, 1)).astype(np.float32) * 0.1)
        for suffix, val in (
            ("weight", 1 + 0.1 * rng.standard_normal(cout)),
            ("bias", 0.1 * rng.standard_normal(cout)),
            ("running_mean", 0.1 * rng.standard_normal(cout)),
            ("running_var", 1 + 0.1 * rng.random(cout)),
        ):
            sd[f"{name}.4.{suffix}"] = torch.from_numpy(val.astype(np.float32))
        sd[f"{name}.4.num_batches_tracked"] = torch.tensor(0)

    specs = {"body.stage1": R._STAGE1, "body.stage2": R._STAGE2, "body.stage3": R._STAGE3}
    for prefix, spec in specs.items():
        for i, (kind, cin, cout, s) in enumerate(spec):
            if kind == "conv":
                add_conv_bn(f"{prefix}.{i}", cin, cout)
            else:
                add_dw(f"{prefix}.{i}", cin, cout)
    for n, cin in (("fpn.output1", 64), ("fpn.output2", 128), ("fpn.output3", 256)):
        add_conv_bn(n, cin, 64, 1)
    add_conv_bn("fpn.merge1", 64, 64)
    add_conv_bn("fpn.merge2", 64, 64)
    for s in ("ssh1", "ssh2", "ssh3"):
        add_conv_bn(f"{s}.conv3X3", 64, 32)
        add_conv_bn(f"{s}.conv5X5_1", 64, 16)
        add_conv_bn(f"{s}.conv5X5_2", 16, 16)
        add_conv_bn(f"{s}.conv7X7_2", 16, 16)
        add_conv_bn(f"{s}.conv7x7_3", 16, 16)
    for head, ch in (("ClassHead", 4), ("BboxHead", 8), ("LandmarkHead", 20)):
        for i in range(3):
            sd[f"{head}.{i}.conv1x1.weight"] = torch.from_numpy(
                rng.standard_normal((ch, 64, 1, 1)).astype(np.float32) * 0.1)
            sd[f"{head}.{i}.conv1x1.bias"] = torch.from_numpy(
                rng.standard_normal(ch).astype(np.float32) * 0.1)

    # folded-BN equivalence on the first conv
    import torch.nn.functional as F

    p = R.params_from_torch(dict(sd))
    x = torch.from_numpy(rng.standard_normal((1, 3, 16, 16)).astype(np.float32))
    w = sd["body.stage1.0.0.weight"]
    y = F.conv2d(x, w, stride=2, padding=1)
    y = F.batch_norm(y, sd["body.stage1.0.1.running_mean"], sd["body.stage1.0.1.running_var"],
                     sd["body.stage1.0.1.weight"], sd["body.stage1.0.1.bias"], eps=1e-5)
    import jax
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), p["stage1/0/kernel"], (2, 2),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["stage1/0/bias"]
    np.testing.assert_allclose(
        np.asarray(got), y.numpy().transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4)
