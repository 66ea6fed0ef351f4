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
    # Official IIGROUP/MANIQA models/swin.py: SwinTransformer holds
    # BasicLayers 'layers.{l}' each with standard Swin 'blocks.{d}' that
    # carry relative_position_bias_table + the relative_position_index /
    # attn_mask buffers (present in real state dicts; importer must skip
    # them) — ADVICE r2.
    for stage, src in (("swin1", "swintransformer1"), ("swin2", "swintransformer2")):
        for l in range(2):
            for d in range(2):
                n = f"{stage}/layer{l}/block{d}"
                s = f"{src}.layers.{l}.blocks.{d}"
                put_ln(f"{s}.norm1", f"{n}/norm1")
                sd[f"{s}.attn.relative_position_bias_table"] = torch.from_numpy(
                    np.asarray(ref[f"{n}/attn/rel_bias_table"]).copy())
                sd[f"{s}.attn.relative_position_index"] = torch.zeros(16, 16, dtype=torch.long)
                put_lin(f"{s}.attn.qkv", f"{n}/attn/qkv")
                put_lin(f"{s}.attn.proj", f"{n}/attn/proj")
                put_ln(f"{s}.norm2", f"{n}/norm2")
                put_lin(f"{s}.mlp.fc1", f"{n}/mlp1")
                put_lin(f"{s}.mlp.fc2", f"{n}/mlp2")
                if d % 2 == 1:  # shifted block registers its attn mask
                    sd[f"{s}.attn_mask"] = torch.zeros(49, 16, 16)
    put_lin("fc_score.0", "fc_score1")
    put_lin("fc_score.3", "fc_score2")
    put_lin("fc_weight.0", "fc_weight1")
    put_lin("fc_weight.3", "fc_weight2")

    got = M.params_from_torch(sd)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-6)


def test_maniqa_official_key_list_is_fully_consumed():
    """Importer contract against the OFFICIAL checkpoint key list recorded
    as literals (IIGROUP/MANIQA maniqa.py + swin.py module tree with
    embed_dim=768, depths=[2,2], num_heads=[4,4], window=4, num_tab=2;
    timm vit_base_patch8_224 trunk) — not against our own param names
    (VERDICT r2 item 7). Every expected key must be consumed and no
    expected key may be missing."""
    torch = pytest.importorskip("torch")
    from instarevive_tpu.utils import maniqa as M

    D, MLPD = 768, 768
    keys = {
        "vit.cls_token": (1, 1, D),
        "vit.pos_embed": (1, 785, D),
        "vit.patch_embed.proj.weight": (D, 3, 8, 8),
        "vit.patch_embed.proj.bias": (D,),
    }
    for i in range(12):
        b = f"vit.blocks.{i}"
        keys.update({
            f"{b}.norm1.weight": (D,), f"{b}.norm1.bias": (D,),
            f"{b}.attn.qkv.weight": (3 * D, D), f"{b}.attn.qkv.bias": (3 * D,),
            f"{b}.attn.proj.weight": (D, D), f"{b}.attn.proj.bias": (D,),
            f"{b}.norm2.weight": (D,), f"{b}.norm2.bias": (D,),
            f"{b}.mlp.fc1.weight": (4 * D, D), f"{b}.mlp.fc1.bias": (4 * D,),
            f"{b}.mlp.fc2.weight": (D, 4 * D), f"{b}.mlp.fc2.bias": (D,),
        })
    for t in range(2):
        for tab in ("tablock1", "tablock2"):
            for qkv in ("c_q", "c_k", "c_v"):
                keys[f"{tab}.{t}.{qkv}.weight"] = (784, 784)
                keys[f"{tab}.{t}.{qkv}.bias"] = (784,)
    keys["conv1.weight"] = (D, 4 * D, 1, 1)
    keys["conv1.bias"] = (D,)
    keys["conv2.weight"] = (D // 2, D, 1, 1)
    keys["conv2.bias"] = (D // 2,)
    for swin, dim in (("swintransformer1", D), ("swintransformer2", D // 2)):
        for l in range(2):
            for d in range(2):
                b = f"{swin}.layers.{l}.blocks.{d}"
                keys.update({
                    f"{b}.norm1.weight": (dim,), f"{b}.norm1.bias": (dim,),
                    f"{b}.attn.relative_position_bias_table": (49, 4),
                    f"{b}.attn.relative_position_index": (16, 16),
                    f"{b}.attn.qkv.weight": (3 * dim, dim),
                    f"{b}.attn.qkv.bias": (3 * dim,),
                    f"{b}.attn.proj.weight": (dim, dim),
                    f"{b}.attn.proj.bias": (dim,),
                    f"{b}.norm2.weight": (dim,), f"{b}.norm2.bias": (dim,),
                    f"{b}.mlp.fc1.weight": (MLPD, dim), f"{b}.mlp.fc1.bias": (MLPD,),
                    f"{b}.mlp.fc2.weight": (dim, MLPD), f"{b}.mlp.fc2.bias": (dim,),
                })
                if d % 2 == 1:
                    keys[f"{b}.attn_mask"] = (49, 16, 16)
    for head in ("fc_score", "fc_weight"):
        keys[f"{head}.0.weight"] = (D // 2, D // 2)
        keys[f"{head}.0.bias"] = (D // 2,)
        keys[f"{head}.3.weight"] = (1, D // 2)
        keys[f"{head}.3.bias"] = (1,)

    gen = torch.Generator().manual_seed(0)
    sd = {k: torch.randn(*shape, generator=gen) * 0.02 for k, shape in keys.items()}
    p = M.params_from_torch(sd)
    # importer output must exactly cover the functional net's contract
    assert set(p) == set(M.init_random_params(0))
    # and the imported net must run
    score = M.maniqa_forward(p, jnp.zeros((1, 224, 224, 3)))
    assert np.isfinite(np.asarray(score)).all()


def test_musiq_official_key_list_is_fully_consumed():
    """MUSIQ importer against the documented torch dialect recorded as
    literals (BiT ResNet-root + ViT-pytorch transformer naming; see
    utils/musiq.py _TORCH_DIALECT). Full coverage + the imported net runs
    (VERDICT r2 item 7 / ADVICE r2: no unconditional raise)."""
    torch = pytest.importorskip("torch")
    from instarevive_tpu.utils import musiq as Mu

    D, MLP, L = 384, 1152, 14
    keys = {
        "transformer_encoder.cls_token": (1, 1, D),
        "transformer_encoder.pos_emb": (1, 100, D),
        "transformer_encoder.scale_emb": (3, D),
        "conv_root.weight": (64, 3, 7, 7),
        "gn_root.weight": (64,), "gn_root.bias": (64,),
        "block1.unit1.gn1.weight": (64,), "block1.unit1.gn1.bias": (64,),
        "block1.unit1.conv1.weight": (64, 64, 1, 1),
        "block1.unit1.gn2.weight": (64,), "block1.unit1.gn2.bias": (64,),
        "block1.unit1.conv2.weight": (64, 64, 3, 3),
        "block1.unit1.gn3.weight": (256,), "block1.unit1.gn3.bias": (256,),
        "block1.unit1.conv3.weight": (256, 64, 1, 1),
        "block1.unit1.downsample.weight": (256, 64, 1, 1),
        "block1.unit1.gn_proj.weight": (256,), "block1.unit1.gn_proj.bias": (256,),
        "embedding.weight": (D, 16384), "embedding.bias": (D,),
        "transformer_encoder.encoder_norm.weight": (D,),
        "transformer_encoder.encoder_norm.bias": (D,),
        "head.weight": (1, D), "head.bias": (1,),
    }
    for i in range(L):
        b = f"transformer_encoder.layers.{i}"
        keys.update({
            f"{b}.attention_norm.weight": (D,), f"{b}.attention_norm.bias": (D,),
            f"{b}.attn.query.weight": (D, D), f"{b}.attn.query.bias": (D,),
            f"{b}.attn.key.weight": (D, D), f"{b}.attn.key.bias": (D,),
            f"{b}.attn.value.weight": (D, D), f"{b}.attn.value.bias": (D,),
            f"{b}.attn.out.weight": (D, D), f"{b}.attn.out.bias": (D,),
            f"{b}.ffn_norm.weight": (D,), f"{b}.ffn_norm.bias": (D,),
            f"{b}.ffn.fc1.weight": (MLP, D), f"{b}.ffn.fc1.bias": (MLP,),
            f"{b}.ffn.fc2.weight": (D, MLP), f"{b}.ffn.fc2.bias": (D,),
        })

    gen = torch.Generator().manual_seed(1)
    sd = {k: torch.randn(*shape, generator=gen) * 0.02 for k, shape in keys.items()}
    p = Mu.params_from_torch(sd)
    assert set(p) == set(Mu.init_random_params(0))
    # weight standardization must be folded into conv kernels
    w = np.asarray(p["conv_root/kernel"])  # HWIO
    np.testing.assert_allclose(w.mean(axis=(0, 1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(w.std(axis=(0, 1, 2)), 1.0, atol=1e-2)
    m = Mu.MUSIQ(p)
    s = m(np.random.default_rng(0).random((96, 128, 3), np.float32))
    assert np.isfinite(s).all()


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


def test_lpips_without_weights_raises():
    """An 'lpips' number can never come from uninitialized features: calling
    the metric without imported weights must raise (VERDICT r2 item 8)."""
    from instarevive_tpu.utils.metrics import LPIPS

    lp = LPIPS()
    with pytest.raises(ValueError, match="weights not loaded"):
        lp(jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))
