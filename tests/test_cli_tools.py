"""CLI tools: sample.py, train.py resume path, orbax roundtrip, datasets."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from instarevive_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    tree = {"a": jnp.arange(6).reshape(2, 3).astype(jnp.float32), "b": {"c": jnp.ones(4)}}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, tree)
    loaded = load_checkpoint(path)
    np.testing.assert_allclose(np.asarray(loaded["a"]), np.asarray(tree["a"]))
    np.testing.assert_allclose(np.asarray(loaded["b"]["c"]), 1.0)


def test_internal_and_dmd_datasets(tmp_path):
    from instarevive_tpu.data.internal import DMDPairDataset, InternalFeatureDataset

    noise_dir = tmp_path / "noise"
    latent_dir = tmp_path / "latent"
    feat_dir = tmp_path / "feat"
    for d in (noise_dir, latent_dir, feat_dir):
        d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(noise_dir / f"img{i}.npy", rng.standard_normal((8, 8, 4)).astype(np.float32))
        np.save(latent_dir / f"img{i}.npy", rng.standard_normal((8, 8, 4)).astype(np.float32))
        np.savez(feat_dir / f"img{i}.npz",
                 caption_feature=rng.standard_normal((8, 16)).astype(np.float32),
                 attention_mask=np.ones(8, np.int32))

    ds = DMDPairDataset(str(noise_dir), str(latent_dir), str(feat_dir))
    assert len(ds) == 3
    s = ds[0]
    assert s["noise"].shape == (8, 8, 4) and s["latent"].shape == (8, 8, 4)
    assert s["txt_fea"].shape == (8, 16)

    manifest = tmp_path / "data_info.json"
    np.savez(tmp_path / "v0.npz", latent=rng.standard_normal((8, 8, 4)).astype(np.float32))
    manifest.write_text(json.dumps([
        {"vae_feat": "v0.npz", "t5_feat": str(feat_dir / "img0.npz"), "ratio": 1.0}
    ]))
    ids = InternalFeatureDataset(str(manifest), root=str(tmp_path))
    assert len(ids) == 1 and ids.ratios == [1.0]
    item = ids[0]
    assert item["latent"].shape == (8, 8, 4) and item["txt_fea"].shape == (8, 16)


@pytest.mark.parametrize("algo", ["dpm-solver", "ddim"])
def test_sample_cli(tmp_path, algo):
    out = tmp_path / "samples"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "sample.py"),
         "--config", os.path.join(REPO, "configs", "tiny.yaml"),
         "--random_init", "--image_size", "64", "--step", "4",
         "--sampling_algo", algo, "--output", str(out), "--prompt", "x"],
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert any(f.endswith(".png") for f in os.listdir(out))


@pytest.mark.parametrize("flag,n", [("--seq_parallel", "4"), ("--pipeline_parallel", "2")])
def test_sample_cli_model_parallel(tmp_path, flag, n):
    """sample.py --seq_parallel / --pipeline_parallel: the model-parallel
    DiT dispatch (parallel/sp.py, parallel/pp.py) runs the full sampling
    CLI end-to-end and matches the monolithic run bit-for... well, to
    sampler tolerance — the PNGs must agree (the parallel forwards are
    exact to ~1e-6, tests/test_parallel_{sp,pp}.py)."""
    from PIL import Image

    env = _env()
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    outs = {}
    for name, extra in [("mono", []), ("par", [flag, n])]:
        out = tmp_path / name
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "sample.py"),
             "--config", os.path.join(REPO, "configs", "tiny.yaml"),
             "--random_init", "--image_size", "64", "--step", "4",
             "--sampling_algo", "dpm-solver", "--output", str(out),
             "--prompt", "x", *extra],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        png = next(f for f in os.listdir(out) if f.endswith(".png"))
        outs[name] = np.asarray(Image.open(out / png), dtype=np.int16)
    # uint8 quantization absorbs the ~1e-6 forward divergence almost
    # everywhere; allow single-count rounding flips
    assert np.abs(outs["mono"] - outs["par"]).max() <= 1


def test_generate_data_info_and_pickout(tmp_path):
    """tools/generate_data_info.py + tools/pickout_img.py (VERDICT r2 item
    9): manifest fields match the reference layout; pickout copies the
    listed subset."""
    from PIL import Image

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i, (w, h) in enumerate([(64, 48), (32, 64)]):
        Image.fromarray(
            (rng.random((h, w, 3)) * 255).astype(np.uint8)
        ).save(src / f"im{i}.png")

    out = tmp_path / "data_info.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/generate_data_info.py"),
         "--folders", str(src), "--output", str(out),
         "--prompt", "high quality photo", "--sort"],
        env=_env(), capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    recs = json.loads(out.read_text())
    assert len(recs) == 2
    assert set(recs[0]) == {"height", "width", "ratio", "path", "prompt"}
    assert recs[0]["ratio"] == recs[0]["width"] / recs[0]["height"]
    assert recs[0]["prompt"] == "high quality photo"

    lst = tmp_path / "test.list"
    lst.write_text(recs[0]["path"] + "\n")
    dst = tmp_path / "picked"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/pickout_img.py"),
         "--list", str(lst), "--output", str(dst)],
        env=_env(), capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert len(os.listdir(dst)) == 1


def test_lq_tool(tmp_path):
    """tools/lq.py: produces same-size degraded outputs that differ from
    the input (blur+noise+jpeg actually applied)."""
    from PIL import Image

    src = tmp_path / "hq"
    src.mkdir()
    rng = np.random.default_rng(1)
    arr = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(src / "a.png")
    dst = tmp_path / "lq"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/lq.py"),
         "--input", str(src), "--output", str(dst), "--seed", "3"],
        env=_env(), capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    out = np.asarray(Image.open(dst / "a.png"))
    assert out.shape == arr.shape
    assert np.abs(out.astype(np.int32) - arr.astype(np.int32)).mean() > 1.0


def test_find_model_local(tmp_path):
    """tools/download.py find_model: loads local paths, raises with the
    canonical URL for missing registry names (zero-egress behavior)."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from download import find_model
    finally:
        sys.path.pop(0)

    path = tmp_path / "custom.pth"
    torch.save({"state_dict": {"w": torch.ones(2)}}, str(path))
    sd = find_model(str(path))
    assert "state_dict" in sd
    with pytest.raises(FileNotFoundError, match="huggingface"):
        find_model("PixArt-Sigma-XL-2-512-MS.pth", model_dir=str(tmp_path))
    with pytest.raises(FileNotFoundError, match="Could not find"):
        find_model(str(tmp_path / "nope.pth"))


def test_extract_features_ffhq(tmp_path):
    """tools/extract_features_ffhq.py: data_info-driven bucketized latent
    extraction with img_hw/aspect_ratio side info."""
    from PIL import Image

    root = tmp_path / "root"
    root.mkdir()
    rng = np.random.default_rng(2)
    recs = []
    for i, (w, h) in enumerate([(80, 64), (64, 64)]):
        name = f"f{i}.png"
        Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8)).save(root / name)
        recs.append({"height": h, "width": w, "ratio": w / h, "path": name,
                     "prompt": ""})
    info = tmp_path / "data_info.json"
    info.write_text(json.dumps(recs))
    out = tmp_path / "features"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/extract_features_ffhq.py"),
         "--root", str(root), "--data_info", str(info), "--output", str(out),
         "--config", "configs/tiny.yaml", "--resolution", "512",
         "--batch_size", "2"],
        env=_env(), capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr
    files = sorted(os.listdir(out / "vae_feat"))
    assert files == ["f0.npz", "f1.npz"]
    z = np.load(out / "vae_feat" / "f0.npz")
    assert set(z.files) == {"latent", "img_hw", "aspect_ratio"}
    assert z["img_hw"].tolist() == [64.0, 80.0]


def test_extract_caption_weights_gate(tmp_path):
    """tools/extract_caption.py (LLaVA-MPT captioner CLI): without local
    weights it must exit with instructions, not invent a proxy."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/extract_caption.py"),
         "--input", str(tmp_path), "--output", str(tmp_path / "c.json")],
        env=_env(), capture_output=True, text=True,
    )
    assert r.returncode != 0
    assert "local weights" in r.stderr
    assert not (tmp_path / "c.json").exists()
