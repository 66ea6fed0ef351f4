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
