"""Data pipeline: on-device degradations, loader, pair queue, aspect sampler."""

import numpy as np

import jax
import jax.numpy as jnp

from instarevive_tpu.data.codeformer import (
    CodeformerDegradationConfig,
    degrade_batch_codeformer,
)
from instarevive_tpu.data.dataset import (
    AspectRatioBatchSampler,
    ImageFolderDataset,
    PairQueue,
    PrefetchLoader,
)
from instarevive_tpu.data.realesrgan import (
    RealESRGANDegradationConfig,
    degrade_batch,
    sample_batch_kernels,
)


def _hq(b=2, s=64, seed=0):
    return jnp.clip(jax.random.uniform(jax.random.key(seed), (b, s, s, 3)), 0, 1)


def test_realesrgan_degrade_batch():
    cfg = RealESRGANDegradationConfig()
    out = jax.jit(lambda k, x: degrade_batch(k, x, cfg))(jax.random.key(1), _hq())
    assert out["lq"].shape == (2, 64, 64, 3)
    assert out["hq"].shape == (2, 64, 64, 3)
    lq = np.asarray(out["lq"])
    assert np.isfinite(lq).all() and lq.min() >= 0 and lq.max() <= 1
    hq01 = (np.asarray(out["hq"]) + 1) / 2
    assert np.abs(lq - hq01).mean() > 0.02  # degradation actually happened
    # different keys -> different degradations
    out2 = degrade_batch(jax.random.key(2), _hq(), cfg)
    assert not np.allclose(np.asarray(out2["lq"]), lq)


def test_realesrgan_kernels_batch():
    cfg = RealESRGANDegradationConfig()
    k1, k2, sinc = sample_batch_kernels(jax.random.key(0), cfg, 4)
    for k in (k1, k2, sinc):
        assert k.shape == (4, 21, 21)
        np.testing.assert_allclose(np.asarray(k.sum(axis=(1, 2))), 1.0, atol=1e-4)


def test_codeformer_degrade_batch():
    cfg = CodeformerDegradationConfig()
    out = jax.jit(lambda k, x: degrade_batch_codeformer(k, x, cfg))(
        jax.random.key(3), _hq()
    )
    lq = np.asarray(out["lq"])
    assert lq.shape == (2, 64, 64, 3)
    assert np.isfinite(lq).all()
    hq01 = (np.asarray(out["hq"]) + 1) / 2
    assert np.abs(lq - hq01).mean() > 0.01


def test_image_folder_dataset_and_loader():
    ds = ImageFolderDataset("/root/reference/assets/inputs", out_size=64, crop_type="random")
    assert len(ds) == 2
    s = ds[0]
    assert s["hq"].shape == (64, 64, 3) and s["hq"].dtype == np.uint8

    loader = PrefetchLoader(ds, batch_size=2, num_threads=2)
    batches = list(iter(loader))
    assert len(batches) == 1
    assert batches[0]["hq"].shape == (2, 64, 64, 3)


def test_pair_queue_shuffles_when_full():
    q = PairQueue(queue_size=4, seed=0)
    outs = []
    for i in range(4):
        lq = np.full((2, 2, 2, 3), i, np.float32)
        outs.append(q(lq, lq)[0][0, 0, 0, 0])
    # first two calls fill the queue and pass through
    assert outs[0] == 0 and outs[1] == 1
    # once full, dequeued samples come from earlier steps
    assert {outs[2], outs[3]} <= {0.0, 1.0, 2.0, 3.0}


def test_aspect_ratio_sampler_homogeneous_batches():
    rng = np.random.default_rng(0)
    ratios = list(rng.choice([0.5, 1.0, 2.0], size=32))
    s = AspectRatioBatchSampler(ratios, batch_size=4, seed=0)
    for ratio, idxs in s:
        assert len(idxs) == 4
        for i in idxs:
            keys = np.asarray(sorted(s.table.keys()))
            closest = keys[np.argmin(np.abs(keys - ratios[i]))]
            assert float(closest) == ratio


def test_prefetch_loader_fast_forward_determinism():
    """fast_forward(n) replays shuffles so the stream continues exactly as
    if n batches had been consumed (checkpoint-resume data alignment)."""
    from instarevive_tpu.data.dataset import PrefetchLoader

    class Idx:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((2, 2), i, np.uint8)}

    def stream(loader, n):
        out = []
        while len(out) < n:
            for b in loader:
                out.append(sorted(int(v) for v in b["x"][:, 0, 0]))
                if len(out) >= n:
                    break
        return out

    full = stream(PrefetchLoader(Idx(), 3, num_threads=2, seed=5), 7)

    resumed_loader = PrefetchLoader(Idx(), 3, num_threads=2, seed=5)
    resumed_loader.fast_forward(4)  # 1 epoch (3 batches) + 1 batch
    resumed = stream(resumed_loader, 3)
    assert resumed == full[4:7], (resumed, full)
