"""Third aux batch: masks, dihedral aug, dist helpers, profiling, SizeEmbedder."""

import numpy as np

import jax
import jax.numpy as jnp

from instarevive_tpu.data.masks import (
    augment_dihedral,
    brush_stroke_mask,
    invert_augment_dihedral,
)
from instarevive_tpu.parallel.dist import (
    broadcast_from_main,
    get_dist_info,
    is_main_process,
    local_device_group,
    sync_global_mean,
)


def test_brush_stroke_mask():
    rng = np.random.default_rng(0)
    m = brush_stroke_mask(rng, (128, 128))
    assert m.shape == (128, 128)
    assert set(np.unique(m)) <= {0.0, 1.0}
    assert 0 < m.mean() < 0.9  # some hole, not everything


def test_dihedral_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).random((2, 8, 6, 3), dtype=np.float32))
    for mode in range(8):
        y = augment_dihedral(x, mode)
        back = invert_augment_dihedral(y, mode)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_dist_helpers_single_process():
    rank, world = get_dist_info()
    assert rank == 0 and world == 1
    assert is_main_process()
    assert len(local_device_group()) == 8
    tree = {"a": np.ones(3)}
    np.testing.assert_allclose(broadcast_from_main(tree)["a"], 1.0)
    np.testing.assert_allclose(sync_global_mean(tree)["a"], 1.0)


def test_size_embedder_and_micro_condition():
    from instarevive_tpu.models.pixart import PixArt, SizeEmbedder

    emb = SizeEmbedder(out_dim=32)
    params = emb.init(jax.random.key(0), jnp.zeros((2, 2)))
    out = emb.apply(params, jnp.asarray([[512.0, 512.0], [256.0, 384.0]]))
    assert out.shape == (2, 64)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))

    dit = PixArt(input_size=16, hidden_size=96, depth=1, num_heads=4,
                 caption_channels=32, model_max_length=4, micro_condition=True)
    y = jnp.zeros((1, 4, 32))
    z = jnp.zeros((1, 16, 16, 4))
    p = dit.init(jax.random.key(1), z, jnp.zeros((1,)), y)
    out = dit.apply(p, z, jnp.asarray([400.0]), y,
                    data_info={"img_hw": jnp.asarray([[512.0, 512.0]]),
                               "aspect_ratio": jnp.asarray([[1.0]])})
    assert out.shape == (1, 16, 16, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_time_fn_profiling():
    from instarevive_tpu.utils.profiling import time_fn

    f = jax.jit(lambda x: x * 2)
    t = time_fn(f, jnp.ones((128, 128)), iters=3)
    assert t > 0
