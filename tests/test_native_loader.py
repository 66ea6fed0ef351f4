"""Native C++ loader: parity vs PIL/numpy (skipped if not built)."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from instarevive_tpu.data import native_loader as nl

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built():
    if not nl.available():
        try:
            subprocess.check_call([sys.executable, os.path.join(REPO, "native", "build.py")])
        except Exception:
            pytest.skip("native toolchain unavailable")
    assert nl.available()


def test_decode_center_matches_pil():
    path = "/root/reference/assets/inputs/6.jpg"
    out = nl.decode_crop(path, 256, crop="center")
    ref = np.asarray(Image.open(path).convert("RGB"))
    h, w = ref.shape[:2]
    y0, x0 = (h - 256) // 2, (w - 256) // 2
    np.testing.assert_array_equal(out, ref[y0 : y0 + 256, x0 : x0 + 256])


def test_decode_hflip():
    path = "/root/reference/assets/inputs/6.jpg"
    a = nl.decode_crop(path, 128, crop="center")
    b = nl.decode_crop(path, 128, crop="center", hflip=True)
    np.testing.assert_array_equal(b, a[:, ::-1])


def test_batch_decode_threads():
    paths = ["/root/reference/assets/inputs/6.jpg", "/root/reference/assets/inputs/11.jpg"] * 3
    out = nl.batch_decode(paths, 64, crop="random", seeds=list(range(6)),
                          hflips=[i % 2 == 0 for i in range(6)], num_threads=3)
    assert out.shape == (6, 64, 64, 3)
    # random crops with different seeds differ
    assert not np.array_equal(out[0], out[2])


def test_npy_reader_exact(tmp_path):
    arr = np.random.default_rng(1).standard_normal((4, 8, 8, 4)).astype(np.float32)
    p = tmp_path / "a.npy"
    np.save(p, arr)
    out = nl.load_npy_f32(str(p))
    np.testing.assert_array_equal(out, arr)


def test_dataset_uses_native_path():
    from instarevive_tpu.data.dataset import ImageFolderDataset

    ds = ImageFolderDataset("/root/reference/assets/inputs", out_size=96, crop_type="center",
                            use_hflip=False)
    s = ds[0]
    assert s["hq"].shape == (96, 96, 3)
