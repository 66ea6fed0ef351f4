"""Face restoration helper: align -> enhance -> inverse paste-back.

Parity target: reference ``utils/face_restoration_helper.py:49-516``
(FaceRestoreHelper): 5-landmark similarity alignment to the 512^2 FFHQ
template, inverse-affine paste-back with feathered mask. Face *detection*
is an external model (facexlib RetinaFace) the reference downloads; here
detection stays host-side and pluggable — the helper consumes landmarks
(from any detector) and performs the align/warp/paste math as batched jnp
affine ops on TPU.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# FFHQ 5-point template for 512x512 (face_restoration_helper.py:79-92)
FFHQ_TEMPLATE_512 = np.array(
    [
        [192.98138, 239.94708],
        [318.90277, 240.1936],
        [256.63416, 314.01935],
        [201.26117, 371.41043],
        [313.08905, 371.15118],
    ],
    dtype=np.float32,
)


def umeyama_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform (cv2.estimateAffinePartial2D
    equivalent): returns 2x3 affine mapping src -> dst."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u) * np.linalg.det(vt))
    dd = np.diag([1.0, d])
    r = u @ dd @ vt
    var_s = (sc**2).sum() / len(src)
    scale = (s * np.diag(dd)).sum() / var_s
    t = mu_d - scale * r @ mu_s
    m = np.zeros((2, 3))
    m[:, :2] = scale * r
    m[:, 2] = t
    return m.astype(np.float32)


def _affine_grid(m_inv: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Sampling coordinates: for each output pixel, the source position."""
    h, w = out_hw
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = m_inv[0, 0] * xs + m_inv[0, 1] * ys + m_inv[0, 2]
    sy = m_inv[1, 0] * xs + m_inv[1, 1] * ys + m_inv[1, 2]
    return jnp.stack([sy, sx], axis=0)  # (2, H, W) in (row, col)


def warp_affine(img: jnp.ndarray, m: np.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear warp of HWC image by 2x3 affine m (src->dst), on-device."""
    m3 = np.eye(3, dtype=np.float32)
    m3[:2] = m
    m_inv = jnp.asarray(np.linalg.inv(m3)[:2])
    coords = _affine_grid(m_inv, out_hw)
    out = jax.vmap(
        lambda ch: jax.scipy.ndimage.map_coordinates(ch, list(coords), order=1, mode="constant"),
        in_axes=-1, out_axes=-1,
    )(img)
    return out


def align_face(
    img: jnp.ndarray, landmarks5: np.ndarray, face_size: int = 512
) -> Tuple[jnp.ndarray, np.ndarray]:
    """Crop-align one face to the FFHQ template; returns (face, affine)."""
    template = FFHQ_TEMPLATE_512 * (face_size / 512.0)
    m = umeyama_similarity(landmarks5, template)
    face = warp_affine(img, m, (face_size, face_size))
    return face, m


def paste_face_back(
    img: jnp.ndarray,
    face: jnp.ndarray,
    m: np.ndarray,
    feather: int = 20,
) -> jnp.ndarray:
    """Inverse-affine paste with feathered (eroded+blurred) mask
    (face_restoration_helper.py:364-509)."""
    h, w = img.shape[:2]
    m3 = np.eye(3, dtype=np.float32)
    m3[:2] = m
    m_inv = np.linalg.inv(m3)[:2]

    face_back = warp_affine(face, m_inv, (h, w))
    mask = jnp.ones(face.shape[:2], dtype=jnp.float32)
    # erode border then feather, like the reference's mask erosion + blur
    if feather > 0:
        mask = mask.at[:feather].set(0).at[-feather:].set(0)
        mask = mask.at[:, :feather].set(0).at[:, -feather:].set(0)
        from instarevive_tpu.ops.filters import gaussian_blur

        mask = gaussian_blur(mask[None, ..., None], 2 * feather + 1, feather / 2.0)[0, ..., 0]
    mask_back = warp_affine(mask[..., None], m_inv, (h, w))[..., 0]
    mask_back = jnp.clip(mask_back, 0.0, 1.0)[..., None]
    return img * (1 - mask_back) + face_back * mask_back


class FaceRestoreHelper:
    """Host-orchestrated multi-face align/enhance/paste (detector pluggable)."""

    def __init__(self, face_size: int = 512, feather: int = 20, detector=None):
        self.face_size = face_size
        self.feather = feather
        self.detector = detector  # e.g. utils.retinaface.RetinaFace(params)
        self.affines: List[np.ndarray] = []

    def get_face_landmarks_5(self, img01, conf_thresh: float = 0.8):
        """Detect faces and return 5-point landmarks (the reference's
        facexlib get_face_landmarks_5, face_restoration_helper.py:79-92).
        Requires a detector (utils/retinaface.RetinaFace with imported
        weights) — landmarks can also be supplied externally to align_all."""
        if self.detector is None:
            raise RuntimeError(
                "no detector attached: construct FaceRestoreHelper(detector="
                "RetinaFace(params_from_torch(...))) or pass landmarks directly"
            )
        _, landmarks = self.detector(np.asarray(img01), conf_thresh=conf_thresh)
        return [lm for lm in landmarks]

    def align_all(self, img: jnp.ndarray, all_landmarks: List[np.ndarray]):
        faces = []
        self.affines = []
        for lm in all_landmarks:
            face, m = align_face(img, lm, self.face_size)
            faces.append(face)
            self.affines.append(m)
        return faces

    def paste_all(self, img: jnp.ndarray, restored_faces) -> jnp.ndarray:
        out = img
        for face, m in zip(restored_faces, self.affines):
            out = paste_face_back(out, face, m, self.feather)
        return out
