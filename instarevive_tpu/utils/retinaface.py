"""RetinaFace face detector (MobileNetV1-0.25 variant) + weight importer.

Parity target: the reference face pipeline uses facexlib's RetinaFace
(``utils/face_restoration_helper.py:79-92`` — ``get_face_landmarks_5``) to
produce the 5-point landmarks that drive FFHQ alignment. This implements
the same network (biubug6/Pytorch_Retinaface graph facexlib vendors:
MobileNetV1-0.25 body -> 3-level FPN -> SSH context modules -> per-level
class/bbox/landmark heads with 2 anchors) as a functional NHWC JAX model.

TPU-first choices: BatchNorm is folded into the convs at import time (this
is an inference-only detector), the whole trunk is one jitted program, and
only prior-box decode + NMS run host-side. Weights import from the
``Retinaface_mobilenet0.25.pth`` release via ``params_from_torch`` (strict:
raises listing unmatched keys), following the LPIPS/CLIP importer pattern.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LEAKY = 0.1
_OUT = 64  # FPN/SSH channel width for the 0.25 config
_MIN_SIZES = ((16, 32), (64, 128), (256, 512))
_STEPS = (8, 16, 32)
_VARIANCE = (0.1, 0.2)

# (name, cin, cout, stride) for the MobileNet 0.25 body; dw = depthwise pair
_STAGE1 = [("conv", 3, 8, 2), ("dw", 8, 16, 1), ("dw", 16, 32, 2),
           ("dw", 32, 32, 1), ("dw", 32, 64, 2), ("dw", 64, 64, 1)]
_STAGE2 = [("dw", 64, 128, 2)] + [("dw", 128, 128, 1)] * 5
_STAGE3 = [("dw", 128, 256, 2), ("dw", 256, 256, 1)]


def _conv(x, p, name, stride=1, groups=1, relu=True):
    k = p[f"{name}/kernel"]
    # torch-convention symmetric padding (k//2) — differs from XLA "SAME"
    # for stride-2 convs, which would pad asymmetrically
    pad = k.shape[0] // 2
    out = jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    out = out + p[f"{name}/bias"]
    return jax.nn.leaky_relu(out, _LEAKY) if relu else out


def _body_stage(x, p, prefix, spec):
    for i, (kind, cin, cout, s) in enumerate(spec):
        n = f"{prefix}/{i}"
        if kind == "conv":
            x = _conv(x, p, n, stride=s)
        else:
            x = _conv(x, p, f"{n}_dw", stride=s, groups=cin)
            x = _conv(x, p, f"{n}_pw")
    return x


def _ssh(x, p, name):
    c3 = _conv(x, p, f"{name}/conv3X3", relu=False)
    c51 = _conv(x, p, f"{name}/conv5X5_1")
    c52 = _conv(c51, p, f"{name}/conv5X5_2", relu=False)
    c71 = _conv(c51, p, f"{name}/conv7X7_2")
    c72 = _conv(c71, p, f"{name}/conv7x7_3", relu=False)
    return jax.nn.relu(jnp.concatenate([c3, c52, c72], axis=-1))


def _upsample_to(x, hw):
    b, h, w, c = x.shape
    # nearest like F.interpolate(size=...)
    ridx = (jnp.arange(hw[0]) * h // hw[0]).astype(jnp.int32)
    cidx = (jnp.arange(hw[1]) * w // hw[1]).astype(jnp.int32)
    return x[:, ridx][:, :, cidx]


def retinaface_forward(params, img: jnp.ndarray):
    """img: (B, H, W, 3) float32, BGR, mean-subtracted (104, 117, 123).
    Returns per-level (loc (B,N,4), conf (B,N,2), landms (B,N,10)) concat."""
    p = params
    f1 = _body_stage(img, p, "stage1", _STAGE1)
    f2 = _body_stage(f1, p, "stage2", _STAGE2)
    f3 = _body_stage(f2, p, "stage3", _STAGE3)

    o1 = _conv(f1, p, "fpn/output1")
    o2 = _conv(f2, p, "fpn/output2")
    o3 = _conv(f3, p, "fpn/output3")
    o2 = o2 + _upsample_to(o3, o2.shape[1:3])
    o2 = _conv(o2, p, "fpn/merge2")
    o1 = o1 + _upsample_to(o2, o1.shape[1:3])
    o1 = _conv(o1, p, "fpn/merge1")

    feats = [_ssh(o1, p, "ssh1"), _ssh(o2, p, "ssh2"), _ssh(o3, p, "ssh3")]
    locs, confs, lands = [], [], []
    for i, f in enumerate(feats):
        b = f.shape[0]
        locs.append(_conv(f, p, f"BboxHead/{i}", relu=False).reshape(b, -1, 4))
        confs.append(_conv(f, p, f"ClassHead/{i}", relu=False).reshape(b, -1, 2))
        lands.append(_conv(f, p, f"LandmarkHead/{i}", relu=False).reshape(b, -1, 10))
    return (
        jnp.concatenate(locs, 1),
        jax.nn.softmax(jnp.concatenate(confs, 1), axis=-1),
        jnp.concatenate(lands, 1),
    )


def prior_boxes(h: int, w: int) -> np.ndarray:
    """PriorBox 'center-size' anchors for an h x w input (prior_box.py)."""
    anchors = []
    for sizes, step in zip(_MIN_SIZES, _STEPS):
        fh, fw = -(-h // step), -(-w // step)
        for i in range(fh):
            for j in range(fw):
                for ms in sizes:
                    s_kx, s_ky = ms / w, ms / h
                    cx, cy = (j + 0.5) * step / w, (i + 0.5) * step / h
                    anchors.append([cx, cy, s_kx, s_ky])
    return np.asarray(anchors, np.float32)


def decode(loc: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """box_utils.decode: center-size offsets -> (x1, y1, x2, y2) in [0,1]."""
    v0, v1 = _VARIANCE
    cxy = priors[:, :2] + loc[:, :2] * v0 * priors[:, 2:]
    wh = priors[:, 2:] * np.exp(loc[:, 2:] * v1)
    return np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1)


def decode_landm(landm: np.ndarray, priors: np.ndarray) -> np.ndarray:
    v0 = _VARIANCE[0]
    pts = landm.reshape(-1, 5, 2)
    return (priors[:, None, :2] + pts * v0 * priors[:, None, 2:]).reshape(-1, 10)


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> List[int]:
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas[order[1:]] - inter, 1e-9)
        order = order[1:][iou <= thresh]
    return keep


class RetinaFace:
    """Host-callable detector: (H, W, 3) RGB [0,1] -> (faces, landmarks5)."""

    _BGR_MEAN = np.array([104.0, 117.0, 123.0], np.float32)

    def __init__(self, params: Dict[str, jnp.ndarray]):
        self.params = params
        self._fwd = jax.jit(retinaface_forward)

    def __call__(
        self, img01: np.ndarray, conf_thresh: float = 0.8, nms_thresh: float = 0.4
    ) -> Tuple[np.ndarray, np.ndarray]:
        img01 = np.asarray(img01, np.float32)
        h, w = img01.shape[:2]
        # pad to step-32 multiples so every FPN level is exact
        ph, pw = -(-h // 32) * 32, -(-w // 32) * 32
        x = img01[..., ::-1] * 255.0 - self._BGR_MEAN  # RGB->BGR, mean-sub
        x = np.pad(x, ((0, ph - h), (0, pw - w), (0, 0)))
        loc, conf, landm = (np.asarray(v[0]) for v in self._fwd(self.params, jnp.asarray(x)[None]))
        priors = prior_boxes(ph, pw)
        boxes = decode(loc, priors) * [pw, ph, pw, ph]
        landms = decode_landm(landm, priors) * ([pw, ph] * 5)
        scores = conf[:, 1]
        keep = scores > conf_thresh
        boxes, landms, scores = boxes[keep], landms[keep], scores[keep]
        if len(boxes) == 0:
            return np.zeros((0, 5), np.float32), np.zeros((0, 5, 2), np.float32)
        idx = nms(boxes, scores, nms_thresh)
        boxes, landms, scores = boxes[idx], landms[idx], scores[idx]
        out = np.concatenate([boxes, scores[:, None]], axis=1)
        return out.astype(np.float32), landms.reshape(-1, 5, 2).astype(np.float32)


def _specs() -> List[Tuple[str, Tuple[int, ...], int]]:
    """(name, kernel shape HWIO, groups) for every conv in the graph."""
    out = []
    for prefix, spec in (("stage1", _STAGE1), ("stage2", _STAGE2), ("stage3", _STAGE3)):
        for i, (kind, cin, cout, s) in enumerate(spec):
            if kind == "conv":
                out.append((f"{prefix}/{i}", (3, 3, cin, cout), 1))
            else:
                out.append((f"{prefix}/{i}_dw", (3, 3, 1, cin), cin))
                out.append((f"{prefix}/{i}_pw", (1, 1, cin, cout), 1))
    for n, cin in (("fpn/output1", 64), ("fpn/output2", 128), ("fpn/output3", 256)):
        out.append((n, (1, 1, cin, _OUT), 1))
    out.append(("fpn/merge1", (3, 3, _OUT, _OUT), 1))
    out.append(("fpn/merge2", (3, 3, _OUT, _OUT), 1))
    for s in ("ssh1", "ssh2", "ssh3"):
        out.append((f"{s}/conv3X3", (3, 3, _OUT, _OUT // 2), 1))
        out.append((f"{s}/conv5X5_1", (3, 3, _OUT, _OUT // 4), 1))
        out.append((f"{s}/conv5X5_2", (3, 3, _OUT // 4, _OUT // 4), 1))
        out.append((f"{s}/conv7X7_2", (3, 3, _OUT // 4, _OUT // 4), 1))
        out.append((f"{s}/conv7x7_3", (3, 3, _OUT // 4, _OUT // 4), 1))
    for i in range(3):
        out.append((f"ClassHead/{i}", (1, 1, _OUT, 4), 1))
        out.append((f"BboxHead/{i}", (1, 1, _OUT, 8), 1))
        out.append((f"LandmarkHead/{i}", (1, 1, _OUT, 20), 1))
    return out


def init_random_params(seed: int = 0) -> Dict[str, jnp.ndarray]:
    rng = np.random.default_rng(seed)
    p = {}
    for name, shape, _ in _specs():
        fan_in = shape[0] * shape[1] * shape[2]
        p[f"{name}/kernel"] = jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) / math.sqrt(fan_in)
        )
        p[f"{name}/bias"] = jnp.zeros((shape[3],))
    return p


def params_from_torch(sd: Dict[str, "np.ndarray"]) -> Dict[str, jnp.ndarray]:
    """Import Retinaface_mobilenet0.25.pth (biubug6 graph; facexlib ships the
    same keys) with BatchNorm folded into the convs."""
    import torch

    def npv(k):
        v = sd.pop(k)
        return v.detach().float().numpy() if isinstance(v, torch.Tensor) else np.asarray(v, np.float32)

    sd = {k.replace("module.", "", 1): v for k, v in sd.items()}

    def folded(conv_key, bn_key, groups=1):
        w = npv(f"{conv_key}.weight")  # OIHW
        gamma = npv(f"{bn_key}.weight")
        beta = npv(f"{bn_key}.bias")
        mean = npv(f"{bn_key}.running_mean")
        var = npv(f"{bn_key}.running_var")
        sd.pop(f"{bn_key}.num_batches_tracked", None)
        scale = gamma / np.sqrt(var + 1e-5)
        w = w * scale[:, None, None, None]
        b = beta - mean * scale
        if groups > 1:  # torch depthwise OIHW (C,1,H,W) -> HWIO (H,W,1,C)
            k = np.transpose(w, (2, 3, 1, 0))
        else:
            k = np.transpose(w, (2, 3, 1, 0))
        return jnp.asarray(k), jnp.asarray(b)

    p = {}
    for prefix, tprefix, spec in (
        ("stage1", "body.stage1", _STAGE1),
        ("stage2", "body.stage2", _STAGE2),
        ("stage3", "body.stage3", _STAGE3),
    ):
        for i, (kind, cin, cout, s) in enumerate(spec):
            if kind == "conv":  # Sequential(conv, bn, leaky)
                k, b = folded(f"{tprefix}.{i}.0", f"{tprefix}.{i}.1")
                p[f"{prefix}/{i}/kernel"], p[f"{prefix}/{i}/bias"] = k, b
            else:  # Sequential(dw-conv, bn, leaky, pw-conv, bn, leaky)
                k, b = folded(f"{tprefix}.{i}.0", f"{tprefix}.{i}.1", groups=cin)
                p[f"{prefix}/{i}_dw/kernel"], p[f"{prefix}/{i}_dw/bias"] = k, b
                k, b = folded(f"{tprefix}.{i}.3", f"{tprefix}.{i}.4")
                p[f"{prefix}/{i}_pw/kernel"], p[f"{prefix}/{i}_pw/bias"] = k, b

    for n, t in (
        ("fpn/output1", "fpn.output1"), ("fpn/output2", "fpn.output2"),
        ("fpn/output3", "fpn.output3"), ("fpn/merge1", "fpn.merge1"),
        ("fpn/merge2", "fpn.merge2"),
    ):
        k, b = folded(f"{t}.0", f"{t}.1")
        p[f"{n}/kernel"], p[f"{n}/bias"] = k, b
    for s in ("ssh1", "ssh2", "ssh3"):
        for c in ("conv3X3", "conv5X5_1", "conv5X5_2", "conv7X7_2", "conv7x7_3"):
            k, b = folded(f"{s}.{c}.0", f"{s}.{c}.1")
            p[f"{s}/{c}/kernel"], p[f"{s}/{c}/bias"] = k, b
    for head in ("ClassHead", "BboxHead", "LandmarkHead"):
        for i in range(3):
            w = npv(f"{head}.{i}.conv1x1.weight")
            p[f"{head}/{i}/kernel"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
            p[f"{head}/{i}/bias"] = jnp.asarray(npv(f"{head}.{i}.conv1x1.bias"))

    if sd:
        raise KeyError(
            "RetinaFace importer: unmatched checkpoint keys: "
            + ", ".join(sorted(sd)[:20])
        )
    return p
