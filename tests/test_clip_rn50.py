"""CLIP RN50 numeric oracle: a runnable torch transcription of the OpenAI
ModifiedResNet + text transformer (the ``RN50`` checkpoint layout pyiqa's
``clipiqa`` defaults to, reference evaluate_img.py:17), random-initialized
(including non-trivial BatchNorm running stats so the import-time BN fold
is actually exercised), imported through
``convert.torch_import.clip_rn50_params_from_torch`` and compared against
the native flax towers — the same standard as the MUSIQ/MANIQA/CLIPIQA
oracles. Also checks the CLIPIQA metric end to end over the RN50 wrapper.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from instarevive_tpu.convert.torch_import import clip_rn50_params_from_torch  # noqa: E402
from instarevive_tpu.models.clip_rn50 import (  # noqa: E402
    CLIPTextTower,
    ModifiedResNet,
    OpenAICLIP,
)

# --------------------------------------------------------------------------
# torch transcription of the OpenAI CLIP RN50 layout (model.py key schema)
# --------------------------------------------------------------------------


class _Bottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.avgpool = tnn.AvgPool2d(stride) if stride > 1 else tnn.Identity()
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            # openai keys the Sequential "-1" (avgpool) / "0" (conv) / "1" (bn)
            self.downsample = tnn.Sequential()
            if stride > 1:
                self.downsample.add_module("-1", tnn.AvgPool2d(stride))
            self.downsample.add_module("0", tnn.Conv2d(inplanes, planes * 4, 1, bias=False))
            self.downsample.add_module("1", tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        identity = x if self.downsample is None else self.downsample(x)
        return F.relu(out + identity)


class _AttentionPool2d(tnn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = tnn.Parameter(
            torch.randn(spacial_dim**2 + 1, embed_dim) / embed_dim**0.5
        )
        self.q_proj = tnn.Linear(embed_dim, embed_dim)
        self.k_proj = tnn.Linear(embed_dim, embed_dim)
        self.v_proj = tnn.Linear(embed_dim, embed_dim)
        self.c_proj = tnn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):  # (B, C, H, W)
        b, c, h, w = x.shape
        x = x.flatten(start_dim=2).permute(2, 0, 1)  # (HW, B, C)
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :]
        q = self.q_proj(x[:1])
        k, v = self.k_proj(x), self.v_proj(x)
        hd = c // self.num_heads
        t = x.shape[0]
        q = q.reshape(1, b * self.num_heads, hd).transpose(0, 1)
        k = k.reshape(t, b * self.num_heads, hd).transpose(0, 1)
        v = v.reshape(t, b * self.num_heads, hd).transpose(0, 1)
        attn = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(hd), dim=-1)
        out = (attn @ v).transpose(0, 1).reshape(1, b, c)
        return self.c_proj(out)[0]


class _ModifiedResNet(tnn.Module):
    def __init__(self, layers, output_dim, heads, input_resolution, width):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width // 2)
        self.conv2 = tnn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width // 2)
        self.conv3 = tnn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width)
        self.avgpool = tnn.AvgPool2d(2)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)
        self.attnpool = _AttentionPool2d(
            input_resolution // 32, width * 32, heads, output_dim
        )

    def _make_layer(self, planes, blocks, stride=1):
        layers = [_Bottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * _Bottleneck.expansion
        for _ in range(1, blocks):
            layers.append(_Bottleneck(self._inplanes, planes))
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return self.attnpool(x)


class _QuickGELU(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _ResidualAttentionBlock(tnn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.attn = tnn.MultiheadAttention(width, heads)
        self.ln_1 = tnn.LayerNorm(width)
        self.mlp = tnn.Sequential()
        self.mlp.add_module("c_fc", tnn.Linear(width, width * 4))
        self.mlp.add_module("gelu", _QuickGELU())
        self.mlp.add_module("c_proj", tnn.Linear(width * 4, width))
        self.ln_2 = tnn.LayerNorm(width)

    def forward(self, x, mask):  # (T, B, C)
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False, attn_mask=mask)[0]
        return x + self.mlp(self.ln_2(x))


class _CLIPRN50(tnn.Module):
    """Container reproducing the OpenAI checkpoint's top-level key schema."""

    def __init__(self, layers=(1, 1, 1, 1), width=16, embed_dim=32,
                 input_resolution=64, text_width=64, text_layers=2,
                 vocab=100, context=16):
        super().__init__()
        self.visual = _ModifiedResNet(
            layers, embed_dim, width * 32 // 64, input_resolution, width
        )
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [_ResidualAttentionBlock(text_width, text_width // 64)
             for _ in range(text_layers)]
        )
        self.token_embedding = tnn.Embedding(vocab, text_width)
        self.positional_embedding = tnn.Parameter(torch.randn(context, text_width) * 0.01)
        self.ln_final = tnn.LayerNorm(text_width)
        self.text_projection = tnn.Parameter(torch.randn(text_width, embed_dim) * 0.05)
        self.logit_scale = tnn.Parameter(torch.tensor(np.log(14.0), dtype=torch.float32))
        self.context = context

    def encode_image(self, x):
        return self.visual(x)

    def encode_text(self, ids):
        x = self.token_embedding(ids) + self.positional_embedding[: ids.shape[1]]
        x = x.permute(1, 0, 2)  # (T, B, C)
        t = x.shape[0]
        mask = torch.full((t, t), float("-inf")).triu(1)
        for blk in self.transformer.resblocks:
            x = blk(x, mask)
        x = self.ln_final(x.permute(1, 0, 2))
        eot = ids.argmax(dim=-1)
        return x[torch.arange(x.shape[0]), eot] @ self.text_projection


def _randomize_bn(model, rng):
    """Non-trivial running stats so the BN fold is actually tested."""
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.5, m.running_mean.shape).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 2.0, m.running_var.shape).astype(np.float32)))
            m.weight.data.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, m.weight.shape).astype(np.float32)))
            m.bias.data.copy_(torch.from_numpy(
                rng.normal(0, 0.2, m.bias.shape).astype(np.float32)))


@pytest.fixture(scope="module")
def rn50_pair():
    torch.manual_seed(0)
    mt = _CLIPRN50()
    with torch.no_grad():
        _randomize_bn(mt, np.random.default_rng(1))
    mt.eval()
    vis, txt, scale, meta = clip_rn50_params_from_torch(mt.state_dict())
    assert meta == {
        "layers": (1, 1, 1, 1), "embed_dim": 32, "vision_width": 16,
        "vision_heads": 8, "image_size": 64, "text_width": 64,
        "text_layers": 2, "text_heads": 1, "vocab_size": 100,
        "context_length": 16,
    }
    return mt, vis, txt, scale, meta


def test_image_tower_matches_torch(rn50_pair):
    mt, vis, _, _, meta = rn50_pair
    x = np.random.default_rng(2).normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = mt.encode_image(torch.from_numpy(x)).numpy()
    visual = ModifiedResNet(layers=meta["layers"], output_dim=meta["embed_dim"],
                            heads=meta["vision_heads"], width=meta["vision_width"])
    ours = np.asarray(visual.apply({"params": vis}, x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)


def test_text_tower_matches_torch(rn50_pair):
    mt, _, txt, _, meta = rn50_pair
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 90, (3, 16)).astype(np.int64)
    ids[:, 9] = 99  # EOT = max vocab id; argmax pooling picks it
    with torch.no_grad():
        ref = mt.encode_text(torch.from_numpy(ids)).numpy()
    text = CLIPTextTower(width=meta["text_width"], layers=meta["text_layers"],
                         heads=meta["text_heads"], vocab_size=meta["vocab_size"],
                         context_length=meta["context_length"],
                         embed_dim=meta["embed_dim"])
    ours = np.asarray(text.apply({"params": txt}, ids.astype(np.int32)))
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


class _Tok:
    """Stub tokenizer: deterministic ids per text, EOT (max id) terminated."""

    def __call__(self, texts, padding=True, return_tensors="np"):
        ids = np.ones((len(texts), 12), np.int64)
        for i, t in enumerate(texts):
            h = abs(hash(t))
            for j in range(1, 10):
                ids[i, j] = 1 + (h >> j) % 90
            ids[i, 10] = 99  # EOT
        return {"input_ids": ids, "attention_mask": np.ones_like(ids)}


def test_clipiqa_rn50_end_to_end(rn50_pair):
    """CLIPIQA over the RN50 wrapper == the torch-side scoring transcription
    (pyiqa rule: softmax(logit_scale.exp() * cos) over antonym pairs)."""
    from instarevive_tpu.utils.clipiqa import _MEAN, _STD, CLIPIQA

    mt, vis, txt, scale, meta = rn50_pair
    model = OpenAICLIP(vis, txt, scale, image_size=meta["image_size"],
                       visual=ModifiedResNet(
                           layers=meta["layers"], output_dim=meta["embed_dim"],
                           heads=meta["vision_heads"], width=meta["vision_width"]),
                       text=CLIPTextTower(
                           width=meta["text_width"], layers=meta["text_layers"],
                           heads=meta["text_heads"], vocab_size=meta["vocab_size"],
                           context_length=meta["context_length"],
                           embed_dim=meta["embed_dim"]))
    tok = _Tok()
    metric = CLIPIQA(model=model, tokenizer=tok)
    imgs = np.random.default_rng(4).random((2, 64, 64, 3)).astype(np.float32)
    ours = metric(imgs)

    with torch.no_grad():
        pix = torch.from_numpy(
            ((imgs - _MEAN) / _STD).transpose(0, 3, 1, 2).astype(np.float32))
        f_img = mt.encode_image(pix)
        f_img = f_img / f_img.norm(dim=-1, keepdim=True)
        flat = [p for pair in metric.prompts for p in pair]
        f_txt = mt.encode_text(torch.from_numpy(tok(flat)["input_ids"]))
        f_txt = f_txt / f_txt.norm(dim=-1, keepdim=True)
        f_txt = f_txt.reshape(len(metric.prompts), 2, -1)
        logits = torch.exp(mt.logit_scale) * torch.einsum(
            "nd,pkd->npk", f_img, f_txt)
        ref = torch.softmax(logits, dim=-1)[..., 0].mean(dim=-1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    assert abs(metric.logit_scale - 14.0) < 1e-3
