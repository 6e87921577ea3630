"""SwinV2 converter parity against an independent torch oracle implementing
the timm swinv2 semantics (res-post-norm, cosine attention with clamped
per-head temperature, log-CPB, shifted windows, v2 patch merging)."""
import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax.numpy as jnp

pytestmark = pytest.mark.heavy  # torch-oracle suites: second tier, see conftest


from xmir_tpu.models import SwinV2Backbone
from xmir_tpu.models.convert import convert_swinv2_timm


class _TorchWindowAttnV2(nn.Module):
    def __init__(self, dim, heads, window, pretrained_window):
        super().__init__()
        self.dim, self.heads, self.window = dim, heads, window
        self.qkv = nn.Linear(dim, 3 * dim, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.logit_scale = nn.Parameter(
            torch.log(10 * torch.ones(heads, 1, 1))
        )
        self.cpb_mlp = nn.Sequential(
            nn.Linear(2, 512), nn.ReLU(), nn.Linear(512, heads, bias=False)
        )
        self.proj = nn.Linear(dim, dim)
        # relative coords table
        coords = torch.arange(-(window - 1), window, dtype=torch.float32)
        table = torch.stack(torch.meshgrid(coords, coords, indexing="ij"), -1)
        denom = max(pretrained_window - 1, 1)
        table = table / denom * 8
        table = torch.sign(table) * torch.log2(1 + table.abs()) / math.log2(8)
        self.register_buffer("table", table)
        c = torch.stack(
            torch.meshgrid(torch.arange(window), torch.arange(window), indexing="ij")
        ).flatten(1)
        rel = (c[:, :, None] - c[:, None, :]).permute(1, 2, 0) + window - 1
        self.register_buffer(
            "rel_idx", (rel[..., 0] * (2 * window - 1) + rel[..., 1]).long()
        )

    def forward(self, x, mask=None):
        bw, n, _ = x.shape
        hd = self.dim // self.heads
        bias_qkv = torch.cat(
            [self.q_bias, torch.zeros_like(self.q_bias), self.v_bias]
        )
        qkv = torch.nn.functional.linear(x, self.qkv.weight, bias_qkv)
        qkv = qkv.reshape(bw, n, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = torch.nn.functional.normalize(q, dim=-1) @ torch.nn.functional.normalize(
            k, dim=-1
        ).transpose(-2, -1)
        scale = torch.clamp(self.logit_scale, max=math.log(100.0)).exp()
        attn = attn * scale
        bias = self.cpb_mlp(self.table).view(-1, self.heads)[self.rel_idx.view(-1)]
        bias = bias.view(n, n, self.heads).permute(2, 0, 1)
        attn = attn + 16 * torch.sigmoid(bias).unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(bw // nw, nw, self.heads, n, n) + mask[None, :, None]
            attn = attn.view(bw, self.heads, n, n)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(bw, n, self.dim)
        return self.proj(x)


def _win_part(x, w):
    b, h, ww, c = x.shape
    x = x.view(b, h // w, w, ww // w, w, c).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _win_rev(x, w, h, ww):
    b = x.shape[0] // ((h // w) * (ww // w))
    x = x.view(b, h // w, ww // w, w, w, -1).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, ww, -1)


class _TorchSwinBlock(nn.Module):
    def __init__(self, dim, heads, window, shift, pretrained_window):
        super().__init__()
        self.window, self.shift = window, shift
        self.attn = _TorchWindowAttnV2(dim, heads, window, pretrained_window)
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, x):
        b, h, w, c = x.shape
        win = min(self.window, h)
        shift = 0 if win >= h else self.shift
        shortcut = x
        if shift:
            x = torch.roll(x, (-shift, -shift), (1, 2))
        xw = _win_part(x, win)
        mask = None
        if shift:
            img = torch.zeros(h, w)
            cnt = 0
            for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
                for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
                    img[hs, ws] = cnt
                    cnt += 1
            mw = _win_part(img[None, ..., None], win).squeeze(-1)
            diff = mw[:, None] - mw[:, :, None]
            mask = torch.where(diff != 0, torch.tensor(-100.0), torch.tensor(0.0))
        xw = self.attn(xw, mask)
        x = _win_rev(xw, win, h, w)
        if shift:
            x = torch.roll(x, (shift, shift), (1, 2))
        x = shortcut + self.norm1(x)
        return x + self.norm2(self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(x))))


class _TorchSwinV2(nn.Module):
    def __init__(self, embed=8, depths=(2, 2), heads=(2, 4), window=4, pw=(4, 4)):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, embed, 4, stride=4)
        self.patch_embed.norm = nn.LayerNorm(embed, eps=1e-5)
        self.layers = nn.ModuleList()
        dim = embed
        for i, d in enumerate(depths):
            layer = nn.Module()
            if i > 0:
                dim *= 2
                layer.downsample = nn.Module()
                layer.downsample.reduction = nn.Linear(dim * 2, dim, bias=False)
                layer.downsample.norm = nn.LayerNorm(dim, eps=1e-5)
            layer.blocks = nn.ModuleList(
                [
                    _TorchSwinBlock(dim, heads[i], window,
                                    0 if j % 2 == 0 else window // 2, pw[i])
                    for j in range(d)
                ]
            )
            self.layers.append(layer)
        self.norm = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        for i, layer in enumerate(self.layers):
            if i > 0:
                b, h, w, c = x.shape
                x = x.view(b, h // 2, 2, w // 2, 2, c)
                x = torch.cat(
                    [x[:, :, 0, :, 0], x[:, :, 1, :, 0],
                     x[:, :, 0, :, 1], x[:, :, 1, :, 1]], dim=-1
                )
                x = layer.downsample.reduction(x)
                x = layer.downsample.norm(x)
            for blk in layer.blocks:
                x = blk(x)
        x = self.norm(x)
        return x, x.mean((1, 2))


class TestSwinV2Conversion:
    def test_numerical_parity_with_shifted_windows(self):
        torch.manual_seed(0)
        tm = _TorchSwinV2().eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = convert_swinv2_timm(sd, depths=(2, 2))
        fm = SwinV2Backbone(
            embed_dim=8, depths=(2, 2), num_heads=(2, 4), window=4,
            pretrained_window=(4, 4),
        )
        # 32x32 input -> 8x8 grid stage0 (shift active), 4x4 stage1 (window==grid)
        x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            tfeat, tpool = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
        out = fm.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out["features"]), tfeat.numpy(), atol=2e-4
        )
        np.testing.assert_allclose(np.asarray(out["pooled"]), tpool.numpy(), atol=2e-4)
