"""Converter parity for ConvNeXtV2 and DINOv2-style ViT against minimal torch
oracles that replicate the timm layouts (key names + math)."""
import numpy as np
import pytest
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.heavy  # torch-oracle suites: second tier, see conftest


from xmir_tpu.models import ConvNeXtV2Backbone, ViTBackbone
from xmir_tpu.models.convert import convert_convnextv2_timm, convert_vit_timm


# --- torch ConvNeXtV2 oracle (timm naming: stem.0/1, stages.N.blocks.M.*) ---


class _TorchGRN(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.weight = nn.Parameter(torch.zeros(dim))
        self.bias = nn.Parameter(torch.zeros(dim))

    def forward(self, x):  # (B, H, W, C)
        gx = torch.norm(x, p=2, dim=(1, 2), keepdim=True)
        nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
        return self.weight * (x * nx) + self.bias + x


class _TorchCNBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.grn = _TorchGRN(4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)

    def forward(self, x):  # (B, C, H, W)
        h = self.conv_dw(x)
        h = h.permute(0, 2, 3, 1)
        h = self.norm(h)
        h = self.mlp.fc1(h)
        h = torch.nn.functional.gelu(h)
        h = self.mlp.grn(h)
        h = self.mlp.fc2(h)
        return x + h.permute(0, 3, 1, 2)


class _TorchConvNeXtV2(nn.Module):
    def __init__(self, depths=(1, 1), dims=(8, 16)):
        super().__init__()
        self.depths, self.dims = depths, dims
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], 4, stride=4), nn.LayerNorm(dims[0], eps=1e-6)
        )
        self.stages = nn.ModuleList()
        for i, d in enumerate(depths):
            stage = nn.Module()
            if i > 0:
                stage.downsample = nn.Sequential(
                    nn.LayerNorm(dims[i - 1], eps=1e-6),
                    nn.Conv2d(dims[i - 1], dims[i], 2, stride=2),
                )
            stage.blocks = nn.ModuleList([_TorchCNBlock(dims[i]) for _ in range(d)])
            self.stages.append(stage)
        self.head = nn.Module()
        self.head.norm = nn.LayerNorm(dims[-1], eps=1e-6)

    def forward(self, x):
        x = self.stem[0](x)
        x = self.stem[1](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        for i, stage in enumerate(self.stages):
            if i > 0:
                x = stage.downsample[0](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                x = stage.downsample[1](x)
            for blk in stage.blocks:
                x = blk(x)
        pooled = x.mean((2, 3))
        return x, self.head.norm(pooled)


class TestConvNeXtV2Conversion:
    def test_numerical_parity(self):
        torch.manual_seed(0)
        tm = _TorchConvNeXtV2().eval()
        # state dict keys: stem.0.weight, stages.1.downsample.0.*, blocks...
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        # rename GRN weight/bias to timm's mlp.grn.weight/bias (already match)
        variables = convert_convnextv2_timm(sd, depths=(1, 1))
        fm = ConvNeXtV2Backbone(depths=(1, 1), dims=(8, 16))
        x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            tfeat, tpool = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
        out = fm.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out["features"]), tfeat.numpy().transpose(0, 2, 3, 1),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["pooled_norm"]), tpool.numpy(), atol=1e-4
        )


# --- torch DINOv2-style ViT oracle (timm naming: blocks.N.attn.qkv etc.) ---


class _TorchViTBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.dim, self.heads = dim, heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, 3 * dim)
        self.attn.proj = nn.Linear(dim, dim)
        self.ls1 = nn.Module()
        self.ls1.gamma = nn.Parameter(torch.full((dim,), 1e-5))
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.ls2 = nn.Module()
        self.ls2.gamma = nn.Parameter(torch.full((dim,), 1e-5))

    def forward(self, x):
        b, n, d = x.shape
        hd = d // self.heads
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, n, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = torch.softmax(q @ k.transpose(-2, -1) * hd**-0.5, dim=-1)
        h = (a @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.ls1.gamma * self.attn.proj(h)
        h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.ls2.gamma * h


class _TorchViT(nn.Module):
    def __init__(self, img=28, patch=14, dim=32, depth=2, heads=4):
        super().__init__()
        n = (img // patch) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.blocks = nn.ModuleList([_TorchViTBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x[:, 0], x[:, 1:]


class TestViTConversion:
    def test_numerical_parity(self):
        torch.manual_seed(0)
        tm = _TorchViT().eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = convert_vit_timm(sd, depth=2)
        fm = ViTBackbone(img_size=28, patch_size=14, dim=32, depth=2, num_heads=4)
        x = np.random.default_rng(0).standard_normal((2, 28, 28, 3)).astype(np.float32)
        with torch.no_grad():
            tcls, ttok = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
        out = fm.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out["cls"]), tcls.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["tokens"]), ttok.numpy(), atol=1e-4)
