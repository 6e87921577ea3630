"""Weight-converter parity tests: torch reference modules (random init) ->
convert -> flax apply must match torch forward numerically."""
from collections import OrderedDict

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

pytestmark = pytest.mark.heavy  # torch-oracle suites: second tier, see conftest


from xmir_tpu.models import DenseNetBackbone, SiglipVisionBackbone, BertTextBackbone
from xmir_tpu.models.convert import (
    convert_bert,
    convert_densenet121,
    convert_siglip_vision,
)


# --- minimal torchvision-layout DenseNet121 (torch oracle) ---


class _TorchDenseLayer(nn.Module):
    def __init__(self, in_ch, growth, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_ch)
        self.conv1 = nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        h = self.conv1(torch.relu(self.norm1(x)))
        h = self.conv2(torch.relu(self.norm2(h)))
        return torch.cat([x, h], 1)


class _TorchDenseNet(nn.Module):
    def __init__(self, growth=32, cfg=(6, 12, 24, 16), init_f=64):
        super().__init__()
        feats = OrderedDict()
        feats["conv0"] = nn.Conv2d(3, init_f, 7, 2, 3, bias=False)
        feats["norm0"] = nn.BatchNorm2d(init_f)
        nf = init_f
        for i, n in enumerate(cfg):
            block = nn.Module()
            for j in range(n):
                block.add_module(
                    f"denselayer{j + 1}", _TorchDenseLayer(nf + j * growth, growth)
                )
            feats[f"denseblock{i + 1}"] = block
            nf += n * growth
            if i < len(cfg) - 1:
                trans = nn.Module()
                trans.add_module("norm", nn.BatchNorm2d(nf))
                trans.add_module("conv", nn.Conv2d(nf, nf // 2, 1, bias=False))
                feats[f"transition{i + 1}"] = trans
                nf //= 2
        feats["norm5"] = nn.BatchNorm2d(nf)
        self.features = nn.Sequential(feats)

    def forward(self, x):
        for name, mod in self.features.named_children():
            if name.startswith("denseblock"):
                for layer in mod.children():
                    x = layer(x)
            elif name.startswith("transition"):
                x = mod.norm(x)
                x = torch.relu(x)
                x = mod.conv(x)
                x = torch.nn.functional.avg_pool2d(x, 2, 2)
            else:
                x = mod(x)
                if name == "conv0":
                    pass
                if name == "norm0":
                    x = torch.relu(x)
                    x = torch.nn.functional.max_pool2d(x, 3, 2, 1)
        features = x  # post-norm5, pre-relu
        pooled = torch.relu(x).mean((2, 3))
        return features, pooled


class TestDenseNetConversion:
    def test_numerical_parity(self):
        torch.manual_seed(0)
        tm = _TorchDenseNet().eval()
        # randomize BN stats so eval-mode normalization is non-trivial
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.1)
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        variables = convert_densenet121(sd)

        x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            tfeat, tpool = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
        fm = DenseNetBackbone()
        out = fm.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(x),
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(out["pooled"]), tpool.numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["features"]),
            tfeat.numpy().transpose(0, 2, 3, 1),
            atol=2e-3,
        )


class TestSiglipConversion:
    def test_numerical_parity_vs_hf(self):
        from transformers import SiglipVisionConfig, SiglipVisionModel

        cfg = SiglipVisionConfig(
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=3,
            num_attention_heads=4,
            image_size=56,
            patch_size=14,
        )
        torch.manual_seed(0)
        hf = SiglipVisionModel(cfg).eval()
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        variables = convert_siglip_vision(sd, depth=3)

        fm = SiglipVisionBackbone(
            img_size=56, patch_size=14, dim=64, depth=3, num_heads=4, intermediate=128
        )
        x = np.random.default_rng(0).standard_normal((2, 56, 56, 3)).astype(np.float32)
        with torch.no_grad():
            t_out = hf(pixel_values=torch.tensor(x.transpose(0, 3, 1, 2)))
        out = fm.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out["tokens"]), t_out.last_hidden_state.numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["pooled"]), t_out.pooler_output.numpy(), atol=2e-4
        )


class TestBertConversion:
    def test_numerical_parity_vs_hf(self):
        from transformers import BertConfig, BertModel

        cfg = BertConfig(
            vocab_size=200,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            max_position_embeddings=64,
        )
        torch.manual_seed(0)
        hf = BertModel(cfg, add_pooling_layer=False).eval()
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        variables = convert_bert(sd, depth=2)

        fm = BertTextBackbone(
            vocab_size=200, dim=64, depth=2, num_heads=4, intermediate=128,
            max_position=64,
        )
        ids = np.array([[1, 5, 9, 3, 0, 0], [7, 2, 0, 0, 0, 0]])
        mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 0, 0, 0, 0]])
        with torch.no_grad():
            t_out = hf(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        out = fm.apply(variables, jnp.asarray(ids), jnp.asarray(mask))
        # compare only unmasked positions (masked positions see different
        # context handling but are never consumed downstream)
        m = mask.astype(bool)
        np.testing.assert_allclose(
            np.asarray(out["tokens"])[m], t_out[m], atol=2e-4
        )


class TestSiglipTextConversion:
    def test_numerical_parity_vs_hf(self):
        from transformers import SiglipTextConfig, SiglipTextModel

        from xmir_tpu.models import SiglipTextBackbone
        from xmir_tpu.models.convert import convert_siglip_text

        cfg = SiglipTextConfig(
            vocab_size=300,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=16,
        )
        torch.manual_seed(0)
        hf = SiglipTextModel(cfg).eval()
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        variables = convert_siglip_text(sd, depth=2)

        fm = SiglipTextBackbone(
            vocab_size=300, dim=64, depth=2, num_heads=4, intermediate=128,
            max_position=16,
        )
        ids = np.array([[4, 8, 15, 16, 23, 42], [7, 1, 2, 3, 4, 5]])
        with torch.no_grad():
            t_out = hf(input_ids=torch.tensor(ids))
        out = fm.apply(variables, jnp.asarray(ids))
        np.testing.assert_allclose(
            np.asarray(out["tokens"]), t_out.last_hidden_state.numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["pooled"]), t_out.pooler_output.numpy(), atol=2e-4
        )


class TestExportRoundTrip:
    @pytest.mark.slow
    def test_densenet_export_import_roundtrip(self):
        """flax -> torch naming -> flax must be identity."""
        from xmir_tpu.models import DenseNet121Embedder
        from xmir_tpu.models.convert import convert_densenet121_embedder
        from xmir_tpu.models.export import export_densenet121_embedder

        model = DenseNet121Embedder(embedding_dim=16, num_labels=3)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        sd = export_densenet121_embedder(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]}
        )
        assert "densenet121.0.conv0.weight" in sd
        assert sd["fc.weight"].shape == (16, 1024)
        back = convert_densenet121_embedder(sd)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables["params"]),
            jax.tree_util.tree_leaves_with_path(back["params"]),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(variables["batch_stats"]),
            jax.tree_util.tree_leaves(back["batch_stats"]),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
