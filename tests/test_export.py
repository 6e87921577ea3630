"""Export round-trip tests: for every registry backbone, exporting Flax
params to the source framework's state-dict layout (models/export.py) and
re-importing through models/convert.py must reproduce the original tree
exactly. Combined with the import converters' numerical parity vs real HF /
torchvision weights (test_convert*.py), this pins export correctness
(reference convert_to_onnx.py:1-26 interchange role)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmir_tpu.models import convert, export


def _flat(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flat(v, prefix + (k,)))
    else:
        out["/".join(prefix)] = np.asarray(tree)
    return out


def _assert_tree_equal(a, b):
    fa, fb = _flat(a), _flat(b)
    assert set(fa) == set(fb), (
        f"missing {sorted(set(fa) - set(fb))[:5]}, "
        f"extra {sorted(set(fb) - set(fa))[:5]}"
    )
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


class TestBackboneRoundTrips:
    def test_resnet50(self, rng):
        from xmir_tpu.models import ResNetBackbone

        m = ResNetBackbone()
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        v = jax.jit(lambda r: m.init(r, x, train=True))(jax.random.PRNGKey(0))
        sd = export.export_resnet50_backbone(v["params"], v["batch_stats"])
        back = convert.convert_resnet50(sd)
        _assert_tree_equal(v["params"], back["params"])
        _assert_tree_equal(v["batch_stats"], back["batch_stats"])

    def test_siglip_vision(self, rng):
        from xmir_tpu.models import SiglipVisionBackbone

        m = SiglipVisionBackbone(
            img_size=28, patch_size=14, dim=32, depth=2, num_heads=4,
            intermediate=64,
        )
        x = jnp.asarray(rng.standard_normal((1, 28, 28, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        sd = export.export_siglip_vision(v["params"], depth=2)
        back = convert.convert_siglip_vision(sd, depth=2)
        _assert_tree_equal(v["params"], back["params"])

    def test_siglip_text(self):
        from xmir_tpu.models.siglip_text import SiglipTextBackbone

        m = SiglipTextBackbone(vocab_size=50, dim=32, depth=2, num_heads=4,
                               intermediate=64, max_position=16)
        ids = jnp.zeros((1, 8), jnp.int32)
        v = m.init(jax.random.PRNGKey(0), ids)
        sd = export.export_siglip_text(v["params"], depth=2)
        back = convert.convert_siglip_text(sd, depth=2)
        _assert_tree_equal(v["params"], back["params"])

    def test_bert(self):
        from xmir_tpu.models import BertTextBackbone

        m = BertTextBackbone(vocab_size=50, dim=32, depth=2, num_heads=4,
                             intermediate=64)
        ids = jnp.zeros((1, 8), jnp.int32)
        v = m.init(jax.random.PRNGKey(0), ids)
        sd = export.export_bert(v["params"], depth=2)
        back = convert.convert_bert(sd, depth=2)
        _assert_tree_equal(v["params"], back["params"])

    def test_vit(self, rng):
        from xmir_tpu.models import ViTBackbone

        m = ViTBackbone(img_size=28, patch_size=14, dim=32, depth=2,
                        num_heads=4)
        x = jnp.asarray(rng.standard_normal((1, 28, 28, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        sd = export.export_vit_timm(v["params"], depth=2)
        back = convert.convert_vit_timm(sd, depth=2)
        _assert_tree_equal(v["params"], back["params"])

    def test_convnextv2(self, rng):
        from xmir_tpu.models import ConvNeXtV2Backbone

        m = ConvNeXtV2Backbone(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64))
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        sd = export.export_convnextv2_timm(v["params"], depths=(1, 1, 1, 1))
        back = convert.convert_convnextv2_timm(sd, depths=(1, 1, 1, 1))
        _assert_tree_equal(v["params"], back["params"])

    @pytest.mark.slow
    def test_swinv2(self, rng):
        from xmir_tpu.models import SwinV2Backbone

        m = SwinV2Backbone(embed_dim=16, depths=(1, 1, 1, 1),
                           num_heads=(1, 2, 4, 8), window=4,
                           pretrained_window=(4, 4, 4, 2))
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        sd = export.export_swinv2_timm(v["params"], depths=(1, 1, 1, 1))
        back = convert.convert_swinv2_timm(sd, depths=(1, 1, 1, 1))
        _assert_tree_equal(v["params"], back["params"])


class TestExportDispatch:
    def test_export_backbone_names(self, rng):
        """export_backbone resolves the embedder layout for each registry
        name (smoke: resnet50 embedder)."""
        from xmir_tpu.models import ResNet50Embedder

        m = ResNet50Embedder(embedding_dim=8)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        v = jax.jit(lambda r: m.init(r, x, train=True))(jax.random.PRNGKey(0))
        sd = export.export_backbone("resnet50", v)
        assert "conv1.weight" in sd and sd["conv1.weight"].shape == (64, 3, 7, 7)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            export.export_backbone("nope", {"params": {}})

    def test_save_npz(self, tmp_path, rng):
        sd = {"a.weight": rng.standard_normal((2, 2)).astype(np.float32)}
        p = export.save_torch_state_dict(sd, str(tmp_path / "sd.npz"))
        loaded = np.load(p)
        np.testing.assert_array_equal(loaded["a.weight"], sd["a.weight"])


class TestBiomedCLIPConverter:
    def test_converter_from_synthetic_openclip_sd(self, rng):
        """Build an open_clip-layout state dict synthetically, convert, and
        check the params load into a matching BiomedCLIPModel and the towers
        run; projection kernels must be transposed exactly."""
        import jax
        from xmir_tpu.models import BiomedCLIPModel, convert_biomedclip

        D, E, depth, vocab = 32, 16, 2, 50
        model = BiomedCLIPModel(
            embed_dim=E, img_size=32, vision_dim=D, vision_depth=depth,
            text_dim=D, text_depth=depth, text_vocab=vocab,
        )
        x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
        ids0 = jnp.zeros((1, 8), jnp.int32)
        v = model.init(jax.random.PRNGKey(0), x0, ids0,
                       method=BiomedCLIPModel.init_towers)

        # synth open_clip sd from the flax init via the existing exporters
        sd = {}
        sd.update({
            f"visual.trunk.{k}": val for k, val in export.export_vit_timm(
                v["params"]["visual"], depth=depth, layerscale=False
            ).items()
        })
        sd["visual.head.proj.weight"] = np.transpose(
            np.asarray(v["params"]["visual_proj"]["kernel"])
        )
        sd.update({
            f"text.transformer.{k}": val for k, val in export.export_bert(
                v["params"]["text"], depth=depth
            ).items()
        })
        sd["text.proj.0.weight"] = np.transpose(
            np.asarray(v["params"]["text_proj1"]["kernel"]))
        sd["text.proj.0.bias"] = np.asarray(v["params"]["text_proj1"]["bias"])
        sd["text.proj.2.weight"] = np.transpose(
            np.asarray(v["params"]["text_proj2"]["kernel"]))
        sd["text.proj.2.bias"] = np.asarray(v["params"]["text_proj2"]["bias"])
        sd["logit_scale"] = np.asarray(v["params"]["logit_scale"])

        back = convert_biomedclip(sd)
        _assert_tree_equal(v["params"], back["params"])

        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        out = model.apply({"params": back["params"]}, x)
        assert out["embedding"].shape == (2, E)
        txt = model.apply(
            {"params": back["params"]}, ids0, None,
            method=BiomedCLIPModel.encode_text,
        )
        assert txt.shape == (1, E)


class TestSavedModelExport:
    def test_savedmodel_matches_flax(self, rng, tmp_path):
        """jax2tf SavedModel output must equal the Flax embedding."""
        tf = pytest.importorskip("tensorflow")
        from xmir_tpu.models import TinyEmbedder

        m = TinyEmbedder(embedding_dim=8)
        x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        want = np.asarray(m.apply(v, jnp.asarray(x))["embedding"])

        out = str(tmp_path / "sm")
        export.export_savedmodel(m, v, out, (None, 32, 32, 3))
        loaded = tf.saved_model.load(out)
        got = loaded.embed(tf.constant(x)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_export_cli_torch(self, tmp_path):
        from xmir_tpu.cli import export as export_cli

        out = str(tmp_path / "resnet.npz")
        export_cli.main(["--model", "resnet50", "--output", out])
        sd = np.load(out)
        assert "conv1.weight" in sd
