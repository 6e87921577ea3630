"""Model zoo tests: output contracts (L2-normalized embeddings, dict keys),
jit-ability, and small-shape correctness. Full-size models are exercised at
reduced depth/size where possible to keep CPU runtime sane."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmir_tpu.models import (
    ATHNet,
    BertTextBackbone,
    ConvNeXtV2Backbone,
    DenseNetBackbone,
    NIHDualHeadModel,
    ResNetBackbone,
    SiglipVisionBackbone,
    SwinV2Backbone,
    ViTBackbone,
    create_model,
    get_spec,
    list_models,
)
from xmir_tpu.models.embedders import (
    ConvNeXtV2SRAEmbedder,
    DenseNet121Embedder,
)
from xmir_tpu.models.heads import PCAMPool, SRA


def _init_apply(model, x, **kwargs):
    variables = model.init(jax.random.PRNGKey(0), x, **kwargs)
    out = model.apply(variables, x, **kwargs)
    return variables, out


def _assert_normalized(e):
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(e), axis=1), 1.0, atol=1e-5
    )


class TestBackboneShapes:
    def test_densenet121_shapes(self):
        m = DenseNetBackbone()
        x = jnp.ones((2, 64, 64, 3))
        _, out = _init_apply(m, x)
        assert out["pooled"].shape == (2, 1024)
        assert out["features"].shape == (2, 2, 2, 1024)

    def test_resnet50_shapes(self):
        m = ResNetBackbone()
        x = jnp.ones((2, 64, 64, 3))
        _, out = _init_apply(m, x)
        assert out["pooled"].shape == (2, 2048)

    def test_convnext_tiny_shapes(self):
        m = ConvNeXtV2Backbone(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64))
        x = jnp.ones((2, 64, 64, 3))
        _, out = _init_apply(m, x)
        assert out["pooled_norm"].shape == (2, 64)
        assert out["features"].shape == (2, 2, 2, 64)
        assert len(out["head_norm"]) == 2

    def test_vit_shapes_and_attentions(self):
        m = ViTBackbone(img_size=56, patch_size=14, dim=32, depth=2, num_heads=4)
        x = jnp.ones((2, 56, 56, 3))
        _, out = _init_apply(m, x, output_attentions=True)
        assert out["cls"].shape == (2, 32)
        assert out["tokens"].shape == (2, 16, 32)
        assert len(out["attentions"]) == 2
        a = np.asarray(out["attentions"][0])
        assert a.shape == (2, 4, 17, 17)
        np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)

    def test_vit_pos_interp(self):
        # run at a different resolution than img_size -> pos embed interpolation
        m = ViTBackbone(img_size=56, patch_size=14, dim=32, depth=1, num_heads=4)
        x56 = jnp.ones((1, 56, 56, 3))
        variables = m.init(jax.random.PRNGKey(0), x56)
        out = m.apply(variables, jnp.ones((1, 84, 84, 3)))
        assert out["tokens"].shape == (1, 36, 32)

    def test_siglip_shapes(self):
        m = SiglipVisionBackbone(
            img_size=56, patch_size=14, dim=32, depth=2, num_heads=4, intermediate=64
        )
        x = jnp.ones((2, 56, 56, 3))
        _, out = _init_apply(m, x, output_attentions=True)
        assert out["pooled"].shape == (2, 32)
        assert out["tokens"].shape == (2, 16, 32)
        assert len(out["attentions"]) == 2

    def test_swin_shapes(self):
        m = SwinV2Backbone(
            embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8), window=4,
            pretrained_window=(4, 4, 4, 4),
        )
        x = jnp.ones((2, 64, 64, 3))
        _, out = _init_apply(m, x)
        assert out["pooled"].shape == (2, 128)
        assert out["features"].shape == (2, 2, 2, 128)

    def test_swin_shifted_windows_differ(self):
        # shift must change the computation (mask path active)
        m = SwinV2Backbone(
            embed_dim=8, depths=(2,), num_heads=(2,), window=4,
            pretrained_window=(4,),
        )
        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 32, 3)), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        assert np.isfinite(np.asarray(out["pooled"])).all()

    def test_bert_shapes(self):
        m = BertTextBackbone(vocab_size=100, dim=32, depth=2, num_heads=4, intermediate=64)
        ids = jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]])
        mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]])
        variables = m.init(jax.random.PRNGKey(0), ids, mask)
        out = m.apply(variables, ids, mask)
        assert out["cls"].shape == (2, 32)
        assert out["tokens"].shape == (2, 4, 32)

    def test_bert_masking_matters(self):
        m = BertTextBackbone(vocab_size=100, dim=32, depth=1, num_heads=4, intermediate=64)
        ids = jnp.asarray([[1, 2, 3, 7]])
        variables = m.init(jax.random.PRNGKey(0), ids)
        full = m.apply(variables, ids, jnp.asarray([[1, 1, 1, 1]]))["cls"]
        part = m.apply(variables, ids, jnp.asarray([[1, 1, 1, 0]]))["cls"]
        assert not np.allclose(np.asarray(full), np.asarray(part))

    def test_ath_shapes(self):
        m = ATHNet(hash_size=48, num_classes=5, input_size=64)
        x = jnp.ones((2, 64, 64, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        codes, logits = m.apply(variables, x)
        assert codes.shape == (2, 48)
        assert logits.shape == (2, 5)


class TestEmbedders:
    def test_densenet_embedder_normalized(self):
        m = DenseNet121Embedder(embedding_dim=32)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32)
        _, out = _init_apply(m, x)
        _assert_normalized(out["embedding"])
        assert out["embedding"].shape == (2, 32)

    def test_densenet_dual_branch(self):
        m = DenseNet121Embedder(embedding_dim=16, num_labels=3)
        x = jnp.ones((2, 64, 64, 3))
        _, out = _init_apply(m, x)
        assert out["logits"].shape == (2, 3)
        _assert_normalized(out["embedding"])

    def test_nih_dual_head_contract(self):
        m = NIHDualHeadModel(backbone="convnextv2", num_labels=14)
        # full-size backbone is heavy; just check init traces on small input is
        # impossible (dims fixed); use the dinov2 variant with tiny image
        m = NIHDualHeadModel(backbone="dinov2", num_labels=14)
        x = jnp.ones((1, 70, 70, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        assert set(out) >= {"projection", "embedding", "logits", "cls_embedding"}
        assert out["projection"].shape == (1, 256)
        assert out["logits"].shape == (1, 14)
        _assert_normalized(out["embedding"])


class TestHeads:
    def test_sra_residual_fusion(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)), jnp.float32)
        m = SRA(8, num_heads=2, lam=0.1)
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        assert out.shape == (2, 8)
        # with ~zero-init attention conv, attention is uniform; output should
        # be gap + lam * (uniform spatial mean) = (1 + lam) * gap
        gap = np.asarray(x).mean((1, 2))
        np.testing.assert_allclose(np.asarray(out), gap * 1.1, atol=1e-3)

    def test_pcam_outputs(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)), jnp.float32)
        m = PCAMPool(8, num_classes=3)
        variables = m.init(jax.random.PRNGKey(0), x)
        emb, logits, probs = m.apply(variables, x)
        assert emb.shape == (2, 8)
        assert logits.shape == (2, 3)
        assert probs.shape == (2, 4, 4, 3)
        _assert_normalized(emb)

    def test_sra_embedder_shares_head_norm(self):
        m = ConvNeXtV2SRAEmbedder()
        # ensure init works and the sra head exists alongside backbone
        x = jnp.ones((1, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        params = variables["params"]
        assert "sra" in params and "backbone" in params
        assert "head_norm" in params["backbone"]


class TestRegistry:
    def test_all_models_listed(self):
        names = list_models()
        for expected in [
            "densenet121", "resnet50", "convnextv2", "convnextv2_sra",
            "convnextv2_pcam", "swinv2", "dinov2", "medsiglip", "conceptclip",
            "nih_dinov2", "nih_convnextv2", "ath",
        ]:
            assert expected in names

    def test_spec_fields(self):
        s = get_spec("densenet121")
        assert s.input_size == 224 and s.resize_size == 256 and s.embed_dim == 1024
        s = get_spec("medsiglip")
        assert s.input_size == 448 and s.mean == (0.5, 0.5, 0.5)
        with pytest.raises(ValueError):
            get_spec("nope")

    def test_create_model(self):
        m, spec = create_model("densenet121", embedding_dim=64)
        x = jnp.ones((1, 64, 64, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        assert out["embedding"].shape == (1, 64)
