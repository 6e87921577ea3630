"""XAI engine tests: mask generation parity, SBSM localization, SimAtt/SimCAM
shapes + sanity, rollout math vs hand-computed reference, causal metric
semantics vs a step-by-step numpy oracle."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmir_tpu.xai import (
    attention_rollout,
    causal_scores,
    generate_masks,
    get_feature_head,
    rollout_saliency,
    run_causal_metric,
    saliency_rank,
    sbsm_pair_saliency,
    sbsm_self_saliency,
    simatt_saliency,
    simcam_maps,
    zeros_substrate,
)
from xmir_tpu.metrics.saliency import auc
from xmir_tpu.ops.blur import gaussian_blur, gkern


def toy_embed_fn(variables, images):
    """Embedding = spatially-weighted channel means; sensitive to a bright
    corner patch so occlusion there changes the embedding."""
    x = images.astype(jnp.float32)
    b = x.shape[0]
    h, w = x.shape[1], x.shape[2]
    yy = jnp.linspace(0, 1, h)[None, :, None, None]
    xx = jnp.linspace(0, 1, w)[None, None, :, None]
    feats = jnp.concatenate(
        [
            jnp.mean(x, axis=(1, 2)),
            jnp.mean(x * yy, axis=(1, 2)),
            jnp.mean(x * xx, axis=(1, 2)),
        ],
        axis=1,
    )
    return feats / jnp.maximum(jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12)


class TestMasks:
    def test_reference_mask_grid(self):
        masks = generate_masks(224, window_size=24, stride=5)
        # reference grid: rows = arange(5-24, 224, 5) -> len 49 -> 49*49 masks
        assert masks.shape == (49 * 49, 224, 224)
        assert masks.dtype == np.uint8
        assert set(np.unique(masks)) == {0, 1}

    def test_every_pixel_covered(self):
        masks = generate_masks(32, window_size=8, stride=4)
        coverage = (1 - masks).sum(0)
        assert coverage.min() >= 1  # every pixel occluded at least once


class TestSBSM:
    def test_self_saliency_localizes(self):
        # image with a single bright patch: occluding it changes the embedding
        # most, so saliency should peak inside the patch
        img = np.zeros((1, 32, 32, 3), np.float32)
        img[0, 20:28, 4:12, :] = 5.0
        masks = jnp.asarray(generate_masks(32, 8, 4))
        sal = sbsm_self_saliency(toy_embed_fn, {}, jnp.asarray(img), masks, chunk=32)
        sal = np.asarray(sal)[0]
        peak = np.unravel_index(sal.argmax(), sal.shape)
        assert 16 <= peak[0] <= 31 and 0 <= peak[1] <= 15

    def test_pair_saliency_shape_and_nonneg(self):
        rng = np.random.default_rng(0)
        xq = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
        xr = jnp.asarray(rng.random((3, 32, 32, 3)), jnp.float32)
        masks = jnp.asarray(generate_masks(32, 8, 4))
        sal = sbsm_pair_saliency(toy_embed_fn, {}, xq, xr, masks, chunk=32)
        assert sal.shape == (2, 3, 32, 32)
        assert float(jnp.min(sal)) >= 0.0


class TestSimAtt:
    @pytest.mark.slow
    def test_densenet_head_and_saliency(self):
        from xmir_tpu.models import DenseNet121Embedder

        model = DenseNet121Embedder(embedding_dim=16)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((3, 64, 64, 3)), jnp.float32
        )
        variables = model.init(jax.random.PRNGKey(0), x)

        def features_fn(xs):
            return model.apply(variables, xs)["features"]

        head_fn = get_feature_head("densenet121", variables["params"])
        # consistency: head(features) == model embedding
        out = model.apply(variables, x)
        emb_head = head_fn(features_fn(x))
        np.testing.assert_allclose(
            np.asarray(emb_head), np.asarray(out["embedding"]), atol=1e-5
        )
        sal = simatt_saliency(features_fn, head_fn, x, n_pos=1)
        assert sal.shape == (3, 64, 64)
        assert float(jnp.min(sal)) >= 0.0
        assert np.isfinite(np.asarray(sal)).all()


class TestSimCAM:
    def test_maps_localize_matching_region(self):
        rng = np.random.default_rng(0)
        h = w = c = 4
        q = np.zeros((h, w, c), np.float32)
        r = np.zeros((1, h, w, c), np.float32)
        # matching signal: q at (0,0) and r at (3,3) share a channel pattern
        q[0, 0] = [10, 0, 0, 0]
        r[0, 3, 3] = [10, 0, 0, 0]
        maps = simcam_maps(jnp.asarray(q), jnp.asarray(r), out_hw=(8, 8))
        maps = np.asarray(maps)
        assert maps.shape == (1, 2, 8, 8)
        qmap, rmap = maps[0]
        assert np.unravel_index(qmap.argmax(), qmap.shape) == (0, 0)
        assert np.unravel_index(rmap.argmax(), rmap.shape) == (7, 7)


class TestRollout:
    def test_uniform_attention_rollout_oracle(self):
        # uniform attention + residual: a = (J/n + I)/2; rollout = a @ a
        b, heads, n = 1, 2, 4
        attn = jnp.ones((b, heads, n, n)) / n
        r = attention_rollout([attn, attn], discard_ratio=0.0)
        a = (np.full((n, n), 1 / n) + np.eye(n)) / 2.0
        np.testing.assert_allclose(np.asarray(r)[0], a @ a, atol=1e-6)

    def test_hand_computed_single_layer(self):
        n = 2
        a = jnp.asarray([[[[0.8, 0.2], [0.4, 0.6]]]])  # (1, 1, 2, 2)
        r = attention_rollout([a], discard_ratio=0.0)
        expected = (np.asarray(a)[0, 0] + np.eye(2))
        expected = expected / expected.sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(r)[0], expected, atol=1e-6)

    def test_discard_ratio_sparsifies(self):
        rng = np.random.default_rng(0)
        a = jax.nn.softmax(jnp.asarray(rng.standard_normal((1, 2, 16, 16))), -1)
        dense = attention_rollout([a], discard_ratio=0.0)
        sparse = attention_rollout([a], discard_ratio=0.9)
        assert not np.allclose(np.asarray(dense), np.asarray(sparse))

    def test_rollout_saliency_shapes_and_guidance(self):
        rng = np.random.default_rng(0)
        attn = jax.nn.softmax(jnp.asarray(rng.standard_normal((2, 2, 16, 16))), -1)
        sal = rollout_saliency([attn], (32, 32))
        assert sal.shape == (2, 32, 32)
        q = jnp.asarray(rng.standard_normal(8), jnp.float32)
        patches = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.float32)
        sal_g = rollout_saliency([attn], (32, 32), query_embedding=q, patch_embeddings=patches)
        assert not np.allclose(np.asarray(sal), np.asarray(sal_g))


class TestCausal:
    def test_saliency_rank_tie_semantics(self):
        # ties: higher flat index ranks first (reference flip-of-argsort)
        exp = jnp.asarray([[1.0, 2.0], [2.0, 0.0]])
        ranks = np.asarray(saliency_rank(exp))
        # values flat: [1, 2, 2, 0]; order desc with tie->higher index first:
        # idx2 (2.0), idx1 (2.0), idx0 (1.0), idx3 (0.0)
        assert ranks[2] == 0 and ranks[1] == 1 and ranks[0] == 2 and ranks[3] == 3

    def test_scores_match_numpy_oracle(self):
        rng = np.random.default_rng(0)
        h = w = 8
        img = rng.random((h, w, 3)).astype(np.float32)
        sal = rng.random((h, w)).astype(np.float32)
        step = 16
        q_img = rng.random((h, w, 3)).astype(np.float32)

        # numpy oracle: reference-style in-place deletion loop
        def np_embed(x):
            return np.asarray(toy_embed_fn({}, jnp.asarray(x)))

        q_feat = np_embed(q_img[None])[0]
        order = np.argsort(sal.reshape(-1), kind="stable")[::-1]
        start = img.copy().reshape(-1, 3)
        finish = np.zeros_like(start)
        hw = h * w
        n_steps = -(-hw // step)
        expected = []
        for i in range(n_steps + 1):
            e = np_embed(start.reshape(1, h, w, 3))[0]
            expected.append(float(np.dot(e, q_feat)))
            if i < n_steps:
                coords = order[step * i : step * (i + 1)]
                start[coords] = finish[coords]

        ranks = saliency_rank(jnp.asarray(sal))
        got = np.asarray(
            causal_scores(
                toy_embed_fn, {}, jnp.asarray(q_feat), jnp.asarray(img),
                jnp.zeros((h, w, 3)), ranks, step, batch_steps=4,
            )
        )
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_run_causal_metric_del_and_ins(self):
        rng = np.random.default_rng(1)
        img = rng.random((8, 8, 3)).astype(np.float32)
        qimg = img.copy()
        sal = rng.random((8, 8)).astype(np.float32)
        a_del, z_del, s_del = run_causal_metric(
            toy_embed_fn, {}, jnp.asarray(qimg), jnp.asarray(img), sal,
            "del", zeros_substrate, step=16, batch_steps=4,
        )
        assert s_del[0] == pytest.approx(1.0, abs=1e-5)  # identical pair
        assert 0.0 <= a_del <= 1.0
        a_ins, _, s_ins = run_causal_metric(
            toy_embed_fn, {}, jnp.asarray(qimg), jnp.asarray(img), sal,
            "ins", zeros_substrate, step=16, batch_steps=4,
        )
        assert s_ins[-1] == pytest.approx(1.0, abs=1e-5)  # fully restored

    def test_auc_trapezoid(self):
        assert auc(np.linspace(0, 1, 5)) == pytest.approx(0.5)


class TestBlur:
    def test_gkern_normalized(self):
        k = gkern(51)
        assert k.shape == (51, 51)
        assert k.sum() == pytest.approx(1.0, abs=1e-3)

    def test_blur_preserves_mean(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        blurred = gaussian_blur(img, 21, 3.0)
        assert blurred.shape == img.shape
        # interior mean approximately preserved
        assert float(jnp.mean(blurred[:, 20:44, 20:44])) == pytest.approx(
            float(jnp.mean(img[:, 20:44, 20:44])), abs=0.05
        )


class TestVariants:
    def _features_fn(self):
        def f(x):
            # fake conv features: 2x2 pooled patches, 4 channels
            b, h, w, c = x.shape
            ph, pw = h // 2, w // 2
            patches = x.reshape(b, 2, ph, 2, pw, c).mean((2, 4))  # (b,2,2,c)
            extra = jnp.concatenate([patches, patches[..., :1] * 0.5], -1)
            return extra
        return f

    def test_transform_query_modes(self, rng):
        from xmir_tpu.xai import transform_query

        x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
        m = jnp.zeros((1, 16, 16)).at[:, :8].set(1.0)
        masked = transform_query(x, m, "mask")
        assert float(jnp.abs(masked[0, 12:]).sum()) == 0.0
        blurred = transform_query(x, m, "blur", sigma=2.0)
        assert not np.allclose(np.asarray(blurred[0, 12:]), 0.0)
        np.testing.assert_allclose(
            np.asarray(blurred[0, :8]), np.asarray(x[0, :8]), atol=1e-5
        )
        with pytest.raises(ValueError):
            transform_query(x, m, "nope")

    def test_sbsm_masked_query(self, rng):
        from xmir_tpu.xai import sbsm_masked_query_saliency

        x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        masks = jnp.asarray(generate_masks(32, 8, 8))
        region = jnp.ones((1, 32, 32))
        sal = sbsm_masked_query_saliency(
            toy_embed_fn, {}, x, x, masks, region, chunk=16
        )
        assert sal.shape == (32, 32)
        assert float(jnp.min(sal)) >= 0.0

    def test_fsal_probability_drop(self, rng):
        from xmir_tpu.xai import ProbeClassifier, fsal_saliency

        # embeddings where the first feature decides class (toy_embed_fn is 9-d)
        pos = rng.random((20, 9)).astype(np.float64)
        pos[:, 0] += 1.0
        neg = rng.random((20, 9)).astype(np.float64)
        probe = ProbeClassifier("logistic_reg").fit(pos, neg)
        img = np.zeros((1, 32, 32, 3), np.float32)
        img[0, 20:28, 4:12, :] = 5.0
        masks = jnp.asarray(generate_masks(32, 8, 4))
        sal = fsal_saliency(toy_embed_fn, {}, jnp.asarray(img), masks, probe, chunk=32)
        assert sal.shape == (1, 32, 32)
        assert np.isfinite(sal).all() and sal.min() >= 0.0

    def test_fsal_grad(self, rng):
        from xmir_tpu.xai import ProbeClassifier, fsal_grad_saliency

        pos = rng.random((20, 5)) + 1.0
        neg = rng.random((20, 5))
        probe = ProbeClassifier("logistic_reg").fit(pos, neg)
        f_fn = self._features_fn()

        def head_fn(feats):
            return jnp.mean(feats, axis=(1, 2))  # (b, 5)

        x = jnp.asarray(rng.random((2, 8, 8, 4)), jnp.float32)
        sal = fsal_grad_saliency(f_fn, head_fn, probe, x)
        assert sal.shape == (2, 8, 8)
        assert float(jnp.min(sal)) >= 0.0

    def test_sim_score_cam(self, rng):
        from xmir_tpu.xai import sim_score_cam

        f_fn = self._features_fn()
        xq = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
        xr = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
        sal = sim_score_cam(toy_embed_fn, {}, f_fn, xq, xr, chunk=2)
        assert sal.shape == (16, 16)
        assert np.isfinite(np.asarray(sal)).all()

    def test_sbsm_feature_space(self, rng):
        from xmir_tpu.xai import sbsm_feature_saliency

        f_fn = self._features_fn()
        xq = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
        xr = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
        masks = jnp.asarray(generate_masks(16, 4, 4))
        sal = sbsm_feature_saliency(toy_embed_fn, {}, f_fn, xq, xr, masks)
        assert sal.shape == (16, 16)
        assert float(jnp.min(sal)) >= 0.0


class TestBatchedCausal:
    def test_matches_single_pair(self, rng):
        from xmir_tpu.xai import run_causal_metric, run_causal_metric_pairs

        h = w = 8
        q = rng.random((h, w, 3)).astype(np.float32)
        imgs = rng.random((3, h, w, 3)).astype(np.float32)
        sals = rng.random((3, h, w)).astype(np.float32)
        batch = run_causal_metric_pairs(
            toy_embed_fn, {}, jnp.asarray(q), jnp.asarray(imgs), sals,
            "del", zeros_substrate, step=16, batch_steps=2,
        )
        for p in range(3):
            a_single, z_single, _ = run_causal_metric(
                toy_embed_fn, {}, jnp.asarray(q), jnp.asarray(imgs[p]),
                sals[p], "del", zeros_substrate, step=16, batch_steps=4,
            )
            assert batch[p][0] == pytest.approx(a_single, abs=1e-5)
            assert batch[p][1] == z_single


class TestConceptXAI:
    """Patch-concept explanations (reference xai_conceptclip.py:151-353)."""

    def _embeds(self, rng):
        # 4 orthogonal concepts, 8 patches: patches 0-3 aligned to concept 2
        concepts = np.eye(4, 16, dtype=np.float32)
        patches = rng.standard_normal((8, 16)).astype(np.float32) * 0.05
        patches[:4] += concepts[2] * 2.0
        patches[6] += concepts[0] * 1.2
        return patches, concepts

    def test_attention_and_topk(self, rng):
        from xmir_tpu.xai.conceptxai import patch_concept_attention

        patches, concepts = self._embeds(rng)
        att, top, scores = patch_concept_attention(patches, concepts, top_k=2)
        assert att.shape == (8, 4)
        assert top[0] == 2 and top[1] == 0
        assert scores[0] > scores[1] > 0.5
        # cosine attention: normalized inputs -> bounded scores
        assert np.all(att <= 1.0 + 1e-6)

    def test_batched_attention_matches_loop(self, rng):
        from xmir_tpu.xai.conceptxai import patch_concept_attention

        batch = rng.standard_normal((3, 8, 16)).astype(np.float32)
        concepts = rng.standard_normal((5, 16)).astype(np.float32)
        att_b, top_b, sc_b = patch_concept_attention(batch, concepts, top_k=3)
        for i in range(3):
            att_i, top_i, sc_i = patch_concept_attention(batch[i], concepts, 3)
            np.testing.assert_allclose(att_b[i], att_i, rtol=1e-6)
            np.testing.assert_array_equal(top_b[i], top_i)

    def test_grid_detection(self):
        from xmir_tpu.xai.conceptxai import detect_patch_grid

        assert detect_patch_grid(16) == (4, 4)
        assert detect_patch_grid(12) == (3, 4)
        assert detect_patch_grid(8) == (2, 4)
        assert detect_patch_grid(729) == (27, 27)

    def test_heatmap_peak_localization(self):
        from xmir_tpu.xai.conceptxai import attention_heatmap

        v = np.zeros(16, np.float32)
        v[5] = 1.0  # grid (4,4): row 1, col 1
        hm = attention_heatmap(v, image_size=64)
        assert hm.shape == (64, 64)
        y, x = np.unravel_index(hm.argmax(), hm.shape)
        assert 16 <= y < 32 and 16 <= x < 32

    def test_explain_and_text(self, rng):
        from xmir_tpu.xai.conceptxai import explain_retrieval, text_explanation

        patches, concepts = self._embeds(rng)
        retrieved = np.stack([patches, rng.standard_normal((8, 16)).astype(np.float32)])
        names = ["aort", "atel", "calc", "cardio"]
        exp = explain_retrieval(
            patches, retrieved, concepts, names, [0.9, 0.3],
            ["r0", "r1"], query_id="q", top_k_concepts=2,
        )
        assert exp["query_top_concepts"][0]["name"] == "calc"
        assert "calc" in exp["retrieved"][0]["shared_findings"]
        assert exp["retrieved"][0]["similarity"] == 0.9
        report = text_explanation(exp)
        assert "q" in report and "calc" in report and "0.9000" in report

    def test_render_writes_png(self, rng, tmp_path):
        from xmir_tpu.xai.conceptxai import explain_retrieval, render_retrieval_explanation

        patches, concepts = self._embeds(rng)
        exp = explain_retrieval(
            patches, patches[None], concepts, ["a", "b", "c", "d"], [0.5],
            ["r0"], top_k_concepts=2,
        )
        img = (rng.random((32, 32)) * 255).astype(np.uint8)
        out = render_retrieval_explanation(exp, img, [img], str(tmp_path / "x.png"))
        import os
        assert os.path.getsize(out) > 1000


class TestGradCAMSimilarity:
    """Grad-CAM of cosine similarity on ViT tokens
    (reference medsiglip_saliency.py:51-131), via the token_delta tap."""

    def _tiny_vit(self):
        import flax.linen as nn
        from xmir_tpu.models.siglip import SiglipVisionBackbone
        from xmir_tpu.losses.metric_losses import l2_normalize

        class M(nn.Module):
            @nn.compact
            def __call__(self, x, train=False, token_delta=None):
                out = SiglipVisionBackbone(
                    img_size=28, patch_size=14, dim=32, depth=2, num_heads=4,
                    intermediate=64, name="backbone",
                )(x, train, token_delta=token_delta)
                emb = nn.Dense(16, name="proj")(out["pooled"])
                return {"embedding": l2_normalize(emb, axis=1),
                        "encoder_tokens": out["encoder_tokens"]}

        return M()

    def test_token_delta_zero_is_identity(self, rng):
        import jax
        model = self._tiny_vit()
        x = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x)
        base = model.apply(v, x)["embedding"]
        tok = model.apply(v, x)["encoder_tokens"]
        tapped = model.apply(v, x, token_delta=jnp.zeros_like(tok))["embedding"]
        np.testing.assert_allclose(np.asarray(base), np.asarray(tapped), atol=1e-6)

    def test_gradcam_shape_range_and_signal(self, rng):
        import jax
        from xmir_tpu.xai import make_vit_gradcam_fn, vit_gradcam_similarity

        model = self._tiny_vit()
        x = jnp.asarray(rng.standard_normal((3, 28, 28, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x)
        q_emb = model.apply(v, x[:1])["embedding"][0]
        maps = vit_gradcam_similarity(
            make_vit_gradcam_fn(model), v, q_emb, x, out_hw=(28, 28)
        )
        maps = np.asarray(maps)
        assert maps.shape == (3, 28, 28)
        assert maps.min() >= 0.0 and maps.max() <= 1.0 + 1e-6
        assert maps.max() > 0.0  # gradient actually flowed through the tap

    def test_gradient_matches_finite_difference(self, rng):
        """The tap gradient must equal d(sim)/d(last-layer tokens)."""
        import jax
        model = self._tiny_vit()
        x = jnp.asarray(rng.standard_normal((1, 28, 28, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x)
        q = model.apply(v, x)["embedding"][0]
        tok = model.apply(v, x)["encoder_tokens"]

        def sim(delta):
            out = model.apply(v, x, token_delta=delta)
            return jnp.sum(out["embedding"][0] * q)

        g = jax.grad(sim)(jnp.zeros_like(tok))
        eps = 1e-3
        d = np.zeros(np.asarray(tok).shape, np.float32)
        d[0, 2, 5] = eps
        fd = (float(sim(jnp.asarray(d))) - float(sim(jnp.asarray(-d)))) / (2 * eps)
        assert fd == pytest.approx(float(np.asarray(g)[0, 2, 5]), abs=1e-3)


class TestMeshXAI:
    """Multi-device XAI fan-out (VERDICT r4 #1): the mesh-sharded SBSM mask
    axis and ins/del pair axis must reproduce the single-device results on
    the 8-device CPU mesh (fp-tolerant: psum reassociates the mask sum)."""

    def _mesh(self):
        from xmir_tpu.parallel import make_mesh

        return make_mesh((8,), axis_names=("data",))

    def test_sbsm_self_mesh_matches_single_device(self):
        from xmir_tpu.xai import sbsm_self_saliency_mesh

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((3, 32, 32, 3)), jnp.float32)
        masks = jnp.asarray(generate_masks(32, 8, 4))  # 49 masks: pads to 56
        ref = np.asarray(sbsm_self_saliency(toy_embed_fn, {}, x, masks, chunk=32))
        got = np.asarray(
            sbsm_self_saliency_mesh(toy_embed_fn, {}, x, masks, self._mesh(), chunk=32)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_sbsm_pair_mesh_matches_single_device(self):
        from xmir_tpu.xai import sbsm_pair_saliency_mesh

        rng = np.random.default_rng(1)
        xq = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
        xr = jnp.asarray(rng.random((3, 32, 32, 3)), jnp.float32)
        masks = jnp.asarray(generate_masks(32, 8, 4))
        ref = np.asarray(
            sbsm_pair_saliency(toy_embed_fn, {}, xq, xr, masks, chunk=32)
        )
        got = np.asarray(
            sbsm_pair_saliency_mesh(
                toy_embed_fn, {}, xq, xr, masks, self._mesh(), chunk=32
            )
        )
        assert got.shape == (2, 3, 32, 32)
        # (m_dist - o_dist)+ clamps near zero, so chunk-order fp noise in the
        # embeds shifts the tiny excesses by ~1e-6 absolute
        np.testing.assert_allclose(got, ref, rtol=5e-3, atol=1e-5)

    def test_causal_pairs_mesh_matches_single_device(self):
        from xmir_tpu.xai import causal_scores_batch, causal_scores_batch_mesh

        rng = np.random.default_rng(2)
        p, h, w = 5, 8, 8  # 5 pairs pad to 8 over the mesh
        starts = jnp.asarray(rng.random((p, h, w, 3)), jnp.float32)
        finishes = jnp.zeros_like(starts)
        sal = rng.random((p, h * w)).astype(np.float32)
        ranks = jnp.stack([saliency_rank(jnp.asarray(s)) for s in sal])
        q_feat = toy_embed_fn({}, starts[:1])[0]
        ref = np.asarray(
            causal_scores_batch(
                toy_embed_fn, {}, q_feat, starts, finishes, ranks, 16,
                batch_steps=4,
            )
        )
        got = np.asarray(
            causal_scores_batch_mesh(
                toy_embed_fn, {}, q_feat, starts, finishes, ranks, 16,
                self._mesh(), batch_steps=4,
            )
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_run_causal_metric_pairs_mesh_auc_equal(self):
        from xmir_tpu.xai import run_causal_metric_pairs

        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.random((8, 8, 3)), jnp.float32)
        r_imgs = jnp.asarray(rng.random((3, 8, 8, 3)), jnp.float32)
        sals = [rng.random((8, 8)).astype(np.float32) for _ in range(3)]
        ref = run_causal_metric_pairs(
            toy_embed_fn, {}, q, r_imgs, sals, "del", zeros_substrate,
            step=16, batch_steps=4,
        )
        got = run_causal_metric_pairs(
            toy_embed_fn, {}, q, r_imgs, sals, "del", zeros_substrate,
            step=16, batch_steps=4, mesh=self._mesh(),
        )
        for (a0, z0), (a1, z1) in zip(ref, got):
            assert a1 == pytest.approx(a0, abs=1e-6)
            assert z0 == z1


class TestCausalBoth:
    """Combined del+ins batching (VERDICT r4 #3): one 2P-pair computation
    must reproduce two single-mode runs exactly, and the auto-tuned
    batch_steps must cover all steps with bounded padding."""

    def test_both_matches_two_single_mode_runs(self):
        from xmir_tpu.xai import (
            run_causal_metric_pairs,
            run_causal_metric_pairs_both,
        )
        from xmir_tpu.xai.variants import gaussian_blur_normed  # noqa: F401

        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.random((8, 8, 3)), jnp.float32)
        r_imgs = jnp.asarray(rng.random((3, 8, 8, 3)), jnp.float32)
        sals = [rng.random((8, 8)).astype(np.float32) for _ in range(3)]

        def blurish(imgs):  # any substrate; zeros vs non-zeros both covered
            return imgs * 0.25

        d_ref = run_causal_metric_pairs(
            toy_embed_fn, {}, q, r_imgs, sals, "del", zeros_substrate, step=16
        )
        i_ref = run_causal_metric_pairs(
            toy_embed_fn, {}, q, r_imgs, sals, "ins", blurish, step=16
        )
        d_got, i_got = run_causal_metric_pairs_both(
            toy_embed_fn, {}, q, r_imgs, sals, zeros_substrate, blurish, step=16
        )
        for ref, got in ((d_ref, d_got), (i_ref, i_got)):
            assert len(ref) == len(got) == 3
            for (a0, z0), (a1, z1) in zip(ref, got):
                assert a1 == pytest.approx(a0, abs=1e-6)
                assert z0 == z1

    def test_both_on_mesh_matches(self):
        from xmir_tpu.parallel import make_mesh
        from xmir_tpu.xai import run_causal_metric_pairs_both

        rng = np.random.default_rng(6)
        q = jnp.asarray(rng.random((8, 8, 3)), jnp.float32)
        r_imgs = jnp.asarray(rng.random((3, 8, 8, 3)), jnp.float32)
        sals = [rng.random((8, 8)).astype(np.float32) for _ in range(3)]
        ref = run_causal_metric_pairs_both(
            toy_embed_fn, {}, q, r_imgs, sals, zeros_substrate,
            zeros_substrate, step=16,
        )
        got = run_causal_metric_pairs_both(
            toy_embed_fn, {}, q, r_imgs, sals, zeros_substrate,
            zeros_substrate, step=16,
            mesh=make_mesh((8,), axis_names=("data",)),
        )
        for r_list, g_list in zip(ref, got):
            for (a0, z0), (a1, z1) in zip(r_list, g_list):
                assert a1 == pytest.approx(a0, abs=1e-6)
                assert z0 == z1

    def test_auto_batch_steps_covers_all_steps(self):
        from xmir_tpu.xai import auto_batch_steps

        for hw, step, p in [(224 * 224, 1000, 5), (224 * 224, 1000, 10),
                            (224 * 224, 224, 8), (64, 16, 3), (48 * 48, 6272, 4)]:
            n_slots = -(-hw // step) + 1
            bs = auto_batch_steps(hw, step, p)
            assert bs >= 1
            k = -(-n_slots // bs)
            assert k * bs >= n_slots            # covers every step
            assert k * bs - n_slots < bs        # waste < one chunk
            # bounded forward batch (max_batch; k=n_slots always admissible)
            assert bs * p <= max(512, p)
