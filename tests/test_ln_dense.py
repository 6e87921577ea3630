"""Fused LayerNorm->Dense kernels vs the XLA reference (interpret mode).

The kernels serve the plain-ViT towers' norm1->qkv and norm2->fc1->GELU
paths (ops/ln_dense_pallas.py); on-chip numerics are covered by the verify
drive and tower-parity tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmir_tpu.ops.ln_dense_pallas import (
    _ln_dense_reference,
    _ln_qkv_reference,
    ln_dense_fused,
    ln_qkv_eligible,
    ln_qkv_fused,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestLnDense:
    @pytest.mark.parametrize("act", ["", "gelu"])
    def test_matches_reference(self, rng, act):
        r, c, m = 70, 128, 256  # r deliberately not a tile multiple
        x = jnp.asarray(rng.standard_normal((r, c)), jnp.float32)
        lns = jnp.asarray(rng.standard_normal(c), jnp.float32)
        lnb = jnp.asarray(rng.standard_normal(c), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c, m)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal(m), jnp.float32)
        got = ln_dense_fused(x, lns, lnb, w, b, 1e-6, act, 32, True)
        want = _ln_dense_reference(x, lns, lnb, w, b, 1e-6, act)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_no_bias(self, rng):
        x = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)
        lns = jnp.ones(128)
        lnb = jnp.zeros(128)
        w = jnp.asarray(rng.standard_normal((128, 128)) * 0.05, jnp.float32)
        got = ln_dense_fused(x, lns, lnb, w, None, 1e-6, "", 16, True)
        want = _ln_dense_reference(x, lns, lnb, w, None, 1e-6, "")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_reference(self, rng):
        r, c, m = 24, 128, 128
        x = jnp.asarray(rng.standard_normal((r, c)), jnp.float32)
        lns = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32)
        lnb = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c, m)) * 0.05, jnp.float32)
        b = jnp.asarray(0.1 * rng.standard_normal(m), jnp.float32)

        def f_kernel(x, lns, lnb, w, b):
            return jnp.sum(ln_dense_fused(x, lns, lnb, w, b, 1e-6, "gelu", 8, True) ** 2)

        def f_ref(x, lns, lnb, w, b):
            return jnp.sum(_ln_dense_reference(x, lns, lnb, w, b, 1e-6, "gelu") ** 2)

        gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3, 4))(x, lns, lnb, w, b)
        gr = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, lns, lnb, w, b)
        for a, b_ in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4)


class TestLnQkv:
    def test_matches_reference_head_major(self, rng):
        bsz, n, c, h = 2, 70, 128, 2  # hd = 64; n not a tile multiple
        x = jnp.asarray(rng.standard_normal((bsz, n, c)), jnp.float32)
        lns = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32)
        lnb = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05, jnp.float32)
        b = jnp.asarray(0.1 * rng.standard_normal(3 * c), jnp.float32)
        q, k, v = ln_qkv_fused(x, lns, lnb, w, b, h, 1e-6, 32, True)
        qr, kr, vr = _ln_qkv_reference(x, lns, lnb, w, b, h, 1e-6)
        assert q.shape == (bsz, h, n, c // h)
        for got, want in ((q, qr), (k, kr), (v, vr)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)

    def test_no_bias_and_grads(self, rng):
        bsz, n, c, h = 1, 32, 128, 2
        x = jnp.asarray(rng.standard_normal((bsz, n, c)), jnp.float32)
        lns = jnp.ones(c)
        lnb = jnp.zeros(c)
        w = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05, jnp.float32)

        def f_kernel(x, w):
            q, k, v = ln_qkv_fused(x, lns, lnb, w, None, h, 1e-6, 16, True)
            return jnp.sum(q ** 2) + jnp.sum(k * v)

        def f_ref(x, w):
            q, k, v = _ln_qkv_reference(x, lns, lnb, w, None, h, 1e-6)
            return jnp.sum(q ** 2) + jnp.sum(k * v)

        np.testing.assert_allclose(float(f_kernel(x, w)), float(f_ref(x, w)),
                                   rtol=1e-5)
        gk = jax.grad(f_kernel, argnums=(0, 1))(x, w)
        gr = jax.grad(f_ref, argnums=(0, 1))(x, w)
        for a, b_ in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4)

    def test_analytic_bwd_all_grads_vs_reference(self, rng):
        """The round-4 analytic vjp (2 matmuls + closed-form LN chain)
        must match jax.grad of the XLA reference for every operand,
        including the LN affine params and the packed bias, on a
        non-tile-multiple sequence length."""
        bsz, n, c, h = 2, 35, 128, 2
        x = jnp.asarray(rng.standard_normal((bsz, n, c)), jnp.float32)
        lns = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32)
        lnb = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05, jnp.float32)
        b = jnp.asarray(0.1 * rng.standard_normal(3 * c), jnp.float32)

        def loss(fn):
            def f(x, lns, lnb, w, b):
                q, k, v = fn(x, lns, lnb, w, b)
                return jnp.sum(q ** 2) + jnp.sum(k * v) + jnp.sum(jnp.tanh(v))
            return f

        gk = jax.grad(loss(
            lambda *a: ln_qkv_fused(*a, h, 1e-6, 16, True)
        ), argnums=(0, 1, 2, 3, 4))(x, lns, lnb, w, b)
        gr = jax.grad(loss(
            lambda *a: _ln_qkv_reference(*a, h, 1e-6)
        ), argnums=(0, 1, 2, 3, 4))(x, lns, lnb, w, b)
        for a, b_ in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4)

    def test_eligibility(self, monkeypatch):
        assert ln_qkv_eligible(768, 64)
        # SO400M hd=72: measured negative on current libtpu — opt-in only
        monkeypatch.delenv("XMIR_FUSED_LN_QKV72", raising=False)
        assert not ln_qkv_eligible(1152, 72)
        monkeypatch.setenv("XMIR_FUSED_LN_QKV72", "1")
        assert ln_qkv_eligible(1152, 72)
        assert not ln_qkv_eligible(100, 64)


class TestViTBlockFusedBranch:
    """Wiring test: ViTBlock's fused-LN branch (LayerNormParams + ln_qkv +
    ln_dense fc1) must reproduce the default nn.LayerNorm branch with the
    SAME params — interpret-mode kernels, XLA reference attention."""

    def test_fused_branch_matches_default(self, rng, monkeypatch):
        from xmir_tpu.models import vit as vit_mod
        from xmir_tpu.ops import ln_dense_pallas as lnp
        from xmir_tpu.ops import plain_attn

        dim, heads, n, b = 128, 2, 33, 2
        block = vit_mod.ViTBlock(dim, heads, mlp_ratio=2.0)
        x = jnp.asarray(rng.standard_normal((b, n, dim)), jnp.float32)
        variables = block.init(jax.random.PRNGKey(0), x)
        ref, _ = block.apply(variables, x)

        def attn_ref(q, k, v, scale):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

        monkeypatch.setattr(lnp, "fused_ln_enabled", lambda dtype: True)
        monkeypatch.setattr(plain_attn, "plain_flash_enabled",
                            lambda dtype, n: True)
        monkeypatch.setattr(plain_attn, "flash_attention_plain", attn_ref)
        monkeypatch.setattr(
            vit_mod, "ln_qkv_fused",
            lambda x, s, bb, w, bias, h: ln_qkv_fused(
                x, s, bb, w, bias, h, 1e-6, 32, True
            ),
        )
        monkeypatch.setattr(
            vit_mod, "ln_dense_fused",
            lambda x, s, bb, w, bias, eps, act: ln_dense_fused(
                x, s, bb, w, bias, eps, act, 32, True
            ),
        )
        got, _ = block.apply(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestSiglipFusedBranch:
    """Round-5 wiring: SiglipEncoderLayer's fused LN->qkv branch at SO400M's
    head_dim=72 must reproduce the default branch with the SAME params
    (interpret-mode kernel, XLA reference attention)."""

    def test_fused_branch_matches_default_hd72(self, rng, monkeypatch):
        from xmir_tpu.models import siglip as sg
        from xmir_tpu.ops import ln_dense_pallas as lnp
        from xmir_tpu.ops import plain_attn

        dim, heads, n, b = 288, 4, 33, 2  # hd = 72
        layer = sg.SiglipEncoderLayer(dim, heads, intermediate=2 * dim)
        x = jnp.asarray(rng.standard_normal((b, n, dim)), jnp.float32)
        variables = layer.init(jax.random.PRNGKey(0), x)
        ref, _ = layer.apply(variables, x)

        def attn_ref(q, k, v, scale):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

        monkeypatch.setattr(lnp, "fused_ln_enabled", lambda dtype: True)
        monkeypatch.setattr(plain_attn, "plain_flash_enabled",
                            lambda dtype, n: True)
        monkeypatch.setattr(plain_attn, "flash_attention_plain", attn_ref)
        real_fused = lnp.ln_qkv_fused
        monkeypatch.setattr(
            lnp, "ln_qkv_fused",
            lambda x, s, bb, w, bias, h: real_fused(
                x, s, bb, w, bias, h, 1e-6, 32, True
            ),
        )
        got, _ = layer.apply(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_eligibility_so400m_opt_in(self, monkeypatch):
        monkeypatch.setenv("XMIR_FUSED_LN_QKV72", "1")
        assert ln_qkv_eligible(1152, 72)
        assert not ln_qkv_eligible(1150, 72)
