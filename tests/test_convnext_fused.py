"""Fused ConvNeXt MLP+GRN kernel parity (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmir_tpu.ops.convnext_block_pallas import convnext_mlp_grn_fused


def _reference(y, x, w1, b1, w2, b2, g, be):
    h = jnp.asarray(y, jnp.float32) @ jnp.asarray(w1, jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=True)
    gx = jnp.sqrt(jnp.sum(h * h, axis=0, keepdims=True) + 1e-12)
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    h = g * (h * nx) + be + h
    return jnp.asarray(x, jnp.float32) + h @ jnp.asarray(w2, jnp.float32) + b2


class TestConvNeXtFusedBlock:
    def test_matches_reference_f32(self, rng):
        b, r, c = 3, 64, 32
        y = jnp.asarray(rng.standard_normal((b, r, c)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((b, r, c)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((c, 4 * c)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(4 * c) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((4 * c, c)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
        g = jnp.asarray(rng.standard_normal(4 * c) * 0.1, jnp.float32)
        be = jnp.asarray(rng.standard_normal(4 * c) * 0.1, jnp.float32)
        got = convnext_mlp_grn_fused(y, x, w1, b1, w2, b2, g, be,
                                     interpret=True)
        want = np.stack([
            np.asarray(_reference(y[i], x[i], w1, b1, w2, b2, g, be))
            for i in range(b)
        ])
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_bf16_io(self, rng):
        b, r, c = 2, 64, 32
        mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, jnp.bfloat16)
        y, x = mk(b, r, c), mk(b, r, c)
        w1, w2 = mk(c, 4 * c), mk(4 * c, c)
        b1 = jnp.zeros(4 * c); b2 = jnp.zeros(c)
        g = jnp.full((4 * c,), 0.1); be = jnp.zeros(4 * c)
        got = convnext_mlp_grn_fused(y, x, w1, b1, w2, b2, g, be,
                                     interpret=True)
        assert got.dtype == jnp.bfloat16
        want = np.stack([
            np.asarray(_reference(np.asarray(y[i], np.float32),
                                  np.asarray(x[i], np.float32),
                                  np.asarray(w1, np.float32), b1,
                                  np.asarray(w2, np.float32), b2, g, be))
            for i in range(b)
        ])
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   rtol=0.05, atol=0.05)

    def test_block_fused_matches_xla_path(self, rng, monkeypatch):
        """Whole ConvNeXtV2Block through both paths (bf16, interpret)."""
        import xmir_tpu.ops.convnext_block_pallas as cbp
        from xmir_tpu.models.convnext import ConvNeXtV2Block

        blk = ConvNeXtV2Block(16)
        x32 = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
        v = blk.init(jax.random.PRNGKey(0), x32)
        vb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), v)
        xb = x32.astype(jnp.bfloat16)
        monkeypatch.setenv("XMIR_FUSED_MLP", "0")
        base = blk.apply(vb, xb)
        monkeypatch.setenv("XMIR_FUSED_MLP", "1")
        real = cbp.convnext_block_fused

        def interp(*args, **kw):
            kw["interpret"] = True
            return real(*args, **kw)

        monkeypatch.setattr(cbp, "convnext_block_fused", interp)
        fused = blk.apply(vb, xb)
        np.testing.assert_allclose(
            np.asarray(fused, np.float32), np.asarray(base, np.float32),
            rtol=0.05, atol=0.05,
        )


class TestTrainingGate:
    def test_train_path_is_differentiable_and_skips_kernel(self, rng, monkeypatch):
        """The custom kernels have no VJP: train=True must take the XLA path
        even when fused mode is force-enabled."""
        import xmir_tpu.ops.convnext_block_pallas as cbp
        from xmir_tpu.models.convnext import ConvNeXtV2Block

        blk = ConvNeXtV2Block(8)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), jnp.float32)
        v = blk.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("XMIR_FUSED_MLP", "1")

        def boom(*a, **k):
            raise AssertionError("fused kernel must not run under train=True")

        monkeypatch.setattr(cbp, "convnext_mlp_grn_fused", boom)

        def loss(p):
            return jnp.sum(blk.apply({"params": p}, x, train=True) ** 2)

        g = jax.grad(loss)(v["params"])
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))

    def test_swin_train_gate(self, rng, monkeypatch):
        """Round-3 policy: training DOES take the fused biased kernel (its
        custom_vjp backward is the Pallas kernel on TPU, the exact XLA vjp
        elsewhere); only the v1 kernel (no vjp) stays eval-only. Forced-on
        gate + v1 requested: the train path must skip v1, route through
        biased_attention_fused, and produce finite grads."""
        import xmir_tpu.models.swin as swin_mod
        import xmir_tpu.ops.vit_attn_pallas as vap
        import xmir_tpu.ops.window_attn_pallas as wap
        from xmir_tpu.models.swin import SwinV2Block

        blk = SwinV2Block(8, 2, 4, 0, 4)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
        v = blk.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("XMIR_FUSED_ATTN", "1")
        monkeypatch.setenv("XMIR_SWIN_KERNEL", "v1")

        def boom(*a, **k):
            raise AssertionError("the vjp-less v1 kernel must not run in train")

        monkeypatch.setattr(wap, "window_attention_fused", boom)
        calls = []

        def biased_stub(q, k, v_, bias, scale, g_size, cosine, interpret=False):
            calls.append(True)  # CPU cannot compile the kernel; use the ref
            return vap._biased_reference(q, k, v_, bias, scale, g_size, cosine)

        monkeypatch.setattr(
            swin_mod, "biased_attention_fused", biased_stub, raising=False
        )
        monkeypatch.setattr(vap, "biased_attention_fused", biased_stub)

        def loss(p):
            return jnp.sum(blk.apply({"params": p}, x, train=True) ** 2)

        g = jax.grad(loss)(v["params"])
        assert calls, "train must route through the biased fused path"
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))
