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
    def test_train_path_is_differentiable_and_uses_fused_block(
        self, rng, monkeypatch
    ):
        """Round-3 policy: train=True routes through convnext_block_fused
        (now a custom_vjp with a Pallas tail backward) and grads flow."""
        import xmir_tpu.models.convnext as cnx_mod
        import xmir_tpu.ops.convnext_block_pallas as cbp
        from xmir_tpu.models.convnext import ConvNeXtV2Block

        blk = ConvNeXtV2Block(8)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), jnp.float32)
        v = blk.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("XMIR_FUSED_MLP", "1")
        # the tiny 8x8 test shape is below the measured win threshold;
        # force the train-path gate open to test the routing itself
        import xmir_tpu.ops.convnext_block_pallas as _cbp
        monkeypatch.setattr(_cbp, "fused_train_wins", lambda r, c, c4: True)
        calls = []

        def fused_stub(x, dwk, dwb, lns, lnb, w1, b1, w2, b2, g, be,
                       interpret=False):
            calls.append(True)  # CPU cannot compile the kernel; jnp replica
            h = cbp._dwconv(x, dwk, dwb)
            b_, hh, ww, c = x.shape
            t = cbp._tail_reference(
                h.reshape(b_, hh * ww, c), lns, lnb, w1, b1, w2, g, be
            ) + b2
            return x + t.reshape(b_, hh, ww, c).astype(x.dtype)

        monkeypatch.setattr(
            cnx_mod, "convnext_block_fused", fused_stub, raising=False
        )
        monkeypatch.setattr(cbp, "convnext_block_fused", fused_stub)

        def loss(p):
            return jnp.sum(blk.apply({"params": p}, x, train=True) ** 2)

        g = jax.grad(loss)(v["params"])
        assert calls, "train must route through the fused block"
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


class TestBlockBackwardKernel:
    def test_all_eleven_grads_match_reference_vjp(self, rng):
        """convnext_block_fused's custom_vjp (per-image Pallas tail backward,
        dwconv backward on XLA) against jax.vjp of the jnp replica, interpret
        mode: exact to f32 rounding for every input and parameter grad."""
        from xmir_tpu.ops.convnext_block_pallas import (
            _dwconv,
            _tail_reference,
            convnext_block_fused,
        )

        B, H, W, C = 2, 8, 8, 16
        C4 = 4 * C
        r = rng

        def arr(*s, scale=1.0):
            return jnp.asarray(r.standard_normal(s) * scale, jnp.float32)

        x = arr(B, H, W, C)
        args = (
            x, arr(7, 7, C, scale=0.1), arr(C, scale=0.1),
            arr(C, scale=0.2) + 1.0, arr(C, scale=0.1),
            arr(C, C4, scale=C ** -0.5), arr(C4, scale=0.1),
            arr(C4, C, scale=C4 ** -0.5), arr(C, scale=0.1),
            arr(C4, scale=0.2), arr(C4, scale=0.1),
        )

        def ref(x, dwk, dwb, lns, lnb, w1, b1, w2, b2, gamma, beta):
            h = _dwconv(x, dwk, dwb)
            b_, hh, ww, c = x.shape
            t = _tail_reference(
                h.reshape(b_, hh * ww, c), lns, lnb, w1, b1, w2, gamma, beta
            ) + b2
            return x + t.reshape(b_, hh, ww, c).astype(x.dtype)

        def loss_k(*a):
            return 0.5 * jnp.sum(
                convnext_block_fused(*a, True).astype(jnp.float32) ** 2
            )

        def loss_r(*a):
            return 0.5 * jnp.sum(ref(*a).astype(jnp.float32) ** 2)

        gk = jax.grad(loss_k, argnums=tuple(range(11)))(*args)
        gr = jax.grad(loss_r, argnums=tuple(range(11)))(*args)
        for a, b in zip(gk, gr):
            sc = float(jnp.max(jnp.abs(b))) or 1.0
            np.testing.assert_allclose(
                np.asarray(a) / sc, np.asarray(b) / sc, atol=5e-5
            )

    def test_vmem_eligibility_gate(self):
        from xmir_tpu.ops.convnext_block_pallas import _tail_bwd_eligible

        assert _tail_bwd_eligible(576, 512, 2048)    # stage 3 @ 384px
        assert _tail_bwd_eligible(2304, 256, 1024)   # stage 2
        assert _tail_bwd_eligible(144, 1024, 4096)   # stage 4
        assert not _tail_bwd_eligible(9216, 128, 512)  # stage 1: 75+ MB live
