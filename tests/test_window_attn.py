"""Fused window-attention kernel parity vs the XLA einsum path
(interpret mode on CPU; the TPU path is exercised by bench/verify runs)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmir_tpu.ops.window_attn_pallas import window_attention_fused


def _xla_reference(qs, kn, v, bias):
    """softmax(qs @ kn^T + bias) @ v with bias (NWB, H, N, N)."""
    attn = jnp.einsum("wbhqd,wbhkd->wbhqk", qs, kn,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[:, None]
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("wbhqk,wbhkd->wbhqd", attn.astype(v.dtype), v)


class TestWindowAttentionFused:
    @pytest.mark.parametrize("nwb", ["per_window", "shared"])
    def test_matches_xla(self, rng, nwb):
        nw, b, h, n, d = 4, 2, 3, 64, 32
        qs = jnp.asarray(rng.standard_normal((nw, b, h, n, d)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((nw, b, h, n, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((nw, b, h, n, d)), jnp.float32)
        nb = nw if nwb == "per_window" else 1
        bias = jnp.asarray(rng.standard_normal((nb, h, n, n)) * 2, jnp.float32)
        got = window_attention_fused(qs, kn, v, bias, interpret=True)
        want = _xla_reference(qs, kn, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_swin_shapes(self, rng):
        # stage-4 of swin at 384: one 12x12 window, 32 heads, hd 32
        nw, b, h, n, d = 1, 2, 4, 144, 32
        qs = jnp.asarray(rng.standard_normal((nw, b, h, n, d)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((nw, b, h, n, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((nw, b, h, n, d)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((1, h, n, n)), jnp.float32)
        got = window_attention_fused(qs, kn, v, bias, interpret=True)
        want = _xla_reference(qs, kn, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_bf16_inputs(self, rng):
        nw, b, h, n, d = 2, 1, 2, 64, 32
        mk = lambda: jnp.asarray(rng.standard_normal((nw, b, h, n, d)),
                                 jnp.bfloat16)
        qs, kn, v = mk(), mk(), mk()
        bias = jnp.asarray(rng.standard_normal((nw, h, n, n)), jnp.float32)
        got = window_attention_fused(qs, kn, v, bias, interpret=True)
        want = _xla_reference(qs, kn, v, bias)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0.05, atol=0.05,
        )

    def test_model_fused_matches_xla_path(self, rng, monkeypatch):
        """Whole SwinV2 block through the v1 (per-window-head) fused kernel
        vs the XLA path (interpret on CPU via the env flag + monkeypatched
        interpret default)."""
        import xmir_tpu.ops.window_attn_pallas as wap
        from xmir_tpu.models import SwinV2Backbone

        m = SwinV2Backbone(embed_dim=16, depths=(1, 1), num_heads=(2, 4),
                           window=4, pretrained_window=(4, 4))
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        base = m.apply(v, x)["pooled"]

        monkeypatch.setenv("XMIR_FUSED_ATTN", "1")
        monkeypatch.setenv("XMIR_SWIN_KERNEL", "v1")
        real_fused = wap.window_attention_fused

        def interp_fused(qs, kn, vv, bias, interpret=False):
            return real_fused(qs, kn, vv, bias, interpret=True)

        monkeypatch.setattr(wap, "window_attention_fused", interp_fused)
        fused = m.apply(v, x)["pooled"]
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                                   rtol=1e-4, atol=1e-5)

    def test_model_grouped_bias_kernel_matches_xla_path(self, rng, monkeypatch):
        """Whole SwinV2 model through the round-2 grouped-bias single-pass
        kernel (the default fused path) vs the XLA path — depths (2, 1)
        so a shifted block exercises the masked (head, window) grouping."""
        import xmir_tpu.models.swin as swin_mod
        import xmir_tpu.ops.vit_attn_pallas as vap
        from xmir_tpu.models import SwinV2Backbone

        m = SwinV2Backbone(embed_dim=16, depths=(2, 1), num_heads=(2, 4),
                           window=4, pretrained_window=(4, 4))
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        base = m.apply(v, x)["pooled"]

        monkeypatch.setenv("XMIR_FUSED_ATTN", "1")
        real = vap.biased_attention_fused

        def interp(q, k, vv, bias, scale, g_size=1, cosine=False, interpret=False):
            return real(q, k, vv, bias, scale, g_size, cosine, True)

        monkeypatch.setattr(swin_mod, "biased_attention_fused", interp,
                            raising=False)
        import xmir_tpu.ops.vit_attn_pallas as _v
        monkeypatch.setattr(_v, "biased_attention_fused", interp)
        fused = m.apply(v, x)["pooled"]
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                                   rtol=1e-4, atol=1e-5)


class TestPlainFlashGating:
    """flash_attention_plain runs only where it wins (TPU, bf16 — the
    single-pass kernel handles every sequence length, ragged DINOv2 1370
    included); numerics are checked on real TPU in the verify drive
    (max |diff| ~2e-3 at bf16)."""

    def test_disabled_on_cpu(self, monkeypatch):
        from xmir_tpu.ops.plain_attn import plain_flash_enabled

        monkeypatch.delenv("XMIR_FLASH_ATTN", raising=False)
        assert not plain_flash_enabled(jnp.bfloat16, 1024)

    def test_env_force(self, monkeypatch):
        from xmir_tpu.ops.plain_attn import plain_flash_enabled

        monkeypatch.setenv("XMIR_FLASH_ATTN", "1")
        assert plain_flash_enabled(jnp.float32, 1370)
        monkeypatch.setenv("XMIR_FLASH_ATTN", "0")
        assert not plain_flash_enabled(jnp.bfloat16, 1024)

    def test_enabled_for_all_lengths_on_tpu_bf16(self, monkeypatch):
        from xmir_tpu.ops import plain_attn

        # immune to ambient env (e.g. a prior dryrun_multichip in the same
        # process): the gate must hold on its defaults, not inherited state
        monkeypatch.delenv("XMIR_FLASH_ATTN", raising=False)
        monkeypatch.setattr(
            plain_attn.jax, "default_backend", lambda: "tpu"
        )
        assert plain_attn.plain_flash_enabled(jnp.bfloat16, 1024)
        assert plain_attn.plain_flash_enabled(jnp.bfloat16, 729)
        assert plain_attn.plain_flash_enabled(jnp.bfloat16, 1370)
        # f32 keeps the XLA einsum path for converted-checkpoint parity
        assert not plain_attn.plain_flash_enabled(jnp.float32, 1024)

    def test_vmem_ceiling_blocks_oversized_sequences(self, monkeypatch):
        # beyond ~12k keys the f32 score tiles cannot fit scoped VMEM even
        # at batch fold 1 — the gate must refuse rather than fail compile,
        # including under the env force
        from xmir_tpu.ops import plain_attn

        monkeypatch.delenv("XMIR_FLASH_ATTN", raising=False)
        monkeypatch.setattr(plain_attn.jax, "default_backend", lambda: "tpu")
        assert not plain_attn.plain_flash_enabled(jnp.bfloat16, 20000)
        monkeypatch.setenv("XMIR_FLASH_ATTN", "1")
        assert not plain_attn.plain_flash_enabled(jnp.bfloat16, 20000)


class TestDtypeGate:
    def test_f32_keeps_xla_path_on_tpu(self, monkeypatch):
        """f32 compute keeps the XLA path (checkpoint parity): the MXU's
        bf16-pass decomposition inside the kernel drifts ~3e-2 from the XLA
        einsum on the scale-21 cosine softmax (measured on v5e)."""
        from xmir_tpu.ops import window_attn_pallas as wap

        monkeypatch.delenv("XMIR_FUSED_ATTN", raising=False)
        monkeypatch.setattr(wap.jax, "default_backend", lambda: "tpu")
        assert wap.fused_attention_enabled(jnp.bfloat16)
        assert not wap.fused_attention_enabled(jnp.float32)
        assert wap.fused_attention_enabled()  # dtype-less: backend only
        monkeypatch.setenv("XMIR_FUSED_ATTN", "0")
        assert not wap.fused_attention_enabled(jnp.bfloat16)
        monkeypatch.setenv("XMIR_FUSED_ATTN", "1")
        assert wap.fused_attention_enabled(jnp.float32)  # forced: tests
