"""Tie-exact evaluation precision (VERDICT r4 #2).

The reference scores in true f32 (test.py:1080 torch.cdist; Milvus COSINE),
while TPU DEFAULT matmul precision rounds f32 inputs to bf16 on the MXU —
near-ties closer than ~2^-8 relative can reorder, and rank-sensitive metrics
(mAP, R@K) must not depend on which near-ties the hardware rounds. These
tests pin the production wiring:
  - metrics/retrieval.py (N, N) eval matrices carry precision=HIGHEST by
    default (XMIR_EVAL_PRECISION), even under an ambient low-precision
    default — the near-tie fixture demonstrably flips under emulated
    bf16-rounded scoring and holds under the wired path;
  - ops/topk.py tiled_topk + the eval CLIs thread XMIR_TOPK_PRECISION
    (cli/common.py apply_score_precision, default 'highest' for eval).
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _near_tie_embeds(rng, n_ties: int = 8, dim: int = 256):
    """Rows 1..n_ties sit at radii (1 + 2e-4*j)/2 from row 0: spacing ~1e-4
    relative — far above f32 eps, well inside the bf16 ~2^-8 reorder band."""
    e = rng.standard_normal((n_ties + 8, dim)).astype(np.float32)
    q = e[0] / np.linalg.norm(e[0])
    for j in range(1, n_ties + 1):
        u = rng.standard_normal(dim).astype(np.float32)
        u -= (u @ q) * q
        u /= np.linalg.norm(u)
        e[j] = q + 0.5 * (1 + 2e-4 * j) * u
    e[0] = q
    return e


class TestEvalMatrixPrecision:
    def test_near_ties_rank_exactly_and_flip_under_bf16(self, rng):
        from xmir_tpu.metrics.retrieval import pairwise_neg_l2

        e = _near_tie_embeds(rng)
        d64 = -np.sqrt(np.maximum(
            ((e[None, :, :].astype(np.float64)
              - e[:, None, :].astype(np.float64)) ** 2).sum(-1), 0.0,
        ))
        want = np.argsort(-d64[0][1:9], kind="stable")
        assert np.array_equal(want, np.arange(8))  # fixture sanity

        got = np.argsort(
            -np.asarray(pairwise_neg_l2(jnp.asarray(e)))[0][1:9], kind="stable"
        )
        assert np.array_equal(got, want), "production eval matrix reordered near-ties"

        # the same fixture UNDER bf16-rounded inputs (what TPU DEFAULT
        # precision does to the score matmul) demonstrably flips — i.e. the
        # fixture genuinely sits inside the reorder band the wiring guards
        e_bf16 = jnp.asarray(e).astype(jnp.bfloat16).astype(jnp.float32)
        flipped = np.argsort(
            -np.asarray(pairwise_neg_l2(e_bf16))[0][1:9], kind="stable"
        )
        assert not np.array_equal(flipped, want), (
            "fixture too coarse: bf16 rounding did not reorder it"
        )

    def test_eval_matrices_pin_highest_over_ambient_default(self, rng):
        """Even with an ambient low-precision matmul default (what production
        CLIs see — conftest's global pin does not exist outside tests), the
        eval matrices carry explicit HIGHEST."""
        from xmir_tpu.metrics.retrieval import pairwise_cosine, pairwise_neg_l2

        e = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
        with jax.default_matmul_precision("bfloat16"):
            for fn in (pairwise_neg_l2, pairwise_cosine):
                jx = str(jax.make_jaxpr(fn)(e)).upper()
                assert "HIGHEST" in jx, f"{fn.__name__} lost the precision pin"

    def test_env_opt_out(self, rng, monkeypatch):
        from xmir_tpu.metrics.retrieval import pairwise_neg_l2

        e = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
        monkeypatch.setenv("XMIR_EVAL_PRECISION", "default")
        jx = str(jax.make_jaxpr(pairwise_neg_l2)(e)).upper()
        assert "HIGHEST" not in jx


class TestTopkPrecision:
    def test_tiled_topk_threads_env_precision(self, rng, monkeypatch):
        from xmir_tpu.ops.topk import tiled_topk

        q = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
        monkeypatch.setenv("XMIR_TOPK_PRECISION", "highest")
        jx = str(jax.make_jaxpr(
            lambda q, g: tiled_topk(q, g, 3, metric="ip")
        )(q, g)).upper()
        assert "HIGHEST" in jx
        monkeypatch.setenv("XMIR_TOPK_PRECISION", "default")
        jx = str(jax.make_jaxpr(
            lambda q, g: tiled_topk(q, g, 3, metric="ip")
        )(q, g)).upper()
        assert "HIGHEST" not in jx, (
            "env change did not re-key the jit cache (stale precision)"
        )

    def test_explicit_precision_wins_over_env(self, rng, monkeypatch):
        from xmir_tpu.ops.topk import tiled_topk

        q = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
        monkeypatch.setenv("XMIR_TOPK_PRECISION", "default")
        jx = str(jax.make_jaxpr(
            lambda q, g: tiled_topk(q, g, 3, metric="ip", precision="highest")
        )(q, g)).upper()
        assert "HIGHEST" in jx


class TestCLIWiring:
    def test_apply_score_precision_defaults_both_envs(self, monkeypatch):
        from xmir_tpu.cli.common import apply_score_precision

        monkeypatch.delenv("XMIR_TOPK_PRECISION", raising=False)
        monkeypatch.delenv("XMIR_EVAL_PRECISION", raising=False)
        import os

        apply_score_precision(argparse.Namespace(score_precision="highest"))
        assert os.environ["XMIR_TOPK_PRECISION"] == "highest"
        assert os.environ["XMIR_EVAL_PRECISION"] == "highest"

    def test_explicit_env_wins_over_flag(self, monkeypatch):
        from xmir_tpu.cli.common import apply_score_precision

        monkeypatch.setenv("XMIR_TOPK_PRECISION", "default")
        monkeypatch.delenv("XMIR_EVAL_PRECISION", raising=False)
        import os

        apply_score_precision(argparse.Namespace(score_precision="highest"))
        assert os.environ["XMIR_TOPK_PRECISION"] == "default"
        assert os.environ["XMIR_EVAL_PRECISION"] == "highest"

    def test_eval_clis_expose_flag(self):
        """cli/test.py, cli/query.py, cli/evaluate_saliency.py parse
        --score-precision (default 'highest'); evaluate_query.py is pure
        host-side JSON scoring (no matmul), so it takes no flag."""
        from xmir_tpu.cli.common import add_precision_args

        p = argparse.ArgumentParser()
        add_precision_args(p)
        args = p.parse_args([])
        assert args.score_precision == "highest"
        args = p.parse_args(["--score-precision", "default"])
        assert args.score_precision == "default"
