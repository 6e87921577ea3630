"""Regenerate parity_golden.npz — the committed golden artifact for the
parity harness (cli/parity.py). Deterministic synthetic embeddings with
cluster structure; metrics computed once by the metric stack and frozen.
Any future change to metric semantics will flip the golden test."""
import json
import os

import numpy as np

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from xmir_tpu.cli.test import single_label_metrics
from xmir_tpu.metrics import fill_diagonal_neg_inf, pairwise_neg_l2

rng = np.random.default_rng(12345)
centers = rng.standard_normal((3, 32)).astype(np.float32) * 2.5
labels = np.arange(60) % 3
embeds = centers[labels] + rng.standard_normal((60, 32)).astype(np.float32) * 0.8
embeds /= np.linalg.norm(embeds, axis=1, keepdims=True)

dists = np.asarray(fill_diagonal_neg_inf(pairwise_neg_l2(jnp.asarray(embeds))))
metrics = single_label_metrics(dists, labels)
out = os.path.join(os.path.dirname(__file__), "parity_golden.npz")
np.savez(out, embeds=embeds, labels=labels, dists=dists,
         metrics=json.dumps(metrics, default=float))
print("wrote", out, "mAP =", metrics["mAP"])
