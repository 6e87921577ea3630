"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's NCCL/DDP layer (train.py:649-658,
782-790): a (data, model) mesh; batches shard along `data`, large parameters
may shard along `model`; gradients are reduced by the psum XLA inserts for
pjit-sharded train steps — no explicit collectives in user code.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
    devices=None,
) -> Mesh:
    """Create a mesh over available devices. Default: all devices on `data`,
    1 on `model`."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over `data`."""
    return NamedSharding(mesh, P(DATA_AXIS))


def gallery_sharding(mesh: Mesh) -> NamedSharding:
    """Shard gallery rows over `data` (each device holds N/n_data rows in HBM)."""
    return NamedSharding(mesh, P(DATA_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Pad the batch to a multiple of the data-axis size and device_put it
    sharded. Returns (sharded_array, real_batch_size).

    INFERENCE-ONLY helper: the caller must slice outputs back to
    real_batch_size. Do NOT feed the padded batch to a training loss — the
    zero rows would be treated as real label-0 samples (the train CLIs use
    drop_last batching and device_put unpadded batches instead)."""
    n_data = mesh.shape[DATA_AXIS]
    b = x.shape[0]
    pad = (-b) % n_data
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return jax.device_put(x, batch_sharding(mesh)), b


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def auto_param_shardings(params, mesh: Mesh, min_dim: int = 256):
    """Tensor-parallel sharding rules: large kernels shard their widest axis
    over `model`; everything else replicates. GSPMD then partitions the
    matmuls and inserts the collectives (the scaling-book recipe: annotate
    shardings, let XLA place the all-reduces)."""
    n_model = mesh.shape[MODEL_AXIS]

    def rule(x):
        if not hasattr(x, "shape") or x.ndim < 2 or n_model <= 1:
            return replicated(mesh)
        widest = int(np.argmax(x.shape))
        if x.shape[widest] >= min_dim and x.shape[widest] % n_model == 0:
            spec = [None] * x.ndim
            spec[widest] = MODEL_AXIS
            return NamedSharding(mesh, P(*spec))
        return replicated(mesh)

    return jax.tree_util.tree_map(rule, params)


def fsdp_state_shardings(tree, mesh: Mesh, min_size: int = 65536):
    """FSDP / ZeRO-3-style shardings for a whole train state (params,
    optimizer moments, batch_stats, counters): every floating leaf with
    >= min_size elements shards its largest n_data-divisible axis over
    `data`; small leaves replicate. device_put the state with these and
    jit the step as usual — GSPMD all-gathers each parameter at its use
    site and reduce-scatters its gradient (the DDP all-reduce splits into
    its two halves), so per-device parameter + Adam memory scales 1/n_data
    where plain DP replicates it. The reference has no equivalent (DDP
    replicates optimizer state on every rank).

    Works on any pytree whose large leaves mirror param shapes (optax mu/nu
    do), so one call covers the full TrainState."""
    n_data = mesh.shape[DATA_AXIS]

    def rule(x):
        if (not hasattr(x, "shape") or n_data <= 1 or x.ndim < 1
                or x.size < min_size
                or not jnp.issubdtype(x.dtype, jnp.floating)):
            return replicated(mesh)
        for ax in sorted(range(x.ndim), key=lambda i: -x.shape[i]):
            if x.shape[ax] % n_data == 0:
                spec = [None] * x.ndim
                spec[ax] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
        return replicated(mesh)

    return jax.tree_util.tree_map(rule, tree)
