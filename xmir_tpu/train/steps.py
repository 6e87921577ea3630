"""pjit-able train/eval steps.

One step function per training family, mirroring the reference loops:
  single-embedding metric loss   train.py:47-148   (train_epoch)
  dual-branch multi-label        nih_multilabel_retrieval.py:308-348
  distillation (student/teacher) model.py:281-415 + cosine distill loss
  conceptclip IT+RC align        train.py:221-397

All steps are pure (state, batch) -> (state, metrics) functions; shard the
batch over the mesh `data` axis and XLA inserts the gradient psum — the DDP
allreduce equivalent (SURVEY.md §2.10).

Mixed precision (compute_dtype=bfloat16) is the torch-AMP equivalent of the
reference's autocast loop (train.py:47-148): master params stay f32 in the
optimizer, a bf16 copy is cast INSIDE the differentiated function so the
whole forward+backward runs on bf16 MXU passes, and the cast's transpose
returns f32 gradients. Casting only the inputs would be a no-op — flax's
promote_dtype rules re-promote every matmul to f32 at the first f32 kernel.
No GradScaler is needed: bf16 carries the f32 exponent range. Flax norm
layers compute their statistics in f32 internally regardless of input dtype.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import (
    asymmetric_loss,
    conceptclip_loss,
    jaccard_supcon_loss,
    multilabel_contrastive_loss,
    supcon_loss,
    triplet_margin_loss,
    weighted_multilabel_triplet_loss,
)

LOSS_FNS = {
    "triplet": lambda e, l, **kw: triplet_margin_loss(e, l, **kw),
    "triplet_hard": lambda e, l, **kw: triplet_margin_loss(e, l, mining="batch_hard", **kw),
    "supcon": lambda e, l, **kw: (supcon_loss(e, l, **kw), jnp.asarray(0.0)),
    "jaccard_supcon": lambda e, l, **kw: (jaccard_supcon_loss(e, l, **kw), jnp.asarray(0.0)),
    "weighted_multilabel_triplet": lambda e, l, **kw: weighted_multilabel_triplet_loss(e, l, **kw),
    "multilabel_contrastive": lambda e, l, **kw: (
        multilabel_contrastive_loss(e, l, **kw),
        jnp.asarray(0.0),
    ),
}


def _cast_floating(tree, dtype):
    """Cast floating-point leaves to `dtype`; non-float leaves pass through."""
    if dtype == jnp.float32:
        return tree
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        tree,
    )


def _train_apply(model, params, batch_stats, images):
    """Train-mode forward handling BatchNorm state mutation uniformly."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
        out, updates = model.apply(
            variables, images, train=True, mutable=["batch_stats"]
        )
        return out, updates.get("batch_stats", batch_stats)
    return model.apply(variables, images, train=True), batch_stats


def make_embedding_train_step(
    model,
    loss_name: str = "triplet",
    loss_kwargs: Optional[dict] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
):
    """Generic metric-learning step (reference train_epoch, train.py:47-148).

    remat=True rematerializes the forward pass during backward
    (jax.checkpoint): activation memory drops to ~O(1) model outputs at the
    cost of one extra forward — the gradient-checkpointing equivalent of the
    reference's HF-Trainer flag (train_medsiglip.py:248)."""
    loss_kwargs = loss_kwargs or {}
    loss_fn = LOSS_FNS[loss_name]

    def step(state, images, labels):
        images = images.astype(compute_dtype)

        def forward(params):
            params = _cast_floating(params, compute_dtype)
            out, new_stats = _train_apply(model, params, state.batch_stats, images)
            emb = out["embedding"] if isinstance(out, dict) else out
            return emb.astype(jnp.float32), new_stats

        fwd = jax.checkpoint(forward) if remat else forward

        def losses(params):
            emb, new_stats = fwd(params)
            loss, aux = loss_fn(emb, labels, **loss_kwargs)
            return loss, (aux, new_stats)

        (loss, (aux, new_stats)), grads = jax.value_and_grad(losses, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads, new_stats)
        return state, {"loss": loss, "aux": aux}

    return step


def make_dual_branch_train_step(
    model,
    contrastive_weight: float = 1.0,
    asl_alpha: float = 1.0,
    temperature: float = 0.07,
    gamma_pos: float = 1.0,
    gamma_neg: float = 4.0,
    clip: float = 0.05,
    compute_dtype=jnp.float32,
):
    """NIH dual-head step: Jaccard-weighted contrastive + alpha*ASL
    (nih_multilabel_retrieval.py:308-348)."""

    def step(state, images, labels):
        images = images.astype(compute_dtype)

        def losses(params):
            params = _cast_floating(params, compute_dtype)
            out, new_stats = _train_apply(model, params, state.batch_stats, images)
            contrastive = multilabel_contrastive_loss(
                out["embedding"].astype(jnp.float32), labels, temperature
            )
            asl = asymmetric_loss(
                out["logits"].astype(jnp.float32), labels, gamma_pos, gamma_neg, clip
            )
            loss = contrastive_weight * contrastive + asl_alpha * asl
            return loss, ({"contrastive": contrastive, "asl": asl}, new_stats)

        (loss, (aux, new_stats)), grads = jax.value_and_grad(losses, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads, new_stats)
        return state, {"loss": loss, **aux}

    return step


def make_distill_train_step(
    model,
    loss_name: str = "triplet",
    distill_weight: float = 1.0,
    loss_kwargs: Optional[dict] = None,
    compute_dtype=jnp.float32,
):
    """Student metric loss + cosine-distillation to the teacher embedding."""
    loss_kwargs = loss_kwargs or {}
    loss_fn = LOSS_FNS[loss_name]

    def step(state, images, labels):
        images = images.astype(compute_dtype)

        def losses(params):
            params = _cast_floating(params, compute_dtype)
            out, new_stats = _train_apply(model, params, state.batch_stats, images)
            emb = out["embedding"].astype(jnp.float32)
            metric_loss, aux = loss_fn(emb, labels, **loss_kwargs)
            t = out["teacher_embedding"].astype(jnp.float32)
            # embeddings are L2-normalized; 1 - cosine == 0.5 * ||e - t||^2
            distill = jnp.mean(1.0 - jnp.sum(emb * t, axis=1))
            return metric_loss + distill_weight * distill, (aux, distill, new_stats)

        (loss, (aux, distill, new_stats)), grads = jax.value_and_grad(
            losses, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, new_stats)
        return state, {"loss": loss, "aux": aux, "distill": distill}

    return step


def dedupe_concept_batch(concept_ids, concept_token_mask=None, bucket: int = 8):
    """Host-side unique-ing of per-sample concept token rows.

    The reference encodes every (b, w) concept string through the text tower
    each step (train.py:175-218) even though VinDr concepts come from a fixed
    22-name vocabulary — most of that text-tower work is redundant. Returns
    (unique_ids (U, Lc), unique_token_mask (U, Lc), inverse (B, W) int32)
    with U padded up to a multiple of ``bucket`` (bounds jit recompiles to a
    handful of U shapes). Padded rows are all-[PAD] and unreferenced by
    ``inverse``, so they carry zero gradient. Feed to a step built with
    ``make_conceptclip_train_step(..., dedupe_concepts=True)``.
    """
    concept_ids = np.asarray(concept_ids)
    b, w, lc = concept_ids.shape
    flat = concept_ids.reshape(b * w, lc)
    uniq, first, inverse = np.unique(
        flat, axis=0, return_index=True, return_inverse=True
    )
    u = uniq.shape[0]
    cap = -(-u // bucket) * bucket
    unique_ids = np.zeros((cap, lc), flat.dtype)
    unique_ids[:u] = uniq
    if concept_token_mask is not None:
        flat_mask = np.asarray(concept_token_mask).reshape(b * w, lc)
        unique_mask = np.zeros((cap, lc), flat_mask.dtype)
        unique_mask[:u] = flat_mask[first]
    else:
        unique_mask = unique_ids != 0
    return unique_ids, unique_mask, inverse.reshape(b, w).astype(np.int32)


def make_conceptclip_train_step(model, alpha: float = 0.5,
                                compute_dtype=jnp.float32,
                                dedupe_concepts: bool = False):
    """IT-Align + alpha*RC-Align on the dual encoder (train.py:221-397).
    Batch: pixel_values, input_ids, attention_mask, concept tensors
    (padded (B, W, Lc) token ids reduced to embeddings host-side is NOT done —
    concepts are encoded in-graph through the text tower).

    dedupe_concepts=True swaps the concept inputs for the deduped form
    produced by ``dedupe_concept_batch``: (unique_ids (U, Lc),
    unique_token_mask (U, Lc), concept_inverse (B, W)) — the text tower runs
    U<=22 forwards per step instead of B*W, and the (B, W, D) concept
    features are a gather. Loss and gradients are exactly those of the
    undeduped step (duplicate rows encode identically; their gradients sum
    through the gather), pinned by tests/test_train.py."""

    def concept_feats_from(variables, concept_ids, concept_token_mask):
        b, w, lc = concept_ids.shape
        flat_ids = concept_ids.reshape(b * w, lc)
        # concept names are padded to lc tokens: without a per-token
        # mask, [PAD] positions would participate in self-attention and
        # pollute the CLS concept embedding (HF supplies this mask in
        # the reference, train.py:221-397). Default: BERT's [PAD] id 0.
        flat_tok_mask = (
            concept_token_mask.reshape(b * w, lc)
            if concept_token_mask is not None
            else (flat_ids != 0)
        )
        flat_feats = model.apply(
            variables, flat_ids, flat_tok_mask, method=model.encode_text
        )
        return flat_feats.reshape(b, w, -1)

    def concept_feats_deduped(variables, unique_ids, unique_tok_mask, inverse):
        # same [PAD]-mask default as the undeduped path: dedupe_concept_batch
        # always supplies a mask, but a direct caller passing None must not
        # silently let PAD tokens into self-attention
        if unique_tok_mask is None:
            unique_tok_mask = unique_ids != 0
        unique_feats = model.apply(
            variables, unique_ids, unique_tok_mask, method=model.encode_text
        )  # (U, D)
        return jnp.take(unique_feats, inverse, axis=0)  # (B, W, D)

    def step(state, pixel_values, input_ids, attention_mask, concept_ids,
             concept_mask, concept_token_mask=None, concept_inverse=None):
        pixel_values = pixel_values.astype(compute_dtype)

        def losses(params):
            variables = {"params": _cast_floating(params, compute_dtype)}
            out = model.apply(
                variables, pixel_values, input_ids, attention_mask,
                method=model.forward_clip,
            )
            if dedupe_concepts:
                concept_feats = concept_feats_deduped(
                    variables, concept_ids, concept_token_mask, concept_inverse
                )
            else:
                concept_feats = concept_feats_from(
                    variables, concept_ids, concept_token_mask
                )
            total, it, rc = conceptclip_loss(
                out["image_features"].astype(jnp.float32),
                out["text_features"].astype(jnp.float32),
                out["image_token_features"].astype(jnp.float32),
                concept_feats.astype(jnp.float32),
                concept_mask,
                out["logit_scale"],
                out["logit_bias"],
                alpha=alpha,
            )
            return total, (it, rc)

        (loss, (it, rc)), grads = jax.value_and_grad(losses, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        # post-step clamp of logit_scale to [0, ln 100] (train.py:361-367)
        params = dict(state.params)
        if "logit_scale" in params:
            params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0, 4.6052)
            state = state.replace(params=type(state.params)(params))
        return state, {"loss": loss, "it_loss": it, "rc_loss": rc}

    return step


def with_grad_accumulation(state, accum_steps: int):
    """Return a state whose optimizer is wrapped in optax.MultiSteps: every
    step call becomes a microbatch — gradients accumulate (averaged) across
    `accum_steps` calls and parameters update on the accum_steps-th (the
    reference relies on HF Trainer for this, train_medsiglip.py:285-287).

    Works with any step produced by the make_*_train_step factories, since
    they all route updates through state.tx/apply_gradients."""
    import optax

    tx = optax.MultiSteps(state.tx, every_k_schedule=accum_steps)
    return state.replace(tx=tx, opt_state=tx.init(state.params))


def make_embed_fn(model, compute_dtype=jnp.float32):
    """Inference embedding extractor (the test.py/ingest hot loop)."""

    def embed(variables, images):
        out = model.apply(variables, images.astype(compute_dtype), train=False)
        emb = out["embedding"] if isinstance(out, dict) else out
        return emb.astype(jnp.float32)

    return embed
