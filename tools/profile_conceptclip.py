"""Component profile of the ConceptCLIP dual-encoder train step (VERDICT r4
#6): ms per (vision fwd+bwd | caption BERT fwd+bwd | concept BERT fwd+bwd |
IT+RC losses | Adam update) vs the full step — the same decomposition that
found the DINOv2 and Swin wins.

Each component is timed as value_and_grad of a scalar touching only that
subgraph (full param tree; unused towers get zero cotangents at negligible
cost), with the on-device fori_loop differencing method. Geometry matches
tools/bench_conceptclip.py defaults: SO400M@384 vision, PubMedBERT text,
B=4, 8 concepts of 16 tokens (deduped: <=22 unique rows), captions seq 64.

Usage: python tools/profile_conceptclip.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if not os.environ.get("XMIR_NO_COMPILE_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

N1, N2 = 2, 8


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def loop_ms(step_scalar, state_like, *args):
    """step_scalar(params_or_state, bump, *args) -> scalar with a data dep."""

    def run(iters, s, *a):
        def body(_, carry):
            acc, bump = carry
            out = step_scalar(s, bump, *a)
            return acc + out, out * 0e-30

        acc, _ = jax.lax.fori_loop(0, iters, body, (0.0, 0.0))
        return acc

    f = jax.jit(run, static_argnums=())
    float(f(jnp.int32(N1), state_like, *args))
    float(f(jnp.int32(N2), state_like, *args))
    t1 = min(_timed(lambda: float(f(jnp.int32(N1), state_like, *args))) for _ in range(2))
    t2 = min(_timed(lambda: float(f(jnp.int32(N2), state_like, *args))) for _ in range(2))
    return max((t2 - t1) / (N2 - N1), 1e-9) * 1e3


def main():
    import optax

    from xmir_tpu.losses.align import conceptclip_loss
    from xmir_tpu.models import create_model
    from xmir_tpu.train import create_train_state, dedupe_concept_batch
    from xmir_tpu.train.steps import _cast_floating

    batch, w_c, lc, seq_len = 4, 8, 16, 64
    model, spec = create_model("conceptclip")
    rng = np.random.default_rng(0)
    s = spec.input_size
    pix = jnp.asarray(rng.standard_normal((batch, s, s, 3)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(1, 30000, (batch, seq_len)), jnp.int32)
    mask = jnp.ones((batch, seq_len), jnp.int32)
    vocab = rng.integers(1, 30000, (22, lc)).astype(np.int32)
    picks = np.stack([rng.permutation(22)[:w_c] for _ in range(batch)])
    cids = vocab[picks]
    cmask = jnp.asarray(np.ones((batch, w_c), bool))
    u_ids, u_mask, inverse = dedupe_concept_batch(cids, cids != 0)
    u_ids, u_mask, inverse = map(jnp.asarray, (u_ids, u_mask, inverse))

    tx = optax.adam(1e-5)
    variables = jax.jit(
        lambda r: model.init(r, pix[:1].astype(jnp.float32), ids[:1], mask[:1],
                             method=model.forward_clip)
    )(jax.random.PRNGKey(0))
    state = create_train_state(model, jax.random.PRNGKey(0), None, tx,
                               variables=variables)
    del variables
    params = state.params

    def cast(p):
        return {"params": _cast_floating(p, jnp.bfloat16)}

    out = {}

    # --- vision tower fwd+bwd -------------------------------------------
    def vision_scalar(p, bump, pix):
        def loss(p):
            pooled, tokens = model.apply(
                cast(p), pix + bump, method=model.encode_image
            )
            return (jnp.mean(pooled) + jnp.mean(tokens)).astype(jnp.float32)

        l, g = jax.value_and_grad(loss)(p)
        return l + jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x).astype(jnp.float32) * 0e-30, g, 0.0
        )

    out["vision_fwd_bwd_ms"] = round(loop_ms(vision_scalar, params, pix), 2)
    print("vision:", out["vision_fwd_bwd_ms"], flush=True)

    # --- caption BERT fwd+bwd (B x seq_len) -----------------------------
    def caption_scalar(p, bump, ids, mask):
        def loss(p):
            f = model.apply(cast(p), ids, mask, method=model.encode_text)
            return (jnp.mean(f) + bump * 0).astype(jnp.float32)

        l, g = jax.value_and_grad(loss)(p)
        return l + jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x).astype(jnp.float32) * 0e-30, g, 0.0
        )

    out["caption_bert_fwd_bwd_ms"] = round(
        loop_ms(caption_scalar, params, ids, mask), 2
    )
    print("caption:", out["caption_bert_fwd_bwd_ms"], flush=True)

    # --- concept BERT fwd+bwd, deduped (U x lc) and undeduped (B*W x lc) -
    def concept_dedup_scalar(p, bump, u_ids, u_mask, inverse):
        def loss(p):
            f = model.apply(cast(p), u_ids, u_mask, method=model.encode_text)
            return (jnp.mean(jnp.take(f, inverse, axis=0)) + bump * 0).astype(
                jnp.float32
            )

        l, g = jax.value_and_grad(loss)(p)
        return l + jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x).astype(jnp.float32) * 0e-30, g, 0.0
        )

    out["concept_bert_dedup_fwd_bwd_ms"] = round(
        loop_ms(concept_dedup_scalar, params, u_ids, u_mask, inverse), 2
    )
    print("concept_dedup:", out["concept_bert_dedup_fwd_bwd_ms"], flush=True)

    flat_cids = jnp.asarray(cids.reshape(batch * w_c, lc))

    def concept_flat_scalar(p, bump, flat_cids):
        def loss(p):
            f = model.apply(
                cast(p), flat_cids, flat_cids != 0, method=model.encode_text
            )
            return (jnp.mean(f) + bump * 0).astype(jnp.float32)

        l, g = jax.value_and_grad(loss)(p)
        return l + jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x).astype(jnp.float32) * 0e-30, g, 0.0
        )

    out["concept_bert_flat_fwd_bwd_ms"] = round(
        loop_ms(concept_flat_scalar, params, flat_cids), 2
    )
    print("concept_flat:", out["concept_bert_flat_fwd_bwd_ms"], flush=True)

    # --- IT + RC losses on fixed features -------------------------------
    d = 1152
    n_tok = (s // 14) ** 2
    img_f = jnp.asarray(rng.standard_normal((batch, d)), jnp.float32)
    txt_f = jnp.asarray(rng.standard_normal((batch, d)), jnp.float32)
    tok_f = jnp.asarray(rng.standard_normal((batch, n_tok, d)), jnp.float32)
    con_f = jnp.asarray(rng.standard_normal((batch, w_c, d)), jnp.float32)

    def loss_scalar(_, bump, img_f, txt_f, tok_f, con_f, cmask):
        def loss(feats):
            i, t, tk, c = feats
            total, _, _ = conceptclip_loss(
                i + bump, t, tk, c, cmask, jnp.float32(2.3), jnp.float32(-10.0),
                alpha=0.5,
            )
            return total

        l, g = jax.value_and_grad(loss)((img_f, txt_f, tok_f, con_f))
        return l + sum(jnp.sum(x) for x in g) * 0e-30

    out["it_rc_loss_fwd_bwd_ms"] = round(
        loop_ms(loss_scalar, jnp.float32(0), img_f, txt_f, tok_f, con_f, cmask),
        2,
    )
    print("losses:", out["it_rc_loss_fwd_bwd_ms"], flush=True)

    # --- Adam update alone (zeros derived from the state ARG — a closure
    # tree of zeros would serialize 2.15GB of constants into the tunnel's
    # compile payload) ----------------------------------------------------
    def adam_scalar(st, bump, _ignored):
        g = jax.tree_util.tree_map(lambda x: x * 0 + bump * 0, st.params)
        st2 = st.apply_gradients(g)
        return st2.step.astype(jnp.float32) * 0 + jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x).astype(jnp.float32) * 0e-30,
            st2.params, 0.0,
        )

    out["adam_update_ms"] = round(loop_ms(adam_scalar, state, jnp.float32(0)), 2)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
