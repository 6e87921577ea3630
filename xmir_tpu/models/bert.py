"""BERT-style text encoder in Flax — the ConceptCLIP text tower
(PubMedBERT; reference model.py:636-761 unfreezes its last layers).

HF BertModel layout: embeddings (word + position + token_type, LayerNorm),
post-norm transformer layers, optional pooler. Returns token embeddings and a
CLS feature.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class BertSelfAttention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        b, n, _ = x.shape
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, name="query")(x)
        k = nn.Dense(self.dim, name="key")(x)
        v = nn.Dense(self.dim, name="value")(x)

        def split(t):
            return jnp.swapaxes(t.reshape(b, n, self.num_heads, hd), 1, 2)

        a = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q), split(k), preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        if mask is not None:
            a = a + jnp.where(mask[:, None, None, :], 0.0, -1e9)
        a = nn.softmax(a, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a.astype(v.dtype), split(v))
        return jnp.swapaxes(o, 1, 2).reshape(b, n, self.dim)


class BertLayer(nn.Module):
    dim: int
    num_heads: int
    intermediate: int

    @nn.compact
    def __call__(self, x, mask=None):
        h = BertSelfAttention(self.dim, self.num_heads, name="attention")(x, mask)
        h = nn.Dense(self.dim, name="attention_output")(h)
        x = nn.LayerNorm(epsilon=1e-12, name="attention_norm")(x + h)
        h = nn.Dense(self.intermediate, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="output")(h)
        return nn.LayerNorm(epsilon=1e-12, name="output_norm")(x + h)


class BertTextBackbone(nn.Module):
    """Returns {"tokens": (B, N, D), "cls": (B, D)} (CLS = token 0)."""

    vocab_size: int = 30522
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        b, n = input_ids.shape
        word = nn.Embed(self.vocab_size, self.dim, name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(n)[None, :]
        pos = nn.Embed(self.max_position, self.dim, name="position_embeddings")(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        tok = nn.Embed(self.type_vocab_size, self.dim, name="token_type_embeddings")(
            token_type_ids
        )
        x = word + pos + tok
        x = nn.LayerNorm(epsilon=1e-12, name="embeddings_norm")(x)
        mask = attention_mask.astype(bool) if attention_mask is not None else None
        for i in range(self.depth):
            x = BertLayer(self.dim, self.num_heads, self.intermediate, name=f"layer{i}")(
                x, mask
            )
        return {"tokens": x, "cls": x[:, 0]}


def pubmedbert_base() -> BertTextBackbone:
    return BertTextBackbone(vocab_size=30522, dim=768, depth=12, num_heads=12)
