"""BERT language backbone (Flax linen).

The reference has two BERT variants (SURVEY.md 2.10 — the working MMSS
spec is the obs/ version):
  * the "live" backbone that reduces BERT to its word-embedding table
    (reference: maskrcnn_benchmark/modeling/language_backbone/transformers.py:67
    — ``input_embeddings = self.embeddings[input_ids]``, encoder
    commented out), used by GroundingHead and by the student-teacher
    model to embed class names;
  * the full 12-layer encoder + MLM masking
    (language_backbone/obs/transformers.py:26-62) that TransformerHead's
    input contract requires.

Both are provided.  Pretrained HF weights are not downloadable in this
environment; params initialize randomly and can be overwritten by the
checkpoint importer (engine/checkpoint.py) from a torch state dict.
"""

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class WordEmbeddingBackbone(nn.Module):
    """The embedding-table-only BERT (live spec): a [vocab, hidden]
    lookup, frozen unless FT_EMB."""

    vocab_size: int = 30522
    hidden_size: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "word_embeddings",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.hidden_size),
        )
        return table.astype(self.dtype)[input_ids]


class BertSelfAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        head_dim = self.hidden_size // self.num_heads
        dense = lambda name: nn.DenseGeneral(
            (self.num_heads, head_dim), dtype=self.dtype, name=name
        )
        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(head_dim)
        big_neg = jnp.finfo(jnp.float32).min / 2
        attn = attn + jnp.where(mask[:, None, None, :], 0.0, big_neg)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        return nn.DenseGeneral(
            self.hidden_size, axis=(-2, -1), dtype=self.dtype, name="output"
        )(out)


class BertLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        attn = BertSelfAttention(
            self.hidden_size, self.num_heads, self.dtype, name="attention"
        )(x, mask, deterministic)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="attention_ln")(
            x + attn
        )
        h = nn.Dense(
            self.intermediate_size, dtype=self.dtype, name="intermediate"
        )(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="output")(h)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, name="output_ln")(
            x + h
        )


class BertEncoder(nn.Module):
    """Transformer stack over already-embedded tokens (used standalone by
    TransformerHead with 6 layers — transformer_head.py BertEncoder)."""

    num_layers: int
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        for i in range(self.num_layers):
            x = BertLayer(
                self.hidden_size,
                self.num_heads,
                self.intermediate_size,
                self.layer_norm_eps,
                self.dtype,
                name=f"layer{i}",
            )(x, mask, deterministic)
        return x


class BertModel(nn.Module):
    """Full BERT: embeddings (word+position+type+LN) + encoder.  The MMSS
    language backbone (obs/transformers.py:26-62 spec)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic=True):
        emb_init = nn.initializers.normal(0.02)
        word = self.param(
            "word_embeddings", emb_init, (self.vocab_size, self.hidden_size)
        )
        pos = self.param(
            "position_embeddings",
            emb_init,
            (self.max_position_embeddings, self.hidden_size),
        )
        typ = self.param(
            "token_type_embeddings",
            emb_init,
            (self.type_vocab_size, self.hidden_size),
        )
        seq = input_ids.shape[1]
        x = word[input_ids] + pos[None, :seq] + typ[0][None, None]
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="embeddings_ln")(x)
        x = BertEncoder(
            self.num_layers,
            self.hidden_size,
            self.num_heads,
            self.intermediate_size,
            self.layer_norm_eps,
            self.dtype,
            name="encoder",
        )(x.astype(self.dtype), attention_mask, deterministic)
        return x, word


def apply_mlm_masking(
    input_ids: jnp.ndarray,
    special_tokens_mask: jnp.ndarray,
    attention_mask: jnp.ndarray,
    key: jax.Array,
    mask_token_id: int = 103,
    vocab_size: int = 30522,
    prob: float = 0.15,
    prob_mask: float = 0.9,
    prob_noise: float = 0.0,
):
    """Masked-language-modeling corruption
    (obs/transformers.py:32-55): each non-special real token is selected
    with ``prob``; selected tokens become [MASK] with ``prob_mask``, a
    random token with ``prob_noise``, else stay intact.

    Returns (corrupted_ids, mlm_mask) with mlm_mask marking selected
    positions (loss targets)."""
    k1, k2, k3 = jax.random.split(key, 3)
    eligible = (special_tokens_mask == 0) & (attention_mask == 1)
    selected = (
        jax.random.uniform(k1, input_ids.shape) < prob
    ) & eligible
    u = jax.random.uniform(k2, input_ids.shape)
    random_ids = jax.random.randint(
        k3, input_ids.shape, 0, vocab_size
    )
    corrupted = jnp.where(
        selected & (u < prob_mask),
        mask_token_id,
        jnp.where(
            selected & (u >= prob_mask) & (u < prob_mask + prob_noise),
            random_ids,
            input_ids,
        ),
    )
    return corrupted, selected
