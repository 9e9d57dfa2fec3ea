"""ViLBERT-style single-stream transformer head.

TPU re-design of reference modeling/mmss_heads/transformer_head.py:9-313:
VisualEmbedding (feature + location linear + LN), a 6-layer BertEncoder
over [caption; regions], an MLM head whose decoder ties to the BERT word
table, and an image-caption matching loss.

Structural changes vs the reference:
  * The B^2 pair replication (transformer_head.py:113-121) is kept only
    for the matching score; the MLM vocab projection — a [*, 30522]
    matmul the reference computed for all B^2 pairs then discarded off
    the diagonal (transformer_head.py:146-151) — is computed on the B
    diagonal pairs only.  Identical math, B×/vocab-size cheaper.
  * MVM variants that raise NotImplementedError in the reference
    (transformer_head.py:174-233) are not carried over.
"""

from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..language.bert import BertEncoder


class TransformerHeadStatics(NamedTuple):
    num_layers: int = 6
    num_heads: int = 8
    intermediate_size: int = 768
    hidden_size: int = 768
    vocab_size: int = 30522
    layer_norm_eps: float = 1e-12
    mmm_loss: str = "cross_entropy"  # "" | "cross_entropy"
    mlm: bool = True


class VisualEmbedding(nn.Module):
    """transformer_head.py:292-313: feature linear + 2-d location linear,
    summed, LayerNorm."""

    hidden_size: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_emb, region_loc):
        fe = nn.Dense(
            self.hidden_size, dtype=self.dtype, name="image_embeddings"
        )(image_emb)
        le = nn.Dense(
            self.hidden_size, dtype=self.dtype,
            name="image_location_embeddings",
        )(region_loc)
        return nn.LayerNorm(epsilon=1e-12, name="ln")(fe + le)


class TransformerHead(nn.Module):
    statics: TransformerHeadStatics
    # computation dtype of the multimodal encoder / MLM decoder matmuls;
    # params and loss/softmax math stay float32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_emb: jnp.ndarray,  # [B, R, hidden] (v2l-projected)
        region_loc: jnp.ndarray,  # [B, R, 2]
        region_mask: jnp.ndarray,  # [B, R]
        encoded_tokens: jnp.ndarray,  # [B, W, hidden] full-BERT output
        caption_mask: jnp.ndarray,  # [B, W] attention mask
        mlm_mask: jnp.ndarray,  # [B, W] selected-for-MLM positions
        target_ids: jnp.ndarray,  # [B, W] original token ids
        word_table: jnp.ndarray,  # [vocab, hidden] tied decoder weights
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        s = self.statics
        b, r, _ = image_emb.shape
        w = encoded_tokens.shape[1]

        visual = VisualEmbedding(
            s.hidden_size, dtype=self.dtype, name="visual_emb"
        )(image_emb, region_loc)

        encoder = BertEncoder(
            num_layers=s.num_layers,
            hidden_size=s.hidden_size,
            num_heads=s.num_heads,
            intermediate_size=s.intermediate_size,
            layer_norm_eps=s.layer_norm_eps,
            dtype=self.dtype,
            name="encoder",
        )
        pooler = nn.Dense(s.hidden_size, dtype=self.dtype, name="pooler")
        seq_rel = nn.Dense(2, name="seq_relationship")
        # MLM transform + tied decoder (transformer_head.py:53-58)
        mlm_transform = nn.Dense(
            s.hidden_size, dtype=self.dtype, name="mlm_transform"
        )
        mlm_ln = nn.LayerNorm(epsilon=s.layer_norm_eps, name="mlm_ln")
        mlm_bias = self.param(
            "mlm_bias", nn.initializers.zeros, (s.vocab_size,)
        )

        def run(tokens_t, mask_t, tokens_v, mask_v):
            x = jnp.concatenate(
                [tokens_t.astype(self.dtype), tokens_v.astype(self.dtype)],
                axis=1,
            )
            m = jnp.concatenate([mask_t, mask_v], axis=1) > 0
            seq = encoder(x, m)
            pooled = jnp.tanh(pooler(seq[:, 0]))
            return seq, pooled

        losses: Dict[str, jnp.ndarray] = {}
        info: Dict[str, jnp.ndarray] = {}

        # ---- matched (diagonal) pairs: MLM ----
        seq_diag, pooled_diag = run(
            encoded_tokens, caption_mask, visual, region_mask
        )
        seq_t = seq_diag[:, :w]
        h = mlm_ln(nn.gelu(mlm_transform(seq_t), approximate=False))
        mlm_logits = (
            jnp.einsum(
                "bwh,vh->bwv",
                h.astype(self.dtype),
                word_table.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + mlm_bias
        )
        tgt = jnp.where(mlm_mask > 0, target_ids, -1)
        valid = tgt >= 0
        logp = jax.nn.log_softmax(mlm_logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, jnp.clip(tgt, 0)[..., None], axis=-1
        )[..., 0]
        denom = jnp.maximum(jnp.sum(valid), 1)
        mlm_loss = jnp.sum(nll * valid) / denom
        losses["Masked Language Modeling Loss"] = (
            mlm_loss if s.mlm else jnp.zeros(())
        )
        acc_num = jnp.sum(
            (jnp.argmax(mlm_logits, axis=-1) == tgt) & valid
        ).astype(jnp.float32)
        acc_den = jnp.sum(valid).astype(jnp.float32)
        info["Masked Language Modeling Accuracy"] = jnp.where(
            acc_den > 0, acc_num / jnp.maximum(acc_den, 1.0), 0.0
        )
        losses["Masked Visual Modeling Loss"] = jnp.zeros(())

        # ---- matching loss ----
        if s.mmm_loss == "cross_entropy":
            # all B^2 pairs; broadcast into [B*B, ...]
            cap_t = jnp.repeat(encoded_tokens, b, axis=0)  # i-major
            cap_m = jnp.repeat(caption_mask, b, axis=0)
            vis_t = jnp.tile(visual, (b, 1, 1))
            vis_m = jnp.tile(region_mask, (b, 1))
            _, pooled = run(cap_t, cap_m, vis_t, vis_m)
            global_dist = seq_rel(pooled)[:, 0].reshape(b, b)
            lc = jax.nn.log_softmax(-global_dist, axis=0)
            li = jax.nn.log_softmax(-global_dist, axis=1)
            losses["Image Caption Matching Loss"] = -(
                jnp.mean(jnp.diagonal(lc)) + jnp.mean(jnp.diagonal(li))
            )
            arange = jnp.arange(b)
            info["Batch Accuracy (Choose Caption)"] = jnp.mean(
                (jnp.argmin(global_dist, axis=0) == arange).astype(
                    jnp.float32
                )
            )
            info["Batch Accuracy (Choose Image)"] = jnp.mean(
                (jnp.argmin(global_dist, axis=1) == arange).astype(
                    jnp.float32
                )
            )
        else:
            # keep params used so the pytree is stable across configs
            losses["Image Caption Matching Loss"] = (
                jnp.sum(seq_rel(pooled_diag)) * 0.0
            )
        return info, losses
