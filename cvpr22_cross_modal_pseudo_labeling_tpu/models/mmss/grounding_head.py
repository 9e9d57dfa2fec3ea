"""Image-caption grounding head (contrastive word/region alignment).

TPU re-design of reference modeling/mmss_heads/grounding_head.py:40-344.
Structural change: the reference materializes B^2 replicated embedding
tensors (grounding_head.py:95-109) to compute all-pairs distances; here
the pairwise local similarity is one einsum ``iwd,jrd->ijwr`` — the
dominant matmul runs on the MXU with no replication, and the [B,B,W,R]
similarity is the only quadratic buffer.

Supported options mirror the config surface: LOCAL_METRIC
dot/cosine/euclidean; ALIGNMENT softmax/hardmax/random_top3/
random_categorical; GLOBAL_METRIC aligned_local/reconstruction_mse;
LOSS matching/cross_entropy/triplet (+NEGATIVE_MINING).
"""

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class GroundingStatics(NamedTuple):
    local_metric: str = "dot"
    global_metric: str = "aligned_local"
    alignment: str = "softmax"
    temperature: float = 1.0
    loss_type: str = "matching"
    negative_mining: str = "random"
    margin: float = 1.0
    align_words: bool = True
    align_regions: bool = True


def _one_hot_argmax(sim, axis, num):
    idx = jnp.argmax(sim, axis=axis)
    return jax.nn.one_hot(idx, num, axis=axis, dtype=sim.dtype)


class GroundingHead(nn.Module):
    statics: GroundingStatics
    l_dim: int = 768
    # dtype of the MXU contractions (the B^2 WxR similarity and the
    # reconstruction einsums); accumulation and all loss/softmax math
    # stay float32
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_emb: jnp.ndarray,  # [B, R, d_l] (already v2l-projected)
        region_mask: jnp.ndarray,  # [B, R]
        caption_emb: jnp.ndarray,  # [B, W, d_l]
        caption_mask: jnp.ndarray,  # [B, W] real, non-special tokens
        rng: Optional[jax.Array] = None,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        s = self.statics
        b, r, d = image_emb.shape
        w = caption_emb.shape[1]
        cd = self.compute_dtype
        cap_c = caption_emb.astype(cd)
        img_c = image_emb.astype(cd)
        # loss-side math (norms, mse, softmaxes) runs in float32
        caption_emb = caption_emb.astype(jnp.float32)
        image_emb = image_emb.astype(jnp.float32)
        cmask = caption_mask.astype(jnp.float32)
        rmask = region_mask.astype(jnp.float32)
        num_words = cmask.sum(axis=1)
        num_regions = rmask.sum(axis=1)

        pairwise = s.loss_type in ("cross_entropy", "triplet")
        if pairwise:
            # sim[i, j, w, r]: caption i vs image j
            sim = jnp.einsum(
                "iwd,jrd->ijwr", cap_c, img_c,
                preferred_element_type=jnp.float32,
            )
            pair_cmask = cmask[:, None, :, None]  # [B,1,W,1]
            pair_rmask = rmask[None, :, None, :]  # [1,B,1,R]
            nw = jnp.broadcast_to(num_words[:, None], (b, b))
            nr = jnp.broadcast_to(num_regions[None, :], (b, b))
        else:
            sim = jnp.einsum(
                "bwd,brd->bwr", cap_c, img_c,
                preferred_element_type=jnp.float32,
            )
            pair_cmask = cmask[:, :, None]
            pair_rmask = rmask[:, None, :]
            nw, nr = num_words, num_regions

        if s.local_metric == "dot":
            local_similarity = sim
            local_distance = -sim
        elif s.local_metric == "cosine":
            i_norm = jnp.sqrt(
                jnp.sum(image_emb**2, axis=-1, keepdims=False)
            )  # [B, R]
            c_norm = jnp.sqrt(jnp.sum(caption_emb**2, axis=-1))  # [B, W]
            if pairwise:
                denom = c_norm[:, None, :, None] * i_norm[None, :, None, :]
            else:
                denom = c_norm[:, :, None] * i_norm[:, None, :]
            local_similarity = jnp.nan_to_num(sim / denom)
            local_distance = 1.0 - local_similarity
        elif s.local_metric == "euclidean":
            i_sq = jnp.sum(image_emb**2, axis=-1)
            c_sq = jnp.sum(caption_emb**2, axis=-1)
            if pairwise:
                local_distance = (
                    i_sq[None, :, None, :] + c_sq[:, None, :, None] - 2 * sim
                )
            else:
                local_distance = i_sq[:, None, :] + c_sq[:, :, None] - 2 * sim
            local_similarity = -local_distance
        else:
            raise NotImplementedError(s.local_metric)

        local_similarity = local_similarity / s.temperature
        local_distance = local_distance / s.temperature

        pair_valid = (pair_cmask * pair_rmask) > 0
        floor = jax.lax.stop_gradient(jnp.min(local_similarity)) - 100.0
        local_similarity = jnp.where(pair_valid, local_similarity, floor)

        w_axis = -2  # word axis
        r_axis = -1  # region axis
        attention_w2r = attention_r2w = None
        if s.alignment == "softmax":
            if s.align_words:
                attention_w2r = jax.nn.softmax(local_similarity, axis=r_axis)
            if s.align_regions:
                attention_r2w = jax.nn.softmax(local_similarity, axis=w_axis)
        elif s.alignment == "hardmax":
            if s.align_words:
                attention_w2r = _one_hot_argmax(local_similarity, r_axis, r)
            if s.align_regions:
                attention_r2w = _one_hot_argmax(local_similarity, w_axis, w)
        elif s.alignment in ("random_categorical", "random_top3"):
            assert rng is not None, "random alignment needs an rng"
            k1, k2 = jax.random.split(rng)
            if s.alignment == "random_categorical":
                if s.align_words:
                    idx = jax.random.categorical(
                        k1, local_similarity, axis=r_axis
                    )
                    attention_w2r = jax.nn.one_hot(
                        idx, r, axis=r_axis, dtype=local_similarity.dtype
                    )
                if s.align_regions:
                    idx = jax.random.categorical(
                        k2,
                        jnp.moveaxis(local_similarity, w_axis, -1),
                        axis=-1,
                    )
                    attention_r2w = jnp.moveaxis(
                        jax.nn.one_hot(
                            idx, w, dtype=local_similarity.dtype
                        ),
                        -1,
                        w_axis,
                    )
            else:  # random_top3: uniform over the top-3 candidates
                def topk_uniform(sim_t, k_rng, axis, num):
                    moved = jnp.moveaxis(sim_t, axis, -1)
                    _, top_idx = jax.lax.top_k(moved, 3)
                    mask3 = jnp.sum(
                        jax.nn.one_hot(top_idx, num, dtype=sim_t.dtype),
                        axis=-2,
                    )
                    logits = jnp.where(mask3 > 0, 0.0, -jnp.inf)
                    choice = jax.random.categorical(k_rng, logits, axis=-1)
                    return jnp.moveaxis(
                        jax.nn.one_hot(choice, num, dtype=sim_t.dtype),
                        -1,
                        axis,
                    )

                if s.align_words:
                    attention_w2r = topk_uniform(
                        local_similarity, k1, r_axis, r
                    )
                if s.align_regions:
                    attention_r2w = topk_uniform(
                        local_similarity, k2, w_axis, w
                    )
        else:
            raise NotImplementedError(s.alignment)

        one = jnp.ones_like(nw)
        gd_w2r = gd_r2w = None
        if s.global_metric == "aligned_local":
            if s.align_words:
                a = attention_w2r * pair_cmask
                gd_w2r = jnp.sum(a * local_distance, axis=(w_axis, r_axis))
                gd_w2r = gd_w2r / jnp.maximum(nw, one)
            if s.align_regions:
                a = attention_r2w * pair_rmask
                gd_r2w = jnp.sum(a * local_distance, axis=(w_axis, r_axis))
                gd_r2w = gd_r2w / jnp.maximum(nr, one)
        elif s.global_metric == "reconstruction_mse":
            if s.align_words:
                if pairwise:
                    rec = jnp.einsum(
                        "ijwr,jrd->ijwd", attention_w2r.astype(cd), img_c,
                        preferred_element_type=jnp.float32,
                    )
                    err = jnp.mean((rec - caption_emb[:, None]) ** 2, axis=-1)
                    gd_w2r = jnp.sum(err * cmask[:, None, :], axis=-1)
                else:
                    rec = jnp.einsum(
                        "bwr,brd->bwd", attention_w2r.astype(cd), img_c,
                        preferred_element_type=jnp.float32,
                    )
                    err = jnp.mean((rec - caption_emb) ** 2, axis=-1)
                    gd_w2r = jnp.sum(err * cmask, axis=-1)
                gd_w2r = gd_w2r / jnp.maximum(nw, one)
            if s.align_regions:
                if pairwise:
                    rec = jnp.einsum(
                        "ijwr,iwd->ijrd", attention_r2w.astype(cd), cap_c,
                        preferred_element_type=jnp.float32,
                    )
                    err = jnp.mean((rec - image_emb[None]) ** 2, axis=-1)
                    gd_r2w = jnp.sum(err * rmask[None], axis=-1)
                else:
                    rec = jnp.einsum(
                        "bwr,bwd->brd", attention_r2w.astype(cd), cap_c,
                        preferred_element_type=jnp.float32,
                    )
                    err = jnp.mean((rec - image_emb) ** 2, axis=-1)
                    gd_r2w = jnp.sum(err * rmask, axis=-1)
                gd_r2w = gd_r2w / jnp.maximum(nr, one)
        else:
            raise NotImplementedError(s.global_metric)

        # guard empty captions/images (grounding_head.py:222-233).
        # NOTE upstream defect FIXED here: the reference writes
        # `(num_words > 0) + (num_regions > 0)` — bool OR — which is
        # dead code (every image has >= 1 grid region), so an empty
        # caption keeps distance 0 against every image and scores as a
        # spurious perfect pair in the matching/cross-entropy losses.
        # The intended guard is AND: a pair is valid only when BOTH
        # sides are non-empty; invalid pairs get pushed to max + 100.
        def guard(gd):
            ok = (nw > 0) & (nr > 0)
            ceiling = jax.lax.stop_gradient(jnp.max(gd)) + 100.0
            return jnp.where(ok, gd, ceiling)

        losses: Dict[str, jnp.ndarray] = {}
        info: Dict[str, jnp.ndarray] = {}

        if s.loss_type == "matching":
            if s.local_metric == "dot":
                raise ValueError(
                    "Matching loss undefined for unbounded dot metric"
                )
            if s.align_words:
                losses["Image-Caption Matching Loss (Align Words)"] = (
                    jnp.mean(guard(gd_w2r))
                )
            if s.align_regions:
                losses["Image-Caption Matching Loss (Align Regions)"] = (
                    jnp.mean(guard(gd_r2w))
                )
        elif s.loss_type == "cross_entropy":
            arange = jnp.arange(b)

            def ce_losses(pw_cost, tag):
                lc = jax.nn.log_softmax(-pw_cost, axis=0)
                li = jax.nn.log_softmax(-pw_cost, axis=1)
                losses[f"Cross-Entropy Loss ({tag}, Choose Caption)"] = (
                    -jnp.mean(jnp.diagonal(lc))
                )
                losses[f"Cross-Entropy Loss ({tag}, Choose Image)"] = (
                    -jnp.mean(jnp.diagonal(li))
                )
                info[f"Batch Accuracy ({tag}, Choose Caption)"] = jnp.mean(
                    (jnp.argmin(pw_cost, axis=0) == arange).astype(jnp.float32)
                )
                info[f"Batch Accuracy ({tag}, Choose Image)"] = jnp.mean(
                    (jnp.argmin(pw_cost, axis=1) == arange).astype(jnp.float32)
                )

            if s.align_words:
                ce_losses(guard(gd_w2r), "Align Words")
            if s.align_regions:
                ce_losses(guard(gd_r2w), "Align Regions")
        elif s.loss_type == "triplet":
            assert rng is not None or s.negative_mining != "random"
            arange = jnp.arange(b)
            eye = jnp.eye(b, dtype=bool)

            def triplet_losses(pw_cost, tag, k_rng):
                pos = jnp.diagonal(pw_cost)
                inf = jnp.inf
                off_cols = jnp.where(eye, inf, pw_cost)  # for min over dim0
                off_rows = jnp.where(eye, inf, pw_cost)
                if b < 2:
                    neg_cap = pos + s.margin
                    neg_img = pos + s.margin
                elif s.negative_mining == "hardest":
                    neg_cap = jnp.min(off_cols, axis=0)
                    neg_img = jnp.min(off_rows, axis=1)
                elif s.negative_mining == "easiest":
                    neg_cap = jnp.max(
                        jnp.where(eye, -inf, pw_cost), axis=0
                    )
                    neg_img = jnp.max(
                        jnp.where(eye, -inf, pw_cost), axis=1
                    )
                else:  # random
                    kc, ki = jax.random.split(k_rng)
                    # sample a random non-diagonal entry per column/row
                    rc = jax.random.randint(kc, (b,), 0, b - 1)
                    rc = rc + (rc >= arange)
                    neg_cap = pw_cost[rc, arange]
                    ri = jax.random.randint(ki, (b,), 0, b - 1)
                    ri = ri + (ri >= arange)
                    neg_img = pw_cost[arange, ri]
                losses[f"Triplet Loss ({tag}, Choose Caption)"] = jnp.mean(
                    nn.relu(pos - neg_cap + s.margin)
                )
                losses[f"Triplet Loss ({tag}, Choose Image)"] = jnp.mean(
                    nn.relu(pos - neg_img + s.margin)
                )
                info[f"Batch Accuracy ({tag}, Choose Caption)"] = jnp.mean(
                    (jnp.argmin(pw_cost, axis=0) == arange).astype(jnp.float32)
                )
                info[f"Batch Accuracy ({tag}, Choose Image)"] = jnp.mean(
                    (jnp.argmin(pw_cost, axis=1) == arange).astype(jnp.float32)
                )

            ks = (
                jax.random.split(rng, 2)
                if rng is not None
                else (None, None)
            )
            if s.align_words:
                triplet_losses(guard(gd_w2r), "Align Words", ks[0])
            if s.align_regions:
                triplet_losses(guard(gd_r2w), "Align Regions", ks[1])
        else:
            raise NotImplementedError(s.loss_type)

        return info, losses
