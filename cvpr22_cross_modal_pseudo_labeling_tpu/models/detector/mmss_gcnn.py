"""MMSS-GCNN: grid-feature image-caption grounding pretraining model.

TPU re-design of reference modeling/detector/mmss_gcnn.py:15-122 with
the SURVEY.md 2.10 defect resolutions: the language backbone is the
registry-dispatch full-BERT spec (obs/backbone.py + obs/transformers.py)
so TransformerHead's ``encoded_tokens``/``mlm_mask``/``target_ids``
contract is actually satisfiable (the shipped tree cannot even import —
SURVEY.md 2.10 item 1/2).

Differences by design:
  * grid mask / region locations (mmss_gcnn.py:59-77, host numpy per
    step) are pure jnp from image_sizes — no host sync.
  * spatial dropout (mmss_gcnn.py:79-95, python loop + pad_sequence) is
    a random top-k selection to a static cap.
  * captions arrive pre-tokenized from the host pipeline (input_ids,
    attention_mask, special_tokens_mask).
"""

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbone import device_normalize
from ..language.bert import BertModel, WordEmbeddingBackbone, apply_mlm_masking
from ..mmss.grounding_head import GroundingHead, GroundingStatics
from ..mmss.transformer_head import TransformerHead, TransformerHeadStatics
from .statics import RCNNStatics, statics_from_cfg


class MMSSStatics(NamedTuple):
    backbone: RCNNStatics = RCNNStatics()
    v_dim: int = 2048
    l_dim: int = 768
    spatial_dropout: int = 100
    heads: Tuple[str, ...] = ("GroundingHead",)
    default_head: str = "GroundingHead"
    tie_vl: bool = False
    grounding: GroundingStatics = GroundingStatics()
    transformer: TransformerHeadStatics = TransformerHeadStatics()
    # language backbone
    lb_type: str = "BERT-Base"  # "BERT-Base" | "WordEmbedding"
    vocab_size: int = 30522
    bert_layers: int = 12
    bert_heads: int = 12
    bert_intermediate: int = 3072
    mlm: bool = True
    mlm_prob: float = 0.15
    mlm_prob_mask: float = 0.9
    mlm_prob_noise: float = 0.0
    mask_token_id: int = 103


def mmss_statics_from_cfg(cfg) -> MMSSStatics:
    h = cfg.MODEL.MMSS_HEAD
    g = h.GROUNDING
    t = h.TRANSFORMER
    bc = t.BERT_CONFIG
    return MMSSStatics(
        backbone=statics_from_cfg(cfg),
        v_dim=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
        l_dim=768,
        spatial_dropout=h.SPATIAL_DROPOUT,
        heads=tuple(h.TYPES),
        default_head=h.DEFAULT_HEAD,
        tie_vl=h.TIE_VL_PROJECTION_WEIGHTS,
        grounding=GroundingStatics(
            local_metric=g.LOCAL_METRIC,
            global_metric=g.GLOBAL_METRIC,
            alignment=g.ALIGNMENT,
            temperature=g.ALIGNMENT_TEMPERATURE,
            loss_type=g.LOSS,
            negative_mining=g.NEGATIVE_MINING,
            margin=g.TRIPLET_MARGIN,
            align_words=g.ALIGN_WORDS_TO_REGIONS,
            align_regions=g.ALIGN_REGIONS_TO_WORDS,
        ),
        transformer=TransformerHeadStatics(
            num_layers=bc.num_hidden_layers,
            num_heads=bc.num_attention_heads,
            intermediate_size=bc.intermediate_size,
            hidden_size=bc.hidden_size,
            vocab_size=bc.vocab_size,
            layer_norm_eps=bc.layer_norm_eps,
            mmm_loss=t.MMM_LOSS,
            mlm=t.MASKED_LANGUAGE_MODELING,
        ),
        lb_type=cfg.MODEL.LANGUAGE_BACKBONE.TYPE,
        vocab_size=bc.vocab_size,
        mlm=t.MASKED_LANGUAGE_MODELING,
        mlm_prob=t.MASKED_LANGUAGE_MODELING_PROB,
        mlm_prob_mask=t.MASKED_LANGUAGE_MODELING_PROB_MASK,
        mlm_prob_noise=t.MASKED_LANGUAGE_MODELING_PROB_NOISE,
    )


def grid_region_inputs(features, image_sizes, padded_hw):
    """Grid mask + normalized (x, y) locations from true image sizes
    (mmss_gcnn.py:59-77), pure jnp."""
    b, gh, gw, dim = features.shape
    img_h, img_w = padded_hw
    region_features = features.reshape(b, gh * gw, dim)

    gs_h = jnp.ceil(
        image_sizes[:, 0].astype(jnp.float32) * gh / img_h
    ).astype(jnp.int32)
    gs_w = jnp.ceil(
        image_sizes[:, 1].astype(jnp.float32) * gw / img_w
    ).astype(jnp.int32)
    ys = jnp.arange(gh)[None, :, None]  # [1, gh, 1]
    xs = jnp.arange(gw)[None, None, :]
    mask = (ys < gs_h[:, None, None]) & (xs < gs_w[:, None, None])
    loc_y = (ys + 0.5) / jnp.maximum(gs_h[:, None, None], 1)
    loc_x = (xs + 0.5) / jnp.maximum(gs_w[:, None, None], 1)
    loc = jnp.stack(
        [
            jnp.broadcast_to(loc_x, (b, gh, gw)),
            jnp.broadcast_to(loc_y, (b, gh, gw)),
        ],
        axis=-1,
    ) * mask[..., None]
    return (
        region_features,
        mask.reshape(b, gh * gw),
        loc.reshape(b, gh * gw, 2).astype(jnp.float32),
    )


def spatial_dropout_select(region_features, region_mask, region_loc, cap, key):
    """Random selection of <=cap valid regions per image into a static
    [B, cap] layout (mmss_gcnn.py:79-95)."""
    b, n, _ = region_features.shape
    rand = jax.random.uniform(key, (b, n))
    priority = jnp.where(region_mask, rand, 2.0)
    _, idx = jax.lax.top_k(-priority, cap)  # smallest priority first
    sel_mask = jnp.take_along_axis(region_mask, idx, axis=1)
    take = lambda a: jnp.take_along_axis(
        a, idx[..., None] if a.ndim == 3 else idx, axis=1
    )
    return take(region_features), sel_mask, take(region_loc)


class MMSSGridModel(nn.Module):
    statics: MMSSStatics

    def setup(self):
        from ..backbone import ResNetBackbone

        s = self.statics
        bs = s.backbone
        dtype = (
            jnp.bfloat16
            if bs.compute_dtype == "bfloat16"
            else jnp.float32
        )
        self.backbone = ResNetBackbone(
            depth=bs.conv_body[:-3],
            num_stages=4 if bs.conv_body.endswith("-C5") else 3,
            stem_out_channels=bs.stem_out_channels,
            res2_out_channels=bs.res2_out_channels,
            num_groups=bs.num_groups,
            width_per_group=bs.width_per_group,
            stride_in_1x1=bs.stride_in_1x1,
            res5_dilation=bs.res5_dilation,
            s2d_stem=bs.s2d_stem,
            dtype=dtype,
        )
        if s.lb_type == "WordEmbedding" or "TransformerHead" not in s.heads:
            self.language_backbone = WordEmbeddingBackbone(
                vocab_size=s.vocab_size, hidden_size=s.l_dim
            )
        else:
            # compute dtype reaches the full language/VL stack, not just
            # the conv backbone: the BERT encoder, v2l projections and
            # both heads' matmuls run on the MXU at the bf16 rate while
            # params and every loss/softmax stay float32
            self.language_backbone = BertModel(
                vocab_size=s.vocab_size,
                hidden_size=s.l_dim,
                num_layers=s.bert_layers,
                num_heads=s.bert_heads,
                intermediate_size=s.bert_intermediate,
                dtype=dtype,
            )
        if s.tie_vl:
            self.v2l_shared = nn.Dense(
                s.l_dim, dtype=dtype, name="v2l_projection"
            )
        else:
            self.v2l_per_head = {
                h: nn.Dense(s.l_dim, dtype=dtype, name=f"v2l_projection_{h}")
                for h in s.heads
            }
        if "GroundingHead" in s.heads:
            self.grounding_head = GroundingHead(
                s.grounding, s.l_dim, compute_dtype=dtype
            )
        if "TransformerHead" in s.heads:
            self.transformer_head = TransformerHead(s.transformer, dtype=dtype)

    def __call__(
        self,
        images: jnp.ndarray,
        image_sizes: jnp.ndarray,
        captions: Dict[str, jnp.ndarray],
        train: bool = True,
    ):
        s = self.statics
        images = device_normalize(
            images, image_sizes, s.backbone.pixel_mean,
            s.backbone.pixel_std, s.backbone.to_bgr255,
        )
        feats = self.backbone(images)[0]
        region_features, region_mask, region_loc = grid_region_inputs(
            feats.astype(jnp.float32), image_sizes, images.shape[1:3]
        )
        if s.spatial_dropout > 0 and train:
            region_features, region_mask, region_loc = spatial_dropout_select(
                region_features,
                region_mask,
                region_loc,
                min(s.spatial_dropout, region_mask.shape[1]),
                self.make_rng("dropout"),
            )

        input_ids = captions["input_ids"]
        attention_mask = captions["attention_mask"]
        special_mask = captions["special_tokens_mask"]

        use_full_bert = isinstance(self.language_backbone, BertModel)
        mlm_mask = jnp.zeros_like(input_ids, dtype=bool)
        target_ids = input_ids
        if use_full_bert:
            ids_in = input_ids
            if s.mlm and train:
                ids_in, mlm_mask = apply_mlm_masking(
                    input_ids,
                    special_mask,
                    attention_mask,
                    self.make_rng("mlm"),
                    mask_token_id=s.mask_token_id,
                    vocab_size=s.vocab_size,
                    prob=s.mlm_prob,
                    prob_mask=s.mlm_prob_mask,
                    prob_noise=s.mlm_prob_noise,
                )
            encoded_tokens, word_table = self.language_backbone(
                ids_in, attention_mask > 0
            )
            # grounding consumes raw word embeddings (live-spec BERT,
            # transformers.py:67)
            input_embeddings = word_table[input_ids]
        else:
            input_embeddings = self.language_backbone(input_ids)
            encoded_tokens, word_table = None, None

        caption_grounding_mask = attention_mask * (1 - special_mask)

        def v2l(head):
            proj = (
                self.v2l_shared if s.tie_vl else self.v2l_per_head[head]
            )
            return proj(region_features)

        info: Dict[str, jnp.ndarray] = {}
        losses: Dict[str, jnp.ndarray] = {}
        if "GroundingHead" in s.heads:
            rng = (
                self.make_rng("alignment")
                if s.grounding.alignment.startswith("random")
                or s.grounding.negative_mining == "random"
                and s.grounding.loss_type == "triplet"
                else None
            )
            o, l = self.grounding_head(
                v2l("GroundingHead"),
                region_mask,
                input_embeddings,
                caption_grounding_mask,
                rng=rng,
            )
            info.update(o)
            losses.update(l)
        if "TransformerHead" in s.heads:
            assert use_full_bert, (
                "TransformerHead requires the full BERT language backbone"
            )
            o, l = self.transformer_head(
                v2l("TransformerHead"),
                region_loc,
                region_mask,
                encoded_tokens,
                attention_mask,
                mlm_mask,
                target_ids,
                word_table,
            )
            info.update(o)
            losses.update(l)
        return info, losses
