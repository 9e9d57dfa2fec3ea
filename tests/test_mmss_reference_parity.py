"""GroundingHead parity against the reference's pure-torch module
(reference modeling/mmss_heads/grounding_head.py:40-344) — every
deterministic combination of local metric, alignment, global metric and
loss, on ragged region/word masks, must produce the same loss dict and
batch-accuracy info dict.

The reference head owns the v2l projection; ours receives projected
region embeddings (TIE_VL_PROJECTION lives in the parent model), so the
reference's own v2l weights are applied outside before comparing.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_oracle import ref_module


B, R, W, VDIM, LDIM = 4, 5, 3, 6, 8


def _ref_grounding_cfg(**kw):
    from maskrcnn_benchmark.config import cfg

    c = cfg.clone()
    g = c.MODEL.MMSS_HEAD.GROUNDING
    for k, v in kw.items():
        setattr(g, k, v)
    return c


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    regions = rng.randn(B, R, VDIM).astype(np.float32)
    # ragged: image 3 has a single valid region, caption 2 a single word
    rmask = np.ones((B, R), np.int64)
    rmask[3, 1:] = 0
    caption = rng.randn(B, W + 2, LDIM).astype(np.float32)
    attn = np.ones((B, W + 2), np.int64)
    special = np.zeros((B, W + 2), np.int64)
    special[:, 0] = 1   # [CLS]
    special[:, -1] = 1  # [SEP]
    attn[2, 2:] = 0     # caption 2: one real word then padding
    special[2, 2:] = 1
    return regions, rmask, caption, attn, special


VARIANTS = [
    dict(LOCAL_METRIC="dot", ALIGNMENT="softmax",
         GLOBAL_METRIC="aligned_local", LOSS="cross_entropy"),
    dict(LOCAL_METRIC="dot", ALIGNMENT="hardmax",
         GLOBAL_METRIC="aligned_local", LOSS="cross_entropy"),
    dict(LOCAL_METRIC="cosine", ALIGNMENT="softmax",
         GLOBAL_METRIC="aligned_local", LOSS="matching"),
    dict(LOCAL_METRIC="cosine", ALIGNMENT="softmax",
         GLOBAL_METRIC="aligned_local", LOSS="cross_entropy",
         ALIGNMENT_TEMPERATURE=0.5),
    dict(LOCAL_METRIC="euclidean", ALIGNMENT="softmax",
         GLOBAL_METRIC="aligned_local", LOSS="triplet",
         NEGATIVE_MINING="hardest"),
    dict(LOCAL_METRIC="euclidean", ALIGNMENT="hardmax",
         GLOBAL_METRIC="aligned_local", LOSS="triplet",
         NEGATIVE_MINING="easiest"),
    # reconstruction_mse + align_regions crashes in the reference itself
    # (grounding_head.py:196-200 reduces image_rec to [B] before
    # multiplying by region_mask — latent bug in a path no shipped
    # config uses), so the oracle only covers the words direction
    dict(LOCAL_METRIC="cosine", ALIGNMENT="softmax",
         GLOBAL_METRIC="reconstruction_mse", LOSS="cross_entropy",
         ALIGN_REGIONS_TO_WORDS=False),
]


@pytest.mark.parametrize("variant", VARIANTS)
def test_grounding_head_parity(variant):
    gh_mod = ref_module(
        "modeling.mmss_heads.grounding_head", with_transformers_shim=True
    )

    cfg = _ref_grounding_cfg(**variant)
    torch.manual_seed(0)
    ref_head = gh_mod.GroundingHead(cfg, VDIM, LDIM)
    ref_head.eval()

    regions, rmask, caption, attn, special = _inputs()
    input_image = {
        "region_features": torch.from_numpy(regions),
        "region_mask": torch.from_numpy(rmask),
    }
    input_caption = {
        "input_embeddings": torch.from_numpy(caption),
        "attention_mask": torch.from_numpy(attn),
        "special_tokens_mask": torch.from_numpy(special),
    }
    with torch.no_grad():
        ref_info, ref_losses = ref_head(input_image, input_caption)

    # ---- ours: same math over the reference's own v2l projection -----
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.mmss.grounding_head import (
        GroundingHead,
        GroundingStatics,
    )

    statics = GroundingStatics(
        local_metric=variant["LOCAL_METRIC"],
        global_metric=variant["GLOBAL_METRIC"],
        alignment=variant["ALIGNMENT"],
        temperature=variant.get("ALIGNMENT_TEMPERATURE", 1.0),
        loss_type=variant["LOSS"],
        negative_mining=variant.get("NEGATIVE_MINING", "random"),
        margin=cfg.MODEL.MMSS_HEAD.GROUNDING.TRIPLET_MARGIN,
        align_words=variant.get("ALIGN_WORDS_TO_REGIONS", True),
        align_regions=variant.get("ALIGN_REGIONS_TO_WORDS", True),
    )
    head = GroundingHead(statics, l_dim=LDIM)
    w = ref_head.v2l_projection.weight.detach().numpy()
    b = ref_head.v2l_projection.bias.detach().numpy()
    image_emb = regions @ w.T + b
    cmask = attn * (1 - special)

    import jax

    params = head.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(image_emb),
        jnp.asarray(rmask),
        jnp.asarray(caption),
        jnp.asarray(cmask),
    )
    info, losses = head.apply(
        params,
        jnp.asarray(image_emb),
        jnp.asarray(rmask),
        jnp.asarray(caption),
        jnp.asarray(cmask),
    )

    assert set(losses) == set(ref_losses), (
        set(losses) ^ set(ref_losses)
    )
    for k in ref_losses:
        np.testing.assert_allclose(
            np.asarray(losses[k]),
            ref_losses[k].numpy(),
            rtol=0,
            atol=2e-5,
            err_msg=k,
        )
    ref_acc = {k: v for k, v in ref_info.items() if "Batch Accuracy" in k}
    our_acc = {k: np.asarray(v) for k, v in info.items() if "Batch Accuracy" in k}
    assert set(our_acc) == set(ref_acc)
    for k in ref_acc:
        np.testing.assert_allclose(
            our_acc[k], ref_acc[k].numpy(), rtol=0, atol=1e-6, err_msg=k
        )


# ---------------------------------------------------------------------------
# TransformerHead parity (reference transformer_head.py:9-260)
# ---------------------------------------------------------------------------

B2, R2, W2, VDIM2, HID, VOCAB_T = 3, 4, 5, 6, 32, 50


def _lin(mod):
    return {
        "kernel": mod.weight.detach().numpy().T,
        "bias": mod.bias.detach().numpy(),
    }


def _ln(mod):
    return {
        "scale": mod.weight.detach().numpy(),
        "bias": mod.bias.detach().numpy(),
    }


def _encoder_params(enc, num_layers, num_heads, hidden):
    """New-HF BertEncoder state -> our flax BertEncoder tree (same
    mapping as tests/test_bert_hf_parity.py::_hf_to_flax)."""
    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    hd = hidden // num_heads

    def lin(prefix, out_general=False, in_general=False):
        w = sd[prefix + ".weight"].T
        b = sd[prefix + ".bias"]
        if out_general:
            w = w.reshape(hidden, num_heads, hd)
            b = b.reshape(num_heads, hd)
        if in_general:
            w = w.reshape(num_heads, hd, hidden)
        return {"kernel": w, "bias": b}

    def lnp(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    out = {}
    for i in range(num_layers):
        p = f"layer.{i}"
        out[f"layer{i}"] = {
            "attention": {
                "query": lin(p + ".attention.self.query", out_general=True),
                "key": lin(p + ".attention.self.key", out_general=True),
                "value": lin(p + ".attention.self.value", out_general=True),
                "output": lin(p + ".attention.output.dense", in_general=True),
            },
            "attention_ln": lnp(p + ".attention.output.LayerNorm"),
            "intermediate": lin(p + ".intermediate.dense"),
            "output": lin(p + ".output.dense"),
            "output_ln": lnp(p + ".output.LayerNorm"),
        }
    return out


def test_transformer_head_parity():
    """Same weights, dense masks (under which the reference's additive
    0/1 attention mask is a softmax-invariant shift): MLM loss/accuracy
    and the BxB image-caption matching loss must match."""
    import types

    th_mod = ref_module(
        "modeling.mmss_heads.transformer_head", with_transformers_shim=True
    )
    from maskrcnn_benchmark.config import cfg as ref_cfg

    cfg = ref_cfg.clone()
    t = cfg.MODEL.MMSS_HEAD.TRANSFORMER
    t.BERT_CONFIG.update(
        dict(
            vocab_size=VOCAB_T,
            hidden_size=HID,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=64,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
    )
    t.MMM_LOSS = "cross_entropy"
    t.MVM_LOSS = ""

    # modern HF's attention dispatch needs an explicit implementation
    # when BertEncoder is built standalone from a raw config
    import transformers as hf

    th_mod.BertConfig = lambda **kw: hf.BertConfig(
        attn_implementation="eager", **kw
    )

    torch.manual_seed(0)
    backbone = types.SimpleNamespace(
        embeddings=torch.nn.Parameter(0.1 * torch.randn(VOCAB_T, HID))
    )
    ref_head = th_mod.TransformerHead(
        cfg, v_dim=VDIM2, l_dim=HID, loc_dim=2, backbone=backbone
    )
    ref_head.eval()
    # modern HF returns a ModelOutput; the reference unpacks a tuple
    hf_encoder = ref_head.encoder
    ref_head.__dict__["encoder"] = lambda *a, **k: hf_encoder(
        *a, **{**k, "return_dict": False}
    )

    rng = np.random.RandomState(5)
    regions = rng.randn(B2, R2, VDIM2).astype(np.float32)
    region_loc = rng.rand(B2, R2, 2).astype(np.float32)
    rmask = np.ones((B2, R2), np.int64)
    encoded = rng.randn(B2, W2, HID).astype(np.float32)
    cmask = np.ones((B2, W2), np.int64)
    mlm_mask = (rng.rand(B2, W2) < 0.4).astype(np.int64)
    mlm_mask[0, 0] = 1  # at least one target
    target_ids = rng.randint(0, VOCAB_T, (B2, W2)).astype(np.int64)

    input_image = {
        "region_features": torch.from_numpy(regions),
        "region_mask": torch.from_numpy(rmask),
        "region_loc": torch.from_numpy(region_loc),
        "mvm_mask": torch.zeros(B2, R2),
        "target_region_features": torch.zeros(B2, R2, VDIM2),
    }
    input_caption = {
        "encoded_tokens": torch.from_numpy(encoded),
        "attention_mask": torch.from_numpy(cmask),
        "mlm_mask": torch.from_numpy(mlm_mask),
        "target_ids": torch.from_numpy(target_ids),
    }
    with torch.no_grad():
        ref_info, ref_losses = ref_head(input_image, input_caption)

    # ---- ours with the same weights -----------------------------------
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.mmss.transformer_head import (
        TransformerHead,
        TransformerHeadStatics,
    )

    statics = TransformerHeadStatics(
        num_layers=2,
        num_heads=2,
        intermediate_size=64,
        hidden_size=HID,
        vocab_size=VOCAB_T,
        mmm_loss="cross_entropy",
        mlm=True,
    )
    params = {
        "visual_emb": {
            "image_embeddings": _lin(ref_head.visual_emb.image_embeddings),
            "image_location_embeddings": _lin(
                ref_head.visual_emb.image_location_embeddings
            ),
            "ln": _ln(ref_head.visual_emb.LayerNorm),
        },
        "encoder": _encoder_params(hf_encoder, 2, 2, HID),
        "pooler": _lin(ref_head.pooler.dense),
        "seq_relationship": _lin(ref_head.heads.bi_seq_relationship),
        "mlm_transform": _lin(ref_head.heads.predictions.transform.dense),
        "mlm_ln": _ln(ref_head.heads.predictions.transform.LayerNorm),
        "mlm_bias": ref_head.heads.predictions.bias.detach().numpy(),
    }
    w = ref_head.v2l_projection.weight.detach().numpy()
    b = ref_head.v2l_projection.bias.detach().numpy()
    image_emb = regions @ w.T + b

    import jax

    head = TransformerHead(statics)
    info, losses = head.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(image_emb),
        jnp.asarray(region_loc),
        jnp.asarray(rmask),
        jnp.asarray(encoded),
        jnp.asarray(cmask),
        jnp.asarray(mlm_mask),
        jnp.asarray(target_ids),
        jnp.asarray(backbone.embeddings.detach().numpy()),
    )

    for k in ("Masked Language Modeling Loss", "Image Caption Matching Loss"):
        np.testing.assert_allclose(
            np.asarray(losses[k]), ref_losses[k].numpy(),
            rtol=0, atol=3e-5, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(info["Masked Language Modeling Accuracy"]),
        ref_info["Masked Language Modeling Accuracy"].numpy(),
        atol=1e-6,
    )
    for k in ("Batch Accuracy (Choose Caption)", "Batch Accuracy (Choose Image)"):
        np.testing.assert_allclose(
            np.asarray(info[k]), ref_info[k].numpy(), atol=1e-6, err_msg=k
        )
