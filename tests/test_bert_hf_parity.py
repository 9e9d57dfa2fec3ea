"""Cross-check our flax BERT encoder against HuggingFace's (torch CPU)
with identical weights — the reference's language backbone IS
HuggingFace BERT (reference modeling/language_backbone/transformers.py
and obs/transformers.py), so numeric parity here pins the whole MMSS
text tower."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from cvpr22_cross_modal_pseudo_labeling_tpu.models.language.bert import (
    BertModel,
)


def _hf_to_flax(hf, num_layers, num_heads):
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    H = sd["embeddings.word_embeddings.weight"].shape[1]
    hd = H // num_heads

    def lin(prefix, out_shape=None, in_general=False, out_general=False):
        w = sd[prefix + ".weight"].T  # [in, out]
        b = sd[prefix + ".bias"]
        if out_general:  # DenseGeneral -> (heads, hd)
            w = w.reshape(H, num_heads, hd)
            b = b.reshape(num_heads, hd)
        if in_general:  # DenseGeneral axis=(-2,-1): kernel (heads, hd, H)
            w = w.reshape(num_heads, hd, H)
        return {"kernel": w, "bias": b}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    params = {
        "word_embeddings": sd["embeddings.word_embeddings.weight"],
        "position_embeddings": sd["embeddings.position_embeddings.weight"],
        "token_type_embeddings": sd["embeddings.token_type_embeddings.weight"],
        "embeddings_ln": ln("embeddings.LayerNorm"),
        "encoder": {},
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        params["encoder"][f"layer{i}"] = {
            "attention": {
                "query": lin(p + ".attention.self.query", out_general=True),
                "key": lin(p + ".attention.self.key", out_general=True),
                "value": lin(p + ".attention.self.value", out_general=True),
                "output": lin(p + ".attention.output.dense", in_general=True),
            },
            "attention_ln": ln(p + ".attention.output.LayerNorm"),
            "intermediate": lin(p + ".intermediate.dense"),
            "output": lin(p + ".output.dense"),
            "output_ln": ln(p + ".output.LayerNorm"),
        }
    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}


def test_bert_encoder_matches_huggingface():
    cfg = transformers.BertConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=24,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg, add_pooling_layer=False).eval()

    rng = np.random.RandomState(1)
    ids = rng.randint(0, 120, (3, 10)).astype(np.int64)
    mask = np.ones((3, 10), np.int64)
    mask[1, 7:] = 0
    mask[2, 4:] = 0

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    model = BertModel(
        vocab_size=120,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        max_position_embeddings=24,
    )
    params = _hf_to_flax(hf, num_layers=2, num_heads=4)
    out, word_table = model.apply(
        params, jnp.asarray(ids), jnp.asarray(mask, bool)
    )
    out = np.asarray(out)

    valid = mask.astype(bool)
    diff = np.abs(out - ref)[valid]
    assert diff.max() < 2e-4, diff.max()
    np.testing.assert_allclose(
        np.asarray(word_table),
        hf.embeddings.word_embeddings.weight.detach().numpy(),
        rtol=0, atol=0,
    )
