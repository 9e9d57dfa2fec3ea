"""End-to-end oracle for the COMPLETE reference MMSS-GCNN stack.

The reference MMSS meta-architecture cannot even import at HEAD
(SURVEY §2.10 defect 1: the live language_backbone package lacks
`build_language_backbone`; the working spec lives in obs/).  The head
parity suite (test_mmss_reference_parity.py) pins GroundingHead /
TransformerHead math with transplanted weights, but the full
MMSSGridModel — conv backbone -> grid regions/masks/locations
(mmss_gcnn.py:50-77) -> v2l tie -> heads -> loss dict — has never run
as a reference oracle.  Here it does: the obs-spec language backbone
(obs/backbone.py:10-15 BERT-Base branch, obs/transformers.py BERT) is
wired into the reference's own `build_detection_model`, both stacks get
identical weights, and the training loss dicts must agree; a 10-step
SGD trajectory then pins the solver composition for the MMSS stage
(mmss.yaml: FREEZE_CONV_BODY_AT 0 trains the WHOLE R-50-C5, BERT
frozen), which neither the GeneralizedRCNN nor the ST trajectory
oracles cover (both freeze most of the backbone).

Determinism choices (both stacks):
* SPATIAL_DROPOUT=0 (the reference draws np.random permutations,
  mmss_gcnn.py:79-95 — behavioral randomness that cannot be pinned);
* GroundingHead e2e runs with MLM OFF (obs BERT only attaches
  mlm_mask/target_ids when mlm is on, obs/transformers.py:32-55, and
  grounding never reads them);
* TransformerHead e2e runs with MASKED_LANGUAGE_MODELING_PROB=1.0 and
  PROB_MASK=1.0: EVERY real token is deterministically replaced by
  [MASK] on both stacks, so the np.random/jax.random draw sequences
  cancel out of the comparison;
* TransformerHead captions are equal-length (dense attention): the
  reference feeds the RAW 0/1 mask additively to BertEncoder
  (transformer_head.py:125-131), which is a softmax-invariant shift
  only when the mask is all-ones.
"""

import importlib
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_oracle import install_reference_full
from test_reference_parity import _randomize_state_dict
from test_e2e_reference_parity import _tame_state_dict
from test_mmss_reference_parity import _encoder_params, _lin, _ln
from test_bert_hf_parity import _hf_to_flax

pytestmark = pytest.mark.slow

HID = 64
IMG_H, IMG_W = 96, 128  # C5 grid 3x4 = 12 regions
B = 3
N_STEPS = 10
BASE_LR = 1e-4
WARMUP_ITERS = 4
MILESTONES = (6,)

WORDS = ["cat", "dog", "zebra", "chair", "sofa", "table", "horse", "lamp"]
VOCAB_M = {
    w: i
    for i, w in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
    )
}
CAPS_RAGGED = ["cat dog", "zebra", "chair sofa table"]
CAPS_DENSE = ["cat dog", "zebra chair", "sofa table"]
TRUE_SIZES = [(IMG_H, IMG_W), (64, 90), (41, 70)]


class FakeTokenizerM:
    """batch_encode_plus + the MLM surface obs/transformers.py touches
    (mask_token, convert_tokens_to_ids, __len__)."""

    mask_token = "[MASK]"

    def batch_encode_plus(self, text_list, **kw):
        seqs = [
            [VOCAB_M["[CLS]"]]
            + [VOCAB_M.get(w, VOCAB_M["[UNK]"]) for w in t.split()]
            + [VOCAB_M["[SEP]"]]
            for t in text_list
        ]
        n = max(len(s) for s in seqs)
        out = {
            "input_ids": [],
            "attention_mask": [],
            "special_tokens_mask": [],
        }
        for s in seqs:
            pad = n - len(s)
            out["input_ids"].append(s + [VOCAB_M["[PAD]"]] * pad)
            out["attention_mask"].append([1] * len(s) + [0] * pad)
            out["special_tokens_mask"].append(
                [1] + [0] * (len(s) - 2) + [1] + [1] * pad
            )
        return out

    def convert_tokens_to_ids(self, token):
        return VOCAB_M[token]

    def __len__(self):
        return len(VOCAB_M)


def _tokenize(text_list):
    enc = FakeTokenizerM().batch_encode_plus(text_list)
    return {
        "input_ids": np.asarray(enc["input_ids"], np.int32),
        "attention_mask": np.asarray(enc["attention_mask"], np.int32),
        "special_tokens_mask": np.asarray(
            enc["special_tokens_mask"], np.int32
        ),
    }


def _install_reference_mmss():
    """install_reference_full + the obs-spec language backbone wired
    into mmss_gcnn (replacing the raising stub), with the HF surface
    patched to an offline 1-layer BERT + FakeTokenizerM."""
    build = install_reference_full()
    import transformers as hf

    # obs/word_embedding.py imports the pre-3.x HF tokenizer module
    if "transformers.tokenization_bert" not in sys.modules:
        from transformers.models.bert import tokenization_bert as new_tok

        shim = types.ModuleType("transformers.tokenization_bert")
        shim.BasicTokenizer = new_tok.BasicTokenizer
        sys.modules["transformers.tokenization_bert"] = shim

    obs_t = importlib.import_module(
        "maskrcnn_benchmark.modeling.language_backbone.obs.transformers"
    )
    bert_cfg = hf.BertConfig(
        vocab_size=len(VOCAB_M),
        hidden_size=HID,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=32,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        attn_implementation="eager",
    )
    obs_t.BertConfig = types.SimpleNamespace(
        from_pretrained=lambda name: bert_cfg
    )
    obs_t.BertTokenizer = types.SimpleNamespace(
        from_pretrained=lambda name: FakeTokenizerM()
    )

    def _model(name, config=None):
        torch.manual_seed(3)
        return hf.BertModel(config)

    obs_t.BertModel = types.SimpleNamespace(from_pretrained=_model)

    obs_pkg = importlib.import_module(
        "maskrcnn_benchmark.modeling.language_backbone.obs"
    )
    mg = sys.modules["maskrcnn_benchmark.modeling.detector.mmss_gcnn"]
    mg.build_language_backbone = obs_pkg.build_language_backbone

    # TransformerHead builds BertEncoder standalone from a raw config;
    # modern HF needs the explicit eager attention implementation
    th_mod = sys.modules[
        "maskrcnn_benchmark.modeling.mmss_heads.transformer_head"
    ]
    th_mod.BertConfig = lambda **kw: hf.BertConfig(
        attn_implementation="eager", **kw
    )
    return build


def _ref_mmss_cfg(heads):
    from maskrcnn_benchmark.config import cfg

    c = cfg.clone()
    c.MODEL.DEVICE = "cpu"
    c.MODEL.META_ARCHITECTURE = "MMSS-GCNN"
    c.MODEL.BACKBONE.CONV_BODY = "R-50-C5"
    c.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 0  # mmss.yaml: train everything
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 2048
    c.MODEL.LANGUAGE_BACKBONE.TYPE = "BERT-Base"
    c.MODEL.LANGUAGE_BACKBONE.FREEZE = True
    h = c.MODEL.MMSS_HEAD
    h.TYPES = tuple(heads)
    h.DEFAULT_HEAD = heads[0]
    h.TIE_VL_PROJECTION_WEIGHTS = True
    h.SPATIAL_DROPOUT = 0
    g = h.GROUNDING
    g.LOCAL_METRIC = "dot"
    g.GLOBAL_METRIC = "aligned_local"
    g.ALIGNMENT = "softmax"
    g.ALIGNMENT_TEMPERATURE = 10.0
    g.LOSS = "cross_entropy"
    g.ALIGN_WORDS_TO_REGIONS = True
    g.ALIGN_REGIONS_TO_WORDS = True
    t = h.TRANSFORMER
    t.MASKED_LANGUAGE_MODELING = "TransformerHead" in heads
    t.MASKED_LANGUAGE_MODELING_PROB = 1.0
    t.MASKED_LANGUAGE_MODELING_PROB_MASK = 1.0
    t.MASKED_LANGUAGE_MODELING_PROB_NOISE = 0.0
    t.MMM_LOSS = "cross_entropy"
    t.MASKED_VISUAL_MODELING = False
    t.MVM_LOSS = ""
    t.BERT_CONFIG.update(
        dict(
            vocab_size=len(VOCAB_M),
            hidden_size=HID,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=32,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
    )
    return c


def _our_mmss_cfg(heads):
    from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg

    c = get_default_cfg()
    c.MODEL.META_ARCHITECTURE = "MMSS-GCNN"
    c.MODEL.BACKBONE.CONV_BODY = "R-50-C5"
    c.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 0
    c.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 2048
    c.MODEL.LANGUAGE_BACKBONE.TYPE = "BERT-Base"
    c.MODEL.LANGUAGE_BACKBONE.FREEZE = True
    h = c.MODEL.MMSS_HEAD
    h.TYPES = tuple(heads)
    h.DEFAULT_HEAD = heads[0]
    h.TIE_VL_PROJECTION_WEIGHTS = True
    h.SPATIAL_DROPOUT = 0
    g = h.GROUNDING
    g.LOCAL_METRIC = "dot"
    g.GLOBAL_METRIC = "aligned_local"
    g.ALIGNMENT = "softmax"
    g.ALIGNMENT_TEMPERATURE = 10.0
    g.LOSS = "cross_entropy"
    g.ALIGN_WORDS_TO_REGIONS = True
    g.ALIGN_REGIONS_TO_WORDS = True
    t = h.TRANSFORMER
    t.MASKED_LANGUAGE_MODELING = "TransformerHead" in heads
    t.MASKED_LANGUAGE_MODELING_PROB = 1.0
    t.MASKED_LANGUAGE_MODELING_PROB_MASK = 1.0
    t.MASKED_LANGUAGE_MODELING_PROB_NOISE = 0.0
    t.MMM_LOSS = "cross_entropy"
    t.BERT_CONFIG.vocab_size = len(VOCAB_M)
    t.BERT_CONFIG.hidden_size = HID
    t.BERT_CONFIG.num_hidden_layers = 2
    t.BERT_CONFIG.num_attention_heads = 2
    t.BERT_CONFIG.intermediate_size = 32
    return c


def _images(ragged):
    rng = np.random.RandomState(13)
    canvas = rng.randn(B, 3, IMG_H, IMG_W).astype(np.float32)
    sizes = TRUE_SIZES if ragged else [(IMG_H, IMG_W)] * B
    for i, (h, w) in enumerate(sizes):
        canvas[i, :, h:, :] = 0.0
        canvas[i, :, :, w:] = 0.0
    return canvas, sizes


def _build_reference(heads, captions, ragged):
    """Builds + tames the reference MMSS model; returns it with the
    shared fixtures."""
    build = _install_reference_mmss()
    from maskrcnn_benchmark.structures.image_list import to_image_list

    ref_model = build(_ref_mmss_cfg(heads))
    rng = np.random.RandomState(7)
    orig = ref_model.state_dict()
    ref_model.load_state_dict(
        _tame_state_dict(_randomize_state_dict(orig, rng), orig)
    )
    ref_model.train()
    for head in ref_model.mmss_heads.values():
        if hasattr(head, "encoder"):
            enc = head.encoder
            head.__dict__["encoder"] = (
                lambda e: lambda *a, **k: e(*a, **{**k, "return_dict": False})
            )(enc)

    canvas, sizes = _images(ragged)
    tensors = [
        torch.from_numpy(canvas[i, :, :h, :w].copy())
        for i, (h, w) in enumerate(sizes)
    ]
    image_list = to_image_list(tensors, 32)
    return ref_model, image_list, canvas, sizes


def _our_model_and_inputs(heads, canvas, sizes, captions):
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.mmss_gcnn import (
        MMSSGridModel,
        mmss_statics_from_cfg,
    )

    cfg = _our_mmss_cfg(heads)
    statics = mmss_statics_from_cfg(cfg)._replace(
        l_dim=HID,
        vocab_size=len(VOCAB_M),
        bert_layers=1,
        bert_heads=2,
        bert_intermediate=32,
        mask_token_id=VOCAB_M["[MASK]"],
    )
    model = MMSSGridModel(statics)
    images = jnp.asarray(canvas.transpose(0, 2, 3, 1))
    image_sizes = jnp.asarray(np.asarray(sizes, np.int32))
    toks = _tokenize(captions)
    captions_j = {k: jnp.asarray(v) for k, v in toks.items()}
    return model, cfg, images, image_sizes, captions_j


def _transplant(ref_model, init_params, heads):
    """Reference weights -> our flax tree: backbone via the torch
    importer, language table / BERT + v2l + transformer head by the
    proven head-level mappings."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        import_torch_state_dict,
    )

    # .copy(): torch .numpy() returns LIVE VIEWS of the parameters; the
    # trajectory test runs the reference optimizer AFTER this transplant,
    # and in-place SGD updates must not leak into our weights
    sd_backbone = {
        k: v.detach().numpy().copy()
        for k, v in ref_model.state_dict().items()
        if k.startswith("backbone.")
    }
    params, report = import_torch_state_dict(init_params, sd_backbone)
    assert not report["missed_source_keys"], report["missed_source_keys"]

    bert = ref_model.language_backbone.body.bert_model
    if "TransformerHead" in heads:
        params["language_backbone"] = jax.tree_util.tree_map(
            jnp.asarray, _hf_to_flax(bert, 1, 2)["params"]
        )
    else:
        params["language_backbone"] = {
            "word_embeddings": jnp.asarray(
                bert.embeddings.word_embeddings.weight.detach().numpy()
            )
        }

    default_head = ref_model.mmss_heads[heads[0]]
    params["v2l_projection"] = jax.tree_util.tree_map(
        jnp.asarray, _lin(default_head.v2l_projection)
    )
    if "TransformerHead" in heads:
        th = ref_model.mmss_heads["TransformerHead"]
        params["transformer_head"] = jax.tree_util.tree_map(
            jnp.asarray,
            {
                "visual_emb": {
                    "image_embeddings": _lin(th.visual_emb.image_embeddings),
                    "image_location_embeddings": _lin(
                        th.visual_emb.image_location_embeddings
                    ),
                    "ln": _ln(th.visual_emb.LayerNorm),
                },
                # _modules: th.encoder is shadowed by the return_dict
                # wrapper installed in _build_reference
                "encoder": _encoder_params(th._modules["encoder"], 2, 2, HID),
                "pooler": _lin(th.pooler.dense),
                "seq_relationship": _lin(th.heads.bi_seq_relationship),
                "mlm_transform": _lin(th.heads.predictions.transform.dense),
                "mlm_ln": _ln(th.heads.predictions.transform.LayerNorm),
                "mlm_bias": th.heads.predictions.bias.detach().numpy(),
            },
        )
    # materialize every leaf on device: no numpy view of a live torch
    # tensor may survive into the jax tree
    return jax.tree_util.tree_map(jnp.asarray, params)


def _rngs():
    return {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "mlm": jax.random.PRNGKey(2),
    }


def test_mmss_grounding_e2e_forward_parity():
    """Full MMSS-GCNN, GroundingHead only, ragged image/caption masks:
    the training loss dict and batch-accuracy info must match the
    complete reference stack."""
    ref_model, image_list, canvas, sizes = _build_reference(
        ("GroundingHead",), CAPS_RAGGED, ragged=True
    )
    with torch.no_grad():
        ref_info, ref_losses = ref_model(image_list, CAPS_RAGGED)
    ref_losses = {k: float(v) for k, v in ref_losses.items()}

    model, _, images, image_sizes, captions_j = _our_model_and_inputs(
        ("GroundingHead",), canvas, sizes, CAPS_RAGGED
    )
    init = model.init(_rngs(), images, image_sizes, captions_j, train=True)
    params = _transplant(ref_model, init["params"], ("GroundingHead",))
    info, losses = model.apply(
        {"params": params},
        images,
        image_sizes,
        captions_j,
        train=True,
        rngs={"mlm": jax.random.PRNGKey(5)},
    )
    losses = {k: float(v) for k, v in losses.items()}
    assert set(losses) == set(ref_losses), set(losses) ^ set(ref_losses)
    for k, rv in ref_losses.items():
        assert abs(losses[k] - rv) <= 5e-3 * max(1.0, abs(rv)), (
            f"{k}: ours {losses[k]:.6f} vs reference {rv:.6f}"
        )
    for k in ("Batch Accuracy (Choose Caption)", "Batch Accuracy (Choose Image)"):
        if k in ref_info:
            assert abs(float(info[k]) - float(ref_info[k])) <= 1e-6, k


def test_mmss_transformer_e2e_forward_parity():
    """Full MMSS-GCNN, TransformerHead only, fully-masked MLM (PROB=1,
    PROB_MASK=1 makes the masking deterministic on both stacks), dense
    equal-length captions (see module docstring on the reference's raw
    additive attention mask)."""
    ref_model, image_list, canvas, sizes = _build_reference(
        ("TransformerHead",), CAPS_DENSE, ragged=False
    )
    with torch.no_grad():
        ref_info, ref_losses = ref_model(image_list, CAPS_DENSE)
    ref_losses = {k: float(v) for k, v in ref_losses.items()}

    model, _, images, image_sizes, captions_j = _our_model_and_inputs(
        ("TransformerHead",), canvas, sizes, CAPS_DENSE
    )
    init = model.init(_rngs(), images, image_sizes, captions_j, train=True)
    params = _transplant(ref_model, init["params"], ("TransformerHead",))
    info, losses = model.apply(
        {"params": params},
        images,
        image_sizes,
        captions_j,
        train=True,
        rngs={"mlm": jax.random.PRNGKey(5)},
    )
    losses = {k: float(v) for k, v in losses.items()}
    assert set(losses) == set(ref_losses), set(losses) ^ set(ref_losses)
    for k, rv in ref_losses.items():
        assert abs(losses[k] - rv) <= 5e-3 * max(1.0, abs(rv)), (
            f"{k}: ours {losses[k]:.6f} vs reference {rv:.6f}"
        )
    assert (
        abs(
            float(info["Masked Language Modeling Accuracy"])
            - float(ref_info["Masked Language Modeling Accuracy"])
        )
        <= 1e-6
    )


def _solver_overrides(c):
    c.SOLVER.BASE_LR = BASE_LR
    c.SOLVER.MOMENTUM = 0.9
    c.SOLVER.WEIGHT_DECAY = 1e-4
    c.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    c.SOLVER.BIAS_LR_FACTOR = 2
    c.SOLVER.WARMUP_ITERS = WARMUP_ITERS
    c.SOLVER.WARMUP_FACTOR = 1.0 / 3
    c.SOLVER.WARMUP_METHOD = "linear"
    c.SOLVER.STEPS = MILESTONES
    c.SOLVER.GAMMA = 0.1
    return c


def test_mmss_grounding_ten_step_trajectory():
    """10 closed-loop SGD steps on the MMSS pretraining stage.  Unlike
    the detection trajectories, FREEZE_CONV_BODY_AT=0 puts the ENTIRE
    R-50-C5 (stem included) in the optimizer on both stacks while BERT
    stays frozen — a freeze-set or param-group slip in the MMSS stage
    configuration compounds past the envelope by step 10."""
    ref_model, image_list, canvas, sizes = _build_reference(
        ("GroundingHead",), CAPS_RAGGED, ragged=True
    )
    from maskrcnn_benchmark.solver.build import (
        make_lr_scheduler,
        make_optimizer,
    )

    rc = _solver_overrides(_ref_mmss_cfg(("GroundingHead",)))
    optimizer = make_optimizer(rc, ref_model)
    scheduler = make_lr_scheduler(rc, optimizer)

    model, oc, images, image_sizes, captions_j = _our_model_and_inputs(
        ("GroundingHead",), canvas, sizes, CAPS_RAGGED
    )
    oc = _solver_overrides(oc)
    init = model.init(_rngs(), images, image_sizes, captions_j, train=True)
    params = _transplant(ref_model, init["params"], ("GroundingHead",))

    ref_traj = []
    for _ in range(N_STEPS):
        _, losses = ref_model(image_list, CAPS_RAGGED)
        total = sum(losses.values())
        optimizer.zero_grad()
        total.backward()
        optimizer.step()
        scheduler.step()
        ref_traj.append({k: float(v.detach()) for k, v in losses.items()})

    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.optimizer import (
        frozen_prefixes_from_cfg,
        make_optimizer as our_make_optimizer,
    )
    import optax

    tx, _ = our_make_optimizer(
        oc, params, frozen_prefixes_from_cfg(oc, meta_arch="MMSS-GCNN")
    )
    opt_state = tx.init(params)

    def loss_fn(p):
        _, losses = model.apply(
            {"params": p},
            images,
            image_sizes,
            captions_j,
            train=True,
            rngs={"mlm": jax.random.PRNGKey(5)},
        )
        return sum(losses.values()), losses

    @jax.jit
    def step(p, s):
        grads, losses = jax.grad(loss_fn, has_aux=True)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, losses

    our_traj = []
    for _ in range(N_STEPS):
        params, opt_state, losses = step(params, opt_state)
        our_traj.append({k: float(v) for k, v in losses.items()})

    assert set(our_traj[0]) == set(ref_traj[0])
    for i, (ref, ours) in enumerate(zip(ref_traj, our_traj)):
        for k in ref:
            tol = 5e-3 * (1 + i)
            assert abs(ours[k] - ref[k]) <= tol * max(1.0, abs(ref[k])), (
                f"step {i} {k}: ours {ours[k]:.6f} vs ref {ref[k]:.6f} "
                f"(tol {tol})"
            )
