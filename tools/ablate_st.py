#!/usr/bin/env python
"""Does the paper's uncertainty mechanism actually WORK in this stack?

Round-3 proved numerical parity (pseudo-labels, reparameterized mask
sampling, the 0.01/avg_uncertain reweighting, a 10-step trajectory
oracle) but never that the mechanism *functions*: that sigma flags
noisy pseudo-labels and that the adaptive weight
(st_generalized_rcnn.py:336-341 -> ours
models/detector/st_generalized_rcnn.py `0.01/avg_uncertain`) beats a
fixed lambda when pseudo-labels are corrupted.  This is a controlled
synthetic study of exactly that claim, using the REAL ``MaskPredictor``
module (models/roi_heads/mask_head.py — the reparameterized
mu + eps*sigma sampling of reference roi_mask_predictors.py:43-63),
run under BOTH loss estimators now shipped as
``MODEL.ROI_MASK_HEAD.UNCERTAINTY_ESTIMATOR``:

* ``sampled_bce`` (reference parity, n_samples=1): mean BCE over
  sampled logits.  Jensen's inequality makes this monotone in sigma —
  E[BCE(mu + eps*sigma)] >= BCE(mu), with the gradient
  d/dsigma = E[eps * sigmoid(mu + eps*sigma)] >= 0 concentrated where
  |mu| is small — so training pressure shrinks sigma FASTEST at
  ambiguous/noisy pixels.  The measured per-population sigma inverts
  the paper's narrative, and the batch statistic 0.01/avg_uncertain
  behaves as a RISING ANNEAL of the pseudo-loss weight over training
  (frozen at UNCERTAINTY_TRAIN_ITER), not as per-batch noise
  discrimination.
* ``logmeanexp`` (Kendall & Gal loss attenuation, n_samples=8):
  -log((1/T) sum_t exp(-bce_t)) per pixel.  A lucky sample caps the
  loss of a confidently-contradicted pixel, so sigma GROWS exactly on
  corrupted targets — realizing the behavior the paper describes, with
  the same module, one config knob away.

Study design: every example encodes its TRUE box geometry in feature
channel 0 (learnable); "hard" examples additionally carry a texture
marker (channel 1) and their target is replaced by an unrelated random
box with probability CORRUPT_P — pseudo-label noise that CONTRADICTS
learnable structure, the regime the paper's sigma is meant to flag
(a teacher mislabeling hard images).  Checks, per estimator:

  1. sigma discrimination: mean sigma on corrupted-population examples
     vs clean ones (ratio + per-example AUROC);
  2. weight routing/anneal: the per-batch adaptive weight
     0.01/avg_uncertain for pure-noisy vs pure-clean batches, and its
     trajectory over training steps;
  3. downstream win: a linear probe trained with per-sample weights
     0.01/sigma_i on labels corrupted exactly on the noisy population
     (vs fixed-lambda at equal mean weight, vs an oracle that drops
     noisy samples) scored by clean-label held-out accuracy.

Asserted (reduced) by tests/test_uncertainty_efficacy.py; the numbers
are recorded in COVERAGE.md.

  python tools/ablate_st.py [--steps 500] [--seeds 3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CORRUPT_P = 0.8  # P(target replaced | hard example)


def make_data(rng, n, noisy_frac=0.5, m=14, feat_noise=0.35):
    """Features [n, m, m, 8]; targets [n, 2m, 2m]; is_noisy [n];
    is_corrupted [n]; clean_cls [n].

    Every example's TRUE box (rows < y0, cols < x0) is encoded in
    channel 0.  Hard examples (is_noisy) carry a channel-1 marker and
    their target is replaced by a random box w.p. CORRUPT_P — so the
    corrupted targets contradict structure the head CAN learn from the
    clean majority, instead of being feature-free noise.
    """
    feats = rng.randn(n, m, m, 8).astype(np.float32) * feat_noise
    targets = np.zeros((n, 2 * m, 2 * m), np.float32)
    is_noisy = rng.rand(n) < noisy_frac
    is_corrupted = np.zeros(n, bool)
    areas = np.zeros(n, np.float32)
    for i in range(n):
        y0, x0 = rng.randint(4, 2 * m - 2, size=2)
        # true geometry, always readable from channel 0
        feats[i, : max(y0 // 2, 1), : max(x0 // 2, 1), 0] += 1.0
        areas[i] = y0 * x0
        if is_noisy[i]:
            feats[i, :, :, 1] += 1.0  # the "hard image" texture marker
            if rng.rand() < CORRUPT_P:
                is_corrupted[i] = True
                ry0, rx0 = rng.randint(0, 2 * m - 6, size=2)
                rh, rw = rng.randint(4, m, size=2)
                targets[i, ry0 : ry0 + rh, rx0 : rx0 + rw] = 1.0
                continue
        targets[i, :y0, :x0] = 1.0
    # clean binary attribute of the TRUE geometry (median split on
    # area) — predictable from features for every example, including
    # corrupted ones whose mask target lies
    clean_cls = (areas > np.median(areas)).astype(np.int32)
    return feats, targets, is_noisy, is_corrupted, clean_cls


def train_mask_head(
    seed, steps, batch, feats, targets, estimator, num_samples, lr=1e-3,
    traj_every=0, dim_reduced=256,
):
    """Trains the real MaskPredictor under the given estimator; returns
    (sigma_of, trajectory) where sigma_of(feats) -> per-example mean
    sigma and trajectory is [(step, avg_sigma)] when traj_every > 0."""
    import jax
    import jax.numpy as jnp
    import optax

    from cvpr22_cross_modal_pseudo_labeling_tpu.models.roi_heads.mask_head import (
        MaskPredictor,
    )

    model = MaskPredictor(
        num_classes=1, uncertainty=True, dim_reduced=dim_reduced
    )
    n = feats.shape[0]
    key = jax.random.PRNGKey(seed)
    k_init, k_unc, key = jax.random.split(key, 3)
    params = model.init(
        {"params": k_init, "uncertainty": k_unc},
        jnp.asarray(feats[:2]),
        compute_uncertain=True,
        train=True,
    )
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def step(carry, inp):
        params, opt_state = carry
        idx, rng = inp
        x = jnp.take(feats_d, idx, axis=0)
        y = jnp.take(targets_d, idx, axis=0)

        def loss_fn(p):
            logits, scale = model.apply(
                p, x, compute_uncertain=True, train=True,
                num_samples=num_samples, rngs={"uncertainty": rng},
            )
            y_b = jnp.broadcast_to(y[None, ..., None], logits.shape)
            bce = optax.sigmoid_binary_cross_entropy(logits, y_b)
            if estimator == "logmeanexp":
                # Kendall-Gal attenuation over the sample dim (same
                # formula mask_head_loss applies on the hot path)
                bce = -(
                    jax.nn.logsumexp(-bce, axis=0)
                    - jnp.log(float(num_samples))
                )
            return bce.mean(), scale

        (loss, scale), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state)
        return (
            (optax.apply_updates(params, updates), opt_state),
            scale.mean(),
        )

    # one compiled scan over pregenerated batch indices: per-step
    # Python dispatch made a host-loop version ~50x slower on the
    # single-core container
    rng_np = np.random.RandomState(seed + 1)
    idx_all = jnp.asarray(rng_np.randint(0, n, size=(steps, batch)))
    feats_d = jnp.asarray(feats)
    targets_d = jnp.asarray(targets)
    rngs_all = jax.random.split(key, steps)
    (params, opt_state), sigma_per_step = jax.lax.scan(
        step, (params, opt_state), (idx_all, rngs_all)
    )
    sigma_per_step = np.asarray(sigma_per_step)
    trajectory = []
    if traj_every:
        for it in list(range(0, steps, traj_every)) + [steps - 1]:
            if not trajectory or trajectory[-1][0] != it:
                trajectory.append((it, round(float(sigma_per_step[it]), 4)))

    @jax.jit
    def sigma_of(x):
        _, scale = model.apply(
            params, x, compute_uncertain=True, train=False
        )
        return scale[..., 0].mean(axis=(1, 2))  # per-example mean sigma

    return sigma_of, trajectory


def auroc(scores, labels):
    """Rank AUROC of scores for binary labels (no sklearn)."""
    order = np.argsort(scores)
    ranks = np.empty(len(scores))
    ranks[order] = np.arange(1, len(scores) + 1)
    pos = labels.astype(bool)
    n_pos, n_neg = pos.sum(), (~pos).sum()
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float(
        (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    )


def downstream_cls(seed, steps, feats, labels_noisy, labels_clean,
                   weights, n_train, lr=0.5):
    """Linear probe on pooled features, per-sample weighted CE on NOISY
    labels over a SMALL train split; returns clean-label accuracy on
    the held-out remainder."""
    import jax
    import jax.numpy as jnp
    import optax

    pooled = feats.mean(axis=(1, 2))  # [n, 8]
    x_tr, x_te = pooled[:n_train], pooled[n_train:]
    y_tr = labels_noisy[:n_train]
    y_te_clean = labels_clean[n_train:]
    w_tr = weights[:n_train]
    w_tr = w_tr / w_tr.mean()  # equalize the average weight vs control

    params = {
        "w": jnp.zeros((pooled.shape[1], 2)),
        "b": jnp.zeros((2,)),
    }
    tx = optax.sgd(lr)
    opt_state = tx.init(params)

    x_tr_j, y_tr_j, w_tr_j = map(jnp.asarray, (x_tr, y_tr, w_tr))

    def step(carry, _):
        params, opt_state = carry

        def loss_fn(p):
            logits = x_tr_j @ p["w"] + p["b"]
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, y_tr_j
            )
            return (w_tr_j * ce).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), None

    (params, opt_state), _ = jax.lax.scan(
        step, (params, opt_state), None, length=steps
    )
    pred = np.asarray(
        jnp.argmax(jnp.asarray(x_te) @ params["w"] + params["b"], -1)
    )
    return float((pred == y_te_clean).mean())


def run_estimator(seed, steps, estimator, num_samples, data,
                  batch=32, n_train=160):
    import jax.numpy as jnp

    feats, targets, is_noisy, is_corrupted, clean_cls = data
    n = feats.shape[0]

    sigma_of, traj = train_mask_head(
        seed, steps, batch, feats, targets, estimator, num_samples,
        traj_every=max(steps // 8, 1),
    )
    sigmas = np.concatenate(
        [np.asarray(sigma_of(jnp.asarray(feats[i : i + 64])))
         for i in range(0, n, 64)]
    )
    sig_noisy = float(sigmas[is_noisy].mean())
    sig_clean = float(sigmas[~is_noisy].mean())

    # (2) per-batch adaptive weight on pure-clean vs pure-noisy batches
    lam_clean = 0.01 / max(sig_clean, 1e-20)
    lam_noisy = 0.01 / max(sig_noisy, 1e-20)

    # (3) downstream probe: labels random exactly on the noisy
    # population (the teacher mislabeled those images)
    rng = np.random.RandomState(seed + 17)
    labels_noisy = np.where(
        is_noisy, rng.randint(0, 2, size=n), clean_cls
    ).astype(np.int32)
    w_adaptive = 0.01 / np.maximum(sigmas, 1e-20)
    w_fixed = np.ones_like(w_adaptive)
    w_oracle = (~is_noisy).astype(np.float32) + 1e-6
    accs = {
        name: downstream_cls(
            seed, 3000, feats, labels_noisy, clean_cls, w, n_train
        )
        for name, w in (
            ("adaptive", w_adaptive),
            ("fixed", w_fixed),
            ("oracle_drop_noisy", w_oracle),
        )
    }
    return {
        "estimator": estimator,
        "num_samples": num_samples,
        "sigma_clean": round(sig_clean, 4),
        "sigma_noisy": round(sig_noisy, 4),
        "sigma_ratio": round(sig_noisy / max(sig_clean, 1e-20), 4),
        "sigma_auroc_vs_noisy": round(auroc(sigmas, is_noisy), 4),
        "lambda_clean_batch": round(lam_clean, 5),
        "lambda_noisy_batch": round(lam_noisy, 5),
        "avg_sigma_trajectory": traj,
        **{f"acc_{k}": round(v, 4) for k, v in accs.items()},
    }


def run_seed(seed, steps, n=768):
    rng = np.random.RandomState(seed)
    data = make_data(rng, n)
    return {
        "ref": run_estimator(seed, steps, "sampled_bce", 1, data),
        "kg": run_estimator(seed, steps, "logmeanexp", 8, data),
    }


def aggregate(rows, variant, key):
    return round(float(np.mean([r[variant][key] for r in rows])), 4)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1200)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument(
        "--platform", default="cpu",
        help="jax platform (cpu | axon).  Each training is one "
        "compiled lax.scan, so the study runs well on the attached "
        "TPU chip; XLA:CPU's transposed-conv path makes the cpu run "
        "~1 s/step on this container (use reduced --steps there).",
    )
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        # the env var alone does NOT stop the axon TPU plugin from
        # initializing (and blocking on a leased chip) — the config
        # update does (same workaround as tests/conftest.py)
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "cpu")
    rows = [run_seed(s, args.steps) for s in range(args.seeds)]
    scalar_keys = [
        k for k, v in rows[0]["ref"].items()
        if isinstance(v, (int, float)) and k != "num_samples"
    ]
    mean = {
        variant: {k: aggregate(rows, variant, k) for k in scalar_keys}
        for variant in ("ref", "kg")
    }
    ref, kg = mean["ref"], mean["kg"]
    # annealing: the reference-parity weight 0.01/avg_sigma rises as
    # training shrinks sigma (frozen at UNCERTAINTY_TRAIN_ITER)
    traj0 = rows[0]["ref"]["avg_sigma_trajectory"]
    out = {
        "study": "uncertainty_efficacy",
        "seeds": args.seeds,
        "steps": args.steps,
        "corrupt_p": CORRUPT_P,
        "mean": mean,
        "per_seed": rows,
        "claims": {
            # the paper's narrative, realized by the K&G estimator
            "kg_sigma_discriminates_noise": kg["sigma_ratio"] > 1.1
            and kg["sigma_auroc_vs_noisy"] > 0.9,
            "kg_adaptive_lambda_downweights_noise": (
                kg["lambda_noisy_batch"] < kg["lambda_clean_batch"]
            ),
            "kg_adaptive_beats_fixed_on_clean_heldout": (
                kg["acc_adaptive"] > kg["acc_fixed"]
            ),
            # the reference-parity estimator, measured honestly:
            # sigma shrinks FASTEST on noisy targets (Jensen), so the
            # per-batch weight is inverted...
            "ref_sigma_inverted": ref["sigma_ratio"] < 1.0,
            # ...and its real effective behavior is a rising anneal of
            # the pseudo-loss weight over training
            "ref_weight_anneals_up": traj0[-1][1] < traj0[0][1],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
