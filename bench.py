"""Benchmark: open-vocabulary Mask R-CNN (R-50-C4 teacher) training
throughput on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference (hbdat/cvpr22_cross_modal_pseudo_labeling)
publishes no throughput numbers (BASELINE.md); maskrcnn_benchmark-class
R-50-C4 Mask R-CNN training runs at roughly 4 img/s per A100-class GPU
(batch 1/GPU, fp16) — ``vs_baseline`` is measured imgs/sec/chip divided
by that 4.0 img/s reference point, per BASELINE.json's
imgs/sec/chip-vs-A100 north star.
"""

import json
import os
import sys
import time

import numpy as np

A100_REFERENCE_IMGS_PER_SEC = 4.0


def headline(
    batch_size: int,
    emit: bool = True,
    bucket=(800, 1344),
    image_hw=(800, 1333),
):
    """Runs the headline teacher-train bench in THIS process; prints
    its JSON line when ``emit`` (the subprocess entry) and returns the
    dict (the in-process fallback adds notes before printing).

    ``bucket`` is the padded (H, W) the step compiles for; ``image_hw``
    the true image size inside it (tools/bench_bucket_mix.py sweeps
    these over cfg.TPU.IMAGE_BUCKETS to weight by a realistic COCO
    aspect mix)."""
    import jax

    # persistent compilation cache: the first bench run warms it so later
    # runs (and the driver's) skip the multi-minute detection-graph compile
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.optimizer import (
        frozen_prefixes_from_cfg,
        make_optimizer,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
        build_train_step,
        create_train_state,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
        GeneralizedRCNN,
        statics_from_cfg,
    )

    h, w = bucket  # default: the (800, 1333) train bucket, padded /64

    cfg = get_default_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.CLS_AGNOSTIC_MASK = True
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 768
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 49
    cfg.MODEL.ROI_BOX_HEAD.LOSS_WEIGHT_BACKGROUND = 0.2
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 2
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.MAX_GT = 20
    # experiment knob (default matches the committed config)
    cfg.TPU.NMS_TILE = int(os.environ.get("BENCH_NMS_TILE", "512"))

    model = GeneralizedRCNN(statics_from_cfg(cfg))
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(
            rng.rand(batch_size, h, w, 3), jnp.float32
        ),
        "image_sizes": jnp.tile(
            jnp.array([list(image_hw)], jnp.int32), (batch_size, 1)
        ),
        "class_embeddings": jnp.asarray(rng.randn(49, 768), jnp.float32),
        "gt_boxes": jnp.asarray(
            np.stack(
                [
                    rng.uniform(0, 0.45 * image_hw[1], (batch_size, 20)),
                    rng.uniform(0, 0.45 * image_hw[0], (batch_size, 20)),
                    rng.uniform(
                        0.5 * image_hw[1], 0.98 * image_hw[1],
                        (batch_size, 20),
                    ),
                    rng.uniform(
                        0.5 * image_hw[0], 0.98 * image_hw[0],
                        (batch_size, 20),
                    ),
                ],
                axis=-1,
            ),
            jnp.float32,
        ),
        "gt_labels": jnp.asarray(
            rng.randint(1, 49, (batch_size, 20)), jnp.int32
        ),
        "gt_valid": jnp.ones((batch_size, 20), bool),
        "gt_masks": jnp.asarray(
            (rng.rand(batch_size, 20, 28, 28) > 0.5), jnp.float32
        ),
    }

    # jit the init: eager init would dispatch thousands of tiny ops
    # through the device tunnel
    init_fn = jax.jit(
        lambda rngs, im, sz, ce, tg: model.init(
            rngs, im, sz, ce, tg, train=True
        )
    )
    params = init_fn(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        batch["images"][:1],
        batch["image_sizes"][:1],
        batch["class_embeddings"],
        {k: batch[k][:1] for k in ("gt_boxes", "gt_labels", "gt_valid", "gt_masks")},
    )
    tx, _ = make_optimizer(
        cfg, params["params"], frozen_prefixes_from_cfg(cfg)
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(7))
    step = jax.jit(
        build_train_step(model, tx, "GeneralizedRCNN"), donate_argnums=(0,)
    )

    # warmup (compile + 2 steps)
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total_loss"])
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total_loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total_loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = batch_size * n_steps / dt
    out = {
        "metric": "maskrcnn_r50c4_train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(
            imgs_per_sec / A100_REFERENCE_IMGS_PER_SEC, 3
        ),
    }

    # FLOPs accounting -> MFU (VERDICT r1: give the number roofline
    # context).  XLA's cost analysis counts HLO flops of the compiled
    # step program; the bf16 peak comes from the running device's
    # generation (utils/profiler.py::tpu_peak_flops).
    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.profiler import (
        compiled_step_flops,
        mfu_metrics,
    )

    try:
        flops_per_step = compiled_step_flops(step, state, batch)
        if flops_per_step > 0:
            out["flops_per_step"] = flops_per_step
            out.update(mfu_metrics(flops_per_step, dt / n_steps))
            # context: the 4 img/s A100 anchor implies this model FLOPs
            # rate on a 312-TFLOP/s-peak chip
            implied = (
                flops_per_step / batch_size * A100_REFERENCE_IMGS_PER_SEC
            )
            out["implied_a100_baseline_mfu_pct"] = round(
                100.0 * implied / 312e12, 2
            )
    except Exception as e:  # cost analysis unsupported on this backend
        out["mfu_note"] = f"cost_analysis unavailable: {type(e).__name__}"

    if emit:
        print(json.dumps(out))
    return out


def _sub_bench(args, timeout=3600):
    """Runs a bench script in a subprocess and returns its last JSON
    line (dict), or raises.  Each bench owns the TPU for its lifetime —
    the orchestrating parent never initializes jax, so this works both
    over the remote-device tunnel and on a local-libtpu host where the
    chip admits one process at a time."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.run(
        [sys.executable] + args,
        cwd=here,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    lines = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
    ]
    if not lines:
        # surface the subprocess's failure reason, not a bare
        # IndexError; keep the FULL stderr on the exception so callers
        # can classify the failure (a grpc error tail can push the
        # UNAVAILABLE marker out of any fixed-size excerpt)
        err = RuntimeError(
            f"no JSON output (rc={proc.returncode}): "
            + (proc.stderr or "")[-400:]
        )
        err.full_stderr = proc.stderr or ""
        raise err
    return json.loads(lines[-1])


def _relay_up():
    """True when the axon loopback relay accepts connections (or this
    is not an axon-tunnel host, where no relay exists).  Shares the
    port list and probe with tools/tpu_health.py so the two cannot
    drift."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.tpu_health import probe_ports

    return any(v == "open" for v in probe_ports().values())


def _retries_from_env():
    """BENCH_UNAVAILABLE_RETRIES as a positive int; a malformed value
    falls back to 3 instead of crashing before any JSON is emitted."""
    try:
        attempts = int(os.environ.get("BENCH_UNAVAILABLE_RETRIES", "3"))
    except ValueError:
        sys.stderr.write(
            "ignoring malformed BENCH_UNAVAILABLE_RETRIES; using 3\n"
        )
        attempts = 3
    return max(attempts, 1)


def _zero_headline(note):
    return {
        "metric": "maskrcnn_r50c4_train_imgs_per_sec_per_chip",
        "value": 0.0,
        "unit": "imgs/sec/chip",
        "vs_baseline": 0.0,
        "headline_note": note,
    }


def main():
    if "--headline" in sys.argv:
        argv = [a for a in sys.argv[1:] if a != "--headline"]
        headline(int(argv[0]) if argv else 8)
        return

    import subprocess

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    here = os.path.dirname(os.path.abspath(__file__))
    out = None
    # A KILLED axon-tunnel client leaves a stale device lease server-side
    # that clears after tens of minutes; a fresh client sees
    # 'UNAVAILABLE: TPU backend setup/compile error' until then.  Retry
    # with a long backoff instead of failing the whole bench — and never
    # run the in-process fallback for this error class (a second client
    # just blocks on the same lease, unbounded).
    # fast pre-check on axon-tunnel hosts: if the loopback relay isn't
    # listening at all, no client can attach — each attempt would block
    # ~28 min inside the runtime's internal retry before failing
    # UNAVAILABLE (BENCH_NOTES "round3_tunnel_outage").  Seconds, not
    # an hour-and-a-half of retries, to diagnose a dead relay.
    if not _relay_up():
        out = _zero_headline(
            "axon relay down (ports 8081-8083 refused)"
        )
        out["secondary_note"] = "skipped: backend unavailable"
        print(json.dumps(out))
        return

    attempts = _retries_from_env()
    backend_dead = False
    for attempt in range(attempts):
        try:
            out = _sub_bench(
                [os.path.join(here, "bench.py"), "--headline",
                 str(batch_size)]
            )
            break
        except subprocess.TimeoutExpired:
            # do NOT rerun the same (possibly hung) bench in-process
            # with no bound — emit a flagged line instead of stalling
            # the driver
            out = _zero_headline("headline subprocess timed out")
            backend_dead = True
            break
        except Exception as e:
            # classify on the FULL stderr, not the excerpt in str(e)
            msg = getattr(e, "full_stderr", "") + str(e)
            backend_down = (
                "UNAVAILABLE" in msg or "Unable to initialize" in msg
            )
            if backend_down and attempt + 1 < attempts:
                sys.stderr.write(
                    f"TPU backend unavailable (attempt {attempt + 1}/"
                    f"{attempts}); retrying in 300s\n"
                )
                time.sleep(300)
                continue
            sys.stderr.write(f"headline subprocess failed: {e}\n")
            if backend_down:
                out = _zero_headline(
                    f"TPU backend unavailable after {attempts} attempts"
                )
                backend_dead = True
            else:
                # non-backend failure (e.g. restricted spawn) — run
                # in-process, keeping the failure reason.  The parent
                # now owns the chip for its remaining lifetime, so the
                # secondary subprocesses could not attach — skip them
                # (same single-process constraint _sub_bench documents).
                out = headline(batch_size, emit=False)
                out["headline_note"] = (
                    f"subprocess failed ({type(e).__name__}); "
                    "ran in-process"
                )
                backend_dead = True
                out["secondary_note"] = (
                    "skipped: parent holds the chip after in-process "
                    "fallback"
                )
            break

    # secondary workloads (VERDICT r2 items 3-4: track MMSS + ST-distill
    # in the driver-recorded line, not just BENCH_NOTES); skip with
    # BENCH_SKIP_EXTRA=1 (or on any failure) without losing the
    # headline metric
    if backend_dead:
        # the backend is hung, down, or held by this process: the
        # secondary benches would each block against it for up to their
        # own timeout, stalling the driver for hours after the problem
        # is already diagnosed
        out.setdefault("secondary_note", "skipped: backend unavailable")
    elif os.environ.get("BENCH_SKIP_EXTRA") != "1":
        for args, prefix, keys in (
            (
                [os.path.join(here, "tools", "bench_mmss.py"), "global_b64"],
                "mmss_b64",
                ("value", "mfu_pct", "tflops_per_sec"),
            ),
            (
                [os.path.join(here, "tools", "bench_st.py")],
                "st_distill",
                ("value", "pseudo_masks_per_sec", "mfu_pct", "step_ms"),
            ),
            # the PRODUCT number (VERDICT r3 item 1): the real
            # tools/train_net.py CLI — JPEG decode -> transforms ->
            # bucket collate -> uint8 HBM transfer -> step — sustained
            # over 120 steps on a production-size synthetic COCO tree
            (
                [os.path.join(here, "tools", "bench_sustained.py"),
                 "--steps", "120", "--data", "/tmp/synth_coco"],
                "sustained_cli",
                ("value", "steady_imgs_per_sec", "wall_avg_imgs_per_sec",
                 "data_wait_pct", "peak_host_rss_gb"),
            ),
        ):
            if backend_dead:
                # a prior secondary hit the stale-lease error class —
                # further attachments just block on the same lease
                out[f"{prefix}_note"] = "skipped: backend unavailable"
                continue
            # the relay can die between benches; a secondary attempt
            # against a dead relay blocks ~28 min inside the runtime
            # before failing, serially per secondary — re-check first
            if not _relay_up():
                out[f"{prefix}_note"] = "skipped: relay went down"
                continue
            try:
                data = _sub_bench(args)
                for k in keys:
                    if k in data:
                        out[f"{prefix}_{k}"] = data[k]
            except Exception as e:
                out[f"{prefix}_note"] = f"{type(e).__name__}: {str(e)[:200]}"
                msg = getattr(e, "full_stderr", "") + str(e)
                if "UNAVAILABLE" in msg or "Unable to initialize" in msg:
                    # same stale-lease error class as the headline
                    # handler: further attachments just block on it
                    backend_dead = True

    print(json.dumps(out))


if __name__ == "__main__":
    main()
