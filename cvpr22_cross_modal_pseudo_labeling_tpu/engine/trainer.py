"""Training driver.

Re-design of reference engine/trainer.py:54-267 (do_train): the
iteration body is one compiled train step (engine/train_step.py); the
host loop only feeds sharded batches, logs windowed metrics with ETA,
checkpoints, and runs periodic eval.  Loss reduction for logging
(reduce_loss_dict, trainer.py:19-41) already happened inside the step
via GSPMD; empty-target batches need no skip (trainer.py:96-98) because
masked losses handle them.
"""

import datetime
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logger import get_logger
from ..utils.metric_logger import MetricLogger
from .checkpoint import (
    discard_pending_checkpoint,
    flush_pending_checkpoint,
    pending_checkpoint_step,
    save_checkpoint,
)
from .train_step import (
    _ALWAYS_REPLICATED_KEYS,
    _REPLICATED_BATCH_KEYS,
    batch_shardings,
    pad_vocab_tables,
)

# batch keys every host carries in full (vs per-host batch shards)
_HOST_FULL_KEYS = frozenset(
    _REPLICATED_BATCH_KEYS + _ALWAYS_REPLICATED_KEYS
)


class SummaryWriter:
    """Metrics sink: JSONL always; tf.summary when TensorBoard is
    available (replaces tensorboardX, train_net.py:223-228)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(
            os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1
        )
        self._tf = None
        try:
            import tensorflow as tf

            self._tf = tf.summary.create_file_writer(log_dir)
        except Exception:
            pass

    def write(self, step: int, metrics: Dict[str, float]):
        import json

        self._jsonl.write(
            json.dumps({"step": step, **{k: float(v) for k, v in metrics.items()}})
            + "\n"
        )
        if self._tf is not None:
            import tensorflow as tf

            with self._tf.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=step)

    def close(self):
        self._jsonl.close()


def _place(local: np.ndarray, sharding, host_holds_full: bool = False):
    """Puts a host-local batch array onto the mesh.  Single-process:
    plain device_put.  Multi-process: per-batch arrays are each
    process's slice of the global batch (IMS_PER_BATCH // num_hosts,
    data/build.py:183-191), assembled into the global array from the
    process-local shards — the DDP scatter equivalent (reference splits
    the global batch the same way, data/build.py:118-123).  Class-
    embedding tables (``host_holds_full``) exist in FULL on every host
    whatever their device sharding (replicated, or model-axis vocab
    sharding that may span processes), so each process serves its
    addressable shards by slicing its full copy."""
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    if host_holds_full:
        return jax.make_array_from_callback(
            local.shape, sharding, lambda idx: local[idx]
        )
    return jax.make_array_from_process_local_data(sharding, local)


class DevicePrefetcher:
    """Double-buffered HBM prefetch: places the NEXT batch onto the
    mesh from a background thread while the current step runs.

    Without this the hot loop serializes next(loader) -> device_put ->
    step dispatch on the main thread; the host->HBM copy releases the
    GIL, so overlapping it with decode/collate recovers most of the
    transfer time even on a single host core (the sustained CLI bench
    measured the placement serialized with the loader at 46% data-wait).
    Queue depth 2 = one batch in flight on the wire + one ready, the
    standard double buffer (SURVEY build plan: "double-buffered HBM
    prefetch"; the reference's analogue is DataLoader worker prefetch,
    data/build.py:177-180).
    """

    _SENTINEL = object()

    def __init__(self, loader, mesh, extra_batch=None, depth: int = 2):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._mesh = mesh
        self._extra = extra_batch or {}
        self._loader = loader
        self._shardings = None
        self._err = None
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, name="device-prefetch", daemon=True
        )
        self._thread.start()

    def _place_batch(self, batch):
        if self._extra:
            batch = {**batch, **self._extra}
        # vocab-parallel padding: class tables padded to the 'model'
        # mesh axis multiple with row masks (train_step.pad_vocab_tables)
        # so COCO-49 / LVIS-1203 tables shard at any mesh shape
        batch = pad_vocab_tables(batch, self._mesh)
        if self._shardings is None:
            self._shardings = batch_shardings(batch, self._mesh)
        return {
            k: _place(
                np.asarray(v),
                self._shardings[k],
                host_holds_full=k in _HOST_FULL_KEYS,
            )
            for k, v in batch.items()
            if isinstance(v, np.ndarray)
        }

    def _put(self, item) -> bool:
        """Enqueue with stop-polling: the producer must never block
        forever on a full queue if the consumer died without stop()."""
        import queue

        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def _run(self):
        # checkpointable streams (grain): snapshot the position right
        # after drawing each batch, so the state saved with iteration k
        # resumes at batch k+1 even though the stream itself runs up to
        # `depth` batches ahead of the consumer
        get_state = getattr(self._loader, "get_state", None)
        try:
            for batch, _ in self._loader:
                if self._stop.is_set():
                    return
                placed = self._place_batch(batch)
                state = get_state() if get_state else None
                if not self._put((placed, state)):
                    return
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        placed, state = item
        if state is not None:
            self._last_state = state
        return placed

    def get_state(self):
        """Stream position as of the last batch handed to the consumer
        (None for non-checkpointable loaders)."""
        return getattr(self, "_last_state", None)

    def stop(self):
        self._stop.set()
        # drop queued batches so their device buffers free promptly
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass


def do_train(
    step_fn: Callable,
    state,
    loader,
    mesh,
    cfg,
    extra_batch: Optional[Dict[str, np.ndarray]] = None,
    eval_fn: Optional[Callable] = None,
    output_dir: Optional[str] = None,
    start_iter: int = 0,
):
    """Runs the training loop; returns the final state.

    ``extra_batch`` holds batch-invariant arrays merged into every batch
    (class-embedding matrices).  ``eval_fn(state, iteration)`` is called
    every TEST_PERIOD.
    """
    logger = get_logger("trainer")
    meters = MetricLogger()
    output_dir = output_dir or cfg.OUTPUT_DIR
    writer = (
        SummaryWriter(os.path.join(output_dir, "tb"))
        if jax.process_index() == 0
        else None
    )
    max_iter = cfg.SOLVER.MAX_ITER
    log_period = cfg.SOLVER.LOG_PERIOD
    ckpt_period = cfg.SOLVER.CHECKPOINT_PERIOD
    test_period = cfg.SOLVER.TEST_PERIOD
    abort_non_finite = getattr(cfg.SOLVER, "ABORT_ON_NON_FINITE", True)

    if start_iter >= max_iter:
        # a completed run re-launched in the same OUTPUT_DIR must train
        # zero additional steps (reference trainer.py:94 enumerate from
        # start_iter never enters the loop)
        logger.info(
            "training already complete (iteration %d >= MAX_ITER %d); "
            "nothing to do", start_iter, max_iter,
        )
        if writer:
            writer.close()
        return state

    iteration = start_iter
    last_finite_iter = start_iter
    prefetcher = DevicePrefetcher(loader, mesh, extra_batch)
    # Bounded pipelining: with the prefetcher feeding ready batches, an
    # unthrottled loop dispatches arbitrarily far ahead of the device —
    # measured on the tunnel-attached chip, the run-ahead backlog
    # degraded 0.36 s/it to ~1.1 s/it within ~100 iterations.  Keeping
    # <= 2 steps in flight (classic double buffering) pins the loop to
    # the device rate without adding a sync point on the critical path.
    from collections import deque

    inflight = deque()
    end = time.perf_counter()
    for batch in prefetcher:
        data_time = time.perf_counter() - end

        state, metrics = step_fn(state, batch)
        inflight.append(metrics)
        if len(inflight) > 2:
            jax.block_until_ready(inflight.popleft())
        iteration += 1

        # per-step wall/data meters every iteration (reference
        # trainer.py:99 records data_time each step); note the step
        # dispatch is async, so an individual batch_time only means
        # "host-side time this iteration" — global_avg over the run is
        # the accurate sustained number, and sum(data)/sum(time) is the
        # host data-wait fraction
        meters.update(time=time.perf_counter() - end, data=data_time)

        if iteration % log_period == 0 or iteration == max_iter:
            metrics = {
                k: float(v)
                for k, v in jax.device_get(metrics).items()
                if np.ndim(v) == 0
            }
            total = metrics.get("total_loss")
            if (
                abort_non_finite
                and total is not None
                and not np.isfinite(total)
            ):
                # blow-ups must stop the job, not burn chip-hours
                # logging `total_loss: nan` (reference raises in the
                # MMSS forward, mmss_gcnn.py:116-120); the last good
                # checkpoint remains on disk for a lower-lr restart
                logger.error(
                    "non-finite total_loss %s at iteration %d; aborting "
                    "(set SOLVER.ABORT_ON_NON_FINITE False to continue "
                    "through divergence)", total, iteration,
                )
                # publish the pending pipelined checkpoint ONLY if it
                # STRICTLY predates the last finite loss observation:
                # the save at iteration k holds post-update-k params,
                # while the loss logged at k was computed from the
                # pre-update params — so only a finite loss at an
                # iteration AFTER k validates the saved params.  A save
                # taken at-or-after the last finite check may hold
                # post-divergence (NaN) params; publishing it would make
                # the implicit resume restore the blow-up, so drop it
                # and keep last_checkpoint at the previous published
                # (confirmed-era) save
                pending = pending_checkpoint_step()
                if pending is not None and pending >= last_finite_iter:
                    logger.warning(
                        "dropping pending checkpoint at iteration %d "
                        "(after last finite loss at %d — may hold "
                        "diverged params)", pending, last_finite_iter,
                    )
                    discard_pending_checkpoint()
                else:
                    flush_pending_checkpoint()
                prefetcher.stop()
                raise FloatingPointError(
                    f"non-finite total_loss at iteration {iteration}: "
                    f"{metrics}"
                )
            if total is not None:
                last_finite_iter = iteration
            meters.update(**metrics)
            eta = datetime.timedelta(
                seconds=int(
                    meters.meters["time"].global_avg
                    * (max_iter - iteration)
                )
            )
            logger.info(
                "iter %d/%d eta %s %s lr-step done",
                iteration,
                max_iter,
                eta,
                str(meters),
            )
            if writer:
                writer.write(iteration, metrics)
        if ckpt_period and iteration % ckpt_period == 0:
            if output_dir:
                # EVERY process calls save (orbax coordinates the
                # single writer through a cross-process barrier; a
                # rank-0-only call deadlocks a multi-process cluster);
                # pipelined: the orbax write overlaps the next steps and
                # is published by the following save / the final flush
                # the stream position is STAGED with the save and only
                # written when the checkpoint publishes, so the loader
                # state on disk never runs ahead of last_checkpoint
                save_checkpoint(
                    output_dir,
                    {"state": jax.device_get(state), "iteration": iteration},
                    iteration,
                    block=False,
                    extras=_loader_state_extras(output_dir, prefetcher),
                )
        if test_period and eval_fn and iteration % test_period == 0:
            eval_fn(state, iteration)
        end = time.perf_counter()
        if iteration >= max_iter:
            # hard budget guard: never step past MAX_ITER even if the
            # loader yields surplus batches (e.g. a stream restored at
            # an earlier position than the optimizer state)
            break
    prefetcher.stop()

    if output_dir:
        save_checkpoint(
            output_dir,
            {"state": jax.device_get(state), "iteration": iteration},
            iteration,
            extras=_loader_state_extras(output_dir, prefetcher),
        )
        flush_pending_checkpoint()
    if writer:
        writer.close()
    steps = iteration - start_iter
    if steps > 0 and "time" in meters.meters:
        # sustained summary for bench/driver parsing (reference logs the
        # analogous totals at engine/trainer.py:261-266)
        t = meters.meters["time"]
        d = meters.meters["data"]
        imgs = cfg.SOLVER.IMS_PER_BATCH // max(jax.process_count(), 1)
        logger.info(
            "sustained: %d steps, %.1f s wall, %.3f s/it, "
            "%.2f imgs/s/host, data-wait %.1f%% "
            "(sum_data %.1f s / sum_time %.1f s)",
            steps, t.total, t.total / steps,
            imgs * steps / t.total,
            100.0 * d.total / max(t.total, 1e-9),
            d.total, t.total,
        )
    return state


def loader_state_path(output_dir: str) -> str:
    """Per-process file: each host's grain stream has its own position
    (shard_index slicing), so state must not be shared across ranks."""
    pid = jax.process_index()
    name = "loader_state.json" if pid == 0 else f"loader_state_{pid}.json"
    return os.path.join(output_dir, name)


def _loader_state_extras(output_dir: str, loader):
    """Snapshot of the data-stream position, serialized NOW (at the
    checkpoint's iteration) but handed to save_checkpoint as a staged
    sidecar, written only when the save publishes.  None for the
    thread loader, whose resume is start_iter fast-forwarding."""
    get_state = getattr(loader, "get_state", None)
    if get_state is None:
        return None
    import json

    try:
        state = get_state()
        if state is None:  # checkpointable stream, nothing consumed yet
            return None
        return {loader_state_path(output_dir): json.dumps(state)}
    except Exception as e:
        get_logger("trainer").warning("loader state not captured: %s", e)
        return None


def _save_loader_state(output_dir: str, loader) -> None:
    """Immediately persists the data-stream position (synchronous
    variant of _loader_state_extras, for callers outside the pipelined
    checkpoint path)."""
    extras = _loader_state_extras(output_dir, loader)
    for p, content in (extras or {}).items():
        with open(p, "w") as f:
            f.write(content)


def restore_loader_state(output_dir: str, loader) -> bool:
    """Restores a previously saved data-stream position; returns True
    when the loader resumed mid-stream."""
    set_state = getattr(loader, "set_state", None)
    path = loader_state_path(output_dir)
    if set_state is None or not os.path.exists(path):
        return False
    import json

    try:
        with open(path) as f:
            set_state(json.load(f))
        return True
    except Exception as e:
        get_logger("trainer").warning("loader state not restored: %s", e)
        return False


def tokenize_class_names(class_names, tokenizer, token_len: int = 8):
    """Tokenize class names into (ids, mask) int32 [C, T] for
    extract_word_embeddings; empty/"bg" names get all-zero rows (their
    embedding comes out zero, the background convention).  Used both to
    precompute the constant class table (FT_EMB off) and, with FT_EMB
    on, shipped into the train step so the model rebuilds the table
    from the live word embeddings each step (reference
    st_generalized_rcnn.py:190-191)."""
    ids = np.zeros((len(class_names), token_len), np.int32)
    mask = np.zeros((len(class_names), token_len), np.int32)
    for i, name in enumerate(class_names):
        if not name or name == "bg":
            continue
        enc = tokenizer.encode(name, token_len)
        real = enc["attention_mask"] * (1 - enc["special_tokens_mask"])
        ids[i] = enc["input_ids"]
        mask[i] = real
    return ids, mask


def compute_class_name_embeddings(
    model, params, class_names, tokenizer, token_len: int = 8
) -> np.ndarray:
    """BERT-table mean embeddings for a list of class names
    (st_generalized_rcnn.py:202-209 extract_emb), computed once on
    device.  Returns [C, emb_dim] L2-normalized (zero rows for empty
    names, e.g. background)."""
    ids, mask = tokenize_class_names(class_names, tokenizer, token_len)
    out = model.apply(
        params,
        jnp.asarray(ids),
        jnp.asarray(mask),
        method=type(model).extract_word_embeddings,
    )
    return np.asarray(out)
