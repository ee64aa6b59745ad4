"""Training loop: epochs, validation cadence, checkpointing, logging.

Parity target: the PL Trainer wiring in reference ``train.py:53-76`` +
``VANeRFLightningModule`` train/val hooks (``model.py:381-601``): dual
G/D optimizers, val every `val_check_interval` fraction of an epoch,
checkpoint per epoch (all kept + last), auto-resume, scalar logging with
the same `train/*` / `val_total_loss` names.
"""

from __future__ import annotations

import collections
import os
import time
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoints import CheckpointManager
from .train_step import TrainState


class Prefetcher:
    """Background-thread batch prefetcher (the DataLoader-worker analog).

    The reference leans on torch DataLoader workers (``model.py:74-105``);
    here a daemon thread keeps `depth` collated batches ahead of the train
    step so host-side decode/MANO work overlaps device compute.
    """

    def __init__(self, make_batch: Callable[[int], Any], n_steps: int,
                 depth: int = 2):
        import queue
        import threading
        self.q = queue.Queue(maxsize=depth)
        self.n = n_steps

        def worker():
            for i in range(n_steps):
                self.q.put(make_batch(i))
            self.q.put(None)

        self.t = threading.Thread(target=worker, daemon=True)
        self.t.start()

    def __iter__(self):
        while True:
            b = self.q.get()
            if b is None:
                return
            yield b


_POOL_DATASET = None


def _pool_init(dataset):
    global _POOL_DATASET
    # Workers are host-side: pin any jax use inside dataset[i] (e.g. the
    # synthetic fixture's rasterizer) to the CPU platform BEFORE first
    # backend init. Without this, each worker would initialize the
    # default backend — on the remote-TPU ("axon") container that means
    # one TPU client per worker contending on a single-tenancy tunnel.
    # (Env-var forcing does not work here; only jax.config does.)
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    _POOL_DATASET = dataset


def _pool_get(i):
    return _POOL_DATASET[i]


class SampleLoader:
    """Multi-process ``dataset[i]`` evaluation — the torch
    ``DataLoader(num_workers=N)`` analog (``training.train_num_workers``
    in the reference config schema).

    Both datasets seed their per-item RNG from the index alone
    (``data/interhand.py``, ``data/synthetic.py``), so ``dataset[i]`` is
    a pure function and process workers cannot change semantics — only
    overlap image decode / jitter / MANO work with device compute.

    Start method: ``forkserver`` by default (``VANERF_MP_START``
    overrides). The parent has live threads by the time the pool is
    created (SummaryWriter, XLA runtime), so a plain fork could freeze
    a child on a lock held at fork time; forkserver forks workers from
    a clean server process (the dataset travels to it by pickle once).
    Workers do numpy-only work — the JAX client is never initialized in
    a child. ``num_workers <= 1`` degrades to inline calls in the
    prefetcher thread (prior behavior).
    """

    def __init__(self, dataset, num_workers: int = 1):
        self.dataset = dataset
        self.pool = None
        self.window = 1
        if num_workers > 1:
            import multiprocessing as mp
            method = os.environ.get("VANERF_MP_START", "forkserver")
            ctx = mp.get_context(method)
            self.pool = ctx.Pool(num_workers, initializer=_pool_init,
                                 initargs=(dataset,))
            self.window = 2 * num_workers

    def _get(self, res):
        """AsyncResult.get that survives close(): a terminated pool never
        delivers, so poll with a timeout and bail out once closed (else
        an early fit() return would leave the prefetcher thread blocked
        in get() forever)."""
        import multiprocessing as mp
        while True:
            try:
                return res.get(timeout=1.0)
            except mp.TimeoutError:
                if self.pool is None:
                    raise RuntimeError("SampleLoader closed mid-iteration")

    def ordered(self, indices):
        """Yield dataset[i] for each index, in order; work runs in the
        pool with a bounded in-flight window (bounds result memory)."""
        if self.pool is None:
            for i in indices:
                yield self.dataset[int(i)]
            return
        pending = collections.deque()
        it = iter(indices)
        for i in it:
            pending.append(self.pool.apply_async(_pool_get, (int(i),)))
            if len(pending) >= self.window:
                break
        for i in it:
            yield self._get(pending.popleft())
            pending.append(self.pool.apply_async(_pool_get, (int(i),)))
        while pending:
            yield self._get(pending.popleft())

    def close(self):
        if self.pool is not None:
            pool, self.pool = self.pool, None
            pool.terminate()
            pool.join()


class MetricLogger:
    """TensorBoard if available, always a JSONL mirror."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.tb = SummaryWriter(log_dir)
        except Exception:
            self.tb = None

    def log_scalars(self, step: int, scalars: dict):
        import json
        rec = {"step": int(step)}
        for k, v in scalars.items():
            rec[k] = float(v)
            if self.tb is not None:
                self.tb.add_scalar(k, float(v), step)
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()

    def log_image(self, step: int, name: str, img_hwc: np.ndarray):
        if self.tb is not None:
            self.tb.add_image(name, np.transpose(img_hwc, (2, 0, 1)), step)


def fit(train_step: Callable, state: TrainState, dataset,
        collate: Callable, *, cfg: dict, save_dir: str,
        rng: jax.Array, max_epochs: Optional[int] = None,
        val_fn: Optional[Callable] = None, fast_dev_run: bool = False,
        log_every: int = 10, nan_check: bool = False,
        batch_size: Optional[int] = None):
    """Run the training loop.

    Args:
      train_step: jitted (state, batch, rng) -> (state, logs).
      dataset: indexable dataset of per-sample dicts.
      collate: list[dict] -> device batch dict.
      val_fn: optional (state, step, logger) -> dict with 'val_total_loss'.
      batch_size: global batch size override. The multi-device CLI passes
        num_gpus * train_batch_size here (DDP semantics, ref train.py:58-65:
        N ranks each drawing train_batch_size). Short batches (None-dropped
        samples, tail) are padded cyclically so the shard_map 'data'-axis
        split stays divisible.
    Returns final state.
    """
    tcfg = cfg["training"]
    max_epochs = max_epochs or tcfg.get("max_epochs", 30)
    batch_size = batch_size or tcfg.get("train_batch_size", 1)
    val_interval = tcfg.get("pl_cfg", {}).get("val_check_interval", 0.1)

    logger = MetricLogger(save_dir)
    # keep-all mirrors the reference's ModelCheckpoint (train.py:27-37);
    # training.keep_ckpts bounds disk for long synthetic/perf runs
    # (~320 MB per G+D+Adam state).
    ckpt = CheckpointManager(os.path.join(save_dir, "ckpts"),
                             max_to_keep=cfg["training"].get("keep_ckpts"))

    n = len(dataset)
    steps_per_epoch = max(n // batch_size, 1)
    val_every = max(int(steps_per_epoch * val_interval), 1)
    start_step = int(state.step)
    start_epoch = start_step // steps_per_epoch

    order_rng = np.random.default_rng(1234 + start_epoch)
    step_i = start_step
    loader = SampleLoader(dataset, tcfg.get("train_num_workers", 1))
    try:
        for epoch in range(start_epoch, max_epochs):
            perm = order_rng.permutation(n)
            t_epoch = time.time()
            # exact per-batch index slices (the last slice may be short
            # when n < batch_size); cyclic padding below restores shard
            # divisibility
            idx_lists = [perm[bi * batch_size:(bi + 1) * batch_size]
                         for bi in range(steps_per_epoch)]
            samples = loader.ordered(np.concatenate(idx_lists))

            def make_batch(bi, samples=samples, idx_lists=idx_lists):
                items = [next(samples) for _ in range(len(idx_lists[bi]))]
                items = [it for it in items if it is not None]
                if not items:   # None-tolerant collate (model.py:123-132)
                    return ()
                if len(items) < batch_size:  # pad for shard divisibility
                    n0 = len(items)
                    items = [items[i % n0] for i in range(batch_size)]
                return collate(items)

            for batch in Prefetcher(make_batch, steps_per_epoch):
                if batch == ():
                    continue
                rng, krun = jax.random.split(rng)
                state, logs = train_step(state, batch, krun)
                step_i += 1

                if nan_check:
                    bad = {k: float(v) for k, v in logs.items()
                           if not np.isfinite(float(v))}
                    if bad:
                        raise FloatingPointError(
                            f"non-finite losses: {bad}")

                if step_i % log_every == 0:
                    logger.log_scalars(step_i, logs)
                if val_fn is not None and step_i % val_every == 0:
                    val_logs = val_fn(state, step_i, logger)
                    if val_logs:
                        logger.log_scalars(step_i, val_logs)
                if fast_dev_run:
                    return state
            dt = time.time() - t_epoch
            logger.log_scalars(step_i, {"epoch": epoch,
                                        "epoch_time_s": dt})
            # per-epoch save is reference parity; training.ckpt_every_epochs
            # thins it for long synthetic runs where the ~320 MB state
            # write dominates the 8 s epoch (last epoch always saves)
            every = max(1, int(cfg["training"].get("ckpt_every_epochs", 1)))
            if (epoch + 1) % every == 0 or epoch == max_epochs - 1:
                # async: overlap the ~320 MB state write with the next
                # epoch's compute; the final wait is in the finally block
                ckpt.save(step_i, state, wait=False)
        return state
    finally:
        ckpt.wait()          # flush any in-flight async save
        loader.close()


def collate_numpy(items: Iterable[dict], faces=None, flatten_views=True):
    """Stack per-sample dicts into a batch; flatten (B, V, ...) source-view
    tensors to (B*V, ...) as the renderer expects."""
    batch = {}
    keys = [k for k in items[0]
            if k not in ("frame_index", "cam_ind", "human_idx")]
    for k in keys:
        v0 = items[0][k]
        if np.ndim(v0) == 0:
            batch[k] = np.asarray(v0)
            continue
        batch[k] = np.stack([np.asarray(it[k]) for it in items])
    if flatten_views:
        for k in ("src_img", "src_mask", "src_krt", "src_extrin"):
            if k in batch:
                v = batch[k]
                batch[k] = v.reshape((-1,) + v.shape[2:])
    if faces is not None:
        batch["faces"] = faces
    return jax.tree.map(jnp.asarray, batch)
