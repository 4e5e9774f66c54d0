"""Input pipelines: device-resident fast path + multiprocess host path.

Replaces the reference's torch DataLoader stack (16 fork workers,
``/root/reference/data/data.py:317-394``) with two TPU-native paths:

1. **Device-resident** (static transforms — the clustering datasets): the
   whole dataset is transformed once, moved to HBM, and every epoch is a
   device-side permutation + gather inside the jitted epoch scan. Zero
   host<->device traffic per step; this is the path behind the 5x wall-clock
   target.

2. **Host pipeline** (random augmentations): per-image numpy/PIL transforms
   run in forked worker processes at batch granularity with a prefetch
   queue, then batches are device_put ahead of compute (double buffering).

Split policy matches the reference:
- clustering (num_classes == 0): train = concat(train, test), no val/test;
  eval runs on the train set (``data/data.py:393-394``,
  ``experiments/benchmarking/train_vit_som.py:111-112``)
- classification: 80/20 train/val split (90/10 for tiny-imagenet) with a
  fixed seed, test = the real test split; drop_last on all generic-path
  loaders (``data/data.py:382-391``, ``:113-127``)
"""

from __future__ import annotations

import math
import os
import queue
import threading
from concurrent.futures import ProcessPoolExecutor
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitsom_tpu.config import Config, DataConfig
from vitsom_tpu.data import augment as aug_lib
from vitsom_tpu.data.datasets import ArraySplits, load_raw

STATIC_TRANSFORM_SETS = ("mnist", "fmnist", "usps", "reuters-10k")


@dataclass
class Split:
    x: np.ndarray  # [N, H, W, C] uint8/float32, or object array of paths/images
    y: np.ndarray  # [N] int64
    train_mode: bool  # which transform applies
    # persistent augmentation worker pool, created lazily by _get_pool and
    # owned by this split (lifetime-tied; never keyed by id())
    pool: Optional[ProcessPoolExecutor] = field(default=None, repr=False, compare=False)

    def __len__(self) -> int:
        return len(self.y)


@dataclass
class DataModule:
    cfg: Config
    train: Split
    val: Optional[Split]
    test: Optional[Split]
    train_transform: Callable
    eval_transform: Callable

    @property
    def n_train(self) -> int:
        return len(self.train)

    @property
    def steps_per_epoch(self) -> int:
        # drop_last=True semantics (reference ``data/data.py:387-393``)
        return len(self.train) // self.cfg.batch_size

    @property
    def is_static(self) -> bool:
        """True when the train transform is deterministic per-element, so the
        dataset can live on device and epochs are device-side gathers."""
        return aug_lib.is_static_transform(self.cfg.data)

    @property
    def use_device_augment(self) -> bool:
        """True when the augmented train path should run ON DEVICE: raw
        uint8 images resident in HBM, the whole augmentation stack executed
        batched inside the jitted epoch scan (data/device_augment.py).
        Requires a uniform fixed-shape uint8 source array — variable-size
        sources (jpg-dir datasets) fall back to the host pipeline."""
        return (
            self.cfg.data.device_augment
            and not self.is_static
            and isinstance(self.train.x, np.ndarray)
            and self.train.x.dtype == np.uint8
            and self.train.x.ndim == 4
        )

    @property
    def uint8_scale_static(self) -> bool:
        """True when the static train transform is exactly uint8 -> /255
        (the mnist-family ToTensor path): the dataset can cross the tunnel
        as RAW uint8 (4x smaller transfer) with the /255 materialized on
        device."""
        return self._uint8_scale_split(self.train)

    def _uint8_scale_split(self, split: Split) -> bool:
        """Per-split variant of :attr:`uint8_scale_static` (val/test splits
        of the same dataset qualify too)."""
        return (
            self.is_static
            and self.cfg.data.uint8_hbm
            and self.cfg.data.dataset in ("mnist", "fmnist", "usps")
            and isinstance(split.x, np.ndarray)
            and split.x.dtype == np.uint8
            and split.x.ndim == 4
        )

    def raw_device_arrays(self, split: Split, mesh=None):
        """Move the UNtransformed uint8 split to device (batch-sharded under
        multi-host, same span policy as device_arrays)."""
        if jax.process_count() > 1:
            from vitsom_tpu.parallel import distributed as dist

            if mesh is None:
                raise ValueError("raw_device_arrays needs the mesh when multi-host")
            n = dist.truncate_to_multiple(len(split), mesh.devices.size)
            span = dist.local_span(n, dist.process_index(), dist.process_count())
            out = dist.form_global_batch(
                {"image": split.x[span], "label": split.y[span].astype(np.int32)},
                mesh,
            )
            return out["image"], out["label"]
        return jnp.asarray(split.x), jnp.asarray(split.y.astype(np.int32))

    # ------------------------------------------------------------------
    # device-resident path
    # ------------------------------------------------------------------

    def device_arrays(self, split: Split, train_mode: bool = True, mesh=None):
        """Transform the whole split once and move it to device.

        The result is cached on the Split (keyed by train_mode): the trainer
        and the post-training evaluators use the same arrays, so evaluation
        never re-transforms/re-uploads the dataset (the upload alone is
        seconds of tunnel time for a 70k split).

        Multi-host: each process transforms only ITS contiguous row span and
        the spans assemble into one batch-axis-sharded global array (requires
        ``mesh``; the split is truncated to a multiple of the device count —
        global drop_last). Single-process (any device count) is unchanged.
        """
        cached = getattr(split, "_device_cache", {}).get(train_mode)
        if cached is not None:
            return cached
        if self._uint8_scale_split(split):
            # mnist-family /255-only transform: ship RAW uint8 across the
            # tunnel (4x smaller transfer) and materialize f32 on device.
            # XLA lowers /255 to multiply-by-reciprocal (<=1 ULP vs numpy's
            # correctly-rounded divide), so this device buffer is the ONE
            # canonical dataset: fit, train-time eval and restored-
            # checkpoint eval all read it — self-consistent numerics, no
            # duplicate f32 upload. Train and eval transforms are identical
            # here, so both cache keys share the buffer.
            images_u8, labels = self.raw_device_arrays(split, mesh=mesh)
            images = jax.jit(lambda v: v.astype(jnp.float32) / 255.0)(
                images_u8
            )
            result = (images, labels)
            if not hasattr(split, "_device_cache"):
                split._device_cache = {}
            split._device_cache[True] = result
            split._device_cache[False] = result
            return result
        if jax.process_count() > 1:
            from vitsom_tpu.parallel import distributed as dist

            if mesh is None:
                raise ValueError("device_arrays needs the mesh when multi-host")
            n = dist.truncate_to_multiple(len(split), mesh.devices.size)
            span = dist.local_span(n, dist.process_index(), dist.process_count())
            local = Split(split.x[span], split.y[span], split.train_mode)
            x, y = self._host_arrays(local, train_mode)
            out = dist.form_global_batch({"image": x, "label": y}, mesh)
            result = (out["image"], out["label"])
        else:
            x, y = self._host_arrays(split, train_mode)
            result = (jnp.asarray(x), jnp.asarray(y))
        if not hasattr(split, "_device_cache"):
            split._device_cache = {}
        split._device_cache[train_mode] = result
        return result

    def _host_arrays(self, split: Split, train_mode: bool = True):
        """Transform a split to host numpy arrays (scale-only transforms —
        the mnist-family ToTensor path — vectorize over the whole array in
        one shot; anything else falls back to per-image)."""
        tf = self.train_transform if train_mode else self.eval_transform
        rng = np.random.default_rng(0)
        x0 = tf(_materialize(split.x[0]), rng)
        if split.x.dtype != object:
            try:  # vectorized fast path for elementwise transforms
                out = tf(split.x, np.random.default_rng(0))
                if out.shape == (len(split),) + x0.shape:
                    return out.astype(np.float32), split.y.astype(np.int32)
            except Exception:
                pass
        out = np.empty((len(split),) + x0.shape, dtype=np.float32)
        out[0] = x0
        for i in range(1, len(split)):
            out[i] = tf(_materialize(split.x[i]), rng)
        return out, split.y.astype(np.int32)

    # ------------------------------------------------------------------
    # host path (augmented datasets)
    # ------------------------------------------------------------------

    def train_batches(self, epoch: int, seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """One epoch of shuffled, drop_last batches with multiprocess
        augmentation and background prefetch."""
        split = self.train
        bs = self.cfg.batch_size
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        perm = rng.permutation(len(split))
        steps = len(split) // bs
        idx_batches = [perm[i * bs : (i + 1) * bs] for i in range(steps)]
        if jax.process_count() > 1:
            # every process derives the SAME global permutation (seeded) and
            # augments only its span of each batch; the spans reassemble into
            # the identical global batch via form_global_* downstream
            from vitsom_tpu.parallel import distributed as dist

            pi, pc = dist.process_index(), dist.process_count()
            idx_batches = [dist.local_batch_indices(b, pi, pc) for b in idx_batches]
        yield from _augment_batches(
            split, idx_batches, self.train_transform, self.cfg.data, epoch, seed
        )

    def eval_batches(
        self, split: Split, drop_last: bool = True
    ) -> Iterator[Dict[str, np.ndarray]]:
        bs = self.cfg.batch_size
        n = len(split)
        steps = n // bs if drop_last else math.ceil(n / bs)
        tf = self.eval_transform if not split.train_mode else self.train_transform
        # eval transforms are deterministic; no workers needed for small sets
        rng = np.random.default_rng(0)
        for s in range(steps):
            idx = np.arange(s * bs, min((s + 1) * bs, n))
            xs = np.stack([tf(_materialize(split.x[i]), rng) for i in idx])
            yield {"image": xs, "label": split.y[idx].astype(np.int32)}


def _materialize(item) -> np.ndarray:
    """Decode lazy elements (paths) into HWC arrays."""
    if isinstance(item, str):
        from vitsom_tpu.data.datasets import _load_image

        return _load_image(item)
    return np.asarray(item)


# ---------------------------------------------------------------------------
# multiprocess augmentation workers
# ---------------------------------------------------------------------------

_WORKER_STATE: Dict[str, object] = {}


def _worker_init(x, y, data_cfg: DataConfig):
    # dataset arrays arrive ONCE per pool lifetime via initargs (the pool is
    # persistent across epochs — the reference's DataLoader re-forks and
    # re-ships 16 workers per epoch); no parent-global state, so concurrent
    # pools for different datasets can never cross-contaminate
    _WORKER_STATE["x"] = x
    _WORKER_STATE["y"] = y
    _WORKER_STATE["tf"] = aug_lib.make_train_transform(data_cfg)


def _worker_run(args):
    idx, seed_entropy = args
    x = _WORKER_STATE["x"]
    y = _WORKER_STATE["y"]
    tf = _WORKER_STATE["tf"]
    rng = np.random.default_rng(np.random.SeedSequence(seed_entropy))
    xs = np.stack([tf(_materialize(x[i]), rng) for i in idx])
    return {"image": xs, "label": y[idx].astype(np.int32)}


def _get_pool(split: Split, data_cfg: DataConfig, workers: int) -> ProcessPoolExecutor:
    """Lazily create the split-owned persistent worker pool."""
    if split.pool is None:
        import atexit
        import multiprocessing as mp

        split.pool = ProcessPoolExecutor(
            max_workers=workers,
            mp_context=mp.get_context("fork"),
            initializer=_worker_init,
            initargs=(split.x, split.y, data_cfg),
        )
        atexit.register(split.pool.shutdown, wait=False, cancel_futures=True)
    return split.pool


def _augment_batches(
    split: Split,
    idx_batches: List[np.ndarray],
    transform: Callable,
    data_cfg: DataConfig,
    epoch: int,
    seed: int,
) -> Iterator[Dict[str, np.ndarray]]:
    # honor requested num_workers up to 2x cores: mild oversubscription
    # helps prefetch (torch DataLoader style), but a 16-way fork storm on a
    # 1-CPU VM with JAX's thread pools is a deadlock hazard
    workers = min(data_cfg.num_workers, 2 * (os.cpu_count() or 1))
    if workers <= 1:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch, 7]))
        for idx in idx_batches:
            xs = np.stack([transform(_materialize(split.x[i]), rng) for i in idx])
            yield {"image": xs, "label": split.y[idx].astype(np.int32)}
        return

    args = [(idx, [seed, epoch, s]) for s, idx in enumerate(idx_batches)]
    pool = _get_pool(split, data_cfg, workers)
    # map keeps batches in flight ahead of consumption (host-side prefetch)
    yield from pool.map(_worker_run, args, chunksize=1)


def close_pools(dm: "DataModule") -> None:
    """Shut down any augmentation worker pools owned by the datamodule's
    splits (pools also auto-shutdown at interpreter exit)."""
    for split in (dm.train, dm.val, dm.test):
        if split is not None and split.pool is not None:
            split.pool.shutdown(wait=False, cancel_futures=True)
            split.pool = None


# ---------------------------------------------------------------------------
# device prefetch (double buffering)
# ---------------------------------------------------------------------------


def device_prefetch(batches: Iterator[Dict[str, np.ndarray]], depth: int = 2):
    """Move host batches to device ahead of compute."""
    buf: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()

    def producer():
        try:
            for b in batches:
                buf.put(jax.device_put(b))
        finally:
            buf.put(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        b = buf.get()
        if b is stop:
            return
        yield b


def chunked_device_prefetch(
    batches: Iterator[Dict[str, np.ndarray]], k: int, depth: int = 2, mesh=None
):
    """Stack HOST batches into chunks of (up to) ``k`` and ship each chunk to
    device as ONE transfer, prefetched ahead of compute.

    Stream-mode dispatches execute K train steps per device call
    (``train.steps_per_dispatch``) to amortize the per-dispatch tunnel
    round-trip; the chunk must therefore be assembled BEFORE the transfer.
    Stacking already-transferred device arrays with np.stack pulls every
    batch back to host and re-uploads it — 3 tunnel crossings per batch,
    defeating the prefetch (ADVICE r1). Here np.stack runs on host numpy in
    the producer thread and each leaf crosses once.

    Yields ``(chunk, n)`` where chunk is a device tree of ``[n, bs, ...]``
    leaves and ``n <= k`` (the ragged epoch tail yields once with ``n < k``).
    Producer exceptions re-raise in the consumer.

    Multi-host: incoming batches are this process's LOCAL rows
    (``DataModule.train_batches`` pre-slices them); with ``mesh`` given they
    assemble into global batch-sharded arrays, one transfer per chunk.
    """
    buf: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()
    err: list = []
    multihost = jax.process_count() > 1
    if multihost and mesh is None:
        raise ValueError("chunked_device_prefetch needs the mesh when multi-host")

    def ship(pending):
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *pending)
        if multihost:
            from vitsom_tpu.parallel import distributed as dist

            chunk = dist.form_global_stacked(stacked, mesh)
        else:
            chunk = jax.device_put(stacked)
        buf.put((chunk, len(pending)))

    def producer():
        pending = []
        try:
            for b in batches:
                pending.append(b)
                if len(pending) == k:
                    ship(pending)
                    pending = []
            if pending:
                ship(pending)
        except BaseException as e:  # surface in consumer, don't die silently
            err.append(e)
        finally:
            buf.put(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = buf.get()
        if item is stop:
            if err:
                raise err[0]
            return
        yield item


# ---------------------------------------------------------------------------
# split policy
# ---------------------------------------------------------------------------


def build_datamodule(cfg: Config) -> DataModule:
    raw = load_raw(cfg.data)
    train_tf = aug_lib.make_train_transform(cfg.data)
    eval_tf = aug_lib.make_eval_transform(cfg.data)
    name = cfg.data.dataset

    if not cfg.classification:
        # clustering: concat(train, test) trained and evaluated on
        x = _concat_maybe_object(raw.train_x, raw.test_x)
        y = np.concatenate([raw.train_y, raw.test_y])
        train = Split(x, y, train_mode=True)
        return DataModule(cfg, train, None, None, train_tf, eval_tf)

    # classification: split train into train/val
    val_frac = 0.1 if name == "tiny-imagenet" else 0.2
    rng = np.random.default_rng(0)  # fixed split seed (reference manual_seed(0))
    perm = rng.permutation(len(raw.train_y))
    n_val = int(round(val_frac * len(perm)))
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    train = Split(raw.train_x[train_idx], raw.train_y[train_idx], train_mode=True)
    val = Split(raw.train_x[val_idx], raw.train_y[val_idx], train_mode=False)
    test = Split(raw.test_x, raw.test_y, train_mode=False)
    return DataModule(cfg, train, val, test, train_tf, eval_tf)


def _concat_maybe_object(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.dtype == object or b.dtype == object:
        out = np.empty(len(a) + len(b), dtype=object)
        out[: len(a)] = list(a)
        out[len(a) :] = list(b)
        return out
    return np.concatenate([a, b])
