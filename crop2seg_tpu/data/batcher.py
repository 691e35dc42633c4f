"""Fixed-T bucketed batching with explicit pad masks.

TPU-native replacement for the reference's per-batch max-T padding
(/root/reference/src/utils.py:20-66 ``pad_collate``): dynamic per-batch
shapes force one XLA recompile per distinct T, so instead every batch is
padded up to the smallest bucket in ``t_buckets`` that fits (default buckets
chosen for the S2TSCzCrop range T in [27, 61], README.md:92). The pad mask is
an explicit input — models never inspect data values for padding.
"""
from __future__ import annotations

import logging
from typing import Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)

DEFAULT_T_BUCKETS = (32, 48, 61)


def pick_bucket(t: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if t <= b:
            return b
    return buckets[-1]


def collate(samples: List[Dict[str, np.ndarray]],
            t_buckets: Sequence[int] = DEFAULT_T_BUCKETS,
            pad_value: float = 0.0) -> Dict[str, np.ndarray]:
    """Stack samples into one batch dict, padding T to a shared bucket.

    Produces: x (B, Tb, H, W, C), dates (B, Tb[, 2]), pad_mask (B, Tb) bool,
    y (B, H, W) when present, lengths (B,), ids (B,)[, affine].
    Samples longer than the largest bucket are truncated (keeping the first
    Tb steps — cannot happen for in-contract S2TSCzCrop data).
    """
    max_len = max(s["length"] for s in samples)
    tb = pick_bucket(max_len, t_buckets)
    b = len(samples)
    x0 = samples[0]["x"]
    x = np.full((b, tb) + x0.shape[1:], pad_value, np.float32)
    dshape = (b, tb) + samples[0]["dates"].shape[1:]
    dates = np.zeros(dshape, np.float32)
    pad_mask = np.ones((b, tb), bool)
    lengths = np.zeros((b,), np.int32)
    for i, s in enumerate(samples):
        t = min(s["length"], tb)
        x[i, :t] = s["x"][:t]
        dates[i, :t] = s["dates"][:t]
        pad_mask[i, :t] = False
        lengths[i] = t
    out = {"x": x, "dates": dates, "pad_mask": pad_mask, "lengths": lengths,
           "ids": np.asarray([s["id"] for s in samples], np.int64)}
    if "y" in samples[0]:
        out["y"] = np.stack([s["y"] for s in samples]).astype(np.int32)
    if "affine" in samples[0]:
        out["affine"] = np.stack([s["affine"] for s in samples])
    return out


class BatchLoader:
    """Minimal epoch iterator: shuffle, batch, bucket-pad, optional drop-last.

    Replaces torch DataLoader for the host pipeline (reference train.py:346-380).
    Optionally weighted sampling with replacement (the reference builds a
    WeightedRandomSampler at train.py:340-344).

    ``native=True`` (default) assembles x/pad_mask on the C++ thread pool
    (crop2seg_tpu/native: npy parse + channel reorder + standardize +
    channels-last transpose + bucket pad, off the GIL) whenever the dataset
    reports a compatible plan; otherwise falls back to the Python path.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 t_buckets: Sequence[int] = DEFAULT_T_BUCKETS,
                 pad_value: float = 0.0, drop_last: bool = True,
                 sample_weights: Optional[np.ndarray] = None, seed: int = 0,
                 native: bool = True, native_threads: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.t_buckets = tuple(t_buckets)
        self.pad_value = pad_value
        self.drop_last = drop_last
        self.sample_weights = sample_weights
        self.native_threads = native_threads
        self._rng = np.random.default_rng(seed)
        self._plan = None
        if native:
            from crop2seg_tpu import native as nat
            plan_fn = getattr(dataset, "native_batch_plan", None)
            if plan_fn is not None and nat.available():
                try:
                    self._plan = plan_fn()
                    self._native = nat
                except (OSError, ValueError, KeyError) as e:
                    log.warning("native batch plan unavailable, using the "
                                "Python collate path: %s", e)
                    self._plan = None

    def _native_batch(self, chunk) -> Dict[str, np.ndarray]:
        augment = self._plan.get("augment", False)
        if augment:
            # RNG draws + y/dates transforms in Python (cheap, identical to
            # the __getitem__ stream); the per-pixel x work runs in C++
            # through the frame/pixel gather maps (loader.cpp)
            metas = [self.dataset.aug_item(int(i)) for i in chunk]
        else:
            metas = [self.dataset.light_item(int(i)) for i in chunk]
        tb = pick_bucket(max(m["length"] for m in metas), self.t_buckets)
        paths = [m["path"] for m in metas]
        shape = self._native.npy_shape(paths[0])
        frame_maps = gathers = None
        if augment:
            frame_maps = np.full((len(metas), tb), -1, np.int32)
            for i, m in enumerate(metas):
                fi = m["frame_idx"][:tb]
                frame_maps[i, :len(fi)] = fi
            if metas[0]["gather"] is not None:
                gathers = np.stack([m["gather"] for m in metas])
        x, pad_mask, lengths = self._native.load_batch(
            paths, tb, shape[2], shape[3], reorder=self._plan["reorder"],
            mean=self._plan["mean"], std=self._plan["std"],
            pad_value=self.pad_value, n_threads=self.native_threads,
            frame_maps=frame_maps, gathers=gathers)
        dshape = (len(metas), tb) + metas[0]["dates"].shape[1:]
        dates = np.zeros(dshape, np.float32)
        for i, m in enumerate(metas):
            t = min(m["length"], tb)
            dates[i, :t] = m["dates"][:t]
        out = {"x": x, "dates": dates, "pad_mask": pad_mask,
               "lengths": lengths,
               "ids": np.asarray([m["id"] for m in metas], np.int64)}
        if "y" in metas[0]:
            out["y"] = np.stack([m["y"] for m in metas]).astype(np.int32)
        if "affine" in metas[0]:
            out["affine"] = np.stack([m["affine"] for m in metas])
        return out

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        if self.sample_weights is not None:
            p = np.asarray(self.sample_weights, np.float64)
            idx = self._rng.choice(n, size=n, replace=True, p=p / p.sum())
        elif self.shuffle:
            idx = self._rng.permutation(n)
        else:
            idx = np.arange(n)
        for start in range(0, n, self.batch_size):
            chunk = idx[start:start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            if self._plan is not None:
                try:
                    yield self._native_batch(chunk)
                    continue
                except OSError as e:
                    # e.g. an npy dtype the C++ parser doesn't handle mid-
                    # dataset: drop to the Python path for the rest of the run
                    log.warning("native batch load failed, permanently "
                                "falling back to the Python collate path: %s",
                                e)
                    self._plan = None
            samples = [self.dataset[int(i)] for i in chunk]
            yield collate(samples, self.t_buckets, self.pad_value)


class DeviceCacheLoader:
    """Dataset-in-HBM replay loader: upload every batch once, then train
    from device memory.

    TPU-native mechanism with no reference counterpart (the reference
    re-reads from disk every epoch through torch DataLoader,
    /root/reference/train.py:346-380): when the training set fits in HBM —
    S2TSCzCrop fine-tune cells, the synthetic CLI dataset, any few-GB
    subset — the host->device transfer is paid exactly once. Every epoch
    after the first replays the resident device batches, so step rate is
    set by compute, not by the host link (on this harness the relay moves
    13-47 MB/s, i.e. a fresh B=16 bf16 batch upload costs ~7-25 s against
    a ~0.25 s step; even on a real PCIe host the first-epoch upload is the
    only copy).

    Semantics vs a fresh-stream loader, by design:
    - with ``shuffle=True`` every epoch after the first draws a FRESH
      per-sample permutation and assembles batches ON DEVICE by gathering
      from per-bucket resident stacks — the same shuffling semantics as the
      host loader (bucket membership is a data property either way; the
      epoch's remainder per bucket is dropped, i.e. ``drop_last=True``
      semantics). A gather of a B=16 bf16 batch is ~1 ms of on-device copy
      against a 7-25 s relay upload.
    - with ``shuffle=False`` (eval) epoch 1's batches replay verbatim.
    - augmentation, if any, is frozen at its epoch-1 draw — leave the
      cache off for augmented runs.
    - only ``keys`` are uploaded (the step function's inputs); host-only
      metadata (ids, affine, lengths) is dropped.
    - the consumer must NOT donate the batch argument of its jitted step
      (donation would invalidate the cached buffers).

    ``cast``: optional dtype for the ``x`` leaf (e.g. ``jnp.bfloat16`` for a
    bf16 model — halves both the upload and the resident footprint; the
    model would cast identically on first use).
    """

    def __init__(self, loader, cast=None, shuffle: bool = True, seed: int = 0,
                 keys: Sequence[str] = ("x", "dates", "pad_mask", "y")):
        self.loader = loader
        self.cast = cast
        self.shuffle = shuffle
        self.keys = tuple(keys)
        self._rng = np.random.default_rng(seed)
        self._cache: Optional[List[dict]] = None
        self._stacks: Optional[dict] = None    # bucket T -> stacked arrays
        self._batch_size: Optional[int] = None

    def __len__(self):
        if self._cache is None:
            return len(self.loader)
        if self.shuffle and self._stacks is not None:
            b = self._batch_size or 1
            return sum(s["x"].shape[0] // b for s in self._stacks.values())
        return len(self._cache)

    def _upload(self, batch: Dict[str, np.ndarray]) -> dict:
        import jax.numpy as jnp

        out = {}
        for k in self.keys:
            if k not in batch:
                continue
            v = batch[k]
            if k == "x" and self.cast is not None:
                v = np.asarray(v).astype(self.cast)  # ml_dtypes: host-side
            out[k] = jnp.asarray(v)
        return out

    def _build_stacks(self):
        """Concatenate the cached batches per T-bucket (on device) so later
        epochs can gather arbitrary sample subsets. Each bucket's per-batch
        copies are released right after that bucket's concatenate, so the
        HBM peak is dataset + one bucket — not 2x the dataset (which would
        break the fits-in-HBM contract at the start of epoch 2)."""
        import jax
        import jax.numpy as jnp

        buckets: dict = {}
        for dev in self._cache:
            buckets.setdefault(dev["x"].shape[1], []).append(dev)
        self._batch_size = max(d["x"].shape[0] for d in self._cache)
        self._cache = []  # the bucket lists below hold the only refs now
        self._stacks = {}
        for t in sorted(buckets):
            devs = buckets.pop(t)
            self._stacks[t] = {
                k: jnp.concatenate([d[k] for d in devs], axis=0)
                for k in devs[0]}
            devs.clear()  # free this bucket's per-batch copies
        self._gather = jax.jit(lambda s, i: jax.tree_util.tree_map(
            lambda a: a[i], s))

    def __iter__(self):
        if self._cache is None:
            cache: List[dict] = []
            for batch in self.loader:
                dev = self._upload(batch)
                cache.append(dev)
                yield dev
            self._cache = cache
            return
        if not self.shuffle:
            for dev in self._cache:
                yield dev
            return
        if self._stacks is None:
            self._build_stacks()
        gather = self._gather
        b = self._batch_size
        # fresh per-sample permutation within each bucket, fresh interleave
        # of the resulting batches across buckets
        batches = []
        for t, stack in self._stacks.items():
            perm = self._rng.permutation(stack["x"].shape[0])
            for start in range(0, len(perm) - b + 1, b):
                batches.append((t, perm[start:start + b]))
        self._rng.shuffle(batches)
        for t, idx in batches:
            yield gather(self._stacks[t], idx)


class PrefetchLoader:
    """Background-thread prefetcher wrapping a BatchLoader.

    Overlaps host-side sample loading/augmentation with device compute (the
    reference disabled its DataLoader workers entirely, train.py:110-112;
    with one host core, overlapping IO with TPU steps is the available win).
    """

    def __init__(self, loader, prefetch: int = 2):
        self.loader = loader
        self.prefetch = prefetch

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err = []
        stop = threading.Event()

        def put(item) -> bool:
            # Stop-aware put: when the consumer abandons iteration early
            # (train-step exception, break out of the epoch), its generator
            # finalizer sets ``stop``; a plain q.put would block this
            # thread forever on the full queue, leaking the thread, up to
            # prefetch+1 batches, and the underlying loader mid-epoch.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in self.loader:
                    if not put(batch):
                        return
            except Exception as e:  # surface loader errors on the consumer
                err.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
            t.join()
            if err:
                raise err[0]
        finally:
            stop.set()
