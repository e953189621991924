"""Host input pipeline: decode + crop in worker threads, device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=4)``
(``data_loaders_MT.py:47-77``).  Design:

- JPEG decode happens once per image and is cached as uint8 (the reference
  re-decodes every epoch in every worker process).
- Random crop is a host numpy slice (shrinks H2D 4x for 1024^2 ROIs); flips /
  colour jitter / normalisation run on device (see ``augment.py``) inside the
  jitted train step.
- ``PrefetchLoader`` keeps ``depth`` batches ahead on device
  (double-buffering H2D against compute).

Batch dict layout (train, mode=pathomic):
    path_views [B, 2, S, S, 3] uint8   two random crops (TransformTwice)
    omic       [B, 80] float32
    e, t       [B] float32,  g [B] int32
    index      [B] int32,  sample_idx [B, P+K] int32
"""
from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Dict, Iterator, Optional

import numpy as np

import jax

from .sampling import ContrastSampler


def _decode(entry) -> np.ndarray:
    if isinstance(entry, np.ndarray) and entry.ndim == 3:
        return entry
    if str(entry).lower().endswith((".jpg", ".jpeg")):
        # native libjpeg decode (releases the GIL inside ctypes, so the
        # thread pool gets true parallelism); PIL fallback below
        from . import native_loader
        with open(entry, "rb") as fh:
            img = native_loader.decode_jpeg(fh.read())
        if img is not None:
            return img
    from PIL import Image
    with Image.open(entry) as im:
        return np.asarray(im.convert("RGB"))


class PathomicDataset:
    """Array-of-samples view over one split of the CV pickle
    (reference ``PathomicDatasetLoader`` / ``Pathomic_InstanceSample``,
    ``data_loaders_MT.py:83-260``)."""

    def __init__(self, opt, data: Dict, split: str, train: bool,
                 contrast: bool = False, cache_images: bool = True,
                 superpixels: int = 0):
        d = data[split]
        self.X_path = d["x_path"]
        self.X_omic = np.asarray(d["x_omic"], dtype=np.float32)
        self.e = np.asarray(d["e"], dtype=np.float32)
        self.t = np.asarray(d["t"], dtype=np.float32)
        g = np.asarray(d["g"]).astype(np.int64)
        if opt.label_dim == 2:  # binary remap (:99-104)
            g = np.where(g == 1, 0, np.where(g == 2, 1, g))
        self.g = g.astype(np.int32)
        self.mode = opt.mode
        self.train = train
        self.crop = opt.input_size_path
        self.n = len(self.X_omic)
        self.cache_images = cache_images and self.mode != "omic"
        self._cache: Dict[int, np.ndarray] = {}
        self._cache_lock = threading.Lock()
        # SLIC superpixels for CLAT stage-1 masking: computed once per ROI
        # on the native C++ kernel and cached; crops slice the label map
        # (reference precomputes per image at dataset init,
        # MIA 2023/stage1.../data_loaders_MT_SP.py:116-125,296-313)
        self.superpixels = superpixels
        self._slic_cache: Dict[int, np.ndarray] = {}
        self.sampler: Optional[ContrastSampler] = None
        if contrast:
            self.sampler = ContrastSampler(
                self.g, opt.label_dim, opt.task, opt.nce_p, opt.nce_k,
                opt.pos_mode, getattr(opt, "neg_mode", "diff_class"),
                seed=opt.seed, distill=getattr(opt, "distill", "crd"))

    def __len__(self):
        return self.n

    def image(self, i: int) -> np.ndarray:
        if self.cache_images:
            with self._cache_lock:
                img = self._cache.get(i)
            if img is not None:
                return img
        img = _decode(self.X_path[i])
        if self.cache_images:
            with self._cache_lock:
                self._cache[i] = img
        return img

    def slic(self, i: int) -> np.ndarray:
        with self._cache_lock:
            m = self._slic_cache.get(i)
        if m is not None:
            return m
        from ..masking.slic import slic_segment
        m = slic_segment(self.image(i), self.superpixels, 10.0)
        with self._cache_lock:
            self._slic_cache[i] = m
        return m

    def crops(self, i: int, n_views: int, rng: np.random.Generator,
              with_mask: bool = False):
        """n_views random crops [V, S, S, 3] uint8 (RandomCrop(512)); with
        ``with_mask`` also returns the SLIC label crop aligned to view 0."""
        img = self.image(i)
        h, w = img.shape[:2]
        s = self.crop
        if h < s or w < s:  # RandomCrop pads symmetrically when smaller
            ph, pw = max(0, s - h), max(0, s - w)
            img = np.pad(img, ((ph // 2, ph - ph // 2),
                               (pw // 2, pw - pw // 2), (0, 0)))
            h, w = img.shape[:2]
        views = np.empty((n_views, s, s, 3), dtype=np.uint8)
        mask = None
        for v in range(n_views):
            top = rng.integers(0, h - s + 1)
            left = rng.integers(0, w - s + 1)
            views[v] = img[top:top + s, left:left + s]
            if with_mask and v == 0:
                sp = self.slic(i)
                if sp.shape != (h, w):  # padded image
                    sp = np.pad(sp, ((0, h - sp.shape[0]),
                                     (0, w - sp.shape[1])))
                mask = sp[top:top + s, left:left + s]
        if with_mask:
            return views, mask
        return views


class Loader:
    """Iterates batches of host numpy dicts, decoding in a thread pool."""

    def __init__(self, dataset: PathomicDataset, batch_size: int,
                 shuffle: bool, drop_last: bool, n_views: int = 1,
                 workers: int = 4, seed: int = 0):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.n_views = n_views
        self.pool = ThreadPoolExecutor(max_workers=workers) \
            if dataset.mode != "omic" else None
        self.rng = np.random.default_rng(seed)
        self.epoch = 0

    def __len__(self):
        if self.drop_last:
            return len(self.ds) // self.bs
        return -(-len(self.ds) // self.bs)

    def _make_batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        ds = self.ds
        batch = {
            "omic": ds.X_omic[idx],
            "e": ds.e[idx], "t": ds.t[idx], "g": ds.g[idx],
            "index": idx.astype(np.int32),
        }
        if ds.mode != "omic":
            seeds = self.rng.integers(0, 2 ** 63, size=len(idx))
            with_mask = ds.superpixels > 0

            def job(args):
                i, s = args
                return ds.crops(int(i), self.n_views,
                                np.random.default_rng(int(s)),
                                with_mask=with_mask)

            out = list(self.pool.map(job, zip(idx, seeds)))
            if with_mask:
                batch["path_views"] = np.stack([v for v, _ in out])
                batch["sp_mask"] = np.stack([m for _, m in out]).astype(
                    np.int32)
            else:
                batch["path_views"] = np.stack(out)  # [B, V, S, S, 3]
        if ds.sampler is not None:
            batch["sample_idx"] = ds.sampler.draw_batch(idx)
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(order)
        self.epoch += 1
        nb = len(self)
        for b in range(nb):
            idx = order[b * self.bs:(b + 1) * self.bs]
            if len(idx) == 0:
                return
            yield self._make_batch(idx)


class PrefetchLoader:
    """Wraps a :class:`Loader`, keeping ``depth`` batches on device ahead of
    the consumer (async H2D; the TPU never waits on decode).

    ``device`` may be a single device (default: device 0) or a
    ``jax.sharding.Sharding`` — with a batch sharding over a data mesh each
    array's leading axis is split across the mesh during the H2D transfer
    (the DataParallel scatter, ``train_test_MT.py:62-64``, done on the host
    thread instead of a device-side broadcast+split)."""

    def __init__(self, loader: Loader, depth: int = 2, device=None):
        self.loader = loader
        self.depth = depth
        self.device = device if device is not None else jax.devices()[0]

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        q: Queue = Queue(maxsize=self.depth)
        stop = object()

        def _put(batch):
            if isinstance(self.device, jax.sharding.Sharding):
                if jax.process_count() > 1:
                    # multi-host: every process runs the same Loader; each
                    # contributes its process_index slice of the global
                    # batch (parallel/mesh.py:shard_batch)
                    from ..parallel.mesh import shard_batch
                    return shard_batch(self.device.mesh, batch)
                n_shards = self.device.mesh.size
                lead = next(iter(batch.values())).shape[0]
                if lead % n_shards != 0:
                    # ragged final eval batch: leave it on host
                    # (uncommitted) — jit places it to match the params
                    return batch
            return jax.device_put(batch, self.device)

        def producer():
            try:
                for batch in self.loader:
                    q.put(_put(batch))
            finally:
                q.put(stop)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def make_loaders(opt, data: Dict, fold: int):
    """reference ``pathomic_dataloader`` (``data_loaders_MT.py:47-63``):
    returns ``(train_loader, test_loader, n_data)``."""
    split = data["cv_splits"][fold]
    train_ds = PathomicDataset(opt, split, "train", train=True, contrast=True)
    test_ds = PathomicDataset(opt, split, "test", train=False)
    train_loader = Loader(train_ds, opt.batch_size, shuffle=True,
                          drop_last=True, n_views=2,
                          workers=opt.host_workers, seed=opt.seed)
    test_loader = Loader(test_ds, opt.batch_size, shuffle=False,
                         drop_last=False, n_views=1,
                         workers=opt.host_workers, seed=opt.seed + 1)
    return train_loader, test_loader, len(train_ds)


def make_patches_loader(opt, data: Dict, fold: int):
    """reference ``pathomic_patches_dataloader`` (``data_loaders_MT.py:67-77``)."""
    split = data["cv_splits"][fold]
    test_ds = PathomicDataset(opt, split, "test", train=False)
    return Loader(test_ds, opt.batch_size, shuffle=False, drop_last=False,
                  n_views=1, workers=opt.host_workers, seed=opt.seed + 2)
