"""Datasets and a threaded batch loader.

Parity targets (class names and record keys preserved):
- ``TrainValidImageDataset`` (``ESRGAN/dataset.py:33-87`` bicubic flavor;
  ``BSRGAN/dataset.py:44-96`` degradation flavor): yields ``{"gt", ...}``
  host batches. The TPU-native split differs deliberately from the
  reference: heavy image math (MATLAB bicubic, degradation chains) moved
  OFF the host into jitted device ops (SURVEY.md §3.1 identifies the CPU
  per-sample chain as the reference's hot spot), so datasets here only
  decode, crop and augment.
- ``TestImageDataset`` (``ESRGAN/dataset.py:90-123``): paired GT/LR dirs.
- ``DegeneratedImageDataset`` (``Real_ESRGAN/dataset.py:34-150``): GT +
  per-sample (k1, k2, sinc) kernel triple.
- ``PairedImageDataset`` (``Real_ESRGAN/dataset.py:153-189``).
- ``BatchLoader``: thread-pool decode + bounded queue, the host half of
  the reference's DataLoader(num_workers) + ``CUDAPrefetcher`` pair (the
  device half lives in ``parallel/prefetch.py``).
"""

from __future__ import annotations

import concurrent.futures
import os
import queue
import threading
from typing import Any, Callable, Iterator

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in CI/prod images
    cv2 = None

from srganfd_tpu.ops.augment import center_crop_np, random_crop_np, random_rotate_flip_np
from srganfd_tpu.ops.kernels import pad_kernel  # noqa: F401  (re-export convenience)
from srganfd_tpu.ops.realesrgan_degrade import sample_kernel_triple

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp")


def list_image_files(directory: str, shard: tuple[int, int] | None = None) -> list[str]:
    """Sorted image paths; ``shard=(index, count)`` keeps every count-th
    file starting at index — the per-host split for multi-host training
    (pass ``(jax.process_index(), jax.process_count())``)."""
    names = sorted(
        f for f in os.listdir(directory) if f.lower().endswith(IMAGE_EXTS)
    )
    paths = [os.path.join(directory, f) for f in names]
    if shard is not None:
        index, count = shard
        paths = paths[index::count]
    return paths


def _resolve_shard(shard: tuple[int, int] | str | None) -> tuple[int, int] | None:
    """``"auto"`` -> this process's shard under multi-host training
    (identity for single-process); tuples/None pass through."""
    if shard == "auto":
        import jax

        count = jax.process_count()
        return (jax.process_index(), count) if count > 1 else None
    return shard


def load_image_rgb(path: str) -> np.ndarray:
    """Decode to float32 RGB [0,1] HWC (cv2.imread + BGR->RGB, /255 —
    matching ``ESRGAN/dataset.py:57-66``)."""
    if cv2 is None:
        raise RuntimeError("cv2 unavailable")
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"failed to read image {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


class TrainValidImageDataset:
    """GT-only dataset: decode -> (Train: random crop + rot/flip |
    Valid: center crop) -> RGB [0,1]. LR generation (bicubic or a
    degradation chain) happens on device downstream."""

    def __init__(
        self,
        gt_images_dir: str,
        gt_image_size: int,
        mode: str = "Train",
        crop_image_size: int = 0,
        shard: tuple[int, int] | str | None = "auto",
    ) -> None:
        assert mode in ("Train", "Valid")
        self.paths = list_image_files(gt_images_dir, _resolve_shard(shard))
        if not self.paths:
            raise FileNotFoundError(f"no images in {gt_images_dir}")
        self.gt_image_size = gt_image_size
        self.crop_image_size = crop_image_size or gt_image_size
        self.mode = mode

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int, rng: np.random.Generator | None = None) -> dict[str, Any]:
        rng = rng or np.random.default_rng()
        img = load_image_rgb(self.paths[index])
        size = self.crop_image_size
        h, w = img.shape[:2]
        if h < size or w < size:  # reflect-pad small images up to crop size
            img = np.pad(
                img,
                ((0, max(0, size - h)), (0, max(0, size - w)), (0, 0)),
                mode="reflect",
            )
        if self.mode == "Train":
            img = random_crop_np(img, size, rng)
            img = random_rotate_flip_np(img, rng)
        else:
            img = center_crop_np(img, size)
        return {"gt": img}


# Surface-parity aliases: the reference ships thread+queue readahead
# wrappers (``PrefetchGenerator``/``PrefetchDataLoader``,
# ``ESRGAN/dataset.py:126-169``, unused by its train scripts); BatchLoader
# IS that design, so the names resolve here.
PrefetchGenerator = None  # set below once BatchLoader is defined
PrefetchDataLoader = None


class TestImageDataset:
    """Paired GT/LR directories, sorted order (``ESRGAN/dataset.py:90-123``)."""

    def __init__(self, test_gt_images_dir: str, test_lr_images_dir: str) -> None:
        self.gt_paths = list_image_files(test_gt_images_dir)
        self.lr_paths = list_image_files(test_lr_images_dir)
        assert len(self.gt_paths) == len(self.lr_paths)

    def __len__(self) -> int:
        return len(self.gt_paths)

    def __getitem__(self, index: int, rng=None) -> dict[str, Any]:
        return {
            "gt": load_image_rgb(self.gt_paths[index]),
            "lr": load_image_rgb(self.lr_paths[index]),
        }


class DegeneratedImageDataset:
    """Real-ESRGAN train dataset: GT crop + per-sample kernel triple
    (``Real_ESRGAN/dataset.py:34-150``)."""

    def __init__(
        self,
        gt_images_dir: str,
        gt_image_size: int,
        degradation_model_params: dict,
        mode: str = "Train",
    ) -> None:
        self.inner = TrainValidImageDataset(gt_images_dir, gt_image_size, mode)
        self.params = degradation_model_params

    def __len__(self) -> int:
        return len(self.inner)

    def __getitem__(self, index: int, rng: np.random.Generator | None = None) -> dict[str, Any]:
        rng = rng or np.random.default_rng()
        rec = self.inner.__getitem__(index, rng)
        k1, k2, sinc = sample_kernel_triple(rng, self.params)
        rec.update({"kernel1": k1, "kernel2": k2, "sinc_kernel": sinc})
        return rec


class PairedImageDataset:
    """Registered GT/LR training pairs (``Real_ESRGAN/dataset.py:153-189``)."""

    def __init__(
        self,
        gt_images_dir: str,
        lr_images_dir: str,
        shard: tuple[int, int] | str | None = "auto",
    ) -> None:
        shard = _resolve_shard(shard)
        self.gt_paths = list_image_files(gt_images_dir, shard)
        self.lr_paths = list_image_files(lr_images_dir, shard)
        assert len(self.gt_paths) == len(self.lr_paths)

    def __len__(self) -> int:
        return len(self.gt_paths)

    def __getitem__(self, index: int, rng=None) -> dict[str, Any]:
        return {
            "gt": load_image_rgb(self.gt_paths[index]),
            "lr": load_image_rgb(self.lr_paths[index]),
        }


class BatchLoader:
    """Threaded, seeded, infinite (train) or single-pass (eval) batch
    iterator producing stacked numpy dicts.

    cv2 decode releases the GIL, so a thread pool gives real parallelism
    without process overhead — this replaces the reference's DataLoader
    worker processes (``ESRGAN/train_esrgan.py:215-229``)."""

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch_batches: int = 4,
        loop: bool = True,
        collate_fn: Callable[[list[dict]], dict] | None = None,
        start_batch: int = 0,
    ) -> None:
        """``start_batch`` seeks the deterministic stream: the iterator
        emits batch ``start_batch`` first, byte-identical to what an
        un-seeked loader would have yielded at that position (index order
        and per-record RNG are both pure functions of (seed, batch_no)) —
        an O(1) skip with no decoding, for exact mid-run resume."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch_batches = prefetch_batches
        self.loop = loop
        self.collate_fn = collate_fn or self._default_collate
        self.start_batch = int(start_batch)

    @staticmethod
    def _default_collate(records: list[dict]) -> dict:
        keys = records[0].keys()
        return {k: np.stack([r[k] for r in records]) for k in keys}

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_stream(self) -> Iterator[list[int]]:
        n = len(self.dataset)
        bpp = len(self)  # batches per dataset pass
        # O(1) seek: batch k lives at (pass k // bpp, slot k % bpp); only
        # the target pass's permutation is materialized
        epoch = self.start_batch // bpp if bpp else 0
        slot = self.start_batch % bpp if bpp else 0
        while True:
            order = np.arange(n)
            if self.shuffle:
                np.random.default_rng(self.seed + epoch).shuffle(order)
            for bi in range(slot, bpp):
                idx = order[bi * self.batch_size : (bi + 1) * self.batch_size]
                yield list(idx)
            slot = 0
            if not self.loop:
                return
            epoch += 1

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()
        pool = concurrent.futures.ThreadPoolExecutor(max_workers=self.num_workers)
        counter = iter(range(self.start_batch, 1 << 62))

        def fetch(batch_idx: list[int], batch_no: int) -> dict:
            records = []
            for j, i in enumerate(batch_idx):
                rng = np.random.default_rng((self.seed, batch_no, j))
                records.append(self.dataset.__getitem__(int(i), rng))
            return self.collate_fn(records)

        def producer() -> None:
            try:
                for batch_idx in self._index_stream():
                    if stop.is_set():
                        return
                    q.put(pool.submit(fetch, batch_idx, next(counter)))
            finally:
                q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item.result()
        finally:
            stop.set()
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:
                pass  # interpreter teardown may have reaped queue internals


PrefetchGenerator = BatchLoader
PrefetchDataLoader = BatchLoader
