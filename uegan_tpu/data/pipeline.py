"""Host-side input pipeline: decode -> augment -> batch -> prefetch.

Replaces the reference's torch DataLoader + worker subprocesses
(reference: data_loader.py:72-108) with a thread-pool pipeline that overlaps
PIL decode/augmentation with device compute and prefetches whole device-ready
NHWC float32 batches.  Augmentation parity (reference: data_loader.py:74-101):

- train: RandomCrop(image_size) -> Resize(resize_size^2, bilinear/antialias)
         -> random H flip (p=.5) -> random V flip (p=.5)
         -> normalize to [-1, 1]; each image of the (exp, raw) pair gets
         independent randomness, as in the reference.
- test/val: Resize(test_img_size^2) -> normalize.

Randomness is a deterministic function of (seed, epoch, index) — the torch
pipeline's bit-stream cannot be replicated, but the augmentation
*distribution* is identical and runs are reproducible (SURVEY.md §7 hard
part 5).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np
from PIL import Image

from uegan_tpu.data.dataset import PairedImageDataset


def _to_float_norm(img: Image.Image) -> np.ndarray:
    """HWC uint8 -> float32 in [-1, 1] (Normalize(0.5, 0.5))."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return (arr - 0.5) / 0.5


def _random_crop(img: Image.Image, size: int, rng: np.random.Generator) -> Image.Image:
    w, h = img.size
    if w == size and h == size:
        return img
    if w < size or h < size:
        # torchvision RandomCrop would raise; we pad-reflect to size instead
        # so tiny fixtures work (documented deviation).
        arr = np.asarray(img)
        ph, pw = max(0, size - h), max(0, size - w)
        arr = np.pad(arr, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        img = Image.fromarray(arr)
        w, h = img.size
    left = int(rng.integers(0, w - size + 1))
    top = int(rng.integers(0, h - size + 1))
    return img.crop((left, top, left + size, top + size))


def _train_transform(img: Image.Image, crop: int, resize: int, rng: np.random.Generator,
                     emit_uint8: bool = False) -> np.ndarray:
    img = _random_crop(img, crop, rng)
    img = img.resize((resize, resize), Image.BILINEAR)
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_TOP_BOTTOM)
    return np.asarray(img) if emit_uint8 else _to_float_norm(img)


def _test_transform(img: Image.Image, size: int, emit_uint8: bool = False) -> np.ndarray:
    img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img) if emit_uint8 else _to_float_norm(img)


def _native_transform(img: Image.Image, emit_uint8: bool = False) -> np.ndarray:
    """keep_native test transform: no resize — the reference's unconditional
    square resize (reference: data_loader.py:95-101) is exactly the behavior
    ``--test_keep_aspect`` exists to beat; padding to /16 happens on the
    enhance path (infer/native.py), not here, so saved outputs stay native."""
    return np.asarray(img) if emit_uint8 else _to_float_norm(img)


def device_normalize(x):
    """uint8 batch -> float32 [-1, 1] ON DEVICE (`_to_float_norm` semantics).

    All the host augmentations are uint8-native PIL ops, so the float
    normalize is the only reason to ship 4-byte pixels; doing it on device
    cuts host->device traffic 4x and offloads the per-pixel float work from
    the (single-core) host.  Matches the host normalize to within 1 ulp:
    the only inexact op is /255, which XLA constant-folds to a
    multiply-by-reciprocal (test-bounded at 1.2e-7; the e2e loss canary is
    unchanged at its 4-decimal contract).  Elementwise jit preserves the
    input's sharding.  Float inputs pass through unchanged.
    """
    import jax.numpy as jnp

    if x.dtype != jnp.uint8:
        return x
    a = x.astype(jnp.float32) / 255.0
    return (a - 0.5) / 0.5


class _Loader:
    """Deterministic batched loader with thread prefetch.

    Yields dicts: img_exp (B,H,W,3) float32 [-1,1], img_raw same, img_name
    list[str] — the Munch contract of the reference fetcher
    (reference: data_loader.py:124-129; note domain1=exp, domain2=raw).
    """

    def __init__(
        self,
        dataset: PairedImageDataset,
        batch_size: int,
        train: bool,
        image_size: int = 512,
        resize_size: int = 256,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 1990,
        num_threads: int = 4,
        prefetch: int = 2,
        cache_decoded: bool = False,
        process_id: Optional[int] = None,
        process_count: Optional[int] = None,
        emit: str = "float32",
        keep_native: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.train = train
        self.image_size = image_size
        self.resize_size = resize_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.epoch = 0
        # opt-in RAM cache of decoded images (PNG decode dominates on weak
        # hosts; FiveK-sized sets need tens of GB — caller's choice)
        self.cache_decoded = cache_decoded
        self._cache: Dict[int, tuple] = {}
        # emit="uint8": skip the host-side float normalize and yield uint8
        # batches (4x smaller host->device transfers); the consumer
        # normalizes on device via :func:`device_normalize` (bit-identical)
        if emit not in ("float32", "uint8"):
            raise ValueError(f"emit must be float32|uint8, got {emit!r}")
        self.emit = emit
        # keep_native (test/val only): yield images at their NATIVE size,
        # batched by shape (below) — the --test_keep_aspect product path.
        if keep_native and train:
            raise ValueError("keep_native applies to test/val loaders only")
        self.keep_native = keep_native
        # multi-host data sharding: every process computes the SAME global
        # epoch order (seeded shuffle) and loads only its own contiguous
        # slice of each global batch — ``batch_size`` is the PER-PROCESS
        # batch, so the global batch is batch_size * process_count.  None
        # resolves lazily from jax (after any jax.distributed bootstrap).
        self._process = (process_id, process_count)

    def _process_info(self) -> tuple:
        pid, pc = self._process
        if pc is None:
            if pid is None:
                try:
                    import jax

                    pid, pc = jax.process_index(), jax.process_count()
                except Exception:
                    pid, pc = 0, 1
            else:
                pc = 1
        self._process = (pid or 0, pc)
        return self._process

    def __len__(self) -> int:
        _, pc = self._process_info()
        n = len(self.dataset)
        gb = self.batch_size * pc
        if self.drop_last:
            return n // gb
        return (n + gb - 1) // gb

    def _epoch_order(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(idx)
        return idx

    def _load_item(self, index: int, epoch: int) -> Dict:
        if self.cache_decoded and index in self._cache:
            a1u, a2u, name = self._cache[index]
            img1 = Image.fromarray(a1u)
            img2 = Image.fromarray(a2u)
        else:
            img1, img2, name = self.dataset.load_pair(index)
            if self.cache_decoded:
                self._cache[index] = (np.asarray(img1), np.asarray(img2), name)
        u8 = self.emit == "uint8"
        if self.train:
            r1 = np.random.default_rng((self.seed, epoch, index, 0))
            r2 = np.random.default_rng((self.seed, epoch, index, 1))
            a1 = _train_transform(img1, self.image_size, self.resize_size, r1, u8)
            a2 = _train_transform(img2, self.image_size, self.resize_size, r2, u8)
        elif self.keep_native:
            a1 = _native_transform(img1, u8)
            a2 = _native_transform(img2, u8)
        else:
            a1 = _test_transform(img1, self.image_size, u8)
            a2 = _test_transform(img2, self.image_size, u8)
        return {"exp": a1, "raw": a2, "name": name}

    def _native_batches(self, order: np.ndarray) -> List[np.ndarray]:
        """Group indices by native (raw, domain-1) pixel size so every batch
        stacks — the shape-bucketing half of --test_keep_aspect (the
        enhance-side /16 pad bucketing lives in infer/native.py).  Sizes come
        from image headers (PIL lazy open — no decode).  Order within a
        shape group is preserved, so outputs stay deterministic."""
        groups: Dict[tuple, list] = {}
        for i in order:
            f1, f2 = self.dataset.samples[int(i)]
            with Image.open(f2) as im2:
                k2 = im2.size
            with Image.open(f1) as im1:
                k1 = im1.size
            groups.setdefault((k2, k1), []).append(int(i))
        batches = []
        for idxs in groups.values():
            for j in range(0, len(idxs), self.batch_size):
                batches.append(np.asarray(idxs[j : j + self.batch_size]))
        return batches

    def __iter__(self) -> Iterator[Dict]:
        epoch = self.epoch
        self.epoch += 1
        pid, pc = self._process_info()
        order = self._epoch_order(epoch)
        nb = len(self)
        gb = self.batch_size * pc
        if pc > 1 and not self.drop_last and nb * gb > len(order):
            # multi-process eval: pad the tail global batch by wrapping so
            # every process contributes an equal, full-shaped shard (the
            # standard distributed-sampler convention; duplicates only ever
            # appear in the final batch of an epoch)
            order = np.concatenate([order, order[: nb * gb - len(order)]])
        if self.keep_native:
            if pc > 1:
                raise NotImplementedError(
                    "keep_native batching is single-process (test mode)")
            batches = self._native_batches(order)
        else:
            batches = [
                order[i * gb + pid * self.batch_size : i * gb + (pid + 1) * self.batch_size]
                for i in range(nb)
            ]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        from concurrent.futures import ThreadPoolExecutor

        def producer():
            try:
                with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(lambda i: self._load_item(int(i), epoch), b))
                        batch = {
                            "img_exp": np.stack([it["exp"] for it in items]),
                            "img_raw": np.stack([it["raw"] for it in items]),
                            "img_name": [it["name"] for it in items],
                        }
                        q.put(batch)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


def get_train_loader(
    root,
    img_size: int = 512,
    resize_size: int = 256,
    batch_size: int = 8,
    shuffle: bool = True,
    num_workers: int = 8,
    drop_last: bool = True,
    seed: int = 1990,
    cache_decoded: bool = False,
    process_id: Optional[int] = None,
    process_count: Optional[int] = None,
    emit: str = "float32",
) -> _Loader:
    return _Loader(
        PairedImageDataset(root),
        batch_size=batch_size,
        train=True,
        image_size=img_size,
        resize_size=resize_size,
        shuffle=shuffle,
        drop_last=drop_last,
        seed=seed,
        num_threads=num_workers,
        cache_decoded=cache_decoded,
        process_id=process_id,
        process_count=process_count,
        emit=emit,
    )


def get_test_loader(
    root,
    img_size: int = 512,
    batch_size: int = 8,
    shuffle: bool = False,
    num_workers: int = 4,
    seed: int = 1990,
    process_id: Optional[int] = None,
    process_count: Optional[int] = None,
    emit: str = "float32",
    keep_native: bool = False,
) -> _Loader:
    return _Loader(
        PairedImageDataset(root),
        batch_size=batch_size,
        train=False,
        image_size=img_size,
        shuffle=shuffle,
        drop_last=False,
        seed=seed,
        num_threads=num_workers,
        process_id=process_id,
        process_count=process_count,
        emit=emit,
        keep_native=keep_native,
    )


class Batch(dict):
    """Dict with attribute access — the Munch contract of the reference
    fetcher outputs (reference: data_loader.py:127: inputs.img_raw etc.)."""

    __getattr__ = dict.__getitem__

    def __setattr__(self, k, v):
        self[k] = v


class InputFetcher:
    """Infinite iterator over a loader, optionally device-putting with a sharding.

    The reference fetcher moved tensors host->device per batch
    (reference: data_loader.py:111-129); here ``jax.device_put`` with a
    NamedSharding places each global batch directly onto the mesh.  Under
    multi-host (jax.process_count() > 1) the loader yields this process's
    shard and ``jax.make_array_from_process_local_data`` assembles the
    global sharded array — each host only ever decodes its own 1/N of the
    global batch.
    """

    def __init__(self, loader: _Loader, sharding=None):
        self.loader = loader
        self.sharding = sharding
        self._it: Optional[Iterator] = None
        self._norm = None

    def __next__(self) -> Dict:
        import jax

        try:
            batch = next(self._it)  # type: ignore[arg-type]
        except (AttributeError, StopIteration, TypeError):
            self._it = iter(self.loader)
            batch = next(self._it)
        out = Batch(batch)
        if self.sharding is not None:
            if jax.process_count() > 1:
                put = lambda a: jax.make_array_from_process_local_data(self.sharding, a)
            else:
                put = lambda a: jax.device_put(a, self.sharding)
            # uint8 loaders ship 1-byte pixels and normalize on device
            # (bit-identical to the host normalize; see device_normalize)
            if batch["img_raw"].dtype == np.uint8:
                if self._norm is None:
                    self._norm = jax.jit(device_normalize)
                put_ = lambda a: self._norm(put(a))
            else:
                put_ = put
            out["img_exp"] = put_(batch["img_exp"])
            out["img_raw"] = put_(batch["img_raw"])
        return out
