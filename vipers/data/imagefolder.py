"""ImageFolder dataset + threaded host loader feeding the device.

Counterpart of the reference's torchvision ``ImageFolder`` + ``DataLoader``
usage (`/root/reference/train.py:153-238`: workers decode/augment on host,
batches stream to device).  Here a thread pool decodes, batches are stacked
as uint8 numpy and normalized on device (see ``data.preprocess``), which
keeps host->device transfer at 1 byte/pixel.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".ppm")


class ImageFolder:
    """Directory-per-class dataset: root/<class>/<image>.

    ``cache_dir``: persist the file listing keyed by sha1(root) — the
    reference's on-disk dataset cache (`/root/reference/train.py:144-150`);
    scanning ImageNet's 1.28M files takes minutes, loading the cache doesn't.
    """

    def __init__(self, root: str, cache_dir: str = ""):
        import hashlib
        import pickle

        self.root = root
        cache_path = None
        if cache_dir:
            h = hashlib.sha1(os.path.abspath(root).encode()).hexdigest()
            cache_path = os.path.join(cache_dir, f"imagefolder_{h}.pkl")
            if os.path.exists(cache_path):
                with open(cache_path, "rb") as f:
                    self.classes, self.class_to_idx, self.samples = pickle.load(f)
                return
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        if not classes:
            raise FileNotFoundError(f"no class directories under {root}")
        self.classes = classes
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(IMG_EXTENSIONS):
                    self.samples.append((os.path.join(cdir, fname), self.class_to_idx[c]))
        if cache_path:
            os.makedirs(cache_dir, exist_ok=True)
            with open(cache_path, "wb") as f:
                pickle.dump((self.classes, self.class_to_idx, self.samples), f)

    def __len__(self):
        return len(self.samples)


class ImageFolderLoader:
    """Batched loader over an index stream with a decode thread pool.

    ``decode_fn(path, rng) -> uint8 (H, W, C)`` must produce a fixed size.
    Yields (images_u8 (B,H,W,C), labels (B,)) numpy pairs; the last partial
    batch is dropped when ``drop_last`` (train) and kept otherwise (eval,
    matching torch DataLoader defaults in `/root/reference/train.py:576-586`).

    ``rank``/``world`` (multi-process DP): per-sample augmentation rngs are
    keyed on the *global* stream position (batch-interleaved layout, see
    `data.sampler.shard_indices_for_host(batch_size=...)`), so the global
    batch assembled across processes carries exactly the augmentations a
    single-process run would have drawn — repeated-augmentation samples
    (same index, different position) still get distinct rngs.
    """

    def __init__(
        self,
        dataset: ImageFolder,
        indices: Sequence[int],
        batch_size: int,
        decode_fn: Callable,
        num_workers: int = 8,
        drop_last: bool = False,
        seed: int = 0,
        rank: int = 0,
        world: int = 1,
    ):
        self.dataset = dataset
        self.indices = list(indices)
        self.batch_size = batch_size
        self.decode_fn = decode_fn
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.rank = rank
        self.world = world
        self._pad_row = None  # lazily-built zero row for sentinel padding

    def __len__(self):
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        bs = self.batch_size
        idxs = self.indices
        batches = [idxs[i : i + bs] for i in range(0, len(idxs), bs)]
        if self.drop_last and batches and len(batches[-1]) < bs:
            batches.pop()

        def decode_one(args):
            pos, idx = args
            if idx < 0:
                # sentinel padding row (multi-process eval tails,
                # data.sampler pad_with_sentinel): zero image, label -1 —
                # masked out of loss/top-k/counts by the eval step.
                # The probe decode only establishes the output shape (a
                # constant of the decode config) — do it once, not per
                # pad row per epoch.
                if self._pad_row is None:
                    path, _ = self.dataset.samples[0]
                    probe = self.decode_fn(path, np.random.default_rng(0))
                    self._pad_row = np.zeros_like(probe)
                return self._pad_row, -1
            path, label = self.dataset.samples[idx]
            rng = np.random.default_rng((self.seed, pos, idx))
            return self.decode_fn(path, rng), label

        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []
            it = iter(enumerate(batches))

            def submit_next():
                try:
                    bpos, batch = next(it)
                except StopIteration:
                    return False
                # global stream position: batch-interleaved across ranks
                base = bpos * bs * self.world + self.rank * bs
                futs = [pool.submit(decode_one, (base + j, i)) for j, i in enumerate(batch)]
                pending.append(futs)
                return True

            # double-buffer: keep 2 batches in flight
            submit_next()
            submit_next()
            while pending:
                futs = pending.pop(0)
                results = [f.result() for f in futs]
                submit_next()
                images = np.stack([r[0] for r in results])
                labels = np.asarray([r[1] for r in results], dtype=np.int32)
                yield images, labels
