"""Threaded prefetching data loader producing fixed-shape numpy batches.

TPU-native replacement for the reference's torch DataLoader + mmcv
collate/DataContainer machinery (open_set/apis/train.py:133-149): samples
already come out of the dataset as fixed-size arrays, so batching is a
plain stack; a thread pool overlaps host decoding/augmentation with device
steps and a deterministic epoch-seeded shuffle replaces
DistSamplerSeedHook.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        process_count: Optional[int] = None,
        process_index: Optional[int] = None,
        cache_samples: bool = False,
    ):
        """``batch_size`` is the PER-PROCESS (local) batch. Under
        multi-host execution each process iterates a disjoint shard of the
        epoch permutation (reference DistSamplerSeedHook semantics): the
        same seeded shuffle on every process, then strided slicing by
        process index.

        ``cache_samples`` memoizes each transformed sample by dataset
        index across epochs: the first visit pays the host
        decode/augmentation, later epochs restack cached arrays.  This
        freezes per-epoch augmentation randomness — use it only where
        that is the point (sustained-throughput soaks on hosts whose CPU
        cannot re-augment at chip rate, tools/soak_train.py), never for
        real training runs."""
        if process_count is None:
            import jax

            process_count = jax.process_count()
            process_index = jax.process_index()
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.process_count = process_count
        self.process_index = process_index
        self.epoch = 0
        self._sample_cache: Optional[dict] = {} if cache_samples else None

    def __len__(self) -> int:
        n = len(self.dataset) // self.process_count
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rs = np.random.RandomState(self.seed + self.epoch)
            rs.shuffle(idx)
        if self.process_count > 1:
            # identical permutation everywhere, disjoint strided shards
            n = (len(idx) // self.process_count) * self.process_count
            idx = idx[: n][self.process_index :: self.process_count]
        return idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._indices()
        nb = len(self)
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def fetch(i):
            cache = self._sample_cache
            if cache is None:
                return self.dataset[i]
            i = int(i)
            if i not in cache:
                cache[i] = self.dataset[i]
            return cache[i]

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in batches:
                    if stop.is_set():
                        break
                    samples = list(pool.map(fetch, batch_idx))
                    if isinstance(samples[0], dict):
                        batch = {
                            k: np.stack([s[k] for s in samples])
                            for k in samples[0]
                        }
                    else:  # test mode: (image, meta) tuples
                        batch = (
                            np.stack([s[0] for s in samples]),
                            [s[1] for s in samples],
                        )
                    out_q.put(batch)
            out_q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()


class ClassBalancedDataset:
    """LVIS-style repeat-factor oversampling wrapper.

    TPU equivalent of the reference ``ClassBalancedDatasetOpen``
    (open_set/datasets/dataset_wrappers.py:13-142): images containing rare
    categories are repeated with factor
    max(1, sqrt(oversample_thr / category_frequency)); novel classes are
    pinned to repeat factor 1.0 (:102-106).
    """

    def __init__(self, dataset, oversample_thr: float = 1e-3):
        self.dataset = dataset
        self.oversample_thr = oversample_thr
        self._indices = self._build_indices()

    def _build_indices(self):
        ds = self.dataset
        num_images = len(ds)
        cat_freq: Dict[int, float] = {}
        img_cats = []
        for i, img_id in enumerate(ds.img_ids):
            cats = {
                a.get("category_id")
                for a in ds.coco.img_to_anns.get(img_id, [])
                if a.get("category_id") in ds.cat2label
            }
            img_cats.append(cats)
            for c in cats:
                cat_freq[c] = cat_freq.get(c, 0) + 1
        for c in cat_freq:
            cat_freq[c] /= num_images

        novel = set(getattr(ds, "unknown_cat_ids", []))
        cat_repeat = {
            c: max(1.0, np.sqrt(self.oversample_thr / f)) if c not in novel else 1.0
            for c, f in cat_freq.items()
        }
        indices = []
        for i, cats in enumerate(img_cats):
            repeat = max([cat_repeat[c] for c in cats], default=1.0)
            indices.extend([i] * int(np.ceil(repeat)))
        return indices

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, idx):
        return self.dataset[self._indices[idx]]

    def __getattr__(self, name):
        return getattr(self.dataset, name)
