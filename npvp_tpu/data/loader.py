"""Batch loader + per-dataset data module.

Replaces the reference's torch DataLoader / LightningDataModule stack
(reference utils/dataset.py:25-266) with a thread-pooled host pipeline that
yields **fixed-shape** numpy batches:

- ``pairs`` mode: (past, future) clips — standard VFP training.
- ``vfi`` mode: boundary/middle split by fixed index lists.
- ``rand_context`` mode (unified model): the full clip plus per-batch boolean
  observed/target masks over ``max_T``. The reference's collate returns
  shape-varying tensors per batch (utils/dataset.py:162-178 — the key
  dynamic-shape hazard under XLA, survey §7 hard-part 1); masks keep every
  batch the same shape so one compiled train step serves all context splits.

Sharding: each JAX process loads only its slice of the index space
(``process_index``/``process_count``) — the DistributedSampler equivalent.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from npvp_tpu.data import datasets as D
from npvp_tpu.data.smmnist import StochasticMovingMNIST
from npvp_tpu.data.transforms import build_transforms


class BatchLoader:
    def __init__(self, dataset, batch_size: int, *, shuffle: bool,
                 num_past: int, num_future: int, mode: str = "pairs",
                 min_lo: int = 1, max_lo: Optional[int] = None,
                 to_idx: Optional[Sequence[int]] = None,
                 tp_idx: Optional[Sequence[int]] = None,
                 seed: int = 0, num_workers: int = 4, drop_last: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 prefetch: int = 2):
        assert mode in ("pairs", "vfi", "rand_context")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_past, self.num_future = num_past, num_future
        self.clip_length = num_past + num_future
        self.mode = mode
        self.min_lo = min_lo
        self.max_lo = max_lo if max_lo is not None else self.clip_length - 1
        self.to_idx = np.asarray(to_idx) if to_idx is not None else None
        self.tp_idx = np.asarray(tp_idx) if tp_idx is not None else None
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch]))
            idx = rng.permutation(idx)
        return idx[self.process_index::self.process_count]

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _make_batch(self, sample_ids: np.ndarray,
                    batch_rng: np.random.Generator) -> Dict[str, np.ndarray]:
        def fetch(i):
            srng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch, int(i)]))
            return self.dataset.__getitem__(int(i), srng)

        if hasattr(self.dataset, "get_batch"):
            clip = np.asarray(self.dataset.get_batch(sample_ids), np.float32)
        elif self.num_workers > 1:
            with ThreadPoolExecutor(self.num_workers) as pool:
                clips = list(pool.map(fetch, sample_ids))
            clip = np.stack(clips).astype(np.float32)  # (N, T, H, W, C)
        else:
            clip = np.stack([fetch(i) for i in sample_ids]).astype(np.float32)

        if self.mode == "pairs":
            return {"past": clip[:, :self.num_past],
                    "future": clip[:, self.num_past:]}
        if self.mode == "vfi":
            return {"past": clip[:, self.to_idx],
                    "future": clip[:, self.tp_idx]}
        # rand_context: one random permutation + split point per batch
        # (reference utils/dataset.py:162-178), encoded as masks.
        T = self.clip_length
        lo = int(batch_rng.integers(self.min_lo, self.max_lo + 1))
        perm = batch_rng.permutation(T)
        obs_mask = np.zeros(T, bool)
        obs_mask[perm[:lo]] = True
        return {"clip": clip, "obs_mask": obs_mask, "tgt_mask": ~obs_mask}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices()
        n_batches = len(self)
        batch_rng = np.random.default_rng(
            np.random.SeedSequence([self.seed + 7, self.epoch,
                                    self.process_index]))
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        failure: list[BaseException] = []

        def producer():
            try:
                for b in range(n_batches):
                    ids = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    q.put(self._make_batch(ids, batch_rng))
            except BaseException as exc:  # propagate to the consumer —
                # swallowing a decode error here would silently truncate the
                # epoch and training would quietly continue on partial data
                failure.append(exc)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()
        if failure:
            raise RuntimeError(
                f"data producer failed at epoch {self.epoch}") from failure[0]


class DataModule:
    """Config → train/val/test datasets + loaders (reference
    LitDataModule, utils/dataset.py:25-160): per-dataset transform pipelines,
    ``phase: deploy`` merges train+val, ``dev_set_size`` truncation, and the
    cached ``len_train_loader`` used for per-batch LR scheduling."""

    def __init__(self, cfg, process_index: int = 0, process_count: int = 1):
        self.cfg = cfg
        self.process_index = process_index
        self.process_count = process_count
        d = cfg.Dataset
        self.train_transform, self.renorm = build_transforms(d.name, True)
        self.test_transform, _ = build_transforms(d.name, False)
        self.len_train_loader: Optional[int] = None
        self._built = {}

    # -- dataset construction ------------------------------------------------
    def _clip_length(self, test: bool = False) -> int:
        d = self.cfg.Dataset
        if test:
            return d.test_num_past_frames + d.test_num_future_frames
        return d.num_past_frames + d.num_future_frames

    def _build_split(self, split: str):
        d = self.cfg.Dataset
        L = self._clip_length(test=(split == "test"))
        name = "Cityscapes" if d.name == "CityScapes" else d.name
        if name == "SMMNIST":
            past = (d.test_num_past_frames if split == "test"
                    else d.num_past_frames)
            fut = (d.test_num_future_frames if split == "test"
                   else d.num_future_frames)
            return StochasticMovingMNIST(
                d.dir, train=(split != "test"), num_past_frames=past,
                num_future_frames=fut, image_size=d.img_size,
                # the generator must honor cfg.Dataset.img_size — defaulting
                # to 64 while the predictor's coordinate grid follows
                # img_size caused an opaque shape mismatch at non-64 sizes
                transform=(self.train_transform if split == "train"
                           else self.test_transform))
        tf = self.train_transform if split == "train" else self.test_transform
        if name == "MovingMNIST":
            # legacy deterministic MovingMNIST from pre-rendered npz arrays
            # (reference utils/dataset.py:596-670 + the moving-mnist-*.npz
            # file convention, :1016); the stochastic generator (SMMNIST)
            # is the primary MNIST path
            fname = {"train": "moving-mnist-train.npz",
                     "val": "moving-mnist-valid.npz",
                     "test": "moving-mnist-test.npz"}[split]
            return D.MovingMNISTNpz(Path(d.dir) / fname, L, tf)
        if name == "KTH":
            persons = {"train": [p for p in range(1, 17) if p != 5],
                       "val": [5],
                       "test": list(range(17, 26))}[split]
            clips = D.kth_clips(d.dir, L, persons)
            return D.ClipDataset(clips, tf, "grey_scale")
        if name == "BAIR":
            sub = "test" if split == "test" else "train"
            clips = D.folder_clips(Path(d.dir) / sub, L)
            ds = D.ClipDataset(clips, tf, "RGB")
            if split in ("train", "val"):
                n = len(ds)
                cut = int(n * 0.95)
                rng = np.random.default_rng(2021)
                perm = rng.permutation(n)
                ids = perm[:cut] if split == "train" else perm[cut:]
                return D.SubsetDataset(ds, ids)
            return ds
        if name == "Cityscapes":
            sub = {"train": "train", "val": "val", "test": "test"}[split]
            clips = D.cityscapes_clips(Path(d.dir) / sub, L)
            return D.ClipDataset(clips, tf, "RGB")
        if name == "KITTI":
            clips = D.kitti_clips(d.dir, L, train=(split != "test"))
            ds = D.ClipDataset(clips, tf, "RGB")
            if split in ("train", "val"):
                n = len(ds)
                cut = int(n * 0.95)
                ids = (np.arange(cut) if split == "train"
                       else np.arange(cut, n))
                return D.SubsetDataset(ds, ids)
            return ds
        raise ValueError(f"unknown dataset {name!r}")

    def dataset(self, split: str):
        if split not in self._built:
            ds = self._build_split(split)
            d = self.cfg.Dataset
            if split == "train" and d.phase == "deploy":
                # reference utils/dataset.py:106-107 merges train+val
                # unconditionally; a failure to build the val split must
                # surface, not silently drop the val data from the epoch
                ds = D.ConcatDataset([ds, self._build_split("val")])
            if d.dev_set_size is not None and split in ("train", "val"):
                size = min(d.dev_set_size, len(ds))
                ds = D.SubsetDataset(ds, np.arange(size))
            self._built[split] = ds
        return self._built[split]

    # -- loaders -------------------------------------------------------------
    def _loader(self, split: str, mode: str) -> BatchLoader:
        cfg, d, p = self.cfg, self.cfg.Dataset, self.cfg.Predictor
        test = split == "test"
        num_past = d.test_num_past_frames if test else d.num_past_frames
        num_future = d.test_num_future_frames if test else d.num_future_frames
        to_idx = tp_idx = None
        if mode == "vfi":
            total = num_past + num_future
            to_idx = (list(range(p.context_num_p))
                      + list(range(total - p.context_num_f, total)))
            tp_idx = list(range(p.context_num_p, total - p.context_num_f))
        return BatchLoader(
            self.dataset(split), d.batch_size, shuffle=(split == "train"),
            num_past=num_past, num_future=num_future, mode=mode,
            min_lo=p.min_lo, max_lo=p.max_lo, to_idx=to_idx, tp_idx=tp_idx,
            seed=cfg.Env.rand_seed + {"train": 0, "val": 1, "test": 2}[split],
            num_workers=d.num_workers, drop_last=(split != "test"),
            process_index=self.process_index,
            process_count=self.process_count)

    def predictor_mode(self) -> str:
        p = self.cfg.Predictor
        if p.rand_context:
            return "rand_context"
        if p.VFI:
            return "vfi"
        return "pairs"

    def train_loader(self, mode: Optional[str] = None) -> BatchLoader:
        loader = self._loader("train", mode or "pairs")
        self.len_train_loader = len(loader)
        return loader

    def val_loader(self, mode: Optional[str] = None) -> BatchLoader:
        return self._loader("val", mode or "pairs")

    def test_loader(self, mode: Optional[str] = None) -> BatchLoader:
        return self._loader("test", mode or "pairs")
