"""Frame-folder clip datasets: KTH, BAIR, Cityscapes, KITTI (+ npz
MovingMNIST).

NumPy re-design of the reference's dataset wrappers (reference
utils/dataset.py:268-670): a dataset is a list of clips (each a list of frame
paths) plus a transform; decoding is PIL/cv2 on host CPU inside the loader's
worker threads. Split conventions match the reference exactly so benchmark
protocols line up.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

KTH_ACTIONS = ["boxing", "handclapping", "handwaving", "jogging_no_empty",
               "running_no_empty", "walking_no_empty"]


def load_frame(path: str | Path, color_mode: str = "grey_scale") -> np.ndarray:
    """Decode one frame to float32 (H, W, C) in [0, 1]."""
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("L" if color_mode == "grey_scale" else "RGB")
        arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


class ClipDataset:
    """Generic clip dataset over lists of frame paths (reference
    utils/dataset.py:517-594). ``__getitem__`` returns the decoded,
    transformed full clip (T, H, W, C); past/future or rand-context splitting
    happens in the batch loader."""

    def __init__(self, clips: Sequence[Sequence[Path]], transform,
                 color_mode: str = "grey_scale"):
        self.clips = list(clips)
        self.transform = transform
        self.color_mode = color_mode

    def __len__(self):
        return len(self.clips)

    def __getitem__(self, idx: int,
                    rng: Optional[np.random.Generator] = None) -> np.ndarray:
        frames = [load_frame(p, self.color_mode) for p in self.clips[idx]]
        clip = np.stack(frames, axis=0)
        return self.transform(clip, rng) if self.transform else clip


def chunk_into_clips(img_files: List[Path], clip_length: int,
                     center_remainder: bool = True) -> List[List[Path]]:
    """Slice a sorted frame list into consecutive non-overlapping clips,
    discarding the remainder symmetrically (reference KTH slicing,
    utils/dataset.py:329-339)."""
    n = len(img_files) // clip_length
    rem = len(img_files) % clip_length
    start = rem // 2 if center_remainder else 0
    files = img_files[start:start + n * clip_length]
    return [files[i * clip_length:(i + 1) * clip_length] for i in range(n)]


def kth_clips(root: str | Path, clip_length: int, person_ids: Sequence[int],
              actions: Sequence[str] = tuple(KTH_ACTIONS)
              ) -> List[List[Path]]:
    """KTH frame folders filtered by person id (reference split: persons 1-16
    train, 17-25 test, val person [5]; utils/dataset.py:296-304)."""
    root = Path(root).absolute()
    folders = []
    for action in actions:
        action_path = root / action
        if not action_path.is_dir():
            continue
        folders.extend(p for p in action_path.iterdir()
                       if p.is_dir() and ".avi" not in p.name)
    folders = sorted(folders)
    clips = []
    for folder in folders:
        pid = int(folder.name.strip().split("_")[0][-2:])
        if pid not in person_ids:
            continue
        clips.extend(chunk_into_clips(sorted(folder.glob("*")), clip_length))
    return clips


def folder_clips(root: str | Path, clip_length: int,
                 stride: Optional[int] = None) -> List[List[Path]]:
    """One clip stream per subfolder (BAIR layout: train/test dirs of
    per-example frame folders; reference utils/dataset.py:362-400)."""
    root = Path(root).absolute()
    clips = []
    for folder in sorted(p for p in root.iterdir() if p.is_dir()):
        files = sorted(folder.glob("*"))
        if stride is None:
            clips.extend(chunk_into_clips(files, clip_length,
                                          center_remainder=False))
        else:
            for s in range(0, len(files) - clip_length + 1, stride):
                clips.append(files[s:s + clip_length])
    return clips


def cityscapes_clips(root: str | Path, clip_length: int) -> List[List[Path]]:
    """Cityscapes sequences grouped by (city, seq id) with consecutive frame
    numbers (reference utils/dataset.py:420-443; file stem
    ``city_seq_frame*``)."""
    root = Path(root).absolute()
    clips = []
    for city_dir in sorted(p for p in root.iterdir() if p.is_dir()):
        by_seq = {}
        for f in sorted(city_dir.glob("*")):
            parts = f.stem.split("_")
            if len(parts) < 3:
                continue
            by_seq.setdefault(parts[1], []).append(f)
        for files in by_seq.values():
            clips.extend(chunk_into_clips(sorted(files), clip_length,
                                          center_remainder=False))
    return clips


def kitti_clips(root: str | Path, clip_length: int,
                test_folder_ids: Sequence[int] = (10, 11, 12, 13),
                train: bool = True) -> List[List[Path]]:
    """KITTI folder-indexed split with explicit test folder ids (reference
    utils/dataset.py:445-514)."""
    root = Path(root).absolute()
    folders = sorted(p for p in root.iterdir() if p.is_dir())
    clips = []
    for i, folder in enumerate(folders):
        is_test = i in test_folder_ids
        if train == is_test:
            continue
        clips.extend(chunk_into_clips(sorted(folder.glob("*")), clip_length,
                                      center_remainder=False))
    return clips


class MovingMNISTNpz:
    """Legacy npz MovingMNIST (reference utils/dataset.py:596-670): array of
    shape (T, N, H, W) in [0, 255]."""

    def __init__(self, npz_path: str | Path, clip_length: int, transform=None):
        data = np.load(str(npz_path))
        arr = data[data.files[0]] if hasattr(data, "files") else data
        self.frames = np.asarray(arr, np.float32) / 255.0  # (T, N, H, W)
        self.clip_length = clip_length
        self.transform = transform

    def __len__(self):
        return self.frames.shape[1]

    def __getitem__(self, idx: int,
                    rng: Optional[np.random.Generator] = None) -> np.ndarray:
        clip = self.frames[: self.clip_length, idx, :, :, None]
        return self.transform(clip, rng) if self.transform else clip


class SubsetDataset:
    """Fixed-index subset (reference dev_set_size truncation,
    utils/dataset.py:109-112)."""

    def __init__(self, base, indices: Sequence[int]):
        self.base = base
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx, rng=None):
        return self.base.__getitem__(self.indices[idx], rng)


class ConcatDataset:
    def __init__(self, parts: Sequence):
        self.parts = list(parts)
        self._offsets = np.cumsum([0] + [len(p) for p in self.parts])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx, rng=None):
        part = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.parts[part].__getitem__(idx - int(self._offsets[part]),
                                            rng)
