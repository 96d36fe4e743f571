"""Clip transforms.

NumPy/C++(cv2) equivalents of the reference's list-of-PIL video transforms
(reference utils/dataset.py:780-900). A clip is a float32 array
(T, H, W, C) in [0, 1] until normalization; transforms are picklable
callables composed with :class:`Compose`. Per-dataset normalization constants
live in :data:`DATASET_STATS` (reference utils/dataset.py:33-60 hardcoded
stats produced by mean_std_compute).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False


class Compose:
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, clip: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        for t in self.transforms:
            clip = t(clip, rng) if isinstance(t, RandomTransform) else t(clip)
        return clip


class RandomTransform:
    """Marker base class: the loader threads a per-sample numpy Generator so
    augmentation is reproducible and thread-safe."""


class Resize:
    def __init__(self, size: Tuple[int, int]):
        self.size = size  # (H, W)

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        H, W = self.size
        if clip.shape[1] == H and clip.shape[2] == W:
            return clip
        if _HAVE_CV2:
            out = np.empty(
                (clip.shape[0], H, W, clip.shape[3]), dtype=clip.dtype)
            for t in range(clip.shape[0]):
                r = cv2.resize(clip[t], (W, H), interpolation=cv2.INTER_LINEAR)
                out[t] = r[..., None] if r.ndim == 2 else r
            return out
        # nearest-neighbor fallback
        ys = (np.arange(H) * clip.shape[1] / H).astype(int)
        xs = (np.arange(W) * clip.shape[2] / W).astype(int)
        return clip[:, ys][:, :, xs]


class CenterCrop:
    def __init__(self, size: Tuple[int, int]):
        self.size = size

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        H, W = self.size
        h0 = (clip.shape[1] - H) // 2
        w0 = (clip.shape[2] - W) // 2
        return clip[:, h0:h0 + H, w0:w0 + W]


class Crop:
    """Fixed-corner crop (reference VidCrop)."""

    def __init__(self, h0: int, w0: int, size: Tuple[int, int]):
        self.h0, self.w0, self.size = h0, w0, size

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        H, W = self.size
        return clip[:, self.h0:self.h0 + H, self.w0:self.w0 + W]


class Pad:
    def __init__(self, pad_h: int, pad_w: int):
        self.pad_h, self.pad_w = pad_h, pad_w

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        return np.pad(clip, ((0, 0), (self.pad_h, self.pad_h),
                             (self.pad_w, self.pad_w), (0, 0)))


class RandomHorizontalFlip(RandomTransform):
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, clip, rng):
        if rng is not None and rng.random() < self.p:
            return clip[:, :, ::-1]
        return clip


class RandomVerticalFlip(RandomTransform):
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, clip, rng):
        if rng is not None and rng.random() < self.p:
            return clip[:, ::-1]
        return clip


class Normalize:
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        return (clip - self.mean) / self.std


class ReNormalize:
    """Inverse of Normalize, for visualization/metrics
    (reference VidReNormalize, utils/dataset.py:860-886)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, clip):
        return np.clip(np.asarray(clip, np.float32) * self.std + self.mean,
                       0.0, 1.0)


# Channel statistics measured by the reference (utils/dataset.py:33-60).
DATASET_STATS = {
    "KTH": {"mean": 0.6013795, "std": 2.7570653},
    "KITTI": {"mean": (0.44812047, 0.47147775, 0.4677183),
              "std": (1.5147436, 1.5871466, 1.5925455)},
    "BAIR": {"mean": (0.61749697, 0.6050092, 0.52180636),
             "std": (2.1824553, 2.1553133, 1.9115673)},
    "Cityscapes": {"mean": (0.31604213, 0.35114038, 0.3104223),
                   "std": (1.2172801, 1.3219808, 1.2082524)},
    "SMMNIST": {"mean": 0.0, "std": 1.0},
    "MovingMNIST": {"mean": 0.0, "std": 1.0},
}


def build_transforms(name: str, train: bool):
    """Per-dataset transform pipeline + renormalizer (reference
    utils/dataset.py:33-60). Returns (transform, renorm)."""
    name = "Cityscapes" if name == "CityScapes" else name
    stats = DATASET_STATS[name]
    norm = Normalize(stats["mean"], stats["std"])
    renorm = ReNormalize(stats["mean"], stats["std"])
    flips = [RandomHorizontalFlip(0.5), RandomVerticalFlip(0.5)]
    if name == "KTH":
        steps = [CenterCrop((120, 120)), Resize((64, 64))]
        steps += flips if train else []
        steps += [norm]
    elif name == "KITTI":
        steps = [Resize((128, 128))] + (flips if train else []) + [norm]
    elif name == "BAIR":
        steps = (flips if train else []) + [norm]
    elif name == "Cityscapes":
        steps = [norm]
    elif name in ("SMMNIST", "MovingMNIST"):
        steps = []
    else:
        raise ValueError(f"unknown dataset {name!r}")
    return Compose(steps), renorm


def mean_std_compute(clips_iter, channels: int) -> Tuple[np.ndarray, np.ndarray]:
    """One-pass channel mean/std over a clip iterator (reference
    utils/dataset.py:902-951)."""
    count = 0
    s = np.zeros(channels, np.float64)
    s2 = np.zeros(channels, np.float64)
    for clip in clips_iter:
        flat = clip.reshape(-1, channels).astype(np.float64)
        count += flat.shape[0]
        s += flat.sum(axis=0)
        s2 += (flat ** 2).sum(axis=0)
    mean = s / count
    std = np.sqrt(s2 / count - mean ** 2)
    return mean.astype(np.float32), std.astype(np.float32)
