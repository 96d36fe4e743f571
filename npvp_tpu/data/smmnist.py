"""Stochastic Moving MNIST — procedural bouncing-digit clips.

Synthesizes clips on the fly (reference utils/dataset.py:672-778, after
edenton/svg): two 32×32 digits bounce inside a 64×64 canvas with velocity
resampled at wall hits; per-index seeding makes every clip reproducible.

The digit sprites come from a locally present torchvision MNIST copy when
available (reference uses ``datasets.MNIST(download=False)``); in hermetic
environments a procedural glyph bank (PIL-rendered digits 0-9 with random
affine jitter) is used instead, preserving the dataset's role as the
always-available synthetic fixture for end-to-end tests.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def _load_mnist_sprites(data_root: str | Path, train: bool,
                        digit_size: int) -> Optional[np.ndarray]:
    """(N, digit_size, digit_size) float32 in [0,1] from a local torchvision
    MNIST layout, or None if unavailable."""
    try:
        from torchvision import datasets, transforms  # noqa

        ds = datasets.MNIST(str(data_root), train=train, download=False)
        import cv2

        arr = ds.data.numpy().astype(np.float32) / 255.0
        out = np.empty((arr.shape[0], digit_size, digit_size), np.float32)
        for i in range(arr.shape[0]):
            out[i] = cv2.resize(arr[i], (digit_size, digit_size),
                                interpolation=cv2.INTER_LINEAR)
        return out
    except Exception:
        return None


def _render_glyph_bank(digit_size: int, per_digit: int = 64,
                       seed: int = 0) -> np.ndarray:
    """Procedural sprite bank: PIL-rendered digits with random shift/scale."""
    from PIL import Image, ImageDraw, ImageFont

    rng = np.random.default_rng(seed)
    font = ImageFont.load_default()
    sprites = []
    for digit in range(10):
        for _ in range(per_digit):
            img = Image.new("L", (digit_size, digit_size), 0)
            draw = ImageDraw.Draw(img)
            scale = rng.uniform(1.6, 2.6)
            glyph = Image.new("L", (12, 12), 0)
            ImageDraw.Draw(glyph).text((2, 0), str(digit), fill=255,
                                       font=font)
            gw, gh = int(12 * scale), int(12 * scale)
            glyph = glyph.resize((gw, gh))
            ox = int(rng.integers(0, max(1, digit_size - gw)))
            oy = int(rng.integers(0, max(1, digit_size - gh)))
            img.paste(glyph, (ox, oy))
            sprites.append(np.asarray(img, np.float32) / 255.0)
    return np.stack(sprites)


class StochasticMovingMNIST:
    """Bouncing-digit clip dataset with reference dynamics:
    velocities dx, dy ∈ [-4, 4]; on wall hit the normal velocity is resampled
    away from the wall and the tangential one fully resampled (stochastic
    mode) or reflected (deterministic mode)."""

    def __init__(self, data_root: str | Path = "/tmp/mnist", train: bool = True,
                 num_past_frames: int = 5, num_future_frames: int = 10,
                 num_digits: int = 2, image_size: int = 64,
                 digit_size: int = 32, deterministic: bool = False,
                 length: Optional[int] = None, transform=None):
        self.seq_len = num_past_frames + num_future_frames
        self.num_digits = num_digits
        self.image_size = image_size
        if digit_size >= image_size:
            # keep room for motion at non-default frame sizes (the reference
            # is 64/32 only); S == D would make the placement range empty
            digit_size = max(4, image_size // 2)
        self.digit_size = digit_size
        self.deterministic = deterministic
        self.transform = transform
        sprites = _load_mnist_sprites(data_root, train, digit_size)
        if sprites is None:
            sprites = _render_glyph_bank(digit_size,
                                         seed=0 if train else 1)
        self.sprites = sprites
        self._length = length if length is not None else len(sprites)
        self._train = train

    def __len__(self):
        return self._length

    def get_batch(self, indices) -> "np.ndarray":
        """Batch-level fast path: render all clips in the native C++
        synthesizer (threaded, GIL-free) when available; falls back to the
        per-index Python renderer. Deterministic per (index, split) in both
        backends (each backend has its own RNG stream)."""
        from npvp_tpu.data import native_bindings as nb

        seeds = np.asarray([int(i) * 2 + int(self._train) for i in indices],
                           np.uint64)
        out = nb.synth_moving_sprites_batch(
            self.sprites, self.seq_len, self.image_size, self.num_digits,
            self.deterministic, seeds)
        if out is None:
            return np.stack([self[int(i)] for i in indices])
        if self.transform is not None:
            out = np.stack([self.transform(c, None) for c in out])
        return out

    def __getitem__(self, idx: int,
                    rng: Optional[np.random.Generator] = None) -> np.ndarray:
        # per-index seeding for reproducibility (reference seeds np by index,
        # utils/dataset.py:701-704); train/test streams are decorrelated
        del rng
        r = np.random.default_rng(
            np.random.SeedSequence([idx, int(self._train)]))
        S, D = self.image_size, self.digit_size
        clip = np.zeros((self.seq_len, S, S, 1), np.float32)
        lim = S - D
        for _ in range(self.num_digits):
            sprite = self.sprites[int(r.integers(len(self.sprites)))]
            sx = int(r.integers(lim))
            sy = int(r.integers(lim))
            dx = int(r.integers(-4, 5))
            dy = int(r.integers(-4, 5))
            for t in range(self.seq_len):
                if sy < 0:
                    sy = 0
                    if self.deterministic:
                        dy = -dy
                    else:
                        dy = int(r.integers(1, 5))
                        dx = int(r.integers(-4, 5))
                elif sy >= lim:
                    sy = lim - 1
                    if self.deterministic:
                        dy = -dy
                    else:
                        dy = int(r.integers(-4, 0))
                        dx = int(r.integers(-4, 5))
                if sx < 0:
                    sx = 0
                    if self.deterministic:
                        dx = -dx
                    else:
                        dx = int(r.integers(1, 5))
                        dy = int(r.integers(-4, 5))
                elif sx >= lim:
                    sx = lim - 1
                    if self.deterministic:
                        dx = -dx
                    else:
                        dx = int(r.integers(-4, 0))
                        dy = int(r.integers(-4, 5))
                clip[t, sy:sy + D, sx:sx + D, 0] += sprite
                sy += dy
                sx += dx
        np.clip(clip, 0.0, 1.0, out=clip)
        if self.transform is not None:
            clip = self.transform(clip, None)
        return clip
