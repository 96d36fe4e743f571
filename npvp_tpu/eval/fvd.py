"""Fréchet Video Distance.

Rebuild of the reference FVD pipeline (reference utils/fvd.py): videos in
[0, 1] → resize to 224², scale to [-1, 1] → I3D 400-d logits features →
Fréchet distance between Gaussian fits (scipy ``sqrtm`` on host — a 400×400
matrix, negligible next to device work).

The I3D weights come from a converted released checkpoint
(tools/torch_converter.py ``convert_i3d``); feature extraction itself is a
jitted Flax program batched on the TPU.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from npvp_tpu.eval.i3d import InceptionI3d


def preprocess_videos(videos: np.ndarray, target: int = 224) -> jnp.ndarray:
    """(N, T, H, W, C) uint8/float in [0, 1] → (N, T, 224, 224, 3) in [-1, 1].

    Matches the reference's ``preprocess_single`` exactly
    (utils/fvd.py:160-185): bilinear resize of the *shorter* side to
    ``target`` (align_corners=False ≡ jax.image half-pixel centers), center
    crop of the longer side, then [0,1] → [-1,1]; grayscale triplicated to
    RGB."""
    import math

    videos = np.asarray(videos, np.float32)
    if videos.shape[-1] == 1:
        videos = np.repeat(videos, 3, axis=-1)
    x = jnp.asarray(videos)
    N, T, H, W, C = x.shape
    if (H, W) != (target, target):
        scale = target / min(H, W)
        th, tw = ((target, math.ceil(W * scale)) if H < W
                  else (math.ceil(H * scale), target))
        x = jax.image.resize(x, (N, T, th, tw, C), method="bilinear")
        h0, w0 = (th - target) // 2, (tw - target) // 2
        x = x[:, :, h0:h0 + target, w0:w0 + target, :]
    return x * 2.0 - 1.0


class FVD:
    def __init__(self, i3d_params: Optional[dict] = None,
                 dtype=jnp.bfloat16):
        self.model = InceptionI3d(dtype=dtype)
        self.params = i3d_params
        self._apply = jax.jit(self.model.apply)

    @classmethod
    def from_checkpoint(cls, path: str | Path, dtype=jnp.bfloat16) -> "FVD":
        """Load converted I3D weights (.npz from tools/torch_converter.py)."""
        import pickle

        path = Path(path)
        if path.suffix == ".pkl":
            variables = pickle.loads(path.read_bytes())
        else:
            raise ValueError("expected a .pkl converted checkpoint")
        fvd = cls(dtype=dtype)
        fvd.params = variables
        return fvd

    def init_random(self, seed: int = 0):
        """Random weights — architecture tests only; FVD values are
        meaningless without the Kinetics checkpoint."""
        dummy = jnp.zeros((1, 9, 224, 224, 3))
        self.params = self.model.init(jax.random.key(seed), dummy)
        return self

    def features(self, videos: np.ndarray, batch_size: int = 8
                 ) -> np.ndarray:
        """(N, T, H, W, C) in [0, 1] → (N, 400) I3D features."""
        assert self.params is not None, "load or init I3D weights first"
        x = preprocess_videos(videos)
        feats = []
        for i in range(0, x.shape[0], batch_size):
            feats.append(np.asarray(self._apply(self.params,
                                                x[i:i + batch_size])))
        return np.concatenate(feats, axis=0)

    def __call__(self, fake_videos: np.ndarray, real_videos: np.ndarray,
                 batch_size: int = 8) -> float:
        f_fake = self.features(fake_videos, batch_size)
        f_real = self.features(real_videos, batch_size)
        return frechet_distance(f_fake, f_real)


def frechet_distance(feats1: np.ndarray, feats2: np.ndarray) -> float:
    """Fréchet distance between Gaussian fits of two feature sets
    (reference utils/fvd.py:275-287, from StyleGAN-V)."""
    import scipy.linalg

    mu1, mu2 = feats1.mean(axis=0), feats2.mean(axis=0)
    cov1 = np.cov(feats1, rowvar=False)
    cov2 = np.cov(feats2, rowvar=False)
    m = np.square(mu1 - mu2).sum()
    sqrt_cc = scipy.linalg.sqrtm(np.dot(cov1, cov2))
    return float(m + np.trace(cov1 + cov2 - 2.0 * np.real(sqrt_cc)))
