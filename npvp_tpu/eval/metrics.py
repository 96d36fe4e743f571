"""Quality metrics: PSNR, SSIM, MSE + the per-timestep evaluation protocol.

JAX rebuild of the reference metrics (reference utils/metrics.py:12-140):
identical formulas (PSNR with eps 1e-8; SSIM with an 11×11 σ=1.5 Gaussian
window as a depthwise conv, C1=0.01², C2=0.03²; MSE summed per sample) on
channels-last (N, H, W, C) images in [0, 1] after renormalization.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0,
         mean_flag: bool = True) -> jnp.ndarray:
    """(N, H, W, C) batch PSNR; -10·log10(mse + 1e-8)."""
    x = x.astype(jnp.float32) / data_range
    y = y.astype(jnp.float32) / data_range
    mse = jnp.mean((x - y) ** 2, axis=(1, 2, 3))
    score = -10.0 * jnp.log10(mse + 1e-8)
    return jnp.mean(score) if mean_flag else score


def mse_score(x: jnp.ndarray, y: jnp.ndarray, mean_flag: bool = True
              ) -> jnp.ndarray:
    """Per-sample summed squared error (reference MSEScore)."""
    mse = jnp.sum((x.astype(jnp.float32) - y.astype(jnp.float32)) ** 2,
                  axis=(1, 2, 3))
    return jnp.mean(mse) if mean_flag else mse


def _gaussian_window(window_size: int, sigma: float) -> jnp.ndarray:
    xs = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5, mean_flag: bool = True) -> jnp.ndarray:
    """(N, H, W, C) SSIM with Gaussian window — a depthwise conv, which XLA
    maps straight onto the MXU (survey §2.6 item 6)."""
    C = img1.shape[-1]
    win = _gaussian_window(window_size, sigma)
    kernel = jnp.broadcast_to(win[:, :, None, None],
                              (window_size, window_size, 1, C))

    conv = partial(jax.lax.conv_general_dilated,
                   rhs=kernel, window_strides=(1, 1),
                   padding=[(window_size // 2,) * 2] * 2,
                   dimension_numbers=("NHWC", "HWIO", "NHWC"),
                   feature_group_count=C)
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    mu1, mu2 = conv(x), conv(y)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = conv(x * x) - mu1_sq
    sigma2_sq = conv(y * y) - mu2_sq
    sigma12 = conv(x * y) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return (jnp.mean(ssim_map) if mean_flag
            else jnp.mean(ssim_map, axis=(1, 2, 3)))


def pred_ave_metrics(predict_fn: Callable, data_loader, metric_fn: Callable,
                     renorm, num_future_frames: int) -> np.ndarray:
    """Per-future-timestep metric averaged over a test loader (reference
    utils/metrics.py:111-140): both prediction and ground truth are
    renormalized to [0, 1] first; returns an array of length
    ``num_future_frames``.

    predict_fn: batch dict → (N, TP, H, W, C) predicted frames.
    """
    totals = np.zeros(num_future_frames)
    count = 0
    for batch in data_loader:
        pred = np.asarray(predict_fn(batch), np.float32)
        future = np.asarray(batch["future"], np.float32)
        n = pred.shape[0]
        for t in range(num_future_frames):
            m = float(metric_fn(jnp.asarray(renorm(pred[:, t])),
                                jnp.asarray(renorm(future[:, t]))))
            totals[t] += m * n
        count += n
    return totals / max(count, 1)
