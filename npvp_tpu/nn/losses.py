"""Training losses (reference models/criterion.py).

Active path: L1 (image + weighted feature) and the two-Gaussian KL. The
reference's legacy/exported losses (MSE with temporal weights, GDL,
BiPatchNCE, TemporalDiff) are provided for API completeness.
All are pure jnp functions computed in fp32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, lam: float = 1.0,
            norm_axis: Optional[int] = None,
            mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean absolute error × lam (reference models/criterion.py:99-121).

    ``mask``: optional (T,) weights over axis 1 for masked-mode training —
    the mean is taken only over unmasked frames."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    if norm_axis is not None:
        pred = pred / jnp.maximum(
            jnp.linalg.norm(pred, axis=norm_axis, keepdims=True), 1e-12)
        gt = gt / jnp.maximum(
            jnp.linalg.norm(gt, axis=norm_axis, keepdims=True), 1e-12)
    err = jnp.abs(pred - gt)
    if mask is None:
        return lam * jnp.mean(err)
    m = mask.astype(jnp.float32)
    shape = [1] * err.ndim
    shape[1] = m.shape[0]
    w = m.reshape(shape)
    denom = jnp.maximum(jnp.sum(m), 1.0) * (err.size / err.shape[1])
    return lam * jnp.sum(err * w) / denom


def kl_divergence(mu1: jnp.ndarray, logvar1: jnp.ndarray,
                  mu2: jnp.ndarray, logvar2: jnp.ndarray,
                  beta: float = 1.0) -> jnp.ndarray:
    """β · Σ KL(N(μ1,σ1²) ‖ N(μ2,σ2²)) / batch (reference
    models/criterion.py:341-354; called with (prior, posterior))."""
    mu1, logvar1 = mu1.astype(jnp.float32), logvar1.astype(jnp.float32)
    mu2, logvar2 = mu2.astype(jnp.float32), logvar2.astype(jnp.float32)
    n = mu1.shape[0]
    kld = (0.5 * (logvar2 - logvar1)
           + (jnp.exp(logvar1) + (mu1 - mu2) ** 2) / (2.0 * jnp.exp(logvar2))
           - 0.5)
    return beta * jnp.sum(kld) / n


def mse_loss(pred: jnp.ndarray, gt: jnp.ndarray,
             temporal_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean squared error, optionally weighted per time step (reference
    models/criterion.py:148-175)."""
    se = jnp.square(pred.astype(jnp.float32) - gt.astype(jnp.float32))
    if temporal_weight is not None:
        shape = [1] * se.ndim
        shape[1] = temporal_weight.shape[0]
        se = se * temporal_weight.reshape(shape)
    return jnp.mean(se)


def gdl_loss(pred: jnp.ndarray, gt: jnp.ndarray, alpha: float = 1.0
             ) -> jnp.ndarray:
    """Gradient-difference loss over (…, H, W, C) frames (reference
    models/criterion.py:177-247, channels-last)."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    d_gt_h = jnp.abs(gt[..., 1:, :, :] - gt[..., :-1, :, :])
    d_pr_h = jnp.abs(pred[..., 1:, :, :] - pred[..., :-1, :, :])
    d_gt_w = jnp.abs(gt[..., :, 1:, :] - gt[..., :, :-1, :])
    d_pr_w = jnp.abs(pred[..., :, 1:, :] - pred[..., :, :-1, :])
    g1 = jnp.abs(d_gt_h - d_pr_h)
    g2 = jnp.abs(d_gt_w - d_pr_w)
    if alpha != 1.0:
        g1, g2 = jnp.power(g1, alpha), jnp.power(g2, alpha)
    return jnp.mean(g1) + jnp.mean(g2)


def temporal_diff_loss(pred: jnp.ndarray, gt: jnp.ndarray, shift: int,
                       lam: float = 1.0) -> jnp.ndarray:
    """Temporal-difference loss with an explicit roll shift (the reference
    draws it randomly per call, models/criterion.py:123-146; pass the shift so
    the function stays pure under jit)."""
    dp = pred - jnp.roll(pred, shift, axis=1)
    dg = gt - jnp.roll(gt, shift, axis=1)
    return lam * jnp.mean(jnp.abs(
        dp.astype(jnp.float32) - dg.astype(jnp.float32)))


def bi_patch_nce_loss(gt_f: jnp.ndarray, pred_f: jnp.ndarray,
                      temperature: float = 0.07, lam: float = 1.0
                      ) -> jnp.ndarray:
    """Bidirectional patchwise contrastive loss (reference
    models/criterion.py:249-303). Inputs (N, T, H, W, C) channels-last;
    gradients of the negative logits are stopped."""
    N, T, H, W, C = gt_f.shape
    gt = gt_f.reshape(N * T, H * W, C).astype(jnp.float32)
    pr = pred_f.reshape(N * T, H * W, C).astype(jnp.float32)
    eye = jnp.eye(H * W)[None]

    def direction(a, b):
        diag = jnp.einsum("npc,nqc->npq", a, b) * eye
        nondiag = jnp.einsum("npc,nqc->npq", a,
                             jax.lax.stop_gradient(b)) * (1.0 - eye)
        logits = (diag + nondiag) / temperature
        labels = jnp.arange(H * W)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(logp[:, labels, labels])

    return lam * 0.5 * (direction(gt, pr) + direction(pr, gt))
