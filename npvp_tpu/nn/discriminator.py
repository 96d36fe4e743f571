"""PatchGAN discriminator + adversarial losses.

Parity components for the reference's (deprecated — every shipped config sets
``use_gan: False``) GAN training path: the pix2pix PatchGAN discriminator
(reference models/Predictor.py:363-411), the vanilla/lsgan/wgangp GAN loss
(reference models/criterion.py:8-69) and the WGAN-GP gradient penalty
(reference models/criterion.py:72-96).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from npvp_tpu.nn.layers import BatchNorm


class PatchDiscriminator(nn.Module):
    """70×70 PatchGAN over (N, H, W, C) frames → (N, h', w', 1) logits."""

    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        lrelu = lambda y: nn.leaky_relu(y, 0.2)
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv0")(x)
        x = lrelu(x)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{n}")(x)
            x = BatchNorm(use_running_average=not train, momentum=0.9,
                          dtype=self.dtype, name=f"bn{n}")(x)
            x = lrelu(x)
        nf = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"conv{self.n_layers}")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                      dtype=self.dtype, name=f"bn{self.n_layers}")(x)
        x = lrelu(x)
        return nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       param_dtype=jnp.float32, name="head")(x)


def gan_loss(logits: jnp.ndarray, target_is_real: bool,
             mode: str = "vanilla", lam: float = 1.0) -> jnp.ndarray:
    """vanilla (BCE-with-logits) / lsgan (MSE) / wgangp losses."""
    logits = logits.astype(jnp.float32)
    if mode == "vanilla":
        target = 1.0 if target_is_real else 0.0
        loss = jnp.mean(jnp.maximum(logits, 0) - logits * target
                        + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    elif mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        loss = jnp.mean((logits - target) ** 2)
    elif mode == "wgangp":
        loss = -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    else:
        raise ValueError(f"unknown gan mode {mode!r}")
    return lam * loss


def gradient_penalty(critic_fn: Callable, real: jnp.ndarray,
                     fake: jnp.ndarray, rng: jax.Array,
                     lam_gp: float = 10.0, lam_gan: float = 1.0
                     ) -> jnp.ndarray:
    """WGAN-GP penalty on random interpolates (reference
    models/criterion.py:72-96). ``critic_fn``: frames → scalar-ish logits."""
    n = real.shape[0]
    t = jax.random.uniform(rng, (n,) + (1,) * (real.ndim - 1))
    interp = t * real + (1.0 - t) * fake

    def critic_sum(x):
        return jnp.sum(critic_fn(x))

    grads = jax.grad(critic_sum)(interp)
    gnorm = jnp.sqrt(jnp.sum(jnp.square(
        grads.reshape(n, -1).astype(jnp.float32)) + 1e-16, axis=1))
    penalty = jnp.clip(gnorm - 1.0, min=0.0)
    return jnp.mean(jnp.square(penalty)) * lam_gp * lam_gan
