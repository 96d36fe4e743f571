"""Neural-process conditioning modules: Fourier-feature coordinate MLP
(NRMLP), parameter-free positional fusion (PosFeatFuser), and the latent
event encoder (prior/posterior) for the stochastic path.

Reference: models/submodules.py:258-477.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from npvp_tpu.nn.layers import ConvBNAct


class NRMLP(nn.Module):
    """Fourier-feature positional MLP.

    Coordinates x in [0,1]^3 are lifted with a Gaussian random matrix B
    (init N(0,1) * scale, scale=10 — the exact init the reference found
    load-bearing, models/submodules.py:277-284; B is *trainable*), mapped to
    [cos(2πxBᵀ), sin(2πxBᵀ)], passed through an MLP, and projected to
    per-position (beta, gamma) modulation vectors. ``fuse_method='Add'``
    (all shipped configs) returns gamma = 0.
    """

    out_channels: int
    dim_x: int = 3
    d_model: int = 256
    mlp_layers: int = 4
    scale: float = 10.0
    fuse_method: str = "SPADE"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, coords: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """coords: (N, dim_x) → (beta, gamma) each (N, out_channels)."""
        B = self.param(
            "B",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.d_model, self.dim_x),
        )
        proj = (2.0 * jnp.pi * coords.astype(jnp.float32)) @ B.T
        x = jnp.concatenate([jnp.cos(proj), jnp.sin(proj)], axis=-1)
        x = x.astype(self.dtype)
        x = nn.relu(nn.Dense(self.d_model, dtype=self.dtype,
                             param_dtype=jnp.float32, name="mlp_0")(x))
        for i in range(self.mlp_layers - 2):
            x = nn.relu(nn.Dense(self.d_model, dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name=f"mlp_{i + 1}")(x))
        beta = nn.Dense(self.out_channels, dtype=self.dtype,
                        param_dtype=jnp.float32, name="mlp_beta")(x)
        if self.fuse_method == "SPADE":
            gamma = nn.Dense(self.out_channels, dtype=self.dtype,
                             param_dtype=jnp.float32, name="mlp_gamma")(x)
        else:
            gamma = jnp.zeros_like(beta)
        return beta, gamma


def pos_feat_fuse(
    x: jnp.ndarray,
    pos_beta: jnp.ndarray,
    pos_gamma: jnp.ndarray,
    norm_type: str = "layer",
    epsilon: float = 1e-5,
) -> jnp.ndarray:
    """Parameter-free SPADE-style fusion (reference models/submodules.py:412-454).

    Args:
      x: (N, T, H, W, C) features (channels-last).
      pos_beta / pos_gamma: (T*H*W, C) per-position modulation.
      norm_type: 'layer' (GroupNorm-1 ≡ per-frame layernorm over C,H,W —
        the shipped default), 'instance', or 'batch'.

    Returns normalized * (1 + gamma) + beta, same shape as x.
    """
    N, T, H, W, C = x.shape
    axes = {"layer": (2, 3, 4), "instance": (2, 3),
            "batch": (0, 1, 2, 3), "syncbatch": (0, 1, 2, 3)}.get(norm_type)
    if axes is None:
        raise ValueError(f"unknown param-free norm type {norm_type!r}")
    # fp32 statistics over the compute-dtype tensor (single bf16 read; no
    # fp32 materialization of the activations). For 'batch' the reduction
    # spans the (sharded) global batch — sync-BN for free under jit.
    from npvp_tpu.nn.layers import fp32_moments

    mean, var = fp32_moments(x, axes)
    inv = jax.lax.rsqrt(var + epsilon).astype(x.dtype)
    mean = mean.astype(x.dtype)

    gamma = pos_gamma.reshape(T, H, W, C)[None].astype(x.dtype)
    beta = pos_beta.reshape(T, H, W, C)[None].astype(x.dtype)
    return (x - mean) * inv * (1.0 + gamma) + beta


class EventEncoder(nn.Module):
    """Aggregated event coding → latent μ (and log σ² + reparameterized z when
    stochastic). Reference models/submodules.py:368-410.

    Input/output are channels-last (N, H, W, C).
    """

    hidden_channels: int
    n_layers: int = 1
    stochastic: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 sample: bool = True):
        in_channels = x.shape[-1]
        # depthwise 3x3 → BN → relu
        x = ConvBNAct(in_channels, (3, 3), feature_group_count=in_channels,
                      dtype=self.dtype, name="conv1")(x, train=train)
        x = ConvBNAct(self.hidden_channels, (3, 3), dtype=self.dtype,
                      name="conv2")(x, train=train)
        for i in range(self.n_layers):
            x = ConvBNAct(self.hidden_channels, (1, 1), dtype=self.dtype,
                          name=f"mlp_{i}")(x, train=train)
        mu = nn.Conv(in_channels, (1, 1), use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mu_net")(x)
        if not self.stochastic:
            return mu
        logvar = nn.Conv(in_channels, (1, 1), use_bias=True, dtype=self.dtype,
                         param_dtype=jnp.float32, name="logvar_net")(x)
        if sample:
            eps = jax.random.normal(self.make_rng("latent"), mu.shape,
                                    dtype=jnp.float32)
            z = mu + jnp.exp(0.5 * logvar.astype(jnp.float32)) * eps
            z = z.astype(self.dtype)
        else:
            z = mu
        return z, mu, logvar
