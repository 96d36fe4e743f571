"""Sine/cosine positional embeddings (1D/2D/3D).

Parity port of the reference's legacy DETR-style embeddings (reference
utils/position_encoding.py:13-161) — exported but unused by the NPVP path,
whose NRMLP Fourier features replaced them (survey §2.4 O7). Provided for
API completeness and for ablations against the NRMLP conditioning.
"""

from __future__ import annotations

import jax.numpy as jnp


def _freq_terms(num_pos_feats: int, temperature: float) -> jnp.ndarray:
    i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    return temperature ** (2.0 * jnp.floor(i / 2.0) / num_pos_feats)


def _interleave_sin_cos(pos: jnp.ndarray) -> jnp.ndarray:
    """pos: (..., num_pos_feats) scaled positions → interleaved sin/cos."""
    sin = jnp.sin(pos[..., 0::2])
    cos = jnp.cos(pos[..., 1::2])
    return jnp.stack([sin, cos], axis=-1).reshape(*pos.shape[:-1], -1)


def sine_position_encoding_1d(length: int, num_pos_feats: int = 64,
                              temperature: float = 10000.0,
                              normalize: bool = False,
                              scale: float = 2.0 * jnp.pi) -> jnp.ndarray:
    """(length, num_pos_feats) sine embedding over a 1D index range."""
    pos = jnp.arange(1, length + 1, dtype=jnp.float32)
    if normalize:
        pos = pos / (length + 1e-6) * scale
    dim_t = _freq_terms(num_pos_feats, temperature)
    return _interleave_sin_cos(pos[:, None] / dim_t[None, :])


def sine_position_encoding_2d(h: int, w: int, num_pos_feats: int = 64,
                              temperature: float = 10000.0,
                              normalize: bool = True,
                              scale: float = 2.0 * jnp.pi) -> jnp.ndarray:
    """(h, w, 2*num_pos_feats) embedding: concat of y- and x-axis codes."""
    ys = jnp.arange(1, h + 1, dtype=jnp.float32)
    xs = jnp.arange(1, w + 1, dtype=jnp.float32)
    if normalize:
        ys = ys / (h + 1e-6) * scale
        xs = xs / (w + 1e-6) * scale
    dim_t = _freq_terms(num_pos_feats, temperature)
    pe_y = _interleave_sin_cos(ys[:, None] / dim_t[None, :])  # (h, F)
    pe_x = _interleave_sin_cos(xs[:, None] / dim_t[None, :])  # (w, F)
    pe_y = jnp.broadcast_to(pe_y[:, None, :], (h, w, pe_y.shape[-1]))
    pe_x = jnp.broadcast_to(pe_x[None, :, :], (h, w, pe_x.shape[-1]))
    return jnp.concatenate([pe_y, pe_x], axis=-1)


def sine_position_encoding_3d(t: int, h: int, w: int,
                              num_pos_feats: int = 64,
                              temperature: float = 10000.0,
                              normalize: bool = True,
                              scale: float = 2.0 * jnp.pi) -> jnp.ndarray:
    """(t, h, w, 2*num_pos_feats + num_pos_feats) spatio-temporal embedding:
    2D spatial code concatenated with a temporal code."""
    spatial = sine_position_encoding_2d(h, w, num_pos_feats, temperature,
                                        normalize, scale)
    temporal = sine_position_encoding_1d(t, num_pos_feats, temperature,
                                         normalize, scale)
    spatial = jnp.broadcast_to(spatial[None], (t, h, w, spatial.shape[-1]))
    temporal = jnp.broadcast_to(temporal[:, None, None, :],
                                (t, h, w, temporal.shape[-1]))
    return jnp.concatenate([spatial, temporal], axis=-1)
