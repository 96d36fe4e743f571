"""Dynamic int8 quantization for the serving path.

The reference serves in fp16/fp32 on CUDA; on TPU the MXU executes int8×int8
matmuls at up to ~2× the bf16 rate when compute-bound. At THIS model's
matmul widths the dots are bandwidth/latency-bound (int8 measured ≈1× bf16,
and the dynamic-quant pipeline measured slower end-to-end — DESIGN.md
"Performance status (round 2)"), so the int8 path is an option for
compute-bound deployments, not the default. This module provides the int8
building blocks used when a model is built with ``exec_mode="int8"``:

- activations are quantized **dynamically per token** (abs-max over the
  contracted features, one fp32 scale per row);
- weights are quantized **per output channel** (abs-max over the fan-in);
- the matmul runs int8×int8 → int32 on the MXU and is rescaled by the outer
  product of the two scale vectors.

Weights stay fp32 in the checkpoint (one parameter set for every execution
mode); quantizing them on the fly inside the jitted program costs O(params)
bandwidth — negligible next to the activation matmuls. There is no
quantization-aware training: this is post-training dynamic quantization of
the *serving* path only (training always runs the "xla" bf16/fp32 path).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_EPS = 1e-8

# Static-calibration experiment (round-3 VERDICT item 6): when set, every
# int8 activation quantization uses this FIXED scale instead of computing
# per-token abs-max at runtime — deleting the reduction pass and the
# per-row rescale vector that round 2 measured as the dynamic pipeline's
# end-to-end loss (221.6 vs 179.5 ms bf16). A single scalar reproduces the
# compute/traffic structure of a per-site-calibrated program exactly (the
# scale is a program constant either way), which is what the perf A/B
# needs; per-site values only matter for fidelity. Trace-time: set before
# building the program (tools/ab_int8_static.py).
STATIC_ACT_SCALE = None


def quantize_rowwise(x: jnp.ndarray, n_contract: int = 1
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize ``x`` to int8 with one scale per row.

    The trailing ``n_contract`` axes are the contracted (feature) axes; the
    abs-max over them defines the scale. Returns ``(q, scale)`` where
    ``q = round(x / scale)`` in [-127, 127] and ``scale`` has the row shape
    (keepdims, fp32).

    With :data:`STATIC_ACT_SCALE` set, the scale is that constant instead
    (shape ``(1,)*ndim`` — broadcast-compatible with the dynamic row shape).
    """
    if STATIC_ACT_SCALE is not None:
        scale = jnp.full((1,) * x.ndim, float(STATIC_ACT_SCALE), jnp.float32)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
        return q.astype(jnp.int8), scale
    axes = tuple(range(x.ndim - n_contract, x.ndim))
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_colwise(w: jnp.ndarray, n_contract: int = 1
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize a weight to int8 with one scale per output channel.

    The *leading* ``n_contract`` axes are the contracted (fan-in) axes; the
    remaining trailing axes are output features, each with its own scale.
    Returns ``(q, scale)`` with ``scale`` shaped like the output features
    (keepdims over fan-in, fp32).
    """
    axes = tuple(range(n_contract))
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_contract(x: jnp.ndarray, w: jnp.ndarray, n_contract: int = 1,
                  out_dtype: jnp.dtype = jnp.bfloat16) -> jnp.ndarray:
    """``x · w`` with both operands dynamically quantized to int8.

    Contracts the trailing ``n_contract`` axes of ``x`` with the leading
    ``n_contract`` axes of ``w`` (dot_general, int32 accumulation on the
    MXU), then rescales by the per-row activation scale × per-output-channel
    weight scale.
    """
    qx, sx = quantize_rowwise(x, n_contract)
    qw, sw = quantize_colwise(w, n_contract)
    x_axes = tuple(range(x.ndim - n_contract, x.ndim))
    w_axes = tuple(range(n_contract))
    acc = jax.lax.dot_general(
        qx, qw, dimension_numbers=((x_axes, w_axes), ((), ())),
        preferred_element_type=jnp.int32)
    # sx: row shape + (1,)*n_contract; sw: (1,)*n_contract + out shape
    sx = sx.reshape(sx.shape[:x.ndim - n_contract] + (1,) * (w.ndim - n_contract))
    sw = sw.reshape(w.shape[n_contract:])
    return (acc.astype(jnp.float32) * sx * sw).astype(out_dtype)


def _dense_general_kernel_init(base_init, in_dims: Tuple[int, ...],
                               out_dims: Tuple[int, ...]):
    """flax nn.DenseGeneral initializes its kernel on the 2D
    (prod(in), prod(out)) shape and reshapes — replicate that so QuantDense
    draws bit-identical initial weights to the DenseGeneral it replaces."""
    def init(rng, shape, dtype):
        del shape
        flat = (int(np.prod(in_dims)), int(np.prod(out_dims)))
        return base_init(rng, flat, dtype).reshape(in_dims + out_dims)
    return init


class QuantDense(nn.Module):
    """Drop-in replacement for ``nn.Dense`` / ``nn.DenseGeneral`` with an
    optional dynamic-int8 matmul path.

    Parameter names/shapes/initialization match nn.DenseGeneral exactly
    ({kernel, bias}; kernel = in_dims + out_dims), so checkpoints and the
    torch converter are untouched and the same parameter set serves every
    execution mode.
    """

    features: Union[int, Sequence[int]]
    axis: Union[int, Sequence[int]] = -1
    quant: bool = False
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = (tuple(self.features) if isinstance(self.features, (tuple, list))
                 else (self.features,))
        axis = (tuple(self.axis) if isinstance(self.axis, (tuple, list))
                else (self.axis,))
        axis = tuple(a % x.ndim for a in axis)
        n_in = len(axis)
        # contracted axes must be the trailing ones (all call sites comply)
        assert axis == tuple(range(x.ndim - n_in, x.ndim)), axis
        in_dims = tuple(x.shape[a] for a in axis)
        kernel = self.param(
            "kernel",
            _dense_general_kernel_init(nn.initializers.lecun_normal(),
                                       in_dims, feats),
            in_dims + feats, jnp.float32)
        if self.quant:
            y = int8_contract(x, kernel, n_contract=n_in,
                              out_dtype=self.dtype)
        else:
            y = jax.lax.dot_general(
                x.astype(self.dtype), kernel.astype(self.dtype),
                dimension_numbers=((axis, tuple(range(n_in))), ((), ())))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, feats,
                              jnp.float32)
            y = y + bias.astype(self.dtype)
        return y
