"""Fused Pallas TPU kernel for the MlpDWBN conv feed-forward.

The VidHRFormer FFN (1×1 conv → LayerNorm(H,W,C) → GELU → depthwise 3×3 →
LN → GELU → 1×1 conv → LN → GELU; reference models/VidHRFormer.py:326-392) is
the hottest path in the model: under plain XLA every stage materializes a
(B, 8, 8, hidden) activation in HBM (hidden = 4·embed_dim = 2048 ⇒ ~170 MB
per tensor at the benchmark batch).

This kernel runs the whole FFN for a block of F frames entirely in VMEM:
HBM traffic collapses to x-in + y-out + weights. The two 1×1 convs are MXU
matmuls of shape (F·64, C)·(C, Hd); the depthwise 3×3 is 9 shifted
multiply-adds on the VPU; norms/GELUs stay on-chip.

Mosaic notes: no 3D reductions (per-frame LN statistics use a 2D
row-sum → (F, HW) reshape → second 2D reduction), no native erf (polynomial
erf below), LN affine params arrive pre-tiled to (F·HW, dim).

Inference path (forward only). Training uses the XLA composition — see
npvp_tpu/nn/vidhrformer.py MlpDWBN.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz–Stegun 7.1.26 polynomial erf (|err| < 1.5e-7): Mosaic has
    no native erf/erfc lowering."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_erf(x):
    """Exact GELU via the polynomial erf (matches torch nn.GELU default to
    ~1e-7); used in fp32/interpret mode."""
    return x * 0.5 * (1.0 + _erf(x * 0.7071067811865476))


def _gelu_tanh(x):
    """tanh-approximated GELU for the bf16 serving path (approx error below
    bf16 rounding noise; markedly cheaper on the VPU than erf)."""
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _frame_ln(h, scale, bias, eps, F, HW):
    """h: (F·HW, dim) fp32. Per-frame LayerNorm over contiguous (HW, dim)
    chunks. Statistics per frame come from static 2D slices (full 2D reduce
    → scalar); the per-frame scalars are scattered back with an iota row
    mask — Mosaic supports neither 3D reductions nor narrow cross-lane
    reshapes, so everything stays 2D."""
    dim = h.shape[-1]
    n = HW * dim
    row_frame = jax.lax.broadcasted_iota(jnp.int32, (F * HW, 1), 0) // HW
    mean = jnp.zeros((F * HW, 1), jnp.float32)
    var = jnp.zeros((F * HW, 1), jnp.float32)
    for f in range(F):
        c = h[f * HW:(f + 1) * HW, :]
        m = jnp.sum(c) / n
        v = jnp.sum(jax.lax.square(c)) / n - jax.lax.square(m)
        mask = row_frame == f
        mean = jnp.where(mask, m, mean)
        var = jnp.where(mask, v, var)
    inv = jax.lax.rsqrt(var + eps)
    return (h - mean) * inv * scale + bias


def _kernel(x_ref, w1_ref, b1_ref, ln1s_ref, ln1b_ref, dw_ref, bdw_ref,
            ln2s_ref, ln2b_ref, w2_ref, b2_ref, ln3s_ref, ln3b_ref, out_ref,
            *, H, W, eps, mm_dtype):
    F, _, _, C = x_ref.shape
    Hd = w1_ref.shape[-1]
    HW = H * W
    Cout = w2_ref.shape[-1]
    _gelu = _gelu_erf if mm_dtype == jnp.float32 else _gelu_tanh

    x = x_ref[:].reshape(F * HW, C)
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:]
    h = _frame_ln(h, ln1s_ref[:], ln1b_ref[:], eps, F, HW)
    h = _gelu(h)

    # depthwise 3×3, zero padding, as 9 shifted multiply-adds on the VPU
    h4 = h.reshape(F, H, W, Hd).astype(mm_dtype)
    hp = jnp.pad(h4, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((F, H, W, Hd), jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc += (hp[:, di:di + H, dj:dj + W, :].astype(jnp.float32)
                    * dw_ref[di, dj, :])
    h = acc.reshape(F * HW, Hd) + bdw_ref[:]
    h = _frame_ln(h, ln2s_ref[:], ln2b_ref[:], eps, F, HW)
    h = _gelu(h).astype(mm_dtype)

    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[:]
    y = _frame_ln(y, ln3s_ref[:], ln3b_ref[:], eps, F, HW)
    y = _gelu(y)
    out_ref[:] = y.reshape(F, H, W, Cout).astype(out_ref.dtype)


def fused_mlp_dwbn(x, w1, b1, ln1_scale, ln1_bias, dw, dw_bias, ln2_scale,
                   ln2_bias, w2, b2, ln3_scale, ln3_bias,
                   frames_per_block: int = 2, eps: float = 1e-5,
                   interpret: bool = False):
    """x: (B, H, W, C) frames → (B, H, W, C_out).

    Weight layouts: w1 (C, Hd); dw (3, 3, Hd); w2 (Hd, C_out); LN affine
    params shaped (H, W, dim)."""
    B, H, W, C = x.shape
    Hd = w1.shape[1]
    Cout = w2.shape[1]
    F = frames_per_block
    while B % F:
        F //= 2
    grid = (B // F,)
    param_dtype = jnp.float32 if interpret else jnp.bfloat16

    def tiled(a, d):
        # pre-tile LN affine params to the (F·HW, dim) block layout so the
        # kernel applies them with a plain elementwise multiply
        a = jnp.asarray(a, jnp.float32).reshape(H * W, d)
        return jnp.tile(a, (F, 1))

    vec = lambda a: jnp.asarray(a, jnp.float32).reshape(1, -1)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    kernel = partial(_kernel, H=H, W=W, eps=eps, mm_dtype=param_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((F, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const((C, Hd)), const((1, Hd)),
            const((F * H * W, Hd)), const((F * H * W, Hd)),
            const((3, 3, Hd)), const((1, Hd)),
            const((F * H * W, Hd)), const((F * H * W, Hd)),
            const((Hd, Cout)), const((1, Cout)),
            const((F * H * W, Cout)), const((F * H * W, Cout)),
        ],
        out_specs=pl.BlockSpec((F, H, W, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        interpret=interpret,
    )(x,
      w1.astype(param_dtype), vec(b1),
      tiled(ln1_scale, Hd), tiled(ln1_bias, Hd),
      jnp.asarray(dw, jnp.float32), vec(dw_bias),
      tiled(ln2_scale, Hd), tiled(ln2_bias, Hd),
      w2.astype(param_dtype), vec(b2),
      tiled(ln3_scale, Cout), tiled(ln3_bias, Cout))
