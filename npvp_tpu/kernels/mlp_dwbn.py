"""Fused Pallas TPU kernel for the MlpDWBN conv feed-forward.

The VidHRFormer FFN (1×1 conv → LayerNorm(H,W,C) → GELU → depthwise 3×3 →
LN → GELU → 1×1 conv → LN → GELU; reference models/VidHRFormer.py:326-392) is
the single hottest region of the model (~40% of predictor device time):
under plain XLA every stage materializes a (B, 8, 8, hidden) activation in
HBM (hidden = 4·embed_dim = 2048 ⇒ ~170 MB per tensor at the benchmark
batch), and the LN statistics force extra full-tensor passes.

This kernel runs the whole FFN for a block of F frames entirely in VMEM:
HBM traffic collapses to x-in + y-out + weights. The two 1×1 convs are MXU
matmuls of shape (F·64, C)·(C, Hd); the depthwise 3×3 is 9 shifted
multiply-adds; norms/GELUs stay on-chip.

Round-2 redesign (the round-1 version lost to XLA end-to-end, 205 vs
179 ms):
- F=8 frames per grid step (M=512 matmul rows; round 1 used F=2 → M=128,
  starving the MXU);
- bfloat16 intermediates with fp32 statistics/accumulators only where
  required (round 1 kept everything fp32, doubling VMEM and VPU traffic);
- LN affines stay compact (HW, dim) and are applied per frame through
  statically-unrolled slices (round 1 pre-tiled them to (F·HW, dim) fp32 —
  4 MB of VMEM per tensor, forcing the tiny F).

MEASURED RESULT (tools/ab_ffn.py, v5e, flagship shapes B=640 8×8×512
hidden 2048, 40 interleaved A/B pairs): numerically exact vs the XLA
composition (bf16 max diff 0.0) but median xla/pallas = 0.87 — the kernel
LOSES by ~13%. XLA's fusion of this region with full-batch M=40960 matmuls
is the practical floor at these shapes.

Mosaic notes: no 3D reductions (per-frame LN statistics use full-2D-slice
reductions), no native erf (polynomial below), iota ≥ 2D.

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


def _ln_gelu_per_frame(h, scale_ref, bias_ref, eps, F, HW, gelu, out_dtype):
    """h: (F·HW, dim) fp32 → per-frame LayerNorm over contiguous (HW, dim)
    chunks followed by GELU, emitted per frame from static slices (Mosaic
    has no 3D reductions; F is small and unrolls). Affine params are the
    compact (HW, dim) layout shared by all frames."""
    dim = h.shape[-1]
    n = HW * dim
    scale = scale_ref[:]
    bias = bias_ref[:]
    chunks = []
    for f in range(F):
        c = h[f * HW:(f + 1) * HW, :]
        m = jnp.sum(c) / n
        v = jnp.sum(jax.lax.square(c)) / n - jax.lax.square(m)
        inv = jax.lax.rsqrt(v + eps)
        chunks.append(gelu((c - m) * inv * scale + bias).astype(out_dtype))
    return jnp.concatenate(chunks, axis=0)


def _kernel(x_ref, w1_ref, b1_ref, ln1s_ref, ln1b_ref, dw_ref, bdw_ref,
            ln2s_ref, ln2b_ref, w2_ref, b2_ref, ln3s_ref, ln3b_ref, out_ref,
            *, H, W, eps, mm_dtype):
    F, _, _, C = x_ref.shape
    Hd = w1_ref.shape[-1]
    HW = H * W
    Cout = w2_ref.shape[-1]
    gelu = _gelu_erf if mm_dtype == jnp.float32 else _gelu_tanh

    x = x_ref[:].reshape(F * HW, C)
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:]
    h = _ln_gelu_per_frame(h, ln1s_ref, ln1b_ref, eps, F, HW, gelu, mm_dtype)

    # depthwise 3×3, zero padding, as 9 shifted multiply-adds
    h4 = h.reshape(F, H, W, Hd)
    hp = jnp.pad(h4, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((F, H, W, Hd), jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc += (hp[:, di:di + H, dj:dj + W, :].astype(jnp.float32)
                    * dw_ref[di, dj, :])
    h = acc.reshape(F * HW, Hd) + bdw_ref[:]
    h = _ln_gelu_per_frame(h, ln2s_ref, ln2b_ref, eps, F, HW, gelu, mm_dtype)

    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[:]
    y = _ln_gelu_per_frame(y, ln3s_ref, ln3b_ref, eps, F, HW, gelu,
                           out_ref.dtype)
    out_ref[:] = y.reshape(F, H, W, Cout)


def fused_mlp_dwbn(x, w1, b1, ln1_scale, ln1_bias, dw, dw_bias, ln2_scale,
                   ln2_bias, w2, b2, ln3_scale, ln3_bias,
                   frames_per_block: int = 8, eps: float = 1e-5,
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

    aff = lambda a, d: jnp.asarray(a, jnp.float32).reshape(H * W, d)
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
            const((H * W, Hd)), const((H * W, Hd)),
            const((3, 3, Hd)), const((1, Hd)),
            const((H * W, Hd)), const((H * W, Hd)),
            const((Hd, Cout)), const((1, Cout)),
            const((H * W, Cout)), const((H * W, Cout)),
        ],
        out_specs=pl.BlockSpec((F, H, W, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        interpret=interpret,
    )(x,
      w1.astype(param_dtype), vec(b1),
      aff(ln1_scale, Hd), aff(ln1_bias, Hd),
      jnp.asarray(dw, jnp.float32), vec(dw_bias),
      aff(ln2_scale, Hd), aff(ln2_bias, Hd),
      w2.astype(param_dtype), vec(b2),
      aff(ln3_scale, Cout), aff(ln3_bias, Cout))
