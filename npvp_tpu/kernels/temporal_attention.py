"""Fused per-site temporal attention (Pallas/Mosaic TPU kernel).

Target (round-2 VERDICT item 3): the T×T time attentions of VidHRFormer —
temporal MHSA (reference models/VidHRFormer.py:94-107) and the
encoder-decoder cross-attention (:214-222) — where every (h, w) spatial site
attends over its own short time series. At flagship serving shapes the batch
is N·H·W = 4096 sites with T ∈ [10, 20], 8 heads × 64 dims: thousands of tiny
attentions.

Why a kernel *might* win here even though attention FLOPs are negligible:
XLA canonicalizes each attention einsum into batched dots whose layouts
(head-split, batch-major) differ from the surrounding (N, H, W, T, C)
activations — the profiler attributes ~38.6 ms/batch (~20% of device time)
to the resulting "data formatting" copies (DESIGN.md, device-time
attribution). This kernel consumes q/k/v directly in (B, T, H·D) layout —
sites on sublanes, channels on lanes, exactly how the projection matmuls
produce them — and keeps the head-split, logits, softmax and weighted sum in
VMEM, so the relayouts never touch HBM.

Kernel shape strategy: grid over blocks of S sites; inside a block the site
axis is the *batch* of a batched ``dot_general`` per head (8 unrolled
iterations). Softmax runs on a 2D (S·T, T) view because Mosaic forbids 3D
reductions; logits/softmax are fp32, the weighted sum runs in the compute
dtype (bit-identical softmax statistics to nn/layers.py
``scaled_dot_product_attention``).

Serving-path only: not differentiable (no VJP), no dropout — call sites gate
on ``deterministic`` exactly like the affine-fusion paths.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

# default sites per grid block: 64 fills VMEM without overflowing the 16 MB
# scoped limit at flagship shapes (T=20, HD=512, double-buffered in/out).
# Call sites gate on divisibility by this; tests shrink it to cover tiny
# shapes.
BLOCK_SITES = 64


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, num_heads: int):
    S, Tq, HD = q_ref.shape
    Tk = k_ref.shape[1]
    hd = HD // num_heads
    scale = 1.0 / math.sqrt(hd)
    bias = bias_ref[:]  # (Tq, Tk) fp32 additive mask (0 / -inf)
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh, kh, vh = q_ref[:, :, sl], k_ref[:, :, sl], v_ref[:, :, sl]
        # (S, Tq, Tk) ← site-batched q·kᵀ on the MXU
        logits = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        logits = logits * scale + bias[None]
        # softmax over Tk on a 2D view (Mosaic: no 3D reductions)
        flat = logits.reshape(S * Tq, Tk)
        flat = flat - jnp.max(flat, axis=-1, keepdims=True)
        e = jnp.exp(flat)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        w = w.reshape(S, Tq, Tk).astype(vh.dtype)
        # (S, Tq, hd) ← site-batched weighted sum (MXU needs a 32-bit acc)
        o_ref[:, :, sl] = jax.lax.dot_general(
            w, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_sites", "interpret"))
def temporal_attention(q, k, v, bias=None, *, num_heads: int,
                       block_sites: int | None = None,
                       interpret: bool | None = None) -> jnp.ndarray:
    """Per-site attention: q (B, Tq, H·D), k/v (B, Tk, H·D) → (B, Tq, H·D).

    ``bias``: optional (Tq, Tk) fp32 additive logits mask, shared by all
    sites (use :func:`allow_to_bias` for boolean allow matrices). ``B`` must
    be divisible by ``block_sites`` (serving batches are powers of two; pick
    a compatible block, e.g. 64/128). ``interpret=None`` auto-selects the
    Pallas interpreter off-TPU (CPU tests), the compiled Mosaic kernel on
    TPU.
    """
    if block_sites is None:
        block_sites = BLOCK_SITES
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Tq, HD = q.shape
    Tk = k.shape[1]
    assert v.shape == k.shape and q.shape[2] == k.shape[2], (q.shape, k.shape)
    assert HD % num_heads == 0
    S = min(block_sites, B)
    assert B % S == 0, (
        f"site count {B} not divisible by block_sites {S}")
    if bias is None:
        bias = jnp.zeros((Tq, Tk), jnp.float32)
    bias = bias.astype(jnp.float32)

    grid = (B // S,)
    blk = lambda T: pl.BlockSpec((S, T, HD), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads),
        grid=grid,
        in_specs=[blk(Tq), blk(Tk), blk(Tk),
                  pl.BlockSpec((Tq, Tk), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=blk(Tq),
        out_shape=jax.ShapeDtypeStruct((B, Tq, HD), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Tq * Tk * HD,
            bytes_accessed=(2 * B * Tq * HD + 2 * B * Tk * HD)
            * q.dtype.itemsize,
            transcendentals=B * Tq * Tk),
        interpret=interpret,
    )(q, k, v, bias)


def allow_to_bias(allow) -> jnp.ndarray:
    """Boolean (Tq, Tk) allow matrix (True = attend) → fp32 additive bias."""
    return jnp.where(allow, 0.0, NEG_INF).astype(jnp.float32)
