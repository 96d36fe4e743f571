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

Variant record (measured on the real v5e, tools/kbench.py):
- site blocks >64 (s128/s256): fail to compile — q/k/v/out double-buffered
  blocks exceed the 16 MB scoped-VMEM limit at flagship shapes.
- head axis on the grid (hd-wide blocks): rejected by Mosaic — the last
  block dimension must be divisible by 128 lanes, and hd = 64. Head-split
  can only live *inside* a kernel whose blocks carry the full H·D axis.
- fused output projection: per-call the kernel is ~13% slower than the
  attention-only kernel (3.70 vs 3.27 ms median, interleaved), but it
  deletes the separate (B·T, H·D)@(H·D, C) projection dot and the context
  round-trip — end-to-end device time 149.0 vs 152.7 ms (per-module trace
  join), so FUSE_OPROJ stays on.
- projecting from a VMEM context scratch with one full-K dot instead of
  8 accumulated K=hd dots: a wash (3.61 vs 3.55 ms median) — the kernel is
  not bound by the projection dots; variant deleted.
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

# When True the attention call sites pass the output-projection weights into
# the kernel (fused: the (B, T, H·D) context never round-trips through HBM).
# Read at trace time — tools/ab_oproj.py flips it between jit builds to
# measure fused vs. unfused in one process.
FUSE_OPROJ = True

# Site packing: merge G sites along the token axes — (B, T, HD) becomes
# (B/G, G·T, HD), a free leading-dim reshape — with a block-diagonal logits
# bias so cross-site weights are EXACTLY zero after softmax (the off-block
# bias is finfo.min; exp underflows to 0 in fp32, so the packed PV dot adds
# exactly nothing across sites). Why: the per-site dots are tiny
# (T ∈ [10, 20] « the 128-lane MXU tile) and the kernel is latency-bound on
# op count (floor dossier: 19% of SoL); packing G sites makes every MXU dot
# G× fatter and issues G× fewer of them, while the softmax runs on the same
# number of rows it always lane-padded to 128 anyway. PACK_LANES caps
# G·max(Tq, Tk) at one lane tile; G is the largest power of two that fits
# (powers of two because serving site counts are powers of two).
PACK_LANES = 128


def _pack_factor(B, Tq, Tk, block_sites: int) -> int:
    g = 1
    while (g * 2 * max(Tq, Tk) <= PACK_LANES and B % (g * 2) == 0
           and block_sites % (g * 2) == 0):
        g *= 2
    return g


def _packed_bias(bias, pack: int, Tq: int, Tk: int) -> jnp.ndarray:
    """Block-diagonal (pack·Tq, pack·Tk) bias: the per-site bias on the
    diagonal blocks, finfo.min (→ exactly-zero softmax weight) elsewhere."""
    if bias is None:
        bias = jnp.zeros((Tq, Tk), jnp.float32)
    onblock = (jnp.arange(pack * Tq)[:, None] // Tq
               == jnp.arange(pack * Tk)[None, :] // Tk)
    return jnp.where(onblock, jnp.tile(bias.astype(jnp.float32),
                                       (pack, pack)), NEG_INF)


def _attend_head(q_ref, k_ref, v_ref, bias, h, hd):
    """One head's site-batched attention: (S, Tq, hd) context vectors."""
    S, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    scale = 1.0 / math.sqrt(hd)
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
    return jax.lax.dot_general(
        w, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, num_heads: int):
    HD = q_ref.shape[2]
    hd = HD // num_heads
    bias = bias_ref[:]  # (Tq, Tk) fp32 additive mask (0 / -inf)
    for h in range(num_heads):
        o_ref[:, :, h * hd:(h + 1) * hd] = _attend_head(
            q_ref, k_ref, v_ref, bias, h, hd).astype(o_ref.dtype)


def _kernel_oproj(q_ref, k_ref, v_ref, bias_ref, wo_ref, bo_ref, o_ref, *,
                  num_heads: int):
    """Attention with the output projection fused: the (S, Tq, HD) context
    tensor never round-trips through HBM — each head's context is projected
    by its (hd, C) kernel slice and accumulated in fp32."""
    S, Tq, HD = q_ref.shape
    hd = HD // num_heads
    C = wo_ref.shape[1]
    bias = bias_ref[:]
    acc = jnp.zeros((S * Tq, C), jnp.float32) + bo_ref[:].astype(jnp.float32)
    for h in range(num_heads):
        ctx = _attend_head(q_ref, k_ref, v_ref, bias, h, hd)
        acc = acc + jnp.dot(ctx.reshape(S * Tq, hd).astype(q_ref.dtype),
                            wo_ref[h * hd:(h + 1) * hd, :],
                            preferred_element_type=jnp.float32)
    o_ref[:, :, :] = acc.reshape(S, Tq, C).astype(o_ref.dtype)


def temporal_attention(q, k, v, bias=None, *, num_heads: int,
                       wo=None, bo=None,
                       block_sites: int | None = None,
                       pack_sites: int | None = None,
                       interpret: bool | None = None) -> jnp.ndarray:
    """Per-site attention: q (B, Tq, H·D), k/v (B, Tk, H·D) → (B, Tq, H·D).

    ``bias``: optional (Tq, Tk) fp32 additive logits mask, shared by all
    sites (use :func:`allow_to_bias` for boolean allow matrices). ``B`` must
    be divisible by ``block_sites`` (serving batches are powers of two; pick
    a compatible block, e.g. 64/128). With ``wo`` ((H·D, C) flattened output
    kernel, optional ``bo`` (C,)) the output projection is fused into the
    kernel — the per-site context tensor never round-trips through HBM and
    the result is (B, Tq, C). ``pack_sites`` merges that many sites per MXU
    dot via an exactly-zero block-diagonal softmax (see ``PACK_LANES``);
    ``None`` auto-picks, ``1`` disables. ``interpret=None`` auto-selects the
    Pallas interpreter off-TPU (CPU tests), the compiled Mosaic kernel on
    TPU.
    """
    # defaults resolve OUTSIDE the jit so the actual values land in the
    # static cache key (a mutated BLOCK_SITES module global must never hit
    # a program cached under block_sites=None)
    if block_sites is None:
        block_sites = BLOCK_SITES
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pack_sites is None:
        S = min(block_sites, q.shape[0])
        pack_sites = _pack_factor(q.shape[0], q.shape[1], k.shape[1], S)
    return _temporal_attention(q, k, v, bias, num_heads=num_heads, wo=wo,
                               bo=bo, block_sites=block_sites,
                               pack_sites=pack_sites, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "block_sites", "pack_sites",
                                    "interpret"))
def _temporal_attention(q, k, v, bias=None, *, num_heads: int,
                        wo=None, bo=None, block_sites: int = BLOCK_SITES,
                        pack_sites: int = 1,
                        interpret: bool = False) -> jnp.ndarray:
    B0, Tq0, HD = q.shape
    Tk0 = k.shape[1]
    assert v.shape == k.shape and q.shape[2] == k.shape[2], (q.shape, k.shape)
    assert HD % num_heads == 0
    G = max(1, pack_sites)
    if G > 1:
        assert B0 % G == 0 and min(block_sites, B0) % G == 0, (B0, G)
        # free reshape: leading-dim merge, last dim untouched
        q = q.reshape(B0 // G, G * Tq0, HD)
        k = k.reshape(B0 // G, G * Tk0, HD)
        v = v.reshape(B0 // G, G * Tk0, HD)
        bias = _packed_bias(bias, G, Tq0, Tk0)
        block_sites = min(block_sites, B0) // G
    B, Tq, _ = q.shape
    Tk = k.shape[1]
    S = min(block_sites, B)
    assert B % S == 0, (
        f"site count {B} not divisible by block_sites {S}")
    if bias is None:
        bias = jnp.zeros((Tq, Tk), jnp.float32)
    bias = bias.astype(jnp.float32)

    flops = 4 * B * Tq * Tk * HD
    traffic = (2 * B * Tq * HD + 2 * B * Tk * HD) * q.dtype.itemsize
    grid = (B // S,)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    blk = lambda T, F: pl.BlockSpec((S, T, F), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
    try:
        params = pltpu.CompilerParams(dimension_semantics=("parallel",))
    except TypeError:
        params = pltpu.CompilerParams()
    common = dict(grid=grid, interpret=interpret, compiler_params=params)
    if wo is None:
        out = pl.pallas_call(
            functools.partial(_kernel, num_heads=num_heads),
            in_specs=[blk(Tq, HD), blk(Tk, HD), blk(Tk, HD),
                      whole((Tq, Tk))],
            out_specs=blk(Tq, HD),
            out_shape=jax.ShapeDtypeStruct((B, Tq, HD), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=traffic,
                transcendentals=B * Tq * Tk * num_heads),
            **common,
        )(q, k, v, bias)
        return out.reshape(B0, Tq0, HD)

    C = wo.shape[-1]
    assert wo.shape == (HD, C), wo.shape
    bo2 = (bo if bo is not None else jnp.zeros((C,))).reshape(1, C)
    out = pl.pallas_call(
        functools.partial(_kernel_oproj, num_heads=num_heads),
        in_specs=[blk(Tq, HD), blk(Tk, HD), blk(Tk, HD), whole((Tq, Tk)),
                  whole((HD, C)), whole((1, C))],
        out_specs=blk(Tq, C),
        out_shape=jax.ShapeDtypeStruct((B, Tq, C), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops + 2 * B * Tq * HD * C,
            bytes_accessed=traffic,
            transcendentals=B * Tq * Tk * num_heads),
        **common,
    )(q, k, v, bias, wo.astype(q.dtype), bo2.astype(jnp.float32))
    return out.reshape(B0, Tq0, C)


def allow_to_bias(allow) -> jnp.ndarray:
    """Boolean (Tq, Tk) allow matrix (True = attend) → fp32 additive bias."""
    return jnp.where(allow, 0.0, NEG_INF).astype(jnp.float32)
