"""Shared Flax building blocks.

All modules use NHWC / channels-last layouts (the native TPU conv layout) and
take a ``dtype`` compute dtype (bfloat16 by default at call sites) with float32
parameters, so matmuls hit the MXU in bf16 while normalization statistics stay
in fp32.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Batched attention over (..., L, num_heads, head_dim) tensors.

    ``mask`` is boolean with True = *allowed*, broadcastable to
    (..., num_heads, Lq, Lk). Softmax is computed in fp32 for stability.
    """
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    # (..., num_heads, Lq, Lk)
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)
    return jnp.einsum("...hqk,...khd->...qhd", weights, v)


class MultiHeadAttention(nn.Module):
    """Multi-head attention matching torch.nn.MultiheadAttention semantics
    (separate q/k/v inputs, output projection, dropout on attention weights).

    Inputs are (..., L, C); the leading axes are batch. A torch packed
    ``in_proj_weight`` maps onto (wq, wk, wv) by a 3-way split (see
    tools/torch_converter.py). With ``quant=True`` the four projections run
    dynamically-quantized int8 matmuls on the MXU (npvp_tpu.nn.quant); the
    attention itself (tiny Lq×Lk logits) stays in the compute dtype.

    TPU note: this model's projection matmuls are HBM-bandwidth-bound
    (K = N = 512 — measured tools/dot_probe.py), so when the q and k inputs
    are the *same array* (all self-attentions here) the two projections are
    fused into one matmul over the concatenated kernels — the activations
    are read from HBM once instead of twice. Identical math, same parameter
    tree.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    quant: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, mask=None, deterministic=True):
        from npvp_tpu.nn.quant import QuantDense, int8_contract

        H, D = self.num_heads, self.embed_dim // self.num_heads
        dense = lambda name: QuantDense(
            features=(H, D), axis=-1, name=name, quant=self.quant,
            dtype=self.dtype)
        if q_in is k_in:
            # one fused (C → 2·C) projection; split back into q, k
            wq, bq = _dense_general_params(self, "wq", (self.embed_dim,),
                                           (H, D))
            wk, bk = _dense_general_params(self, "wk", (self.embed_dim,),
                                           (H, D))
            w = jnp.concatenate([wq.reshape(self.embed_dim, H * D),
                                 wk.reshape(self.embed_dim, H * D)], axis=-1)
            if self.quant:
                qk = int8_contract(q_in, w, out_dtype=self.dtype)
            else:
                qk = q_in.astype(self.dtype) @ w.astype(self.dtype)
            q = (qk[..., :H * D] + bq.reshape(-1).astype(self.dtype)
                 ).reshape(q_in.shape[:-1] + (H, D))
            k = (qk[..., H * D:] + bk.reshape(-1).astype(self.dtype)
                 ).reshape(q_in.shape[:-1] + (H, D))
        else:
            q = dense("wq")(q_in)
            k = dense("wk")(k_in)
        v = dense("wv")(v_in)
        rng = None
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        out = scaled_dot_product_attention(
            q, k, v, mask=mask, dropout_rate=self.dropout,
            dropout_rng=rng, deterministic=deterministic)
        return QuantDense(
            features=self.embed_dim, axis=(-2, -1), name="wo",
            quant=self.quant, dtype=self.dtype)(out)


def _dense_general_params(mod: nn.Module, name: str, in_dims, out_dims,
                          kernel_init=None):
    """Create {kernel, bias} under submodule ``name`` with shapes/init
    identical to nn.DenseGeneral (and to QuantDense) — or, with an explicit
    ``kernel_init``, to an nn.Dense using that init — so fused-projection
    call sites share the checkpoint layout of unfused ones."""
    from npvp_tpu.nn.quant import _dense_general_kernel_init

    if kernel_init is None:
        kernel_init = _dense_general_kernel_init(
            nn.initializers.lecun_normal(), tuple(in_dims), tuple(out_dims))

    class _P(nn.Module):
        @nn.compact
        def __call__(self):
            kernel = self.param("kernel", kernel_init,
                                tuple(in_dims) + tuple(out_dims),
                                jnp.float32)
            bias = self.param("bias", nn.initializers.zeros,
                              tuple(out_dims), jnp.float32)
            return kernel, bias

    return _P(name=name)()


def fp32_moments(x: jnp.ndarray, axes, keepdims: bool = True):
    """(mean, var) over ``axes`` accumulated in fp32 while reading ``x`` in
    its compute dtype (the convert fuses into the reduction — no fp32
    materialization of the tensor). Shared by every norm/affine-stat site
    (BatchNorm, TokenLayerNorm, LayerNormHWC, pos_feat_fuse,
    frame_affine_stats) so their numerics stay in lock-step — the
    affine/generic attention equivalence depends on it."""
    mean = jnp.mean(x, axis=axes, keepdims=keepdims, dtype=jnp.float32)
    mean_sq = jnp.mean(jax.lax.square(x.astype(jnp.float32)), axis=axes,
                       keepdims=keepdims)
    var = jnp.maximum(mean_sq - jax.lax.square(mean), 0.0)
    return mean, var


class BatchNorm(nn.Module):
    """BatchNorm with compute-dtype activation traffic, checkpoint-compatible
    with flax ``nn.BatchNorm`` (same param/variable names, shapes, inits, and
    running-average update rule).

    flax's BatchNorm with fp32 params promotes the whole activation tensor to
    fp32 — the optimized HLO of the flagship pipeline showed multi-hundred-MB
    f32 materializations + layout copies at every AE norm (tools/hlo_probe.py).
    Here statistics accumulate in fp32 (reading the tensor once in its compute
    dtype — the convert fuses into the reduction) and the normalization is
    applied as a per-channel affine ``x·a + b`` in the compute dtype, so the
    big tensor is never widened. Same math as flax within rounding.
    """

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # fp32 statistics over the compute-dtype tensor; under a sharded
            # batch axis jit emits the cross-replica reduction (sync-BN)
            mean, var = fp32_moments(x, tuple(range(x.ndim - 1)),
                                     keepdims=False)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        return x.astype(self.dtype) * a.astype(self.dtype) + b.astype(
            self.dtype)


# A/B instrumentation (tools/ab_train.py): trace-time switch selecting the
# flax-equivalent fp32-materializing norm math, to isolate the cost of the
# bf16-traffic formulations in fwd/bwd. Not a user-facing option.
LEGACY_NORMS = False


class TokenLayerNorm(nn.Module):
    """LayerNorm over the trailing (channel) axis with compute-dtype traffic,
    checkpoint-compatible with flax ``nn.LayerNorm`` (params scale/bias of
    shape (C,), default epsilon 1e-6).

    Same motivation as :class:`BatchNorm`: flax's LayerNorm promotes the
    activation to fp32 (an 84 MB copy per transformer-block norm at flagship
    shapes); here only the per-token statistics are fp32.
    """

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        mean, var = fp32_moments(x, -1)
        inv = jax.lax.rsqrt(var + self.epsilon)
        if LEGACY_NORMS:
            y = (x.astype(jnp.float32) - mean) * inv * scale + bias
            return y.astype(self.dtype)
        a = (inv * scale).astype(self.dtype)
        b = (bias - mean * inv * scale).astype(self.dtype)
        return x.astype(self.dtype) * a + b


class LayerNormHWC(nn.Module):
    """LayerNorm over the trailing (H, W, C) axes with (H, W, C)-shaped affine.

    Equivalent of the reference's ``nn.LayerNorm((C, H, W))`` inside MlpDWBN
    (reference models/VidHRFormer.py:348) transposed to channels-last.
    """

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (..., H, W, C). Statistics accumulate in fp32 but the (large)
        # activation tensor itself is only ever read in its compute dtype —
        # on TPU this halves the HBM traffic of the norm vs materializing an
        # fp32 copy.
        shape = x.shape[-3:]
        mean, var = fp32_moments(x, (-3, -2, -1))
        inv = jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, shape, jnp.float32)
        a = (inv * scale).astype(x.dtype)
        b = (bias - mean * inv * scale).astype(x.dtype)
        return x * a + b


class DropPath(nn.Module):
    """Stochastic depth per sample (timm-style; reference
    models/VidHRFormer.py:513-537). Identity when deterministic or rate 0."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        if self.rate == 0.0 or deterministic:
            return x
        keep_prob = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        keep = jax.random.bernoulli(rng, keep_prob, shape)
        return jnp.where(keep, x / keep_prob, jnp.zeros_like(x))


def reflect_pad_2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflection-pad the (H, W) axes of an (..., H, W, C) tensor
    (equivalent of nn.ReflectionPad2d; XLA lowers this to a pad+gather that
    fuses with the following conv)."""
    cfg = [(0, 0)] * (x.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)]
    return jnp.pad(x, cfg, mode="reflect")


class ConvBNAct(nn.Module):
    """Conv → BatchNorm → activation in NHWC.

    BatchNorm batch statistics are computed over the *global* batch under
    pjit/jit with a sharded batch axis — XLA inserts the cross-replica
    reduction, which natively provides the reference's sync_batchnorm
    behavior (reference train_AutoEncoder_lightning.py:41).
    """

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: str | tuple = "TORCH_SAME"
    use_bias: bool = False
    activation: Optional[Callable] = nn.relu
    feature_group_count: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        padding = self.padding
        if padding == "TORCH_SAME":
            # torch Conv2d(padding=k//2) semantics: symmetric padding
            # regardless of stride (XLA 'SAME' pads asymmetrically for
            # stride 2, which would shift features by one pixel)
            padding = tuple((k // 2, k // 2) for k in self.kernel_size)
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    padding=padding, use_bias=self.use_bias,
                    feature_group_count=self.feature_group_count,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                      epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        if self.activation is not None:
            x = self.activation(x)
        return x
