"""VidHRFormer spatio-temporal transformer (encoder + non-autoregressive
decoder).

TPU-first rebuild of the reference's VidHRFormer stack (reference
models/VidHRFormer.py):

- local-window spatial MHSA (HRFormer-style) via reshape-based window
  partition (a mask-based window variant and two Pallas kernels were built,
  measured slower, and removed — DESIGN.md / npvp_tpu/kernels);
- temporal MHSA over the T axis with the batch folded into (N, H, W) — this
  is the axis sharded across the mesh for scale-out;
- conv FFN (1×1 → depthwise 3×3 → 1×1 with per-position LayerNorm, "MlpDWBN");
- boolean *allow* masks (True = attend) thread through every attention so a
  single compiled program serves fixed-split (VFP/VFI) and unified
  rand-context training with static shapes (the reference instead mutates
  tensor shapes per batch — models/Predictor.py:241-251 — which would
  recompile under XLA).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from npvp_tpu.nn.layers import (DropPath, LayerNormHWC, MultiHeadAttention,
                                TokenLayerNorm,
                                scaled_dot_product_attention)
from npvp_tpu.nn.neural_process import pos_feat_fuse
from npvp_tpu.nn.quant import QuantDense


# ---------------------------------------------------------------------------
# window partition helpers (reference models/VidHRFormer.py:437-511)
# ---------------------------------------------------------------------------

def _center_pad_amounts(size: int, window: int) -> Tuple[int, int]:
    pad = (-size) % window
    return pad // 2, pad - pad // 2


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) → (B·nH·nW, window², C) with center padding when H or W is
    not a multiple of ``window`` (reference PadBlock center-pad semantics)."""
    B, H, W, C = x.shape
    ph_lo, ph_hi = _center_pad_amounts(H, window)
    pw_lo, pw_hi = _center_pad_amounts(W, window)
    if ph_lo or ph_hi or pw_lo or pw_hi:
        x = jnp.pad(x, ((0, 0), (ph_lo, ph_hi), (pw_lo, pw_hi), (0, 0)))
    Hp, Wp = H + ph_lo + ph_hi, W + pw_lo + pw_hi
    x = x.reshape(B, Hp // window, window, Wp // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * (Hp // window) * (Wp // window), window * window, C)


def window_reverse(x: jnp.ndarray, window: int, B: int, H: int, W: int
                   ) -> jnp.ndarray:
    """Inverse of :func:`window_partition`, removing the center padding."""
    ph_lo, ph_hi = _center_pad_amounts(H, window)
    pw_lo, pw_hi = _center_pad_amounts(W, window)
    Hp, Wp = H + ph_lo + ph_hi, W + pw_lo + pw_hi
    C = x.shape[-1]
    x = x.reshape(B, Hp // window, Wp // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, ph_lo:ph_lo + H, pw_lo:pw_lo + W, :]


class _MHAParams(nn.Module):
    """wq/wk/wv/wo parameter holder bit-compatible with MultiHeadAttention
    (same child names, shapes, and DenseGeneral init), used by the
    affine-fused attention paths that need raw kernels."""

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self):
        from npvp_tpu.nn.layers import _dense_general_params

        H, D = self.num_heads, self.embed_dim // self.num_heads
        wq, bq = _dense_general_params(self, "wq", (self.embed_dim,), (H, D))
        wk, bk = _dense_general_params(self, "wk", (self.embed_dim,), (H, D))
        wv, bv = _dense_general_params(self, "wv", (self.embed_dim,), (H, D))
        wo, bo = _dense_general_params(self, "wo", (H, D), (self.embed_dim,))
        return (wq, bq), (wk, bk), (wv, bv), (wo, bo)


def frame_affine_stats(x: jnp.ndarray, eps: float = 1e-5):
    """pos_feat_fuse('layer', 'Add') as an affine map: returns fp32 (a, b)
    with ``pos_feat_fuse(x, beta, 0) == a·x + b + beta`` (a, b per (n, t)
    frame, keepdims). Lets attention fold the fusion *through* the q/k
    projections: ``posfuse(x)@W = a·(x@W) + b·(1ᵀW) + β@W`` — so q, k, v all
    project from the raw input in one wide MXU matmul (512→1536 matmuls run
    ~2.5× the TF/s of 512→512 on v5e) and the fused tensor never
    materializes in HBM. Exact algebra, same parameters."""
    from npvp_tpu.nn.layers import fp32_moments

    mean, var = fp32_moments(x, (2, 3, 4))
    inv = jax.lax.rsqrt(var + eps)
    return inv, -mean * inv


def _matmul(x, w, dtype, quant):
    if quant:
        from npvp_tpu.nn.quant import int8_contract

        return int8_contract(x, w, out_dtype=dtype)
    return x.astype(dtype) @ w.astype(dtype)


def _qkv_weights(params):
    """Flatten and concatenate the q/k/v kernels → (C, 3·HD) plus the
    per-projection bias/column-sum terms used by the affine fusion."""
    (wq, bq), (wk, bk), (wv, bv), _ = params
    C = wq.shape[0]
    HD = wq.shape[1] * wq.shape[2]
    flat = lambda w: w.reshape(C, HD)
    w3 = jnp.concatenate([flat(wq), flat(wk), flat(wv)], axis=-1)
    ones = (jnp.sum(flat(wq), 0), jnp.sum(flat(wk), 0))  # 1ᵀWq, 1ᵀWk
    return w3, (flat(wq), flat(wk)), ones, (bq.reshape(HD), bk.reshape(HD),
                                            bv.reshape(HD)), HD


def _out_proj(out, params, dtype, quant=False):
    (_, _, _, (wo, bo)) = params
    if quant:
        from npvp_tpu.nn.quant import int8_contract

        y = int8_contract(out, wo, n_contract=2, out_dtype=dtype)
    else:
        y = jax.lax.dot_general(
            out.astype(dtype), wo.astype(dtype),
            dimension_numbers=(((out.ndim - 2, out.ndim - 1), (0, 1)),
                               ((), ())))
    return y + bo.astype(dtype)


class SpatialWindowAttention(nn.Module):
    """Local-window spatial MHSA (reference models/VidHRFormer.py:247-307).

    q/k come from the positionally-fused input; v from the raw normalized
    features (matching the reference's separate ``value=`` path).

    Two equivalent execution paths: the generic one takes the pre-fused
    tensor; the affine path (``pos_beta`` given; 'layer'+'Add' fusion only)
    folds the fusion through the projections — see frame_affine_stats."""

    embed_dim: int
    num_heads: int
    window_size: int = 4
    dropout: float = 0.0
    exec_mode: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, value, deterministic=True, pos_beta=None,
                 evt=None):
        N, T, H, W, C = x.shape
        if pos_beta is None:
            xw = window_partition(x.reshape(N * T, H, W, C),
                                  self.window_size)
            vw = window_partition(value.reshape(N * T, H, W, C),
                                  self.window_size)
            out = MultiHeadAttention(
                self.embed_dim, self.num_heads, dropout=self.dropout,
                quant=(self.exec_mode == "int8"),
                dtype=self.dtype, name="attn")(
                    xw, xw, vw, deterministic=deterministic)
            out = window_reverse(out, self.window_size, N * T, H, W)
            return out.reshape(N, T, H, W, C)

        # Affine-fused path: x is the raw normalized input (== value).
        # The window partition happens ONCE on x before the projection, so
        # q/k/v emerge directly in window layout — no per-tensor layout
        # copies (the trace showed ~20% of device time in copies/reshapes).
        quant = self.exec_mode == "int8"
        params = _MHAParams(self.embed_dim, self.num_heads, name="attn")()
        w3, (wq_f, wk_f), (ones_q, ones_k), (bq, bk, bv), HD = \
            _qkv_weights(params)
        nh = self.num_heads
        hd = HD // nh
        ws = self.window_size
        # statistics match the reference's fusion input (x + event query)
        a, b = frame_affine_stats(x if evt is None else x + evt)

        xw = window_partition(x.reshape(N * T, H, W, C), ws)  # (B, w², C)
        nW = xw.shape[0] // (N * T)
        P = _matmul(xw, w3, self.dtype, quant).reshape(N, T, nW, ws * ws,
                                                       3 * HD)
        pq, pk, pv = P[..., :HD], P[..., HD:2 * HD], P[..., 2 * HD:]
        if evt is not None:
            # evt is the (N, 1, H, W, C) event map (same for every target
            # time): project its windows once, broadcast over T
            evtw = window_partition(evt.reshape(N, H, W, C), ws)
            evt_qk = _matmul(evtw, jnp.concatenate([wq_f, wk_f], -1),
                             self.dtype, quant).reshape(N, 1, nW, ws * ws,
                                                        2 * HD)
            pq = pq + evt_qk[..., :HD]
            pk = pk + evt_qk[..., HD:]
        beta_w = window_partition(
            pos_beta.reshape(T, H, W, C).astype(self.dtype), ws)
        pos_q = (beta_w @ wq_f.astype(self.dtype) + bq
                 ).reshape(1, T, nW, ws * ws, HD)
        pos_k = (beta_w @ wk_f.astype(self.dtype) + bk
                 ).reshape(1, T, nW, ws * ws, HD)
        a4 = a.reshape(N, T, 1, 1, 1).astype(self.dtype)
        b4 = b.reshape(N, T, 1, 1, 1)
        # the per-frame shift b·1ᵀW applies only to REAL positions: padded
        # window slots must stay bias-only (b·x with x=0 is 0), matching the
        # generic path where fusion happens before the zero padding
        if H % ws or W % ws:
            pad_mask = window_partition(
                jnp.ones((1, H, W, 1), self.dtype), ws
            ).reshape(1, 1, nW, ws * ws, 1)
            b4 = b4 * pad_mask
        heads = lambda t: t.reshape(t.shape[:-1] + (nh, hd))
        qf = a4 * pq + (b4 * ones_q + pos_q).astype(self.dtype)
        kf = a4 * pk + (b4 * ones_k + pos_k).astype(self.dtype)
        vf = pv + bv.astype(self.dtype)
        from npvp_tpu.kernels import temporal_attention as ta_kernel

        Bw = N * T * nW
        if (self.exec_mode == "pallas" and deterministic
                and Bw % ta_kernel.BLOCK_SITES == 0):
            # same per-site kernel as the temporal attentions: each window is
            # a 'site' with ws² tokens — head split/softmax/weighted sum stay
            # in VMEM in the (B, ws², HD) layout the projection produced
            from npvp_tpu.kernels.temporal_attention import temporal_attention

            if ta_kernel.FUSE_OPROJ:
                (_, _, _, (wo, bo)) = params
                out = temporal_attention(
                    qf.reshape(Bw, ws * ws, HD), kf.reshape(Bw, ws * ws, HD),
                    vf.reshape(Bw, ws * ws, HD), num_heads=nh,
                    wo=wo.reshape(HD, -1), bo=bo)  # out-proj fused in-kernel
            else:
                out = temporal_attention(
                    qf.reshape(Bw, ws * ws, HD), kf.reshape(Bw, ws * ws, HD),
                    vf.reshape(Bw, ws * ws, HD), num_heads=nh)
                out = _out_proj(out.reshape(N, T, nW, ws * ws, nh, hd),
                                params, self.dtype, quant=quant)
        else:
            rng = None
            if self.dropout > 0.0 and not deterministic:
                rng = self.make_rng("dropout")
            out = scaled_dot_product_attention(
                heads(qf), heads(kf), heads(vf), dropout_rate=self.dropout,
                dropout_rng=rng,
                deterministic=deterministic)       # (N, T, nW, w², nh, hd)
            out = _out_proj(out, params, self.dtype, quant=quant)
        out = window_reverse(out.reshape(N * T * nW, ws * ws, C), ws,
                             N * T, H, W)
        return out.reshape(N, T, H, W, C)


class _LNParams(nn.Module):
    """Parameter holder for an (H, W, C) LayerNorm affine (named scale/bias
    so checkpoints are interchangeable with LayerNormHWC)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, self.shape,
                           jnp.float32),
                self.param("bias", nn.initializers.zeros, self.shape,
                           jnp.float32))


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's {kernel, bias} naming."""

    kernel_shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        fan_in = int(np.prod(self.kernel_shape[:-1]))
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                           self.kernel_shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.kernel_shape[-1],), jnp.float32)
        return kernel, bias


def _gelu_for(dtype):
    """Exact GELU in fp32, tanh-approximated GELU in bf16: the approximation
    error (~1e-3 relative) is below bf16 rounding noise (~4e-3), and the tanh
    form is markedly cheaper on the VPU."""
    import functools
    return functools.partial(nn.gelu, approximate=(dtype == jnp.bfloat16))


def _layer_norm_hwc(x, scale, bias, dtype, eps=1e-5):
    """Per-sample LayerNorm over trailing (H, W, C) with fp32 statistics but
    compute-dtype traffic (see LayerNormHWC)."""
    from npvp_tpu.nn.layers import fp32_moments

    mean, var = fp32_moments(x, (-3, -2, -1))
    inv = jax.lax.rsqrt(var + eps)
    a = (inv * scale).astype(dtype)
    b = (bias - mean * inv * scale).astype(dtype)
    return x * a + b


class MlpDWBN(nn.Module):
    """Conv feed-forward: 1×1 → depthwise 3×3 → 1×1 with GELU and per-sample
    LayerNorm over (H, W, C) after each stage (reference
    models/VidHRFormer.py:326-392, AR_model=True path).

    Execution paths over one parameter set: a composable XLA path
    ("xla" — training; autodiff) and a dynamic-int8 path ("int8" — serving;
    the 1×1 convs are per-token-quantized MXU matmuls, the cheap depthwise
    conv stays in the compute dtype). A fused Pallas kernel for this region
    was built twice and measured slower than the XLA composition — see
    npvp_tpu/kernels/__init__.py for the record.
    """

    hidden_features: int
    out_features: int
    dropout: float = 0.0
    exec_mode: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        N, T, H, W, C = x.shape
        Hd, Co = self.hidden_features, self.out_features
        w1, b1 = _ConvParams((1, 1, C, Hd), name="fc1")()
        ln1s, ln1b = _LNParams((H, W, Hd), name="norm1")()
        dw, bdw = _ConvParams((3, 3, 1, Hd), name="dw3x3")()
        ln2s, ln2b = _LNParams((H, W, Hd), name="norm2")()
        w2, b2 = _ConvParams((1, 1, Hd, Co), name="fc2")()
        ln3s, ln3b = _LNParams((H, W, Co), name="norm3")()

        act = _gelu_for(self.dtype)
        y = x.reshape(N * T, H, W, C)
        if self.exec_mode == "int8":
            from npvp_tpu.nn.quant import int8_contract

            pointwise = lambda inp, k, b: (
                int8_contract(inp, k.reshape(k.shape[-2:]),
                              out_dtype=self.dtype) + b.astype(self.dtype))
        else:
            pointwise = lambda inp, k, b: (jax.lax.conv_general_dilated(
                inp, k.astype(self.dtype), window_strides=(1, 1),
                padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
                + b.astype(self.dtype))
        dwconv = lambda inp, k, b: (jax.lax.conv_general_dilated(
            inp, k.astype(self.dtype), window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=Hd) + b.astype(self.dtype))
        y = pointwise(y, w1, b1)
        y = _layer_norm_hwc(y, ln1s, ln1b, self.dtype)
        y = act(y)
        y = dwconv(y, dw, bdw)
        y = _layer_norm_hwc(y, ln2s, ln2b, self.dtype)
        y = act(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = pointwise(y, w2, b2)
        y = _layer_norm_hwc(y, ln3s, ln3b, self.dtype)
        y = act(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return y.reshape(N, T, H, W, Co)


def encoder_temporal_allow(T: int,
                           obs_mask: Optional[jnp.ndarray] = None
                           ) -> jnp.ndarray:
    """Boolean (T, T) allow matrix for the encoder's temporal self-attention.

    The reference masks the *last* time position from every earlier query
    (models/VidHRFormer.py:100-107 — EVT-token support; active even without
    the token, so replicated exactly). With an ``obs_mask`` (unified mode),
    keys are restricted to observed positions and "last" becomes the
    highest-index observed position.
    """
    q = jnp.arange(T)[:, None]
    k = jnp.arange(T)[None, :]
    if obs_mask is None:
        last = T - 1
        allow = ~((k == last) & (q != last))
    else:
        obs = obs_mask.astype(bool)
        idx = jnp.arange(T)
        last = jnp.max(jnp.where(obs, idx, -1))
        allow = obs[None, :] & ~((k == last) & (q != last))
    return allow


class TemporalAttention(nn.Module):
    """MHSA over the T axis; batch = (N, H, W) — each spatial site attends over
    its own time series (reference models/VidHRFormer.py:94-107)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    exec_mode: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, allow=None, deterministic=True,
                 pos_beta_q=None, pos_beta_kv=None, evt_q=None,
                 cross_pkv=None, expose_params=False):
        """Generic path: q_in/k_in are pre-fused tensors. Affine path
        (``pos_beta_q`` given; 'layer'+'Add' only): q_in/k_in/v_in are the
        raw inputs and the positional fusion folds through the projections
        (self-attention: q_in is k_in → one C→3C matmul; cross-attention:
        separate q and fused k/v projections on memory).

        ``cross_pkv``: optionally the pre-projected memory (Pk, Pv) in
        (N, H, W, To, HD) layout — the decoder stack batches the k/v
        projections of ALL its cross-attentions into one wide matmul over
        the shared memory (see VidHRFormerDecoderNAR). ``expose_params``
        returns this attention's raw parameter tuple for that hoist."""
        if expose_params:
            return _MHAParams(self.embed_dim, self.num_heads, name="attn")()
        mask = None
        if allow is not None:
            mask = allow[None, None, None, None, :, :]  # (..., heads, Tq, Tk)
        to_bt = lambda t: t.transpose(0, 2, 3, 1, 4)
        quant = self.exec_mode == "int8"
        if pos_beta_q is None:
            tq = to_bt(q_in)
            # preserve object identity → fused-QK path for self-attention
            tk = tq if k_in is q_in else to_bt(k_in)
            out = MultiHeadAttention(
                self.embed_dim, self.num_heads, dropout=self.dropout,
                quant=quant, dtype=self.dtype, name="attn")(
                    tq, tk, to_bt(v_in), mask=mask,
                    deterministic=deterministic)
            return out.transpose(0, 3, 1, 2, 4)

        # Affine path: transpose to time-minor layout ONCE before the
        # projections, so q/k/v emerge directly in attention layout (no
        # per-tensor copies). The memory-side transpose in cross-attention
        # is identical across decoder layers and CSE'd by XLA.
        params = _MHAParams(self.embed_dim, self.num_heads, name="attn")()
        w3, (wq_f, wk_f), (ones_q, ones_k), (bq, bk, bv), HD = \
            _qkv_weights(params)
        nh = self.num_heads
        hd = HD // nh
        N, T, H, W, C = q_in.shape
        heads = lambda t: t.reshape(t.shape[:-1] + (nh, hd))
        # per-frame scalars in (N, 1, 1, T, 1) layout
        perm5 = lambda t: t.transpose(0, 2, 3, 1, 4)
        posmm = lambda beta, w, bias, Tn: (
            beta.reshape(Tn, H, W, C).transpose(1, 2, 0, 3).astype(self.dtype)
            @ w.astype(self.dtype) + bias)[None]  # (1, H, W, Tn, HD)
        if k_in is q_in:  # temporal self-attention (v_in raw, same source)
            s_in = q_in if evt_q is None else q_in + evt_q
            a, b = frame_affine_stats(s_in)
            a5, b5 = perm5(a).astype(self.dtype), perm5(b)
            xT = perm5(q_in)                       # (N, H, W, T, C): 1 copy
            P = _matmul(xT, w3, self.dtype, quant)
            pq, pk, pv = P[..., :HD], P[..., HD:2 * HD], P[..., 2 * HD:]
            if evt_q is not None:
                # (N, 1, H, W, C) event map → (N, H, W, 1, 2·HD), broadcast T
                evt_qk = _matmul(perm5(evt_q),
                                 jnp.concatenate([wq_f, wk_f], -1),
                                 self.dtype, quant)
                pq = pq + evt_qk[..., :HD]
                pk = pk + evt_qk[..., HD:]
            pos_q = posmm(pos_beta_q, wq_f, bq, T)
            pos_k = posmm(pos_beta_q, wk_f, bk, T)
            qf = a5 * pq + (b5 * ones_q + pos_q).astype(self.dtype)
            kf = a5 * pk + (b5 * ones_k + pos_k).astype(self.dtype)
            vf = pv + bv.astype(self.dtype)
        else:  # encoder-decoder cross-attention: v_in == k_in == memory
            s_in = q_in if evt_q is None else q_in + evt_q
            aq, bq_s = frame_affine_stats(s_in)
            sT = perm5(s_in)
            pq = _matmul(sT, wq_f, self.dtype, quant)
            pos_q = posmm(pos_beta_q, wq_f, bq, T)
            qf = (perm5(aq).astype(self.dtype) * pq
                  + (perm5(bq_s) * ones_q + pos_q).astype(self.dtype))
            To = k_in.shape[1]
            ak, bk_s = frame_affine_stats(k_in)
            if cross_pkv is None:
                mT = perm5(k_in)
                P = _matmul(mT, jnp.concatenate(
                    [wk_f, w3[:, 2 * HD:]], -1), self.dtype, quant)
                Pk, Pv = P[..., :HD], P[..., HD:]
            else:  # stack-hoisted projection (same math, one wide matmul)
                Pk, Pv = cross_pkv
            pos_k = posmm(pos_beta_kv, wk_f, bk, To)
            kf = (perm5(ak).astype(self.dtype) * Pk
                  + (perm5(bk_s) * ones_k + pos_k).astype(self.dtype))
            vf = Pv + bv.astype(self.dtype)
        Nq, Hs, Ws, Tq = qf.shape[:4]
        B = Nq * Hs * Ws
        from npvp_tpu.kernels import temporal_attention as ta_kernel

        if (self.exec_mode == "pallas" and deterministic
                and B % ta_kernel.BLOCK_SITES == 0):
            # fused per-site attention kernel: head-split, logits, softmax
            # and weighted sum stay in VMEM in the (B, T, HD) layout the
            # projections produce — no XLA attention-layout relayouts
            from npvp_tpu.kernels.temporal_attention import (allow_to_bias,
                                                             temporal_attention)

            Tk = kf.shape[3]
            bias = allow_to_bias(allow) if allow is not None else None
            if ta_kernel.FUSE_OPROJ:
                (_, _, _, (wo, bo)) = params
                out = temporal_attention(
                    qf.reshape(B, Tq, HD), kf.reshape(B, Tk, HD),
                    vf.reshape(B, Tk, HD), bias, num_heads=nh,
                    wo=wo.reshape(HD, -1), bo=bo)  # out-proj fused in-kernel
                out = out.reshape(Nq, Hs, Ws, Tq, -1)
            else:
                out = temporal_attention(
                    qf.reshape(B, Tq, HD), kf.reshape(B, Tk, HD),
                    vf.reshape(B, Tk, HD), bias, num_heads=nh)
                out = _out_proj(out.reshape(Nq, Hs, Ws, Tq, nh, hd),
                                params, self.dtype, quant=quant)
            return out.transpose(0, 3, 1, 2, 4)
        rng = None
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        out = scaled_dot_product_attention(
            heads(qf), heads(kf), heads(vf), mask=mask,
            dropout_rate=self.dropout, dropout_rng=rng,
            deterministic=deterministic)
        out = _out_proj(out, params, self.dtype, quant=quant)
        return out.transpose(0, 3, 1, 2, 4)


class VidHRFormerBlockEnc(nn.Module):
    """Encoder block: window MHSA → conv FFN → masked temporal MHSA → linear
    FFN, pre-LN with DropPath (reference models/VidHRFormer.py:54-116)."""

    embed_dim: int
    num_heads: int
    window_size: int = 4
    dropout: float = 0.0
    drop_path: float = 0.0
    ffn_hidden_ratio: int = 4
    dim_feedforward: int = 1024
    norm_type: str = "layer"
    affine_posfuse: bool = False
    exec_mode: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_beta, pos_gamma, temporal_allow=None,
                 deterministic=True):
        # torch nn.LayerNorm default eps (reference VidHRFormer.py:65-77)
        ln = lambda name: TokenLayerNorm(epsilon=1e-5, dtype=self.dtype,
                                         name=name)
        dp = DropPath(self.drop_path)
        # the affine-fused path wins at inference (fewer HBM passes) but its
        # BACKWARD measured +10.7% on the train step (tools/ab_train.py,
        # interleaved medians 254.7 vs 230.1 ms) — so it serves only
        # non-differentiated calls; training takes the pre-fused path.
        # Both paths are equality-tested over one parameter set.
        af = self.affine_posfuse and deterministic

        x1 = ln("norm1")(x)
        swa = SpatialWindowAttention(
            self.embed_dim, self.num_heads, self.window_size, self.dropout,
            exec_mode=self.exec_mode, dtype=self.dtype, name="slmhsa")
        if af:
            attn = swa(x1, x1, deterministic, pos_beta=pos_beta)
        else:
            fused = pos_feat_fuse(x1, pos_beta, pos_gamma, self.norm_type)
            attn = swa(fused, x1, deterministic)
        x = x + dp(attn, deterministic)

        ffn = MlpDWBN(self.ffn_hidden_ratio * self.embed_dim, self.embed_dim,
                      self.dropout, exec_mode=self.exec_mode,
                      dtype=self.dtype, name="spatial_ffn")(
                          ln("norm2")(x), deterministic)
        x = x + dp(ffn, deterministic)

        x1 = ln("norm3")(x)
        if temporal_allow is None:
            temporal_allow = encoder_temporal_allow(x.shape[1])
        ta = TemporalAttention(
            self.embed_dim, self.num_heads, self.dropout,
            exec_mode=self.exec_mode, dtype=self.dtype, name="temporal_mhsa")
        if af:
            tattn = ta(x1, x1, x1, temporal_allow, deterministic,
                       pos_beta_q=pos_beta)
        else:
            temp = pos_feat_fuse(x1, pos_beta, pos_gamma, self.norm_type)
            tattn = ta(temp, temp, x1, temporal_allow, deterministic)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(tattn)

        x1 = ln("norm4")(x)
        quant = self.exec_mode == "int8"
        x1 = QuantDense(self.dim_feedforward, quant=quant, dtype=self.dtype,
                        name="linear1")(x1)
        x1 = nn.Dropout(self.dropout, deterministic=deterministic)(
            _gelu_for(self.dtype)(x1))
        x1 = QuantDense(self.embed_dim, quant=quant, dtype=self.dtype,
                        name="linear2")(x1)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(x1)
        return x


class VidHRFormerEncoder(nn.Module):
    """Stack of encoder blocks ("EVT-Former"); computes the event coding from
    context frames (reference models/VidHRFormer.py:11-52). The optional final
    LayerNorm is applied by the caller (its parameters are *shared* with the
    decoder's final norm — a reference quirk, models/Predictor.py:270,290-299).
    """

    num_layers: int
    embed_dim: int
    num_heads: int
    window_size: int = 4
    dropout: float = 0.0
    drop_path: float = 0.0
    ffn_hidden_ratio: int = 4
    dim_feedforward: int = 1024
    norm_type: str = "layer"
    affine_posfuse: bool = False
    remat: bool = False  # rematerialize each block under grad (HBM for FLOPs)
    exec_mode: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_beta, pos_gamma, temporal_allow=None,
                 deterministic=True):
        from npvp_tpu.core.mesh import sp_shard

        # static_argnums counts self as 0: deterministic is arg 5
        block_cls = (nn.remat(VidHRFormerBlockEnc,
                              static_argnums=(5,))
                     if self.remat else VidHRFormerBlockEnc)
        for i in range(self.num_layers):
            x = sp_shard(x)
            x = block_cls(
                self.embed_dim, self.num_heads, self.window_size,
                self.dropout, self.drop_path, self.ffn_hidden_ratio,
                self.dim_feedforward, self.norm_type,
                affine_posfuse=self.affine_posfuse,
                exec_mode=self.exec_mode, dtype=self.dtype,
                name=f"layer_{i}")(x, pos_beta, pos_gamma, temporal_allow,
                                   deterministic)
        return x


class VidHRFormerBlockDecNAR(nn.Module):
    """NAR decoder block: window self-attn (+event query) → conv FFN →
    temporal self-attn → linear FFN → encoder-decoder cross-attn → conv FFN
    (reference models/VidHRFormer.py:163-245)."""

    embed_dim: int
    num_heads: int
    window_size: int = 4
    dropout: float = 0.0
    drop_path: float = 0.0
    ffn_hidden_ratio: int = 4
    dim_feedforward: int = 1024
    norm_type: str = "layer"
    affine_posfuse: bool = False
    exec_mode: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_evt, memory, mem_pos, tgt_pos,
                 self_allow=None, cross_allow=None, deterministic=True,
                 cross_pkv=None, expose_cross_params=False):
        if expose_cross_params:
            # hand the cross-attention's raw parameters to the stack for the
            # hoisted (cross-layer batched) memory k/v projection
            return TemporalAttention(
                self.embed_dim, self.num_heads, self.dropout,
                exec_mode=self.exec_mode, dtype=self.dtype,
                name="enc_dec_attn")(None, None, None, expose_params=True)
        mem_beta, mem_gamma = mem_pos
        tgt_beta, tgt_gamma = tgt_pos
        # torch nn.LayerNorm default eps (reference VidHRFormer.py:65-77)
        ln = lambda name: TokenLayerNorm(epsilon=1e-5, dtype=self.dtype,
                                         name=name)
        dp = DropPath(self.drop_path)
        drop = lambda y: nn.Dropout(self.dropout,
                                    deterministic=deterministic)(y)
        # the affine-fused path wins at inference (fewer HBM passes) but its
        # BACKWARD measured +10.7% on the train step (tools/ab_train.py,
        # interleaved medians 254.7 vs 230.1 ms) — so it serves only
        # non-differentiated calls; training takes the pre-fused path.
        # Both paths are equality-tested over one parameter set.
        af = self.affine_posfuse and deterministic

        # window self-attention with the event query injected into q/k
        tgt2 = ln("norm1")(tgt)
        swa = SpatialWindowAttention(
            self.embed_dim, self.num_heads, self.window_size, self.dropout,
            exec_mode=self.exec_mode, dtype=self.dtype, name="slmhsa")
        if af:
            attn = swa(tgt2, tgt2, deterministic, pos_beta=tgt_beta,
                       evt=query_evt)
        else:
            fused = pos_feat_fuse(tgt2 + query_evt, tgt_beta, tgt_gamma,
                                  self.norm_type)
            attn = swa(fused, tgt2, deterministic)
        tgt2 = tgt + dp(attn, deterministic)

        ffn = MlpDWBN(self.ffn_hidden_ratio * self.embed_dim, self.embed_dim,
                      self.dropout, exec_mode=self.exec_mode,
                      dtype=self.dtype, name="spatial_ffn")(
                          ln("norm2")(tgt2), deterministic)
        tgt2 = tgt2 + dp(ffn, deterministic)

        # temporal self-attention over target times
        t_in = ln("norm3")(tgt2)
        ta = TemporalAttention(
            self.embed_dim, self.num_heads, self.dropout,
            exec_mode=self.exec_mode, dtype=self.dtype, name="temporal_mhsa")
        if af:
            tattn = ta(t_in, t_in, t_in, self_allow, deterministic,
                       pos_beta_q=tgt_beta)
        else:
            temp = pos_feat_fuse(t_in, tgt_beta, tgt_gamma, self.norm_type)
            tattn = ta(temp, temp, t_in, self_allow, deterministic)
        tgt2 = tgt2 + drop(tattn)

        # linear FFN
        y = ln("norm4")(tgt2)
        quant = self.exec_mode == "int8"
        y = QuantDense(self.dim_feedforward, quant=quant, dtype=self.dtype,
                       name="linear1")(y)
        y = drop(_gelu_for(self.dtype)(y))
        y = QuantDense(self.embed_dim, quant=quant, dtype=self.dtype,
                       name="linear2")(y)
        tgt2 = tgt2 + drop(y)

        # encoder-decoder cross-attention over observed memory (per (h, w)
        # site, queries at target times attend to keys at observed times)
        q_in = ln("norm5")(tgt2)
        ca = TemporalAttention(
            self.embed_dim, self.num_heads, self.dropout,
            exec_mode=self.exec_mode, dtype=self.dtype, name="enc_dec_attn")
        if af:
            cattn = ca(q_in, memory, memory, cross_allow, deterministic,
                       pos_beta_q=tgt_beta, pos_beta_kv=mem_beta,
                       evt_q=query_evt, cross_pkv=cross_pkv)
        else:
            query = pos_feat_fuse(q_in + query_evt, tgt_beta, tgt_gamma,
                                  self.norm_type)
            key = pos_feat_fuse(memory, mem_beta, mem_gamma, self.norm_type)
            cattn = ca(query, key, memory, cross_allow, deterministic)
        tgt2 = tgt2 + dp(cattn, deterministic)

        ffn1 = MlpDWBN(self.ffn_hidden_ratio * self.embed_dim, self.embed_dim,
                       self.dropout, exec_mode=self.exec_mode,
                       dtype=self.dtype, name="spatial_ffn1")(
                           ln("norm6")(tgt2), deterministic)
        tgt2 = tgt2 + dp(ffn1, deterministic)
        return tgt2


class VidHRFormerDecoderNAR(nn.Module):
    """Non-autoregressive decoder: target initialized to zeros, L blocks, then
    a caller-supplied shared final norm + ReLU (reference
    models/VidHRFormer.py:118-161). Generates every target frame in one pass —
    the reference's core "continuous generation" mechanism."""

    num_layers: int
    embed_dim: int
    num_heads: int
    window_size: int = 4
    dropout: float = 0.0
    drop_path: float = 0.0
    ffn_hidden_ratio: int = 4
    dim_feedforward: int = 1024
    norm_type: str = "layer"
    affine_posfuse: bool = False
    remat: bool = False  # rematerialize each block under grad (HBM for FLOPs)
    exec_mode: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query_evt, memory, mem_pos, tgt_pos, self_allow=None,
                 cross_allow=None, deterministic=True):
        # query_evt is (N, 1, H, W, C) — broadcast across the TP target
        # times (derived from the target coordinate grid)
        from npvp_tpu.core.mesh import sp_shard

        N, _, H, W, C = query_evt.shape
        TP = tgt_pos[0].shape[0] // (H * W)
        tgt = jnp.zeros((N, TP, H, W, C), query_evt.dtype)
        memory = sp_shard(memory)
        # static_argnums counts self as 0: deterministic is arg 8
        block_cls = (nn.remat(VidHRFormerBlockDecNAR,
                              static_argnums=(8,))
                     if self.remat else VidHRFormerBlockDecNAR)
        blocks = [block_cls(
            self.embed_dim, self.num_heads, self.window_size,
            self.dropout, self.drop_path, self.ffn_hidden_ratio,
            self.dim_feedforward, self.norm_type,
            affine_posfuse=self.affine_posfuse,
            exec_mode=self.exec_mode, dtype=self.dtype,
            name=f"layer_{i}") for i in range(self.num_layers)]

        # Cross-layer k/v hoist (serving): every layer's cross-attention
        # projects the SAME memory; batching the L (C → 2·HD) projections
        # into one (C → L·2·HD) matmul reads memory once and runs the MXU
        # at 8192-wide instead of 1024-wide (512-wide dots measure a
        # fraction of the wide-dot TF/s — DESIGN.md). Exact same math and
        # parameters; per-layer affine/positional terms stay in the blocks.
        cross_pkvs = [None] * self.num_layers
        if (self.affine_posfuse and deterministic and not self.remat
                and self.exec_mode != "int8"):
            args = (tgt, query_evt, memory, mem_pos, tgt_pos)
            pieces, HD = [], None
            for b in blocks:
                w3_l, (_, wk_f), _, _, HD = _qkv_weights(
                    b(*args, expose_cross_params=True))
                pieces.append(jnp.concatenate([wk_f, w3_l[:, 2 * HD:]], -1))
            big = jnp.concatenate(pieces, -1)            # (C, L·2·HD)
            mT = memory.transpose(0, 2, 3, 1, 4)
            P = mT.astype(self.dtype) @ big.astype(self.dtype)
            cross_pkvs = [(P[..., l * 2 * HD:l * 2 * HD + HD],
                           P[..., l * 2 * HD + HD:(l + 1) * 2 * HD])
                          for l in range(self.num_layers)]

        for i, block in enumerate(blocks):
            tgt = sp_shard(tgt)
            kw = ({"cross_pkv": cross_pkvs[i]}
                  if cross_pkvs[i] is not None else {})
            tgt = block(tgt, query_evt, memory, mem_pos, tgt_pos,
                        self_allow, cross_allow, deterministic, **kw)
        return tgt
