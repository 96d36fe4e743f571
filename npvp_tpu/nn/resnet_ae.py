"""Stage-1 per-frame ResNet autoencoder.

TPU-native (NHWC, XLA `conv_general_dilated`, bf16 compute, fp32 BN) rebuild of
the reference's pix2pix-style encoder/decoder (reference
models/ResNetAutoEncoder.py:51-261) and the SAGAN-style non-local attention
blocks interleaved between downsampling stages (reference
models/submodules.py:9-255).

Frames are processed with time folded into batch: (N, T, H, W, C) →
(N·T, H, W, C) — a per-frame model, so all conv batch dims stay large for the
MXU. All shipped reference configs set ``learn_3d: False`` so the temporal half
of Factorized3DConvAttn is off by default (still implemented for parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from npvp_tpu.nn.layers import BatchNorm, ConvBNAct, reflect_pad_2d
from npvp_tpu.nn.upsample import (subpixel_conv_same,
                                  subpixel_conv_transpose_3x3_s2)

_XAVIER = nn.initializers.xavier_uniform()


def _softmax_f32_stats(logits: jnp.ndarray, axes) -> jnp.ndarray:
    """Softmax reading/writing ``logits`` in its own dtype with fp32
    exponent/sum arithmetic — ≡ jax.nn.softmax when logits are fp32."""
    lmax = jax.lax.stop_gradient(jnp.max(logits, axis=axes, keepdims=True))
    e = jnp.exp((logits - lmax).astype(jnp.float32))
    return (e / jnp.sum(e, axis=axes, keepdims=True)).astype(logits.dtype)


def _dense_params(mod, name: str, in_features: int, features: int):
    """{kernel, bias} holder bit-compatible with nn.Dense (xavier kernel as
    the attention projections use), for fused multi-projection matmuls."""
    from npvp_tpu.nn.layers import _dense_general_params

    return _dense_general_params(mod, name, (in_features,), (features,),
                                 kernel_init=_XAVIER)


class _ConvTransposeKernel(nn.Module):
    """Parameter holder bit-compatible with nn.ConvTranspose's {kernel}
    (same name, shape (k, k, O, I), and default lecun_normal init), so the
    sub-pixel execution path shares checkpoints with the ConvTranspose it
    replaces."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class NonLocalAttention2D(nn.Module):
    """Non-local (global spatial) attention with 2×2 max-pooled keys/values and
    a zero-initialized residual gate gamma (reference models/submodules.py:98-180).

    Unscaled q·k logits (SAGAN convention — no 1/sqrt(d))."""

    attn_ratio: int = 8
    value_ratio: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        N, H, W, C = x.shape
        attn_dim = C // self.attn_ratio
        value_dim = C // self.value_ratio
        skip = x

        # Stay in NHWC end-to-end: the (N, H·W, C) flattening the reference
        # uses forced ~500 MB of layout copies per batch between the
        # surrounding convs and the matmuls (tools/hlo_probe.py); einsums on
        # the 4D tensors express the same math with no materialized reshape.
        # q/k/v also project in ONE matmul over concatenated kernels (the
        # activations are read from HBM once) — identical parameters.
        wq, bq = _dense_params(self, "wq", C, attn_dim)
        wk, bk = _dense_params(self, "wk", C, attn_dim)
        wv, bv = _dense_params(self, "wv", C, value_dim)
        w3 = jnp.concatenate([wq, wk, wv], axis=-1).astype(self.dtype)
        b3 = jnp.concatenate([bq, bk, bv]).astype(self.dtype)
        qkv = x.astype(self.dtype) @ w3 + b3
        q = qkv[..., :attn_dim]                                # (N, H, W, a)
        k = qkv[..., attn_dim:2 * attn_dim]
        v = qkv[..., 2 * attn_dim:]
        # Downsample key/value grid to (H/2, W/2)
        k = nn.max_pool(k, (2, 2), strides=(2, 2))
        v = nn.max_pool(v, (2, 2), strides=(2, 2))

        # the (H·W)×(H·W/4) logits are the AE's biggest tensor (671 MB fp32
        # at 32×32 — measured 13.5 ms in this module, tools/hlo_probe.py
        # join): materialize them in the compute dtype and keep only the
        # softmax *statistics* in fp32 (identical math when dtype is fp32)
        logits = jnp.einsum("nhwa,nija->nhwij", q, k,
                            preferred_element_type=jnp.float32
                            ).astype(x.dtype)
        weights = _softmax_f32_stats(logits, axes=(-2, -1))
        out = jnp.einsum("nhwij,nijv->nhwv", weights, v)
        out = nn.Dense(C, kernel_init=_XAVIER, dtype=self.dtype,
                       param_dtype=jnp.float32, name="out_proj")(out)

        out = BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=self.dtype, name="bn")(out)
        out = nn.relu(out)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return skip + gamma.astype(x.dtype) * out


class NonLocalAttention1D(nn.Module):
    """Temporal non-local attention over the T axis; used only when
    ``learn_3d=True`` (reference models/submodules.py:182-255). Input
    (B, T, C) with B = N·H·W."""

    attn_ratio: int = 8
    value_ratio: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, T, C = x.shape
        attn_dim = C // self.attn_ratio
        value_dim = C // self.value_ratio
        dense = lambda feats, name: nn.Dense(
            feats, kernel_init=_XAVIER, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        q = dense(attn_dim, "wq")(x)
        k = dense(attn_dim, "wk")(x)
        v = dense(value_dim, "wv")(x)
        logits = jnp.einsum("btc,bsc->bts", q, k,
                            preferred_element_type=jnp.float32
                            ).astype(x.dtype)
        weights = _softmax_f32_stats(logits, axes=(-1,))
        out = dense(C, "out_proj")(jnp.einsum("bts,bsc->btc", weights, v))
        # reference applies BatchNorm1d over (B, C, T)
        out = BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=self.dtype, name="bn")(out)
        out = nn.relu(out)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return x + gamma.astype(x.dtype) * out


class Factorized3DConvAttn(nn.Module):
    """Spatial conv + non-local 2D attention (+ optional temporal conv1d +
    non-local 1D attention when ``learn_3d``), residual around the whole block
    (reference models/submodules.py:9-95, conv-first order)."""

    learn_3d: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, T: int, train: bool = False):
        NT, H, W, C = x.shape
        skip = x
        x = ConvBNAct(C, (3, 3), use_bias=True, dtype=self.dtype,
                      name="spatial_conv")(x, train=train) + x
        x = NonLocalAttention2D(dtype=self.dtype, name="attn2d")(x, train=train)
        if self.learn_3d:
            N = NT // T
            xt = x.reshape(N, T, H, W, C).transpose(0, 2, 3, 1, 4)
            xt = xt.reshape(N * H * W, T, C)
            # temporal conv1d (kernel 3, 'same') + BN + relu, residual
            conv = nn.Conv(C, (3,), padding="SAME", use_bias=True,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="temporal_conv")(xt)
            conv = BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name="temporal_bn")(conv)
            xt = nn.relu(conv) + xt
            xt = NonLocalAttention1D(dtype=self.dtype, name="attn1d")(
                xt, train=train)
            x = xt.reshape(N, H, W, T, C).transpose(0, 3, 1, 2, 4)
            x = x.reshape(NT, H, W, C)
        return x + skip


class ResnetBlock(nn.Module):
    """Two reflect-padded 3×3 convs with BN, residual
    (reference models/ResNetAutoEncoder.py:207-261)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        C = x.shape[-1]
        y = reflect_pad_2d(x, 1)
        y = ConvBNAct(C, (3, 3), padding="VALID", dtype=self.dtype,
                      name="conv1")(y, train=train)
        y = reflect_pad_2d(y, 1)
        y = ConvBNAct(C, (3, 3), padding="VALID", activation=None,
                      dtype=self.dtype, name="conv2")(y, train=train)
        return x + y


class ResnetEncoder(nn.Module):
    """Frames (N, T, H, W, C_img) → features (N, T, H', W', ngf·2^n_down),
    ReLU-activated (reference models/ResNetAutoEncoder.py:51-146)."""

    ngf: int = 64
    n_downsampling: int = 3
    num_res_blocks: int = 2
    learn_3d: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        N, T = x.shape[:2]
        x = x.reshape((N * T,) + x.shape[2:]).astype(self.dtype)

        # stem: reflect-pad 3 + 7×7 conv
        x = reflect_pad_2d(x, 3)
        x = ConvBNAct(self.ngf, (7, 7), padding="VALID", dtype=self.dtype,
                      name="block0")(x, train=train)
        x = ConvBNAct(self.ngf * 2, (3, 3), strides=(2, 2), dtype=self.dtype,
                      name="block1")(x, train=train)
        ngf = self.ngf * 2
        for i in range(1, self.n_downsampling):
            x = Factorized3DConvAttn(self.learn_3d, dtype=self.dtype,
                                     name=f"block{i + 1}_attn")(x, T, train)
            x = ConvBNAct(ngf * 2, (3, 3), strides=(2, 2), dtype=self.dtype,
                          name=f"block{i + 1}_conv")(x, train=train)
            ngf *= 2
        for i in range(self.num_res_blocks):
            x = Factorized3DConvAttn(self.learn_3d, dtype=self.dtype,
                                     name=f"res_attn_{i}")(x, T, train)
            x = ResnetBlock(dtype=self.dtype, name=f"res_conv_{i}")(x, train)
        x = nn.relu(x)
        return x.reshape((N, T) + x.shape[1:])


class ResnetDecoder(nn.Module):
    """Features (N, T, H', W', C) → frames (N, T, H, W, C_img) through
    ConvTranspose upsampling and a 7×7 head with Tanh/Sigmoid
    (reference models/ResNetAutoEncoder.py:148-204).

    ConvTranspose padding ((1, 2), (1, 2)) with stride 2 / kernel 3
    reproduces torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1)
    exactly (out = 2·in)."""

    out_channels: int = 1
    ngf: int = 64
    n_downsampling: int = 3
    out_layer: str = "Tanh"
    # Sub-pixel decomposition is numerically identical (tests/test_upsample)
    # but measured 3% SLOWER end-to-end than XLA's native ConvTranspose
    # lowering on v5e (tools/ab_probe.py, interleaved pairs, median
    # convT/subpx = 0.970) — XLA's dilated-conv path is better than its
    # 3/4-zero-MAC structure suggests. Default stays on ConvTranspose; the
    # option remains for shapes where the GEMM form wins.
    subpixel: bool = False
    # Sub-pixel (stride-4) form of the 7×7 output head — see
    # upsample.subpixel_conv_same. Same parameters; A/B-able.
    s2d_head: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        N, T = x.shape[:2]
        x = x.reshape((N * T,) + x.shape[2:]).astype(self.dtype)

        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            feats = self.ngf * mult // 2
            if self.subpixel:
                # sub-pixel decomposition of ConvTranspose(k3, s2, p(1,2),
                # transpose_kernel) — identical math and parameter
                # (tests/test_upsample.py), but one dense MXU GEMM instead of
                # an lhs-dilated conv where 3/4 of the MACs hit inserted zeros
                kernel = _ConvTransposeKernel((3, 3, feats, x.shape[-1]),
                                              name=f"up{i}_conv")()
                x = subpixel_conv_transpose_3x3_s2(x,
                                                   kernel.astype(self.dtype))
            else:
                x = nn.ConvTranspose(
                    feats, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2)),
                    use_bias=False, transpose_kernel=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"up{i}_conv")(x)
            x = BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype,
                          name=f"up{i}_bn")(x)
            x = nn.relu(x)
        x = reflect_pad_2d(x, 3)
        s2d_ok = x.shape[1] % 4 == x.shape[2] % 4 == 2
        if self.s2d_head and not s2d_ok:
            # the config asked for the sub-pixel head but the padded H/W
            # don't tile 4×4 — fall back loudly so A/B probes and HLO dumps
            # can't silently measure the wrong variant
            import warnings

            warnings.warn(
                f"AE.s2d_head requested but padded spatial shape "
                f"{x.shape[1]}x{x.shape[2]} is not 2 mod 4 (img_size must be "
                "divisible by 4); using the direct 7x7 head", stacklevel=2)
        if self.s2d_head and s2d_ok:
            # sub-pixel form of the 7×7 head: with C_out=img_channels (1-3)
            # the natural conv maps ~1 output lane of 128 on the MXU
            # (measured 3.9 ms for 16.4 GFLOP); grouping 4×4 output blocks
            # into channels runs it as one stride-4 conv — same parameters
            from npvp_tpu.nn.vidhrformer import _ConvParams

            kernel, bias = _ConvParams(
                (7, 7, x.shape[-1], self.out_channels), name="head")()
            x = subpixel_conv_same(x, kernel.astype(self.dtype),
                                   bias.astype(self.dtype), factor=4)
        else:
            x = nn.Conv(self.out_channels, (7, 7), padding="VALID",
                        use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name="head")(x)
        if self.out_layer == "Tanh":
            x = jnp.tanh(x)
        elif self.out_layer == "Sigmoid":
            x = jax.nn.sigmoid(x)
        else:
            raise ValueError(f"unsupported out_layer {self.out_layer!r}")
        return x.reshape((N, T) + x.shape[1:])


class FrameAutoEncoder(nn.Module):
    """Encoder+decoder pair (stage-1 trainable unit, reference
    models/ResNetAutoEncoder.py:13-49)."""

    img_channels: int = 1
    ngf: int = 64
    n_downsampling: int = 3
    num_res_blocks: int = 2
    out_layer: str = "Tanh"
    learn_3d: bool = False
    s2d_head: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ResnetEncoder(
            ngf=self.ngf, n_downsampling=self.n_downsampling,
            num_res_blocks=self.num_res_blocks, learn_3d=self.learn_3d,
            dtype=self.dtype)
        self.decoder = ResnetDecoder(
            out_channels=self.img_channels, ngf=self.ngf,
            n_downsampling=self.n_downsampling, out_layer=self.out_layer,
            s2d_head=self.s2d_head, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, train: bool = False):
        feats = self.encoder(x, train=train)
        rec = self.decoder(feats, train=train)
        return rec, feats

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.encoder(x, train=train)

    def decode(self, feats: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.decoder(feats, train=train)
