"""InceptionI3d in Flax (NDHWC) for FVD feature extraction.

Port of the I3D architecture (reference utils/pytorch_i3d.py:7-322, itself
from piergiaj/pytorch-i3d) used by the reference's FVD pipeline
(utils/fvd.py): the 400-d Kinetics logits (spatially and temporally averaged,
pre-softmax) are the FVD features. Weights are converted from a released
PyTorch/torchscript checkpoint by tools/torch_converter.py — this module only
defines the architecture.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class Unit3D(nn.Module):
    """3D conv + BN + ReLU with TF-style SAME padding."""

    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding="SAME", use_bias=self.use_bias, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3d")(x)
        if self.use_bn:
            # always inference mode: running statistics from the converted
            # checkpoint (FVD never trains the I3D). eps matches the
            # reference exactly (utils/pytorch_i3d.py:69: eps=1e-5).
            x = nn.BatchNorm(use_running_average=True, momentum=0.999,
                             epsilon=1e-5, dtype=jnp.float32,
                             name="bn")(x).astype(self.dtype)
        if self.activation:
            x = nn.relu(x)
        return x


def _max_pool_same(x, window, strides):
    """TF-SAME max pooling over (D, H, W) of an NDHWC tensor."""
    pads = []
    for size, w, s in zip(x.shape[1:4], window, strides):
        out = -(-size // s)
        total = max((out - 1) * s + w - size, 0)
        pads.append((total // 2, total - total // 2))
    return nn.max_pool(x, window, strides=strides,
                       padding=pads)


class InceptionBlock(nn.Module):
    """Four-branch inception module: 1×1 | 1×1→3×3 | 1×1→3×3 | pool→1×1."""

    out_channels: Sequence[int]  # (b0, b1a, b1b, b2a, b2b, b3b)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.out_channels
        b0 = Unit3D(c[0], dtype=self.dtype, name="b0")(x)
        b1 = Unit3D(c[1], dtype=self.dtype, name="b1a")(x)
        b1 = Unit3D(c[2], (3, 3, 3), dtype=self.dtype, name="b1b")(b1)
        b2 = Unit3D(c[3], dtype=self.dtype, name="b2a")(x)
        b2 = Unit3D(c[4], (3, 3, 3), dtype=self.dtype, name="b2b")(b2)
        b3 = _max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(c[5], dtype=self.dtype, name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# endpoint table: (name, module spec)
_INCEPTION_CHANNELS = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


class InceptionI3d(nn.Module):
    """Video (N, T, H, W, 3) in [-1, 1] → 400-d logits features (N, 400)."""

    num_classes: int = 400
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype,
                   name="Conv3d_1a_7x7")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, dtype=self.dtype, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype, name="Conv3d_2c_3x3")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = InceptionBlock(_INCEPTION_CHANNELS["Mixed_3b"], self.dtype,
                           name="Mixed_3b")(x)
        x = InceptionBlock(_INCEPTION_CHANNELS["Mixed_3c"], self.dtype,
                           name="Mixed_3c")(x)
        x = _max_pool_same(x, (3, 3, 3), (2, 2, 2))
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                     "Mixed_4f"):
            x = InceptionBlock(_INCEPTION_CHANNELS[name], self.dtype,
                               name=name)(x)
        x = _max_pool_same(x, (2, 2, 2), (2, 2, 2))
        x = InceptionBlock(_INCEPTION_CHANNELS["Mixed_5b"], self.dtype,
                           name="Mixed_5b")(x)
        x = InceptionBlock(_INCEPTION_CHANNELS["Mixed_5c"], self.dtype,
                           name="Mixed_5c")(x)
        # the reference's exact head (utils/pytorch_i3d.py:276-315):
        # AvgPool3d([2, 7, 7], stride 1, VALID) → dropout (eval: identity) →
        # 1×1×1 logits conv → spatial squeeze → temporal mean. The temporal
        # kernel-2 pooling half-weights the endpoint frames relative to a
        # plain temporal mean, so it cannot be replaced by a global average.
        kt = min(2, x.shape[1])
        kh = min(7, x.shape[2])
        kw = min(7, x.shape[3])
        x = nn.avg_pool(x, (kt, kh, kw), strides=(1, 1, 1), padding="VALID")
        x = Unit3D(self.num_classes, use_bn=False, activation=False,
                   use_bias=True, dtype=self.dtype, name="logits")(x)
        # (N, T'-1, H', W', 400): squeeze spatial, temporal mean → (N, 400)
        return jnp.mean(x, axis=(1, 2, 3)).astype(jnp.float32)
