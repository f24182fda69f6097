"""MobileNetV3-Large backbone (flax, NHWC).

The reference's lightweight detector variants build on torchvision
``mobilenet_v3_large`` features (``/root/reference/models/detection/rcnn.py:13-43,
104-126``). Standard MBV3-Large recipe (Howard et al.): hard-swish stem, inverted
residual blocks with optional squeeze-excite and hard-sigmoid gating; the feature
pyramid taps the stride-{4, 8, 16, 32} block outputs as ``c2..c5``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _hard_sigmoid(x):
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def _hard_swish(x):
    return x * _hard_sigmoid(x)


class SqueezeExcite(nn.Module):
    channels: int
    squeeze: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), dtype=self.dtype,
                            name="fc1")(s))
        s = _hard_sigmoid(nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                                  name="fc2")(s))
        return x * s


class InvertedResidual(nn.Module):
    exp: int
    out: int
    kernel: int
    stride: int
    use_se: bool
    use_hs: bool
    dtype: Any = jnp.float32
    frozen_stats: bool = False
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _hard_swish if self.use_hs else nn.relu
        use_ra = (not train) or self.frozen_stats
        # eval-mode BN is scale+shift: keep it in compute dtype so the block
        # stays bfloat16 end to end (see resnet.py BN note); batch-stat
        # training mode stays float32
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=use_ra, momentum=self.bn_momentum,
            epsilon=1e-3,
            dtype=jnp.float32 if not use_ra else self.dtype, name=name)
        inp = x.shape[-1]
        y = x
        if self.exp != inp:
            y = act(norm("bn_expand")(
                nn.Conv(self.exp, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand")(y)))
        pad = (self.kernel - 1) // 2
        y = act(norm("bn_dw")(
            nn.Conv(self.exp, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=self.exp, use_bias=False,
                    dtype=self.dtype, name="dwconv")(y)))
        if self.use_se:
            y = SqueezeExcite(self.exp, max(self.exp // 4, 8),
                              dtype=self.dtype, name="se")(y)
        y = norm("bn_project")(
            nn.Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(y))
        if self.stride == 1 and inp == self.out:
            y = y + x
        return y


# (expansion, out, kernel, stride, SE, hard-swish) — MBV3-Large table.
_MBV3_LARGE: Sequence[tuple] = (
    (16, 16, 3, 1, False, False),
    (64, 24, 3, 2, False, False),   # -> stride 4 after this block
    (72, 24, 3, 1, False, False),   # c2 tap
    (72, 40, 5, 2, True, False),
    (120, 40, 5, 1, True, False),
    (120, 40, 5, 1, True, False),   # c3 tap (stride 8)
    (240, 80, 3, 2, False, True),
    (200, 80, 3, 1, False, True),
    (184, 80, 3, 1, False, True),
    (184, 80, 3, 1, False, True),
    (480, 112, 3, 1, True, True),
    (672, 112, 3, 1, True, True),   # c4 tap (stride 16)
    (672, 160, 5, 2, True, True),
    (960, 160, 5, 1, True, True),
    (960, 160, 5, 1, True, True),   # c5 tap (stride 32)
)
_TAPS = {2: "c2", 5: "c3", 11: "c4", 14: "c5"}


class _StemKernel(nn.Module):
    """Holds the stem kernel under the same tree as ``nn.Conv`` (stem/kernel)."""

    in_ch: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_ch, 16), jnp.float32,
        )


def _fused_stem_conv(x, kernel, dtype):
    """3×3/s2 stem as an exact space-to-depth 2×2/s1 conv.

    Same trick as ``resnet._fused_stem_conv``: a 3-channel stride-2 conv runs
    the MXU at ~5 TF/s (contraction dim 27); folding 2×2 pixel blocks into
    channels makes it a 2×2/s1 conv with contraction dim 48 over half the
    spatial grid. Kernel padded 3→4 with a leading zero row/col (shifting the
    effective padding 1→2, compensated by block padding (1, 0)).
    """
    B, H, W, C = x.shape
    y = x.reshape(B, H // 2, 2, W // 2, 2, C)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(B, H // 2, W // 2, 4 * C)
    k4 = jnp.pad(kernel.astype(dtype), ((1, 0), (1, 0), (0, 0), (0, 0)))
    k = k4.reshape(2, 2, 2, 2, C, 16)
    k = jnp.transpose(k, (0, 2, 1, 3, 4, 5)).reshape(2, 2, 4 * C, 16)
    return jax.lax.conv_general_dilated(
        y.astype(dtype), k,
        window_strides=(1, 1),
        padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class MobileNetV3Large(nn.Module):
    num_classes: int = 0
    features_only: bool = False
    dtype: Any = jnp.float32
    frozen_stats: bool = False
    # torchvision MobileNetV3 BN momentum is torch 0.01 == flax 0.99 — tuned
    # for ImageNet-length pretraining. Short from-scratch recipes (the smoke
    # configs) must LOWER it: after ~200 steps, 0.99 leaves ~11% of the
    # identity init in the running stats, which compounds per layer into a
    # train/eval distribution shift that pins eval AP at 0 (measured: RPN
    # max logit 9.3 with batch stats vs -2.3 with running averages on the
    # same trained weights).
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_ra = (not train) or self.frozen_stats
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=use_ra, momentum=self.bn_momentum,
            epsilon=1e-3,
            dtype=jnp.float32 if not use_ra else self.dtype, name=name)
        if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            kernel = _StemKernel(in_ch=x.shape[-1], name="stem")()
            x = _fused_stem_conv(x, kernel, self.dtype)
        else:
            x = nn.Conv(16, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype, name="stem")(x)
        x = _hard_swish(norm("bn_stem")(x))
        feats = {}
        for i, (exp, out, k, s, se, hs) in enumerate(_MBV3_LARGE):
            x = InvertedResidual(exp, out, k, s, se, hs, dtype=self.dtype,
                                 frozen_stats=self.frozen_stats,
                                 bn_momentum=self.bn_momentum,
                                 name=f"block{i}")(x, train=train)
            if i in _TAPS:
                feats[_TAPS[i]] = x
        if self.features_only:
            return feats
        x = _hard_swish(norm("bn_head")(
            nn.Conv(960, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)))
        x = jnp.mean(x, axis=(1, 2))
        x = _hard_swish(nn.Dense(1280, dtype=self.dtype, name="head_fc1")(x))
        if self.num_classes:
            x = nn.Dense(self.num_classes, dtype=jnp.float32,
                         name="head_fc2")(x)
        return x


def mobilenet_v3_large(**kw) -> MobileNetV3Large:
    return MobileNetV3Large(**kw)
