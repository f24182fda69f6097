"""Feature Pyramid Network.

Replaces torchvision's ``BackboneWithFPN`` + ``LastLevelMaxPool`` used by every
reference R-CNN factory (``/root/reference/models/detection/rcnn.py:46-164``):
lateral 1×1 convs, nearest-neighbor top-down pathway, 3×3 smoothing convs, and an
extra stride-2 max-pool level (``p6``) for the RPN.

NHWC; all shapes static given the input size.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .quant import ActQuant, QuantConv


def _upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (B, H, 2, W, 2, C)
    ).reshape(B, 2 * H, 2 * W, C)


class FPN(nn.Module):
    """``{'c2'..'c5'} -> {'p2'..'p6'}`` with ``out_channels`` everywhere.

    ``quant`` (None | "calibrate" | "int8"): serving int8 PTQ path for the
    lateral 1×1 and smoothing 3×3 convs (``models/quant.py`` — same params
    tree as the float path, torchvision converters untouched). Top-down adds
    stay in the compute dtype.
    """

    out_channels: int = 256
    in_levels: Sequence[str] = ("c2", "c3", "c4", "c5")
    add_p6: bool = True
    dtype: Any = jnp.float32
    quant: Any = None

    @nn.compact
    def __call__(self, feats: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
        if self.quant is not None:
            cal = self.quant == "calibrate"

            def conv1x1(i):
                return QuantConv(self.out_channels, (1, 1), dtype=self.dtype,
                                 use_bias=True, calibrate=cal,
                                 name=f"inner_{i}")

            def conv3x3(i):
                return QuantConv(self.out_channels, (3, 3),
                                 padding=((1, 1), (1, 1)), dtype=self.dtype,
                                 use_bias=True, calibrate=cal,
                                 name=f"layer_{i}")
        else:
            def conv1x1(i):
                return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name=f"inner_{i}")

            def conv3x3(i):
                return nn.Conv(self.out_channels, (3, 3),
                               padding=[(1, 1), (1, 1)], dtype=self.dtype,
                               name=f"layer_{i}")

        laterals = []
        for i, lvl in enumerate(self.in_levels):
            x = feats[lvl]
            if self.quant is not None:
                xq, s = ActQuant(calibrate=self.quant == "calibrate",
                                 name=f"inner_q{i}")(x)
                laterals.append(conv1x1(i)(xq, s))
            else:
                laterals.append(conv1x1(i)(x))
        # top-down: start at the coarsest level
        merged = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = _upsample_nearest_2x(merged[0])
            # crop in case of odd sizes (static slice)
            up = up[:, : lat.shape[1], : lat.shape[2], :]
            merged.insert(0, lat + up)
        outs = {}
        for i, (lvl, m) in enumerate(zip(self.in_levels, merged)):
            p = f"p{int(lvl[1:])}"
            if self.quant is not None:
                mq, s = ActQuant(calibrate=self.quant == "calibrate",
                                 name=f"layer_q{i}")(m)
                outs[p] = conv3x3(i)(mq, s)
            else:
                outs[p] = conv3x3(i)(m)
        if self.add_p6:
            top = f"p{int(self.in_levels[-1][1:])}"
            outs[f"p{int(self.in_levels[-1][1:]) + 1}"] = nn.max_pool(
                outs[top], (1, 1), strides=(2, 2)
            )
        return outs


class BackboneWithFPN(nn.Module):
    """Backbone (``features_only``) + FPN, the detection trunk."""

    backbone: nn.Module
    out_channels: int = 256
    in_levels: Sequence[str] = ("c2", "c3", "c4", "c5")
    add_p6: bool = True
    dtype: Any = jnp.float32
    quant: Any = None  # FPN convs only; the backbone carries its own flag

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train=train)
        return FPN(self.out_channels, self.in_levels, self.add_p6,
                   dtype=self.dtype, quant=self.quant, name="fpn")(feats)
