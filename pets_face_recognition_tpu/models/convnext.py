"""ConvNeXt backbones (flax, NHWC).

The reference builds Faster/Keypoint R-CNNs on torchvision ``convnext_tiny``
features (``/root/reference/models/detection/rcnn.py:46-101``) and lists ConvNeXt
as an FE alternative (``configs/cat_fe/cat_fe_head.py:106-107``). Structure follows
the ConvNeXt paper / torchvision: 4×4/4 patchify stem + LayerNorm, stages of
(dwconv7×7 → LN → 4× pointwise → GELU → pointwise → layer-scale) blocks with
2×2/2 LN-downsample between stages.

NHWC is the natural layout here — the 7×7 depthwise conv and the pointwise MLPs
are exactly TPU-friendly (channels in lanes, pointwise = MXU matmul).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=self.dim, dtype=self.dtype,
                    name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale),
                           (self.dim,), jnp.float32)
        return x + y * gamma


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_classes: int = 0
    features_only: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="stem_norm")(x)
        feats = {}
        for s in range(4):
            if s > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                 name=f"downsample_norm{s}")(x)
                x = nn.Conv(self.dims[s], (2, 2), strides=(2, 2),
                            dtype=self.dtype, name=f"downsample_conv{s}")(x)
            for b in range(self.depths[s]):
                x = ConvNeXtBlock(self.dims[s], dtype=self.dtype,
                                  name=f"stage{s}_block{b}")(x)
            feats[f"c{s + 2}"] = x
        if self.features_only:
            return feats
        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="head_norm")(x)
        if self.num_classes:
            x = nn.Dense(self.num_classes, dtype=jnp.float32, name="head_fc")(x)
        return x


def convnext_tiny(**kw) -> ConvNeXt:
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), **kw)


def convnext_small(**kw) -> ConvNeXt:
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768), **kw)
