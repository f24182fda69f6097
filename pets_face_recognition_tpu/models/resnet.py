"""ResNet backbones (flax.linen, NHWC).

The production feature extractor of the reference is torchvision ``resnet50`` with its
``fc`` swapped for ``Linear(2048, 512)`` (``configs/cat_fe/cat_fe_head.py:101-102``),
and the detection backbone is ResNet-50 + FPN (``configs/mask/mask_rcnn_config.py:60-79``).

This implementation is layout- and naming-compatible with torchvision's ResNet so the
reference's pretrained/checkpointed weights can be converted tensor-for-tensor
(see ``utils/torch_convert.py``): same stage widths, stride placement (stride on the
3×3 conv of each bottleneck, torchvision v1.5+ convention), and BatchNorm epsilon.

TPU-first choices: NHWC layout (lane dim = channels), optional bfloat16 compute dtype
with float32 params/stats, and a ``features_only`` mode returning the C2..C5 pyramid
for FPN consumption.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .quant import ActQuant, QuantConv

ModuleDef = Any


def _dequant(xq, s_x, dtype):
    """int8 activation → compute dtype (symmetric scale-127)."""
    return (xq.astype(jnp.float32) * (s_x / 127.0)).astype(dtype)


class Bottleneck(nn.Module):
    """1x1 → 3x3(stride) → 1x1 bottleneck with identity/projection shortcut.

    ``quant`` (None | "calibrate" | "int8") selects the serving int8 path
    (see ``models/quant.py``). Both quant modes declare the same tree as the
    float path's ``nn.Conv`` modules (``convN/kernel``), so torchvision
    checkpoint conversion is unchanged. In int8 mode the block input is
    quantized ONCE (``in_q``) and consumed by conv1, the projection shortcut,
    *and* the identity residual — so the inter-block tensor has a single
    bfloat16 consumer and XLA materializes it int8-only (activation HBM ÷2).
    """

    features: int  # bottleneck width; output is 4x this
    stride: int = 1
    dtype: Any = jnp.float32
    norm: ModuleDef = nn.BatchNorm
    quant: Any = None

    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        out_ch = self.features * self.expansion
        if self.quant is not None:
            calibrate = self.quant == "calibrate"
            qconv = partial(QuantConv, dtype=self.dtype, calibrate=calibrate)
            xq, s_x = ActQuant(calibrate=calibrate, name="in_q")(x)
            y = qconv(self.features, name="conv1")(xq, s_x)
            y = self.norm(name="bn1")(y)
            y = nn.relu(y)
            yq, s1 = ActQuant(calibrate=calibrate, name="q1")(y)
            y = qconv(self.features, (3, 3),
                      strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], name="conv2")(yq, s1)
            y = self.norm(name="bn2")(y)
            y = nn.relu(y)
            yq2, s2 = ActQuant(calibrate=calibrate, name="q2")(y)
            y = qconv(out_ch, name="conv3")(yq2, s2)
            y = self.norm(name="bn3")(y)
            if x.shape[-1] != out_ch or self.stride != 1:
                residual = qconv(out_ch, strides=(self.stride, self.stride),
                                 name="downsample_conv")(xq, s_x)
                residual = self.norm(name="downsample_bn")(residual)
            elif not calibrate:
                residual = _dequant(xq, s_x, self.dtype)
            else:
                residual = x.astype(self.dtype)
            return nn.relu(y + residual)

        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)

        y = conv(self.features, (1, 1), name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), strides=(self.stride, self.stride),
                 padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(out_ch, (1, 1), name="conv3")(y)
        y = self.norm(name="bn3")(y)

        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                            name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    """3x3 → 3x3 block (ResNet-18/34). Same ``quant`` contract as Bottleneck."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32
    norm: ModuleDef = nn.BatchNorm
    quant: Any = None

    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        if self.quant is not None:
            calibrate = self.quant == "calibrate"
            qconv = partial(QuantConv, dtype=self.dtype, calibrate=calibrate)
            xq, s_x = ActQuant(calibrate=calibrate, name="in_q")(x)
            y = qconv(self.features, (3, 3),
                      strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], name="conv1")(xq, s_x)
            y = self.norm(name="bn1")(y)
            y = nn.relu(y)
            yq, s1 = ActQuant(calibrate=calibrate, name="q1")(y)
            y = qconv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                      name="conv2")(yq, s1)
            y = self.norm(name="bn2")(y)
            if x.shape[-1] != self.features or self.stride != 1:
                residual = qconv(self.features,
                                 strides=(self.stride, self.stride),
                                 name="downsample_conv")(xq, s_x)
                residual = self.norm(name="downsample_bn")(residual)
            elif not calibrate:
                residual = _dequant(xq, s_x, self.dtype)
            else:
                residual = x.astype(self.dtype)
            return nn.relu(y + residual)

        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        y = conv(self.features, (3, 3), strides=(self.stride, self.stride),
                 padding=[(1, 1), (1, 1)], name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = self.norm(name="bn2")(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = conv(self.features, (1, 1),
                            strides=(self.stride, self.stride),
                            name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class _StemKernel(nn.Module):
    """Holds the stem kernel under the same tree as ``nn.Conv`` (conv1/kernel)."""

    in_ch: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, self.in_ch, 64), jnp.float32,
        )


def _fused_stem_conv(x, kernel, dtype):
    """7×7/s2 stem as an exact space-to-depth 4×4/s1 conv (see call site)."""
    import jax

    B, H, W, C = x.shape
    # fold 2x2 blocks into channels: y[a, b, (p, q, c)] = x[2a+p, 2b+q, c]
    y = x.reshape(B, H // 2, 2, W // 2, 2, C)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(B, H // 2, W // 2, 4 * C)
    # pad kernel 7→8 with a leading zero row/col, regroup to (4, 4, 4C, 64):
    # W8[2u+p, 2v+q, c, o] → K[u, v, (p, q, c), o]
    k8 = jnp.pad(kernel.astype(dtype), ((1, 0), (1, 0), (0, 0), (0, 0)))
    k = k8.reshape(4, 2, 4, 2, C, 64)
    k = jnp.transpose(k, (0, 2, 1, 3, 4, 5)).reshape(4, 4, 4 * C, 64)
    # NOTE: no preferred_element_type here — a float32 accumulator type with
    # bfloat16 operands breaks the conv transpose rule under autodiff (the
    # float32 cotangent meets the bfloat16 kernel). The MXU accumulates in
    # float32 internally either way.
    return jax.lax.conv_general_dilated(
        y.astype(dtype), k,
        window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class ResNet(nn.Module):
    """torchvision-compatible ResNet.

    Args:
      stage_sizes: blocks per stage, e.g. (3, 4, 6, 3) for ResNet-50.
      block: Bottleneck or BasicBlock.
      num_classes: size of the final dense layer; 0 disables the head.
      features_only: return dict of {'c2','c3','c4','c5'} pyramid features.
      frozen_stats: BatchNorm always uses running stats (torchvision detection's
        FrozenBatchNorm2d behavior, /root/reference/models/detection/rcnn.py:7,22).
      quant: None | "calibrate" | "int8" — serving int8 path (models/quant.py).
        Build a "calibrate" twin and an "int8" twin of the same architecture;
        init/apply the calibrate twin (mutable=["quant"]) over representative
        batches, then apply the int8 twin with the resulting variables. The
        stem stays in the compute dtype (3-channel convs are MXU-starved
        anyway, PERF.md); all stage blocks run int8.
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    block: Callable = Bottleneck
    num_classes: int = 0
    dtype: Any = jnp.float32
    features_only: bool = False
    frozen_stats: bool = False
    fused_stem: bool = True
    quant: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_ra = (not train) or self.frozen_stats
        # When running from frozen/running stats, BN is an affine scale+shift:
        # run it in the compute dtype so conv→BN→relu chains stay bfloat16 end
        # to end (an f32 BN output doubles activation HBM traffic — measured
        # ~40% of backbone time at B=128). Batch-stat computation (train mode
        # with live stats) stays float32 for stable mean/var.
        norm = partial(
            nn.BatchNorm,
            use_running_average=use_ra,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype if use_ra else jnp.float32,
        )
        if self.fused_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # Space-to-depth stem: the 7×7/s2 conv on 3 channels runs the MXU at
            # ~5 TF/s (contraction dim 3·49, measured). Exact reformulation: pad
            # the kernel to 8×8 (zero row/col in FRONT, shifting the effective
            # padding 3→4), fold 2×2 pixel blocks into channels, and convolve
            # 4×4/s1 with padding (2, 1) — identical outputs, contraction dim
            # 192, ~12× faster. The parameter keeps the standard (7,7,C,64)
            # nn.Conv tree (``conv1/kernel``) so checkpoints are interchangeable
            # with the plain stem.
            kernel = _StemKernel(in_ch=x.shape[-1], name="conv1")()
            x = _fused_stem_conv(x, kernel, self.dtype)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = {}
        widths = (64, 128, 256, 512)
        for stage, (n_blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            for i in range(n_blocks):
                stride = 2 if (i == 0 and stage > 0) else 1
                x = self.block(
                    width, stride=stride, dtype=self.dtype, norm=norm,
                    quant=self.quant, name=f"layer{stage + 1}_{i}",
                )(x)
            feats[f"c{stage + 2}"] = x

        if self.features_only:
            return feats

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        if self.num_classes:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(
                x.astype(jnp.float32)
            )
        return x


def resnet50(num_classes: int = 0, **kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck,
                  num_classes=num_classes, **kw)


def resnet34(num_classes: int = 0, **kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block=BasicBlock,
                  num_classes=num_classes, **kw)


def resnet18(num_classes: int = 0, **kw) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block=BasicBlock,
                  num_classes=num_classes, **kw)
