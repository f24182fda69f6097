"""Post-training symmetric int8 quantization for serving backbones.

TPU v5e MXUs run int8×int8→int32 at 2× the bfloat16 rate, and int8-resident
activations/weights halve HBM traffic — the two ceilings PERF.md's roofline
analysis identified for the ResNet-50 pipelines (backbone stages 1–2 sit AT
the HBM roofline; stage 3 and the FPN/RPN are MXU-bound). This module gives
the existing flax backbones an opt-in int8 inference path without touching
their parameter trees:

- ``QuantConv`` keeps the standard float32 ``kernel`` param (so torchvision
  checkpoints convert exactly as before) and adds a ``"quant"`` variable
  collection holding the int8 kernel, per-output-channel weight scales, and
  the calibrated input activation scale.
- Quantization is *symmetric* (scale-127, no zero point) for both weights
  (per-channel, axis=-1) and activations (per-tensor): dequantization is one
  fused scalar/row multiply, no zero-point correction terms — the same
  trade measured best for the Pallas warp kernel (PERF.md round 2).
- Calibration is a module *attribute*, not a call argument, so nothing in the
  call chain (FPN, R-CNN, embedder) needs new plumbing: build one module tree
  with ``quant="calibrate"`` and a twin with ``quant="int8"``; ``init`` /
  ``apply(..., mutable=["quant"])`` of the calibrate twin runs the real
  bfloat16 forward while recording max-abs activation ranges and snapshotting
  the int8 kernels; the int8 twin then consumes the same variables.

Accuracy class: per-channel int8 weights + per-tensor int8 activations is the
standard PTQ recipe for ResNets (sub-1% top-1 on ImageNet in the literature);
``tests/test_quant.py`` pins the numeric error on this implementation and the
serving bench measures the end-to-end retrieval-embedding drift.

No reference counterpart: the reference serves float32 torch models
(``/root/reference/models/detection/rcnn.py``); this is TPU-native headroom.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

QUANT_COLLECTION = "quant"


def quantize_symmetric(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """``clip(round(x * 127/scale))`` → int8. ``scale`` is max-abs (f32)."""
    q = jnp.round(x.astype(jnp.float32) * (127.0 / scale))
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


class ActQuant(nn.Module):
    """Activation quantization point.

    ``calibrate=True``: passes ``x`` through unchanged while folding its
    max-abs into the stored scale (running max over calibration batches).
    ``calibrate=False``: returns ``(int8(x), scale)``.
    """

    calibrate: bool = False

    @nn.compact
    def __call__(self, x):
        scale = self.variable(
            QUANT_COLLECTION, "scale", lambda: jnp.ones((), jnp.float32)
        )
        if self.calibrate:
            observed = jnp.max(jnp.abs(x.astype(jnp.float32)))
            # running max, but ignore the init value on the first batch
            first = self.variable(
                QUANT_COLLECTION, "seen", lambda: jnp.zeros((), jnp.bool_)
            )
            scale.value = jnp.maximum(
                jnp.where(first.value, scale.value, 0.0),
                jnp.maximum(observed, 1e-6),
            )
            first.value = jnp.ones((), jnp.bool_)
            return x, scale.value
        # declare "seen" in both modes so the variable trees match
        self.variable(QUANT_COLLECTION, "seen", lambda: jnp.zeros((), jnp.bool_))
        return quantize_symmetric(x, scale.value), scale.value


class QuantConv(nn.Module):
    """Conv with a float32 ``kernel`` param (torchvision-compatible tree) and
    an int8 execution path.

    ``calibrate=True``: runs the conv in ``dtype`` (the real serving path) and
    snapshots ``kernel_q`` (int8) + ``w_scale`` (per-out-channel max-abs).
    ``calibrate=False``: expects ``(x_int8, s_x)`` from :class:`ActQuant`,
    convolves on the int8 MXU path with an int32 accumulator, and dequantizes
    with one per-channel multiply (fused by XLA into the conv epilogue).
    """

    features: int
    kernel_size: Sequence[int] = (1, 1)
    strides: Sequence[int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    dtype: Any = jnp.bfloat16
    calibrate: bool = False
    use_bias: bool = False  # bias added post-dequant (fused epilogue)

    @nn.compact
    def __call__(self, x, s_x=None):
        cin = x.shape[-1]
        kshape = (*self.kernel_size, cin, self.features)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), kshape, jnp.float32
        )
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        kernel_q = self.variable(
            QUANT_COLLECTION, "kernel_q", lambda: jnp.zeros(kshape, jnp.int8)
        )
        w_scale = self.variable(
            QUANT_COLLECTION, "w_scale",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        if self.calibrate:
            ws = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12)
            w_scale.value = ws
            kernel_q.value = quantize_symmetric(kernel, ws)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=tuple(self.strides), padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(self.dtype) if bias is not None else y
        assert x.dtype == jnp.int8, "int8 mode expects ActQuant output"
        yq = jax.lax.conv_general_dilated(
            x, kernel_q.value,
            window_strides=tuple(self.strides), padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        # dequant in f32 (int32→bf16 direct would round 8-bit-mantissa-style
        # on top of the quantization error), cast once at the end; XLA fuses
        # the whole epilogue into one pass
        scale = (s_x * w_scale.value) * (1.0 / (127.0 * 127.0))
        y = yq.astype(jnp.float32) * scale
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)
