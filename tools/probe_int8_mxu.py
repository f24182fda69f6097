"""Probe: does XLA lower int8x int8 -> int32 convs to the 2x-rate int8 MXU
path on this chip, and at which shapes?

Times bf16 vs int8 `conv_general_dilated` on the exact conv shapes that
dominate the quality pipeline (PERF.md): the RPN shared 3x3 at p2
(80^2 x 256ch), the FPN lateral 1x1s, the FPN smoothing 3x3s, a trunk
bottleneck 3x3 (stage-2 shape), and the keypoint-head 3x3 @14^2 x512.

bench.py-style timing (dispatch N, one sync at the end) per CLAUDE.md's
axon timing traps. Run on the real TPU: `python tools/probe_int8_mxu.py`.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from pets_face_recognition_tpu.utils import enable_compilation_cache

enable_compilation_cache()

B = 128
SHAPES = [
    # (name, (H, W, Cin), (kh, kw, Cout), stride)
    ("rpn_p2_3x3_80x80x256", (80, 80, 256), (3, 3, 256), 1),
    ("fpn_lat_1x1_80x80x256", (80, 80, 256), (1, 1, 256), 1),
    ("fpn_smooth_3x3_40x40x256", (40, 40, 256), (3, 3, 256), 1),
    ("trunk_s2_3x3_40x40x128", (40, 40, 128), (3, 3, 128), 1),
    ("kp_head_3x3_14x14x512", (14, 14, 512), (3, 3, 512), 1),
]


def timeit(fn, x, iters=30, passes=3):
    out = fn(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    rng = np.random.RandomState(0)
    for name, (h, w, cin), (kh, kw, cout), s in SHAPES:
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        x_f = jnp.asarray(rng.rand(B, h, w, cin), jnp.bfloat16)
        k_f = jnp.asarray(rng.rand(kh, kw, cin, cout), jnp.bfloat16)
        x_i = jnp.asarray(rng.randint(-127, 128, (B, h, w, cin)), jnp.int8)
        k_i = jnp.asarray(rng.randint(-127, 128, (kh, kw, cin, cout)), jnp.int8)

        @jax.jit
        def conv_bf16(x, k=k_f):
            return jax.lax.conv_general_dilated(
                x, k, window_strides=(s, s), padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        @jax.jit
        def conv_int8(x, k=k_i):
            return jax.lax.conv_general_dilated(
                x, k, window_strides=(s, s), padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )

        # int8 conv + the dequant epilogue + requant of the result (what a
        # mid-network int8 layer actually pays when its consumer is int8 too)
        sc = jnp.float32(0.01)

        @jax.jit
        def conv_int8_rq(x, k=k_i):
            y = jax.lax.conv_general_dilated(
                x, k, window_strides=(s, s), padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            yf = y.astype(jnp.float32) * sc
            q = jnp.clip(jnp.round(yf * 127.0), -127.0, 127.0)
            return q.astype(jnp.int8)

        t_f = timeit(conv_bf16, x_f)
        t_i = timeit(conv_int8, x_i)
        t_rq = timeit(conv_int8_rq, x_i)
        flops = 2 * B * (h // s) * (w // s) * kh * kw * cin * cout
        print(f"{name}: bf16 {t_f*1e3:7.3f} ms ({flops/t_f/1e12:6.1f} TF/s) | "
              f"int8 {t_i*1e3:7.3f} ms ({flops/t_i/1e12:6.1f} TOP/s) | "
              f"int8+requant {t_rq*1e3:7.3f} ms | ratio int8/bf16 "
              f"{t_i/t_f:4.2f}", flush=True)


if __name__ == "__main__":
    main()
