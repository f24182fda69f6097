"""Pallas TPU kernel: batched affine warp (the alignment hot path).

XLA lowers image warps to arbitrary-index gathers, which run at ~2 ms/image on
v5e regardless of layout (measured; channel padding does not help). This kernel
computes the exact 4-corner bilinear warp with **no gathers**:

- the source image lives in VMEM transposed to ``(W, H·4)`` (channels padded to 4
  so the lane dimension is 128-aligned and y-bands can be lane-sliced);
- for each output row, the x-interpolation is a one-hot-weighted matmul
  ``Wx (out_w, W) @ band (W, BAND·4)`` on the MXU — the 2-non-zero weight rows
  are built in-kernel from iota comparisons;
- the y-interpolation is an elementwise masked reduction over the band followed
  by a tiny channel-selector matmul.

Semantics: ``out[i, j] = img[p·i + q·j + r, s·i + t·j + u]`` bilinear,
BORDER_CONSTANT zero — identical to ``warp_perspective`` for affine H (which the
centroid-augmented alignment homography always is; see ``homography.align_crop``).

Limit: the y-band per 8-row block is static (``BAND`` rows). Rotations with
``|q|·out_w + 8·|p| + 4 > BAND`` clamp at the band edge; at the default
``BAND=160`` that admits rotations past ±30° at alignment scales — far beyond
anything the landmark validity checks let through.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_BLOCK = 8
BAND = 160


def _warp_kernel(h0_ref, coeff_ref, img_ref, out_ref, *, out_w, src_h, src_w,
                 band, n_blocks, mm_dtype):
    bi = pl.program_id(0)
    blk = pl.program_id(1)

    # coefficients ride scalar prefetch (SMEM), flattened (B*8,)
    p = coeff_ref[bi * 8 + 0]
    q = coeff_ref[bi * 8 + 1]
    r = coeff_ref[bi * 8 + 2]
    s = coeff_ref[bi * 8 + 3]
    t = coeff_ref[bi * 8 + 4]
    u = coeff_ref[bi * 8 + 5]

    h0 = h0_ref[bi * n_blocks + blk]
    band_lanes = band * 4
    # h0 is 32-aligned by construction; the hint lets Mosaic prove the
    # lane-dimension slice start is a multiple of 128
    h0l = pl.multiple_of(h0 * 4, 128)
    band_slab = img_ref[0, :, pl.ds(h0l, band_lanes)]  # (W, BAND*4)

    # hardware iota is int-only; cast after
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, out_w), 1)[0].astype(
        jnp.float32)
    xi = jax.lax.broadcasted_iota(jnp.int32, (out_w, src_w), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (out_w, band_lanes), 1)
    ybin = lane // 4
    chan = jax.lax.broadcasted_iota(jnp.int32, (band_lanes, 4), 0) % 4
    sel = (chan == jax.lax.broadcasted_iota(jnp.int32, (band_lanes, 4), 1)
           ).astype(jnp.float32)

    for rr in range(ROWS_PER_BLOCK):
        i = (blk * ROWS_PER_BLOCK + rr).astype(jnp.float32)
        sx = t * jj + (s * i + u)  # (out_w,)
        sy = q * jj + (p * i + r)

        x0 = jnp.floor(sx)
        fx = sx - x0
        x0i = x0.astype(jnp.int32)
        y0 = jnp.floor(sy)
        fy = sy - y0
        y0i = y0.astype(jnp.int32)

        # x one-hot weights; out-of-range x0 simply never matches the iota.
        # mm_dtype=bfloat16 (f32 accumulate) doubles the MXU rate at ~0.4%
        # pixel quantization — below JPEG noise; float32 is cv2-exact.
        x0b = x0i[:, None]
        wx = ((xi == x0b).astype(mm_dtype) * (1.0 - fx)[:, None].astype(mm_dtype)
              + (xi == x0b + 1).astype(mm_dtype) * fx[:, None].astype(mm_dtype))
        a = jnp.dot(wx, band_slab.astype(mm_dtype),
                    preferred_element_type=jnp.float32)
        # (out_w, BAND*4)

        # y 2-tap mask over the band; rows outside [0, band) auto-zero
        rel = (y0i - h0)[:, None]
        m = ((ybin == rel).astype(jnp.float32) * (1.0 - fy)[:, None]
             + (ybin == rel + 1).astype(jnp.float32) * fy[:, None])
        prod = a * m
        out_row = jnp.dot(prod, sel, preferred_element_type=jnp.float32)
        out_ref[0, 0, rr] = out_row  # (out_w, 4)


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "interpret", "compute_dtype", "band"),
)
def warp_affine_batch_pallas(
    images: jnp.ndarray,
    H: jnp.ndarray,
    out_size: tuple[int, int],
    interpret: bool = False,
    compute_dtype=jnp.float32,
    band: int = BAND,
) -> jnp.ndarray:
    """Batched affine inverse warp: ``(B, H, W, C<=4) × (B, 3, 3) → (B, oh, ow, C)``.

    ``H`` must be affine (perspective row ``[0, 0, 1]``); the caller projects the
    alignment homography (exactly affine, see module docstring).
    """
    B, src_h, src_w, C = images.shape
    oh, ow = out_size
    assert oh % ROWS_PER_BLOCK == 0, "output height must be divisible by 8"
    n_blocks = oh // ROWS_PER_BLOCK
    # MXU work scales with the band; serving can narrow it (multiple of 32,
    # rotation limit per the module docstring)
    assert band % 32 == 0, "band must be a multiple of 32"
    band = min(band, src_h)

    Minv = jnp.linalg.inv(H.astype(jnp.float32))
    # out[i, j] samples src at sy = p i + q j + r ; sx = s i + t j + u
    p = Minv[:, 1, 1]
    q = Minv[:, 1, 0]
    r = Minv[:, 1, 2]
    s = Minv[:, 0, 1]
    t = Minv[:, 0, 0]
    u = Minv[:, 0, 2]
    coeffs = jnp.stack(
        [p, q, r, s, t, u, jnp.zeros_like(p), jnp.zeros_like(p)], axis=1
    )  # (B, 8)

    # per-(image, block) 32-aligned band start from the block's corner extrema
    blk = jnp.arange(n_blocks, dtype=jnp.float32) * ROWS_PER_BLOCK
    corners_i = jnp.stack([blk, blk + ROWS_PER_BLOCK - 1], 1)  # (n_blocks, 2)
    corners_j = jnp.asarray([0.0, ow - 1.0])
    sy = (p[:, None, None, None] * corners_i[None, :, :, None]
          + q[:, None, None, None] * corners_j[None, None, None, :]
          + r[:, None, None, None])  # (B, n_blocks, 2, 2)
    sy_min = jnp.floor(sy.min(axis=(2, 3))) - 1.0
    h0 = jnp.clip(sy_min, 0.0, max(src_h - band, 0)).astype(jnp.int32)
    h0 = (h0 // 32) * 32  # lane-slice alignment (h0·4 must be 128-aligned)
    h0 = h0.reshape(-1)  # (B * n_blocks,)

    # transpose to (B, W, H, C4) and fold channels into lanes
    imgs4 = images.astype(jnp.float32)
    if C < 4:
        imgs4 = jnp.pad(imgs4, ((0, 0), (0, 0), (0, 0), (0, 4 - C)))
    imgs_t = jnp.transpose(imgs4, (0, 2, 1, 3)).reshape(B, src_w, src_h * 4)

    kernel = functools.partial(
        _warp_kernel, out_w=ow, src_h=src_h, src_w=src_w, band=band,
        n_blocks=n_blocks, mm_dtype=compute_dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, src_w, src_h * 4), lambda bi, ci, *_: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ROWS_PER_BLOCK, ow, 4),
            lambda bi, ci, *_: (bi, ci, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, n_blocks, ROWS_PER_BLOCK, ow, 4), jnp.float32
        ),
        interpret=interpret,
    )(h0, coeffs.reshape(-1), imgs_t)
    return out.reshape(B, oh, ow, 4)[..., :C]
