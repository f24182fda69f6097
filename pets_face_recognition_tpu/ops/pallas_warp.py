"""Pallas TPU kernel: batched affine warp (the alignment hot path).

XLA lowers image warps to arbitrary-index gathers, which run at ~2 ms/image on
v5e regardless of layout (measured; channel padding does not help). This kernel
computes the exact 4-corner bilinear warp with **no gathers**:

- the source image lives in VMEM transposed to ``(W, H·4)`` (channels padded to 4
  so the lane dimension is 128-aligned and y-bands can be lane-sliced);
- per ``rpb``-row output block, the x-interpolation for all rows is ONE stacked
  matmul ``Wx (rpb·out_w, W) @ band (W, BAND·4)`` on the MXU; the 2-tap bilinear
  weights are the tent function ``relu(1 - |grid - coord|)`` (exactly the
  one-hot construction, half the VPU cost of building one-hots);
- the y-interpolation is a small tent-weight matrix ``(rpb·out_w, BAND)``
  expanded to channel lanes by a constant matmul, an elementwise product, and a
  tiny channel-selector matmul producing channels in sublanes;
- the band is processed in two lane-halves so the float32 matmul accumulators
  stay within the 16 MB scoped-VMEM budget at ``rpb=16``.

Semantics: ``out[i, j] = img[p·i + q·j + r, s·i + t·j + u]`` bilinear,
BORDER_CONSTANT zero — identical to ``warp_perspective`` for affine H (which the
centroid-augmented alignment homography always is; see ``homography.align_crop``).

Limit: the y-band per ``rpb``-row block is static (``BAND`` rows). Rotations
with ``|q|·out_w + rpb·|p| + 4 > BAND`` clamp at the band edge; at the default
``BAND=160`` that admits rotations past ±25° at alignment scales — far beyond
anything the landmark validity checks let through.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND = 160


def _warp_kernel(h0_ref, coeff_ref, img_ref, out_ref, *, out_w, src_h, src_w,
                 band, n_blocks, mm_dtype, rpb):
    bi = pl.program_id(0)

    # coefficients ride scalar prefetch (SMEM), flattened (B*8,)
    p = coeff_ref[bi * 8 + 0]
    q = coeff_ref[bi * 8 + 1]
    r = coeff_ref[bi * 8 + 2]
    s = coeff_ref[bi * 8 + 3]
    t = coeff_ref[bi * 8 + 4]
    u = coeff_ref[bi * 8 + 5]

    blk = pl.program_id(1)
    band_lanes = band * 4
    R = rpb * out_w
    ridx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    jf = (ridx % out_w).astype(jnp.float32)                    # out col
    xi = jax.lax.broadcasted_iota(jnp.int32, (R, src_w), 1).astype(jnp.float32)

    h0 = h0_ref[bi * n_blocks + blk]
    # All rpb rows of the block are stacked into ONE (rpb*out_w, src_w) weight
    # matrix so the x-interpolation is a single big MXU matmul per band half.
    # Bilinear 2-tap weights are the tent function relu(1 - |grid - coord|):
    # exactly the one-hot construction (out-of-range coords get the same
    # zero-border partial weights). NOTE: a fully unrolled one-program-per-
    # image variant measured only ~6% faster standalone and blows the 16 MB
    # scoped-VMEM budget when fused into larger jits — keep (B, n_blocks).
    i = (ridx // out_w + blk * rpb).astype(jnp.float32)
    sx = t * jf + (s * i + u)                                  # (R, 1)
    sy = q * jf + (p * i + r)
    rel = sy - h0.astype(jnp.float32)

    wx = jnp.maximum(0.0, 1.0 - jnp.abs(xi - sx)).astype(mm_dtype)

    # process the band in lane-halves: f32 matmul accumulators are
    # materialized per half, keeping peak VMEM within the 16 MB budget
    n_halves = 2 if band_lanes >= 256 else 1
    hl = band_lanes // n_halves
    hb = hl // 4  # y rows per half
    acc = None
    for h in range(n_halves):
        # h0 is 32-aligned by construction; the hint lets Mosaic prove
        # the lane-dimension slice start is a multiple of 128
        start = pl.multiple_of(h0 * 4 + h * hl, 128)
        slab = img_ref[0, :, pl.ds(start, hl)]             # (W, hl)
        a = jnp.dot(wx, slab.astype(mm_dtype),
                    preferred_element_type=jnp.float32
                    ).astype(mm_dtype)                     # (R, hl)

        # y 2-tap tent over the small (R, hb) grid, expanded to channel
        # lanes by a constant matmul (cheaper than a (R, hl) VPU mask)
        yb = (jax.lax.broadcasted_iota(jnp.int32, (R, hb), 1) + h * hb
              ).astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(yb - rel)).astype(mm_dtype)
        eb = jax.lax.broadcasted_iota(jnp.int32, (hb, hl), 0)
        el = jax.lax.broadcasted_iota(jnp.int32, (hb, hl), 1)
        expand = (eb == el // 4).astype(mm_dtype)          # (hb, hl)
        m = jnp.dot(wy, expand,
                    preferred_element_type=jnp.float32).astype(mm_dtype)

        prod = (a * m).astype(mm_dtype)
        chan = jax.lax.broadcasted_iota(jnp.int32, (hl, 4), 0) % 4
        sel = (chan == jax.lax.broadcasted_iota(jnp.int32, (hl, 4), 1)
               ).astype(mm_dtype)
        # (4, R): channels in sublanes → VMEM block is not lane-padded
        part = jax.lax.dot_general(
            sel, prod, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    out_ref[0, 0] = acc


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
    # bf16 halves every buffer: twice the rows fit per program (fewer programs
    # → less per-program overhead); f32 stays at 8 to fit scoped VMEM
    rpb = 16 if compute_dtype == jnp.bfloat16 else 8
    while oh % rpb:
        rpb //= 2
    n_blocks = oh // rpb
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
    blk = jnp.arange(n_blocks, dtype=jnp.float32) * rpb
    corners_i = jnp.stack([blk, blk + rpb - 1], 1)  # (n_blocks, 2)
    corners_j = jnp.asarray([0.0, ow - 1.0])
    sy = (p[:, None, None, None] * corners_i[None, :, :, None]
          + q[:, None, None, None] * corners_j[None, None, None, :]
          + r[:, None, None, None])  # (B, n_blocks, 2, 2)
    sy_min = jnp.floor(sy.min(axis=(2, 3))) - 1.0
    h0 = jnp.clip(sy_min, 0.0, max(src_h - band, 0)).astype(jnp.int32)
    h0 = (h0 // 32) * 32  # lane-slice alignment (h0·4 must be 128-aligned)
    h0 = h0.reshape(-1)  # (B * n_blocks,)

    # transpose to (B, W, H, C4) and fold channels into lanes; pixel data rides
    # in compute dtype (bf16 halves the per-program image block)
    imgs4 = images.astype(compute_dtype)
    if C < 4:
        imgs4 = jnp.pad(imgs4, ((0, 0), (0, 0), (0, 0), (0, 4 - C)))
    imgs_t = jnp.transpose(imgs4, (0, 2, 1, 3)).reshape(B, src_w, src_h * 4)

    kernel = functools.partial(
        _warp_kernel, out_w=ow, src_h=src_h, src_w=src_w, band=band,
        n_blocks=n_blocks, mm_dtype=compute_dtype, rpb=rpb,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, src_w, src_h * 4), lambda bi, ci, *_: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 4, rpb * ow),
            lambda bi, ci, *_: (bi, ci, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, n_blocks, 4, rpb * ow), jnp.float32
        ),
        interpret=interpret,
    )(h0, coeffs.reshape(-1), imgs_t)
    out = jnp.transpose(out, (0, 1, 3, 2))  # (B, nb, rpb*ow, 4)
    return out.reshape(B, oh, ow, 4)[..., :C]


def _warp_kernel_v3(h0_ref, coeff_ref, img_ref, out_ref, *, out_w, src_h,
                    src_w, band, n_blocks, mm_dtype, rpb):
    bi = pl.program_id(0)
    blk = pl.program_id(1)

    p = coeff_ref[bi * 8 + 0]
    q = coeff_ref[bi * 8 + 1]
    r = coeff_ref[bi * 8 + 2]
    s = coeff_ref[bi * 8 + 3]
    t = coeff_ref[bi * 8 + 4]
    u = coeff_ref[bi * 8 + 5]
    h0 = h0_ref[bi * n_blocks + blk]

    # v3 layout: output pixels ride LANES, interpolation axes ride SUBLANES,
    # channels are separate sublane planes of the image block. Each channel is
    # one clean (band, W) @ (W, R) matmul; the y-tent is an elementwise mask on
    # the matmul RESULT rows and the final channel row is a sublane reduction —
    # no channel-unfold matmul (M/N=4 skinny, 32x pad waste) and no expand
    # matmul, which together were ~40% of the v2 kernel's MXU-equivalents.
    R = rpb * out_w
    rj = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
    jf = (rj % out_w).astype(jnp.float32)
    i = (rj // out_w + blk * rpb).astype(jnp.float32)
    sx = t * jf + (s * i + u)                                  # (1, R)
    sy = q * jf + (p * i + r)
    rel = sy - h0.astype(jnp.float32)

    xi = jax.lax.broadcasted_iota(jnp.int32, (src_w, R), 0).astype(jnp.float32)
    wxT = jnp.maximum(0.0, 1.0 - jnp.abs(xi - sx)).astype(mm_dtype)
    yb = jax.lax.broadcasted_iota(jnp.int32, (band, R), 0).astype(jnp.float32)
    mT = jnp.maximum(0.0, 1.0 - jnp.abs(yb - rel)).astype(mm_dtype)

    for c in range(4):
        # h0 is 8-aligned (sublane granularity — only 7 rows of band slack
        # vs 31 in the lane-sliced v2 layout)
        start = pl.multiple_of(c * src_h + h0, 8)
        slab = img_ref[0, pl.ds(start, band), :]               # (band, W)
        aT = jnp.dot(slab.astype(mm_dtype), wxT,
                     preferred_element_type=jnp.float32)       # (band, R)
        # sublane reduction to one output row; keep 2-D (1, R) for Mosaic
        row = jnp.sum(aT * mT.astype(jnp.float32), axis=0, keepdims=True)
        out_ref[0, 0, pl.ds(c, 1), :] = row


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "interpret", "compute_dtype", "band"),
)
def warp_affine_batch_pallas_v3(
    images: jnp.ndarray,
    H: jnp.ndarray,
    out_size: tuple[int, int],
    interpret: bool = False,
    compute_dtype=jnp.float32,
    band: int = BAND,
) -> jnp.ndarray:
    """v3 of :func:`warp_affine_batch_pallas` (same semantics, see kernel)."""
    B, src_h, src_w, C = images.shape
    oh, ow = out_size
    rpb = 16
    while oh % rpb:
        rpb //= 2
    n_blocks = oh // rpb
    assert band % 8 == 0, "band must be a multiple of 8"
    band = min(band, src_h)

    Minv = jnp.linalg.inv(H.astype(jnp.float32))
    p = Minv[:, 1, 1]
    q = Minv[:, 1, 0]
    r = Minv[:, 1, 2]
    s = Minv[:, 0, 1]
    t = Minv[:, 0, 0]
    u = Minv[:, 0, 2]
    coeffs = jnp.stack(
        [p, q, r, s, t, u, jnp.zeros_like(p), jnp.zeros_like(p)], axis=1
    )

    blk = jnp.arange(n_blocks, dtype=jnp.float32) * rpb
    corners_i = jnp.stack([blk, blk + rpb - 1], 1)
    corners_j = jnp.asarray([0.0, ow - 1.0])
    sy = (p[:, None, None, None] * corners_i[None, :, :, None]
          + q[:, None, None, None] * corners_j[None, None, None, :]
          + r[:, None, None, None])
    sy_min = jnp.floor(sy.min(axis=(2, 3))) - 1.0
    h0 = jnp.clip(sy_min, 0.0, max(src_h - band, 0)).astype(jnp.int32)
    h0 = (h0 // 8) * 8  # sublane-slice alignment
    h0 = h0.reshape(-1)

    # channel-plane layout: (B, 4*H, W); channel c occupies rows [c*H, (c+1)*H)
    imgs4 = images.astype(compute_dtype)
    if C < 4:
        imgs4 = jnp.pad(imgs4, ((0, 0), (0, 0), (0, 0), (0, 4 - C)))
    imgs_p = jnp.transpose(imgs4, (0, 3, 1, 2)).reshape(B, 4 * src_h, src_w)

    kernel = functools.partial(
        _warp_kernel_v3, out_w=ow, src_h=src_h, src_w=src_w, band=band,
        n_blocks=n_blocks, mm_dtype=compute_dtype, rpb=rpb,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 4 * src_h, src_w), lambda bi, ci, *_: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 4, rpb * ow),
            lambda bi, ci, *_: (bi, ci, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, n_blocks, 4, rpb * ow), jnp.float32
        ),
        interpret=interpret,
    )(h0, coeffs.reshape(-1), imgs_p)
    out = jnp.transpose(out, (0, 1, 3, 2))
    return out.reshape(B, oh, ow, 4)[..., :C]
