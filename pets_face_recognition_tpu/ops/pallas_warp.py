"""Pallas TPU kernel: batched affine warp (the alignment hot path).

XLA lowers image warps to arbitrary-index gathers, which run at ~2 ms/image on
v5e regardless of layout (measured; channel padding does not help). This kernel
computes the exact 4-corner bilinear warp with **no gathers**:

- channel-plane layout ``(B, 4·H, W)``: channel ``c`` occupies source rows
  ``[c·H, (c+1)·H)``, so the per-channel y-band is a SUBLANE slice (8-aligned
  dynamic starts — only 7 rows of alignment slack);
- output pixels ride LANES: per ``rpb``-row output block, every channel is one
  clean matmul ``band (BAND, W) @ WxT (W, rpb·out_w)`` on the MXU, where the
  2-tap bilinear x-weights are the tent function ``relu(1 - |grid - coord|)``
  (exactly the one-hot construction at half the VPU cost of one-hots);
- the y-interpolation is an elementwise tent mask on the matmul RESULT rows
  followed by a sublane reduction to the output row — no channel-unfold or
  expand matmuls (their M/N=4 skinny shapes pad 32× on the 128×128 MXU and
  were ~40% of the MXU-equivalents of the previous lane-folded design).

Semantics: full projective inverse warp — ``out[i, j]`` bilinearly samples the
source at ``((s·i + t·j + u)/d, (p·i + q·j + r)/d)`` with
``d = wi·i + wj·j + 1``, BORDER_CONSTANT zero — identical to
``warp_perspective`` / cv2. The rational divide is one (1, R) reciprocal per
row block, negligible next to the tent construction; affine maps pass
``wi = wj = 0``. (Projective support matters for parity: the reference's
``align()`` ROUNDS the prepended centroids to ints, ref
``preprocessor/align.py:8-9``, which makes the exact 4-point homography
slightly projective — see ``homography.align_crop``.)

Limit: the y-band per ``rpb``-row block is static (``BAND`` rows). Rotations
with ``|q|·out_w + rpb·|p| + 9 > BAND`` clamp (gracefully — only the crop's
far rows degrade) at the band edge. Envelope at the 320→224 alignment scale:
band=160 (default, quality paths) ≈ ±25°, band=128 ≈ ±17°, band=96 ≈ ±13°.
Serving (bench.py) uses band=96 — beyond anything the landmark validity
checks let through on aligned head crops.

Measured (v5e, B=128, 320²→224², bf16, band=96): ~9.8 ms — vs ~128 ms for
the XLA gather lowering. MXU work scales with band; the residual is VPU tent
construction + per-program overhead (see PERF.md for the failed attempts to
shrink those).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND = 160


XCHUNK = 128  # lane-chunk width for the x-contraction (static slice granularity)


def _warp_kernel(h0_ref, coeff_ref, xflags_ref, img_ref, out_ref, acc_ref, *,
                 out_w, src_h, src_w, band, n_blocks, mm_dtype, rpb, n_ch,
                 ipp, out_dtype):
    big = pl.program_id(0)   # image-group index (ipp images per program)
    blk = pl.program_id(1)

    R = rpb * out_w
    n_chunks = -(-src_w // XCHUNK)
    rj = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
    jf = (rj % out_w).astype(jnp.float32)
    i = (rj // out_w + blk * rpb).astype(jnp.float32)
    yb = jax.lax.broadcasted_iota(jnp.int32, (band, R), 0).astype(jnp.float32)
    int8_mode = mm_dtype == jnp.int8

    # ipp > 1 amortizes the fixed per-program cost (setup + output DMA seams)
    # over several images; the loop is unrolled so all SMEM scalar reads use
    # static offsets from the group base.
    for gi in range(ipp):
        bi = big * ipp + gi
        # coefficients ride scalar prefetch (SMEM), flattened (B*8,)
        p = coeff_ref[bi * 8 + 0]
        q = coeff_ref[bi * 8 + 1]
        r = coeff_ref[bi * 8 + 2]
        s = coeff_ref[bi * 8 + 3]
        t = coeff_ref[bi * 8 + 4]
        u = coeff_ref[bi * 8 + 5]
        wj = coeff_ref[bi * 8 + 6]   # perspective terms (Minv row 2,
        wi = coeff_ref[bi * 8 + 7]   # normalized so the constant is 1)
        h0 = h0_ref[bi * n_blocks + blk]

        # output pixels ride LANES, interpolation grids ride SUBLANES.
        # Projective sampling: one rational divide per pixel — a (1, R)
        # reciprocal + 3 fmas on top of the affine grids, negligible next to
        # the tent construction. Affine maps pass wj = wi = 0 (d == 1).
        d = wj * jf + (wi * i + 1.0)
        inv_d = 1.0 / d
        sx = (t * jf + (s * i + u)) * inv_d                    # (1, R)
        sy = (q * jf + (p * i + r)) * inv_d
        rel = sy - h0.astype(jnp.float32)
        mT = jnp.maximum(0.0, 1.0 - jnp.abs(yb - rel))

        # x-CHUNKED contraction: the x-tent is nonzero only on the ~|t|·out_w
        # columns the block's taps touch, so whole 128-lane chunks of the
        # (src_w, R) tent build + matmul are dead for typical alignment
        # geometry. The host marks live chunks per (image, block); @pl.when on
        # an SMEM scalar is a REAL branch on this hardware (measured: one
        # active chunk runs ~1/3 the all-active cost), so skipped chunks cost
        # nothing. Exact: chunks partition [0, src_w), skipped chunks hold no
        # taps, and the f32 scratch accumulates partial rows losslessly.
        acc_ref[...] = jnp.zeros((4, R), jnp.float32)
        for k in range(n_chunks):
            cw = min(XCHUNK, src_w - XCHUNK * k)

            @pl.when(xflags_ref[(bi * n_blocks + blk) * n_chunks + k] > 0)
            def _(k=k, cw=cw):
                xi = (jax.lax.broadcasted_iota(jnp.int32, (cw, R), 0)
                      + XCHUNK * k).astype(jnp.float32)
                wxT = jnp.maximum(0.0, 1.0 - jnp.abs(xi - sx))
                if int8_mode:
                    # int8 MXU runs 2x bf16 on v5e. Symmetric quantization:
                    # tent weights and pixels both scale by 127 with NO zero
                    # point, so the dequant is one scalar multiply. Error:
                    # pixels 0.5/127 + two x-taps' tent steps ≈ 1% worst-case,
                    # same class as bfloat16's 0.4% and below JPEG noise.
                    wxTq = jnp.round(wxT * 127.0).astype(jnp.int8)
                else:
                    wxTq = wxT.astype(mm_dtype)

                # only real channels: the pad plane (C<4) is all zeros —
                # skipping it cuts 25% of the MXU work at C=3; its output rows
                # are dropped by the caller
                for c in range(n_ch):
                    # h0 is 8-aligned (sublane granularity)
                    start = pl.multiple_of(c * src_h + h0, 8)
                    slab = img_ref[gi, pl.ds(start, band),
                                   XCHUNK * k : XCHUNK * k + cw]  # (band, cw)
                    if int8_mode:
                        a = jnp.dot(slab, wxTq,
                                    preferred_element_type=jnp.int32)
                        aT = a.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
                    else:
                        aT = jnp.dot(slab.astype(mm_dtype), wxTq,
                                     preferred_element_type=jnp.float32)
                    # sublane reduction to one output row; keep 2-D (1, R)
                    row = jnp.sum(aT * mT, axis=0, keepdims=True)
                    acc_ref[pl.ds(c, 1), :] += row

        out_ref[gi, 0, :, :] = acc_ref[...].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "interpret", "compute_dtype", "band",
                     "imgs_per_program", "out_dtype"),
)
def warp_affine_batch_pallas(
    images: jnp.ndarray,
    H: jnp.ndarray,
    out_size: tuple[int, int],
    interpret: bool = False,
    compute_dtype=jnp.float32,
    band: int = BAND,
    imgs_per_program: int = 8,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Batched projective inverse warp: ``(B, H, W, C<=4) × (B, 3, 3) → (B, oh, ow, C)``.

    ``H`` may be any invertible homography (affine or projective; the
    alignment maps are near-affine with small perspective terms from the
    reference's rounded centroids). ``compute_dtype=bfloat16`` doubles the MXU
    rate at ~0.5% pixel quantization (below JPEG noise); ``float32`` on TPU
    still runs bf16 MXU passes under the default XLA precision but keeps f32
    weight/mask construction.

    CONTRACT (near-affine precondition): the band/chunk liveness estimates
    normalize ``inv(H)`` by its ``[2, 2]`` entry and assume the resulting
    denominator ``wi·i + wj·j + 1`` stays POSITIVE over the whole output crop
    (equivalently: the crop does not straddle the homography's horizon line).
    Alignment maps — rounded-centroid projective corrections on top of a
    similarity — satisfy this by construction (|wi|,|wj| ~ 1e-3,
    ``inv(H)[2,2]`` ~ 1). A strongly projective or sign-flipping ``H`` would
    silently zero the rows whose liveness was mis-estimated rather than raise;
    callers feeding non-alignment homographies must check
    ``den > 0`` at the four crop corners host-side first (it cannot be
    asserted here: ``H`` is a traced value under jit).
    """
    B, src_h, src_w, C = images.shape
    if C > 1 and src_h % 8:
        # Channel planes are stacked along the sublane axis, so plane starts
        # (c*src_h + h0) are only the promised multiple-of-8 when src_h is —
        # a violated pl.multiple_of hint can silently miscompile on hardware.
        raise ValueError(
            f"warp_affine_batch_pallas: C={C} images need src_h % 8 == 0 "
            f"(got {src_h}); pad the input height"
        )
    oh, ow = out_size
    # MXU work scales with the band; serving can narrow it (multiple of 8,
    # rotation limit per the module docstring)
    assert band % 8 == 0, "band must be a multiple of 8"
    band = min(band, src_h)
    n_chunks_est = -(-src_w // XCHUNK)

    def _stack_est(rpb_):
        # Mosaic kernel-stack estimate (bytes): the (band, R) tent/mask/acc
        # temporaries plus per-chunk (XCHUNK, R) tent builds; the 0.72 factor
        # is calibrated against two hardware OOM reports (band=160, f32:
        # 16.27M observed vs 22.5M summed). The scoped-vmem limit is a hard
        # 16M; interpret mode cannot check it.
        R_ = rpb_ * ow
        return R_ * 4 * (2 * band + n_chunks_est * (2 * XCHUNK + band)) * 0.72

    rpb = 16
    while oh % rpb:
        rpb //= 2
    while rpb > 1 and _stack_est(rpb) > 15 * 1024 * 1024:
        rpb //= 2
    n_blocks = oh // rpb
    ipp = imgs_per_program
    while B % ipp:
        ipp -= 1
    # scoped-VMEM clamp: the per-program image block rides VMEM double-buffered
    # (observed hard limit 16 MB; f32 320² C=3 at ipp=8 overflows by ~0.7 MB on
    # hardware — interpret mode can't catch it). Shrink ipp until the estimate
    # fits; serving's int8/bf16 pixels keep ipp=8.
    in_item = jnp.dtype(compute_dtype).itemsize
    out_item = jnp.dtype(out_dtype).itemsize
    while ipp > 1:
        est = (2 * ipp * C * src_h * src_w * in_item
               + 2 * ipp * 4 * rpb * ow * out_item + 4 * rpb * ow * 4)
        if est <= 14 * 1024 * 1024 and B % ipp == 0:
            break
        ipp -= 1

    Minv = jnp.linalg.inv(H.astype(jnp.float32))
    # Normalize so the projective constant is exactly 1 — the kernel's
    # denominator is then wj·j + wi·i + 1 and affine maps degenerate to d = 1.
    # Minv[2, 2] is ~1 for alignment maps (never 0 for an invertible warp
    # whose source region stays finite).
    Minv = Minv / Minv[:, 2:3, 2:3]
    # out[i, j] samples src at
    #   sy = (p i + q j + r) / d ; sx = (s i + t j + u) / d ; d = wi i + wj j + 1
    p = Minv[:, 1, 1]
    q = Minv[:, 1, 0]
    r = Minv[:, 1, 2]
    s = Minv[:, 0, 1]
    t = Minv[:, 0, 0]
    u = Minv[:, 0, 2]
    wj = Minv[:, 2, 0]
    wi = Minv[:, 2, 1]
    coeffs = jnp.stack([p, q, r, s, t, u, wj, wi], axis=1)  # (B, 8)

    # per-(image, block) 8-aligned band start from the block's corner extrema.
    # Rational-linear maps have no interior extrema over a rectangle and are
    # monotone along its edges (Möbius in each coordinate, denominator
    # positive over the crop), so corner evaluation stays exact for the
    # projective case too.
    blk = jnp.arange(n_blocks, dtype=jnp.float32) * rpb
    corners_i = jnp.stack([blk, blk + rpb - 1], 1)  # (n_blocks, 2)
    corners_j = jnp.asarray([0.0, ow - 1.0])
    den = (wi[:, None, None, None] * corners_i[None, :, :, None]
           + wj[:, None, None, None] * corners_j[None, None, None, :]
           + 1.0)  # (B, n_blocks, 2, 2)
    sy = (p[:, None, None, None] * corners_i[None, :, :, None]
          + q[:, None, None, None] * corners_j[None, None, None, :]
          + r[:, None, None, None]) / den  # (B, n_blocks, 2, 2)
    sy_min = jnp.floor(sy.min(axis=(2, 3))) - 1.0
    h0 = jnp.clip(sy_min, 0.0, max(src_h - band, 0)).astype(jnp.int32)
    h0 = (h0 // 8) * 8  # sublane-slice alignment
    h0 = h0.reshape(-1)  # (B * n_blocks,)

    # live x-chunks per (image, block): the block's bilinear taps span
    # [floor(sx_min), floor(sx_max)+1]; a 128-lane chunk is live iff that
    # span (±1 px slack for host/kernel f32 rounding drift) intersects it.
    # Extrema at the block's corner (i, j) pairs (see the band note above).
    n_chunks = -(-src_w // XCHUNK)
    sx = (s[:, None, None, None] * corners_i[None, :, :, None]
          + t[:, None, None, None] * corners_j[None, None, None, :]
          + u[:, None, None, None]) / den  # (B, n_blocks, 2, 2)
    tap_lo = jnp.floor(sx.min(axis=(2, 3))) - 1.0   # (B, n_blocks)
    tap_hi = jnp.floor(sx.max(axis=(2, 3))) + 2.0
    edges = jnp.arange(n_chunks, dtype=jnp.float32) * XCHUNK
    widths = jnp.minimum(XCHUNK, src_w - edges)
    xflags = ((tap_hi[..., None] >= edges)
              & (tap_lo[..., None] < edges + widths)).astype(jnp.int32)
    xflags = xflags.reshape(-1)  # (B * n_blocks * n_chunks,)

    # channel-plane layout (B, C*H, W); pixel data rides in compute dtype
    # (bf16 halves the per-program image block, int8 quarters it). Only real
    # channels get a plane — the kernel loops c < C, so C=3 does 25% less MXU
    # work than the earlier fixed-4-plane layout.
    if compute_dtype == jnp.int8:
        # int8 serving mode: pixels must be in [0, 1]; symmetric q =
        # round(127*img) (scale-only dequant — see the kernel's int8 note).
        q = jnp.clip(jnp.round(images.astype(jnp.float32) * 127.0),
                     0.0, 127.0).astype(jnp.int8)
        imgs_p = jnp.transpose(q, (0, 3, 1, 2))
    else:
        imgs_p = jnp.transpose(images.astype(compute_dtype), (0, 3, 1, 2))
    imgs_p = imgs_p.reshape(B, C * src_h, src_w)

    # out_dtype=bfloat16 halves the crop buffer's HBM write + the consumer's
    # first read (the serving embedder computes in bf16 anyway)
    kernel = functools.partial(
        _warp_kernel, out_w=ow, src_h=src_h, src_w=src_w, band=band,
        n_blocks=n_blocks, mm_dtype=compute_dtype, rpb=rpb, n_ch=C, ipp=ipp,
        out_dtype=out_dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // ipp, n_blocks),
        in_specs=[
            pl.BlockSpec((ipp, C * src_h, src_w),
                         lambda bi, ci, *_: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ipp, 1, 4, rpb * ow),
            lambda bi, ci, *_: (bi, ci, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((4, rpb * ow), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, n_blocks, 4, rpb * ow), out_dtype
        ),
        interpret=interpret,
    )(h0, coeffs.reshape(-1), xflags, imgs_p)
    out = jnp.transpose(out, (0, 1, 3, 2))  # (B, nb, rpb*ow, 4)
    return out.reshape(B, oh, ow, 4)[..., :C]


# superseded name kept for callers/tests that pinned the v3 variant while both
# kernels coexisted
warp_affine_batch_pallas_v3 = warp_affine_batch_pallas
