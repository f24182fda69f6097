"""Homography solve + perspective warp — the alignment kernel.

Replaces OpenCV's ``cv2.findHomography`` / ``cv2.warpPerspective`` pair behind the
reference's ``align()`` (``/root/reference/preprocessor/align.py:5-15``): the reference
prepends each point set's centroid to its 3 landmarks and runs RANSAC over the resulting
4 correspondences — with exactly 4 points RANSAC is deterministic and equals the exact
solve, so we solve the 8×8 DLT system directly (SURVEY.md §7.4).

TPU design: everything is batched and static-shape. ``align_crop`` maps a batch of
images + landmark triples to fixed-size aligned crops in one jitted call — the hot path
of the "aligned crops/sec/chip" benchmark — instead of the reference's per-image eager
OpenCV loop (``transform_reproduce.py:20-53``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_homography(src_pts: jnp.ndarray, dst_pts: jnp.ndarray) -> jnp.ndarray:
    """Exact/least-squares homography H with ``dst ~ H @ src`` (h33 = 1).

    Args:
      src_pts, dst_pts: ``(..., N, 2)`` with N >= 4. N == 4 gives the exact solve
        (the reference's 3-landmarks-plus-centroid case); N > 4 solves the DLT normal
        equations in least squares.

    Returns:
      ``(..., 3, 3)`` float32 homographies.
    """
    src = src_pts.astype(jnp.float32)
    dst = dst_pts.astype(jnp.float32)
    n = src.shape[-2]

    # Hartley normalization: condition the float32 DLT by moving each point set to
    # zero mean / sqrt(2) RMS radius, solving there, then denormalizing.
    def _norm_transform(pts):
        mean = pts.mean(axis=-2, keepdims=True)
        rms = jnp.sqrt(
            jnp.mean(jnp.sum((pts - mean) ** 2, axis=-1), axis=-1, keepdims=True)
        )
        scale = jnp.sqrt(2.0) / jnp.maximum(rms, 1e-8)
        return (pts - mean) * scale[..., None], mean[..., 0, :], scale

    src_n, src_mean, src_scale = _norm_transform(src)
    dst_n, dst_mean, dst_scale = _norm_transform(dst)
    src, dst = src_n, dst_n
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    # Rows: [x y 1 0 0 0 -ux -uy] h = u ; [0 0 0 x y 1 -vx -vy] h = v
    row_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=-1)
    row_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([row_u, row_v], axis=-2)  # (..., 2N, 8)
    b = jnp.concatenate([u, v], axis=-1)[..., None]  # (..., 2N, 1)
    if n == 4:
        h = jnp.linalg.solve(A, b)[..., 0]
    else:
        AtA = jnp.swapaxes(A, -1, -2) @ A
        Atb = jnp.swapaxes(A, -1, -2) @ b
        h = jnp.linalg.solve(AtA, Atb)[..., 0]
    ones_h = jnp.ones(h.shape[:-1] + (1,), h.dtype)
    Hn = jnp.concatenate([h, ones_h], axis=-1).reshape(*h.shape[:-1], 3, 3)

    # Denormalize: H = T_dst^{-1} @ Hn @ T_src, with T = [[s,0,-s*mx],[0,s,-s*my],[0,0,1]].
    def _T(mean, scale):
        s = scale[..., 0]
        z = jnp.zeros_like(s)
        o = jnp.ones_like(s)
        rows = jnp.stack(
            [
                jnp.stack([s, z, -s * mean[..., 0]], axis=-1),
                jnp.stack([z, s, -s * mean[..., 1]], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )
        return rows

    def _T_inv(mean, scale):
        inv = 1.0 / scale[..., 0]
        z = jnp.zeros_like(inv)
        o = jnp.ones_like(inv)
        return jnp.stack(
            [
                jnp.stack([inv, z, mean[..., 0]], axis=-1),
                jnp.stack([z, inv, mean[..., 1]], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )

    H = _T_inv(dst_mean, dst_scale) @ Hn @ _T(src_mean, src_scale)
    return H / H[..., 2:3, 2:3]


def _bilinear_sample(img: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray):
    """Bilinear sample ``img (H, W, C)`` at float coords; zero outside (cv2
    BORDER_CONSTANT semantics)."""
    H, W, _ = img.shape
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yy, xx):
        inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        yc = jnp.clip(yy, 0, H - 1)
        xc = jnp.clip(xx, 0, W - 1)
        vals = img[yc.reshape(-1), xc.reshape(-1)].reshape(*yy.shape, img.shape[-1])
        return jnp.where(inb[..., None], vals, 0.0)

    w00 = ((1 - fy) * (1 - fx))[..., None]
    w01 = ((1 - fy) * fx)[..., None]
    w10 = (fy * (1 - fx))[..., None]
    w11 = (fy * fx)[..., None]
    return (
        tap(y0i, x0i) * w00
        + tap(y0i, x0i + 1) * w01
        + tap(y0i + 1, x0i) * w10
        + tap(y0i + 1, x0i + 1) * w11
    )


def warp_perspective(
    image: jnp.ndarray,
    H: jnp.ndarray,
    dsize: tuple[int, int],
) -> jnp.ndarray:
    """Inverse-map perspective warp of one ``(H, W, C)`` image to ``dsize=(out_h, out_w)``.

    Matches ``cv2.warpPerspective(img, H, (out_w, out_h))`` with bilinear interpolation
    and constant-zero border: output pixel ``(x, y)`` samples the source at
    ``H^-1 @ (x, y, 1)``.
    """
    out_h, out_w = dsize
    Hinv = jnp.linalg.inv(H.astype(jnp.float32))
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    denom = Hinv[2, 0] * gx + Hinv[2, 1] * gy + Hinv[2, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    sx = (Hinv[0, 0] * gx + Hinv[0, 1] * gy + Hinv[0, 2]) / denom
    sy = (Hinv[1, 0] * gx + Hinv[1, 1] * gy + Hinv[1, 2]) / denom
    return _bilinear_sample(image.astype(jnp.float32), sx, sy)


def warp_affine_two_pass(
    image: jnp.ndarray,
    H: jnp.ndarray,
    dsize: tuple[int, int],
) -> jnp.ndarray:
    """Exact two-pass AFFINE inverse warp with axis-aligned gathers (TPU-fast).

    For an affine map ``src = M @ (x, y, 1)`` the bilinear resample factorizes into
    a vertical pass followed by a horizontal pass (Catmull–Smith):

    - along an output row ``i``, ``sx`` is linear in ``j``; re-parametrizing by the
      source column ``x`` gives ``sy = A·i + B·x + C`` — a vertical-only shear,
      computed with ``take_along_axis(axis=0)`` (per-lane row gather, which Mosaic
      vectorizes, unlike the flat random-access gather of the projective path);
    - then ``out[i, j] = M1[i, sx(i, j)]`` — a horizontal-only resample via
      ``take_along_axis(axis=1)``.

    Out-of-range samples produce 0 (cv2 BORDER_CONSTANT), handled per pass.
    Requires ``|t| = |d sx/d j| > 0`` (non-degenerate x scale), true for every
    face-alignment transform.

    Filter note: the two-pass kernel interpolates on a sheared grid, which is a
    valid bilinear-class resampling but not sample-identical to cv2's 4-corner
    bilinear — for alignment-scale transforms the difference is ~0.25% of pixel
    range (same order as cv2's own 5-bit fixed-point interpolation weights).
    Use :func:`warp_perspective` when exact cv2 parity matters; use this in the
    batched TPU pipeline where it is ~an order of magnitude faster (axis-aligned
    gathers vectorize; flat random-access gathers do not).
    """
    out_h, out_w = dsize
    Hs, Ws, C = image.shape
    Minv = jnp.linalg.inv(H.astype(jnp.float32))
    # affine coefficients: sx = s·i + t·j + u ; sy = p·i + q·j + r
    s, t, u = Minv[0, 1], Minv[0, 0], Minv[0, 2]
    p, q, r = Minv[1, 1], Minv[1, 0], Minv[1, 2]

    # pass 1: M1[i, x] = IMG[A·i + B·x + Cc, x]
    # from j = (x - s·i - u)/t:  sy = p·i + q·(x - s·i - u)/t + r
    A = p - q * s / t
    B = q / t
    Cc = r - q * u / t

    ii = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(Ws, dtype=jnp.float32)[None, :]
    sy = A * ii + B * xx + Cc  # (out_h, Ws)
    y0 = jnp.floor(sy)
    fy = sy - y0
    y0i = y0.astype(jnp.int32)
    oob_y0 = (y0i < 0) | (y0i >= Hs)
    oob_y1 = (y0i + 1 < 0) | (y0i + 1 >= Hs)
    y0c = jnp.clip(y0i, 0, Hs - 1)
    y1c = jnp.clip(y0i + 1, 0, Hs - 1)

    # image (Hs, Ws, C); take_along_axis needs matching dims: expand idx to C
    img = image.astype(jnp.float32)
    g0 = jnp.take_along_axis(
        img, jnp.broadcast_to(y0c[:, :, None], (out_h, Ws, C)), axis=0
    )
    g1 = jnp.take_along_axis(
        img, jnp.broadcast_to(y1c[:, :, None], (out_h, Ws, C)), axis=0
    )
    g0 = jnp.where(oob_y0[:, :, None], 0.0, g0)
    g1 = jnp.where(oob_y1[:, :, None], 0.0, g1)
    M1 = g0 * (1.0 - fy)[:, :, None] + g1 * fy[:, :, None]  # (out_h, Ws, C)

    # pass 2: OUT[i, j] = M1[i, sx(i, j)]
    jj = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    sx = s * ii + t * jj + u  # (out_h, out_w)
    x0 = jnp.floor(sx)
    fx = sx - x0
    x0i = x0.astype(jnp.int32)
    oob_x0 = (x0i < 0) | (x0i >= Ws)
    oob_x1 = (x0i + 1 < 0) | (x0i + 1 >= Ws)
    x0c = jnp.clip(x0i, 0, Ws - 1)
    x1c = jnp.clip(x0i + 1, 0, Ws - 1)
    h0 = jnp.take_along_axis(
        M1, jnp.broadcast_to(x0c[:, :, None], (out_h, out_w, C)), axis=1
    )
    h1 = jnp.take_along_axis(
        M1, jnp.broadcast_to(x1c[:, :, None], (out_h, out_w, C)), axis=1
    )
    h0 = jnp.where(oob_x0[:, :, None], 0.0, h0)
    h1 = jnp.where(oob_x1[:, :, None], 0.0, h1)
    return h0 * (1.0 - fx)[:, :, None] + h1 * fx[:, :, None]


def align_crop(
    images: jnp.ndarray,
    landmarks: jnp.ndarray,
    base_pts: jnp.ndarray,
    dsize: tuple[int, int],
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Batched reference ``align()``: centroid-augmented homography + warp.

    Args:
      images: ``(B, H, W, C)`` float images.
      landmarks: ``(B, 3, 2)`` (x, y) landmark triples (left eye, right eye, nose —
        reference order, ``preprocessor/__init__.py:175-193``).
      base_pts: ``(3, 2)`` canonical targets (the production constant is
        ``[[70, 92], [154, 92], [112, 160]]`` into 224×224,
        ``generate_tsv_to_reproduce1.py:151-154``).
      dsize: ``(out_h, out_w)``.
      compute_dtype: matmul dtype for the Pallas warp on TPU. ``bfloat16``
        doubles the MXU rate at ~0.4% pixel quantization (below JPEG noise;
        the serving path uses it); ``float32`` is cv2-exact.

    Returns:
      ``(B, out_h, out_w, C)`` aligned crops.
    """
    landmarks = landmarks.astype(jnp.float32)
    base = jnp.broadcast_to(
        jnp.asarray(base_pts, jnp.float32), (images.shape[0], 3, 2)
    )
    # The reference ROUNDS both prepended centroids to ints
    # (``np.round(np.mean(pts, axis=0)).astype(int)``, ref
    # ``preprocessor/align.py:8-9``; np.round == jnp.round == half-to-even).
    # With rounded centroids the 4 correspondences are no longer
    # affine-consistent, so the exact 4-point homography picks up small
    # perspective terms (~1e-4) whose effect is amplified by extrapolation to
    # the 224² crop — up to ~tens of source px near crop corners (measured).
    # The reference's training corpora, README numbers, and tsv ranks were all
    # produced by this projective warp, so crop parity requires reproducing it
    # exactly: rounded centroids, full homography, projective warp.
    src4 = jnp.concatenate(
        [jnp.round(landmarks.mean(axis=1, keepdims=True)), landmarks], axis=1
    )
    dst4 = jnp.concatenate(
        [jnp.round(base.mean(axis=1, keepdims=True)), base], axis=1
    )
    Hs = solve_homography(src4, dst4)
    if jax.default_backend() != "cpu" and dsize[0] % 8 == 0:
        # gather-free Pallas kernel: exact 4-corner bilinear (~20x faster than
        # the XLA gather lowering on v5e); handles the projective terms with
        # one rational divide per row block
        from .pallas_warp import warp_affine_batch_pallas

        return warp_affine_batch_pallas(images, Hs, tuple(dsize),
                                        compute_dtype=compute_dtype)
    return jax.vmap(lambda im, h: warp_perspective(im, h, dsize))(
        images.astype(jnp.float32), Hs
    )
