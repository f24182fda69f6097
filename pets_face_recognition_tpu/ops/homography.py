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


def align_crop(
    images: jnp.ndarray,
    landmarks: jnp.ndarray,
    base_pts: jnp.ndarray,
    dsize: tuple[int, int],
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

    Returns:
      ``(B, out_h, out_w, C)`` aligned crops.
    """
    landmarks = landmarks.astype(jnp.float32)
    base = jnp.broadcast_to(
        jnp.asarray(base_pts, jnp.float32), (images.shape[0], 3, 2)
    )
    src4 = jnp.concatenate([landmarks.mean(axis=1, keepdims=True), landmarks], axis=1)
    dst4 = jnp.concatenate([base.mean(axis=1, keepdims=True), base], axis=1)
    Hs = solve_homography(src4, dst4)
    return jax.vmap(lambda im, h: warp_perspective(im, h, dsize))(
        images.astype(jnp.float32), Hs
    )
