"""Swin Transformer (flax, NHWC, windowed attention with cyclic shift).

TPU-native rebuild of the reference's from-scratch Swin
(``/root/reference/models/swin.py``, the berniwal variant): patch merging as a
space-to-depth reshape + dense (the reference uses ``nn.Unfold``), window attention
with relative position bias indexed over a ``(2w-1, 2w-1)`` table, shifted windows
via ``jnp.roll`` with additive -inf masks for the wrapped rows/columns, 4 stages with
alternating regular/shifted blocks, mean-pool + LayerNorm+Linear head. Presets
``swin_t/s/b/l`` match the reference's (``swin.py:228-241``).

TPU-first details:
- NHWC throughout; the windowing rearrange keeps channels in the lane dimension;
- attention runs as batched MXU matmuls over ``(B·heads·windows, w², d)``;
- everything is static-shape: H and W must be divisible by
  ``window_size × prod(downscaling_factors)`` (reference keypoint R-CNN pads to
  ``size_divisible=49`` for the same reason, ``models/detection/rcnn.py:157-163``).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from einops import rearrange


def _relative_position_index(window_size: int) -> np.ndarray:
    """(w², w², 2) index into the (2w-1, 2w-1) bias table."""
    coords = np.array(
        [[x, y] for x in range(window_size) for y in range(window_size)]
    )
    rel = coords[None, :, :] - coords[:, None, :]  # (w², w², 2)
    return rel + window_size - 1


def _shift_masks(window_size: int, displacement: int) -> tuple[np.ndarray, np.ndarray]:
    """Additive -inf masks for the wrapped window rows/cols after cyclic shift.

    Mirrors ``create_mask`` (ref swin.py:49-62): ``upper_lower`` blocks attention
    between the bottom ``displacement`` rows and the rest; ``left_right`` the same per
    row of the window.
    """
    n = window_size * window_size
    neg = -1e9
    ul = np.zeros((n, n), np.float32)
    d = displacement * window_size
    ul[-d:, :-d] = neg
    ul[:-d, -d:] = neg

    lr = np.zeros((window_size, window_size, window_size, window_size), np.float32)
    lr[:, -displacement:, :, :-displacement] = neg
    lr[:, :-displacement, :, -displacement:] = neg
    lr = lr.reshape(n, n)
    return ul, lr


class WindowAttention(nn.Module):
    dim: int
    heads: int
    head_dim: int
    window_size: int
    shifted: bool
    relative_pos_embedding: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.window_size
        inner = self.heads * self.head_dim
        scale = self.head_dim**-0.5
        displacement = w // 2

        if self.shifted:
            x = jnp.roll(x, (-displacement, -displacement), axis=(1, 2))

        B, H, W, _ = x.shape
        nw_h, nw_w = H // w, W // w

        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_windows(t):
            return rearrange(
                t, "b (nh wh) (nw ww) (h d) -> b h (nh nw) (wh ww) d",
                h=self.heads, wh=w, ww=w,
            )

        q, k, v = to_windows(q), to_windows(k), to_windows(v)
        dots = jnp.einsum(
            "bhwid,bhwjd->bhwij", q, k, preferred_element_type=jnp.float32
        ) * scale

        if self.relative_pos_embedding:
            table = self.param(
                "pos_embedding", nn.initializers.normal(1.0),
                (2 * w - 1, 2 * w - 1), jnp.float32,
            )
            idx = _relative_position_index(w)
            dots = dots + table[idx[:, :, 0], idx[:, :, 1]]
        else:
            bias = self.param(
                "pos_embedding", nn.initializers.normal(1.0),
                (w * w, w * w), jnp.float32,
            )
            dots = dots + bias

        if self.shifted:
            ul, lr = _shift_masks(w, displacement)
            # bottom row of windows gets the upper/lower mask, rightmost column of
            # windows the left/right mask (ref swin.py:122-124).
            win_row = jnp.arange(nw_h * nw_w) // nw_w
            win_col = jnp.arange(nw_h * nw_w) % nw_w
            ul_sel = (win_row == nw_h - 1).astype(jnp.float32)
            lr_sel = (win_col == nw_w - 1).astype(jnp.float32)
            mask = (
                ul_sel[:, None, None] * jnp.asarray(ul)
                + lr_sel[:, None, None] * jnp.asarray(lr)
            )
            dots = dots + mask[None, None]

        attn = nn.softmax(dots, axis=-1)
        out = jnp.einsum(
            "bhwij,bhwjd->bhwid", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        out = rearrange(
            out, "b h (nh nw) (wh ww) d -> b (nh wh) (nw ww) (h d)",
            nh=nw_h, nw=nw_w, wh=w, ww=w,
        )
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)

        if self.shifted:
            out = jnp.roll(out, (displacement, displacement), axis=(1, 2))
        return out


class SwinBlock(nn.Module):
    dim: int
    heads: int
    head_dim: int
    mlp_dim: int
    shifted: bool
    window_size: int
    relative_pos_embedding: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=jnp.float32, name="attn_norm")(x)
        x = x + WindowAttention(
            self.dim, self.heads, self.head_dim, self.window_size, self.shifted,
            self.relative_pos_embedding, dtype=self.dtype, name="attn",
        )(y)
        y = nn.LayerNorm(dtype=jnp.float32, name="mlp_norm")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    """Space-to-depth (factor f) + linear projection (ref swin.py:155-167)."""

    out_channels: int
    downscaling_factor: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.downscaling_factor
        # torch Unfold flattens as (C, kh, kw) per patch; match that order so torch
        # checkpoints convert directly.
        x = rearrange(x, "b (nh fh) (nw fw) c -> b nh nw (c fh fw)", fh=f, fw=f)
        return nn.Dense(self.out_channels, dtype=self.dtype, name="linear")(x)


class StageModule(nn.Module):
    hidden_dim: int
    layers: int
    downscaling_factor: int
    num_heads: int
    head_dim: int
    window_size: int
    relative_pos_embedding: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert self.layers % 2 == 0
        x = PatchMerging(
            self.hidden_dim, self.downscaling_factor, dtype=self.dtype,
            name="patch_partition",
        )(x)
        for i in range(self.layers // 2):
            x = SwinBlock(
                self.hidden_dim, self.num_heads, self.head_dim,
                self.hidden_dim * 4, shifted=False,
                window_size=self.window_size,
                relative_pos_embedding=self.relative_pos_embedding,
                dtype=self.dtype, name=f"block{i}_regular",
            )(x)
            x = SwinBlock(
                self.hidden_dim, self.num_heads, self.head_dim,
                self.hidden_dim * 4, shifted=True,
                window_size=self.window_size,
                relative_pos_embedding=self.relative_pos_embedding,
                dtype=self.dtype, name=f"block{i}_shifted",
            )(x)
        return x


class SwinTransformer(nn.Module):
    """4-stage Swin; ``features_only`` returns the stage pyramid for FPN use
    (the reference builds its keypoint R-CNN on Swin stages,
    ``models/detection/rcnn.py:129-164``)."""

    hidden_dim: int = 96
    layers: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    head_dim: int = 32
    window_size: int = 7
    downscaling_factors: Sequence[int] = (4, 2, 2, 2)
    relative_pos_embedding: bool = True
    num_classes: int = 0
    features_only: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = {}
        dim = self.hidden_dim
        for s in range(4):
            x = StageModule(
                hidden_dim=dim * (2**s),
                layers=self.layers[s],
                downscaling_factor=self.downscaling_factors[s],
                num_heads=self.heads[s],
                head_dim=self.head_dim,
                window_size=self.window_size,
                relative_pos_embedding=self.relative_pos_embedding,
                dtype=self.dtype,
                name=f"stage{s + 1}",
            )(x)
            feats[f"c{s + 2}"] = x
        if self.features_only:
            return feats
        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(dtype=jnp.float32, name="head_norm")(x)
        if self.num_classes:
            x = nn.Dense(self.num_classes, dtype=jnp.float32, name="head_fc")(x)
        return x


def swin_t(**kw) -> SwinTransformer:
    return SwinTransformer(hidden_dim=96, layers=(2, 2, 6, 2),
                           heads=(3, 6, 12, 24), **kw)


def swin_s(**kw) -> SwinTransformer:
    return SwinTransformer(hidden_dim=96, layers=(2, 2, 18, 2),
                           heads=(3, 6, 12, 24), **kw)


def swin_b(**kw) -> SwinTransformer:
    return SwinTransformer(hidden_dim=128, layers=(2, 2, 18, 2),
                           heads=(4, 8, 16, 32), **kw)


def swin_l(**kw) -> SwinTransformer:
    return SwinTransformer(hidden_dim=192, layers=(2, 2, 18, 2),
                           heads=(6, 12, 24, 48), **kw)
