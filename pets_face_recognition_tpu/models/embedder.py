"""Feature-extractor (embedding) model: backbone → 512-d vector.

Parity target: the reference FE is ``resnet50`` with ``fc = Linear(2048, 512)``
(``/root/reference/configs/cat_fe/cat_fe_head.py:95-108``). At eval time the model maps
an aligned 224×224 crop to an embedding; training wraps it with a large-margin head
(``losses/__init__.py``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .resnet import ResNet, resnet50


class EmbeddingModel(nn.Module):
    """Backbone + linear projection to ``embedding_dim`` (no l2-norm here — the
    margin heads normalize internally, matching the reference)."""

    backbone: nn.Module
    embedding_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train=train)
        emb = nn.Dense(self.embedding_dim, dtype=jnp.float32, name="fc")(
            feats.astype(jnp.float32)
        )
        return emb


def resnet50_embedder(embedding_dim: int = 512, dtype=jnp.float32,
                      quant=None) -> EmbeddingModel:
    """The production FE: ResNet-50 trunk (headless) + 512-d projection.

    ``quant``: None | "calibrate" | "int8" — serving int8 trunk
    (``models/quant.py``); the fc projection stays float32.
    """
    return EmbeddingModel(
        backbone=resnet50(num_classes=0, dtype=dtype, quant=quant),
        embedding_dim=embedding_dim,
        dtype=dtype,
    )
