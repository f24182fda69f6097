"""Generalized R-CNN assemblies: Faster / Mask / Keypoint R-CNN.

TPU-native rebuild of the torchvision detection models the reference uses in
production (``maskrcnn_resnet50_fpn`` for bodies,
``configs/mask/mask_rcnn_config.py:60-79``; ``keypointrcnn_resnet50_fpn`` for
head+landmarks, ``configs/keypoint/keypoints_config.py:69-90``) and the custom
factories in ``/root/reference/models/detection/rcnn.py``.

Design (everything static-shape under jit):
- input is a fixed ``(B, H, W, 3)`` normalized batch (host-side letterbox replaces
  ``GeneralizedRCNNTransform``'s dynamic resize — SURVEY.md §3.2);
- training: ``__call__(images, targets, train=True, rngs={'sampler': ...})`` returns
  the torchvision-style loss dict (summed by the config loss wrapper, parity with
  ``configs/mask/mask_rcnn_config.py:82-97``);
- inference: returns fixed-size padded detections with validity masks:
  ``{'boxes' (B, D, 4), 'labels', 'scores', 'valid', ['masks' (B, D, 28, 28)],
  ['keypoints' (B, D, K, 3), 'keypoints_scores']}``.

Targets format: ``{'boxes' (B, G, 4), 'labels' (B, G), 'valid' (B, G),
['masks' (B, G, H, W)], ['keypoints' (B, G, K, 3)]}``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.anchors import multilevel_anchors
from . import roi_heads as rh
from .fpn import BackboneWithFPN
from .resnet import resnet50
from .rpn import RPNHead, generate_proposals, rpn_loss
from .swin import swin_t


@dataclasses.dataclass(frozen=True)
class RCNNConfig:
    """Static hyper-parameters (torchvision defaults unless noted)."""

    num_classes: int = 2
    # anchors: one size tuple per FPN level p2..p6
    anchor_sizes: tuple = ((32,), (64,), (128,), (256,), (512,))
    aspect_ratios: tuple = (0.5, 1.0, 2.0)
    # RPN
    rpn_pre_nms_top_n_train: int = 2000
    rpn_pre_nms_top_n_test: int = 1000
    rpn_post_nms_top_n_train: int = 2000
    rpn_post_nms_top_n_test: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_fg_iou_thresh: float = 0.7
    rpn_bg_iou_thresh: float = 0.3
    rpn_batch_size_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    # Box head
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    box_detections_per_img: int = 100
    box_fg_iou_thresh: float = 0.5
    box_bg_iou_thresh: float = 0.5
    box_batch_size_per_image: int = 512
    box_positive_fraction: float = 0.25
    # Task heads
    with_mask: bool = False
    num_keypoints: int = 0
    mask_roi_size: int = 14
    keypoint_roi_size: int = 14
    # Training: run mask/keypoint branches on the sampled-positive budget
    # only (torchvision roi_heads.py semantics; loss-exact, 4x less
    # task-head work at default sampling ratios). False = the round-3
    # behavior (task heads over ALL sampled RoIs) — kept as a measurable
    # baseline for tools/probe_train.py --all-rois (VERDICT r4 #4)
    task_heads_on_positives_only: bool = True


class GeneralizedRCNN(nn.Module):
    backbone: nn.Module  # BackboneWithFPN: images -> {'p2'..'p6'}
    cfg: RCNNConfig
    # compute dtype for RPN + RoI heads (params/stats stay float32; final
    # predictor logits are always float32) — bfloat16 on TPU halves the head
    # activation HBM traffic
    dtype: Any = jnp.float32
    # None | "calibrate" | "int8": serving int8 PTQ for the RPN's shared 3×3
    # conv (models/quant.py). Backbone/FPN carry their own quant flags.
    quant: Any = None
    # same, for the keypoint head's 8-conv chain (independent knob: the RPN
    # flag needs an int8 backbone to pay off, the kp head pays off alone)
    quant_kp: Any = None

    def setup(self):
        c = self.cfg
        self.rpn_head = RPNHead(
            num_anchors=len(c.anchor_sizes[0]) * len(c.aspect_ratios),
            dtype=self.dtype, quant=self.quant, name="rpn"
        )
        self.box_head = rh.TwoMLPHead(dtype=self.dtype, name="box_head")
        self.box_predictor = rh.FastRCNNPredictor(c.num_classes,
                                                  name="box_predictor")
        if c.with_mask:
            self.mask_head = rh.MaskHead(c.num_classes, dtype=self.dtype,
                                         name="mask_head")
        if c.num_keypoints:
            self.keypoint_head = rh.KeypointHead(c.num_keypoints,
                                                 dtype=self.dtype,
                                                 quant=self.quant_kp,
                                                 name="keypoint_head")

    # ------------------------------------------------------------------ #

    def _anchors_and_levels(self, feats, image_size):
        rpn_levels = sorted(feats)
        feature_sizes = [
            (feats[l].shape[1], feats[l].shape[2]) for l in rpn_levels
        ]
        strides = [image_size[0] // h for (h, _) in feature_sizes]
        anchors = multilevel_anchors(
            feature_sizes, strides, self.cfg.anchor_sizes,
            self.cfg.aspect_ratios,
        )
        A = len(self.cfg.anchor_sizes[0]) * len(self.cfg.aspect_ratios)
        level_ids = np.concatenate([
            np.full(h * w * A, i, np.int32)
            for i, (h, w) in enumerate(feature_sizes)
        ])
        return anchors, level_ids, strides

    def _pool_levels(self, feats):
        """All FPN levels except the extra max-pool level (torchvision pools RoIs
        from the named FPN outputs only). Returns (names, tensors)."""
        keys = sorted(feats)[:-1]
        return keys, [feats[k] for k in keys]

    # pyramids at or below this many total cells use the dense einsum RoIAlign
    # (whole levels × interpolation matmuls) instead of the per-RoI Pallas
    # kernel, which is program-overhead-bound (~3.6 µs/RoI): on the 2-level
    # serving detectors (p4/p5 = 20²+10² at 320px) dense measures 1.3 ms vs
    # 14.8 ms for 4096 RoIs on v5e
    DENSE_ROI_ALIGN_MAX_CELLS = 1024

    def _roi_align(self, pool_names, pool_feats, boxes_flat, batch_idx,
                   strides, output_size, train: bool = False):
        levels = [int(n[1:]) for n in pool_names]
        if (not train
                and sum(f.shape[1] * f.shape[2] for f in pool_feats)
                <= self.DENSE_ROI_ALIGN_MAX_CELLS
                and boxes_flat.shape[0] % pool_feats[0].shape[0] == 0):
            from ..ops.roi_align import multilevel_roi_align_dense

            return multilevel_roi_align_dense(
                pool_feats, boxes_flat, batch_idx, output_size,
                tuple(strides[: len(pool_feats)]),
                min_level=min(levels), max_level=max(levels),
            )
        if train:
            # Training: the separable einsum form (``Wy @ level @ Wxᵀ``,
            # ops/roi_align.py) — plain matmuls, exactly differentiable by
            # XLA autodiff. Measured round-5 at the box-stage shapes
            # (2048 RoIs × 7², 4-level pyramid @320, B=4): fwd+bwd 14.7 ms
            # vs 39.9 ms for the Pallas custom-VJP pair (whose backward is
            # scratch/DMA-bound accumulating full per-image level
            # gradients). Works on every backend.
            from ..ops.roi_align import multilevel_roi_align_separable

            return multilevel_roi_align_separable(
                pool_feats, boxes_flat, batch_idx, output_size,
                tuple(strides[: len(pool_feats)]),
                min_level=min(levels), max_level=max(levels),
                # repo convention: compute dtype flows through dtype= —
                # bf16 on TPU recipes, f32 on CPU tests (keeps the 8-device
                # gradient-parity deterministic)
                compute_dtype=self.dtype,
            )
        if jax.default_backend() != "cpu":
            # Eval: Pallas kernel — windowed VMEM slices + MXU interpolation
            # matmuls (an order of magnitude less HBM traffic than the XLA
            # gather). batch_idx is block-contiguous here (rois reshaped
            # from (B, R, 4)).
            from ..ops.pallas_roi_align import multilevel_roi_align_pallas

            return multilevel_roi_align_pallas(
                pool_feats, boxes_flat, batch_idx, output_size,
                tuple(strides[: len(pool_feats)]),
                min_level=min(levels), max_level=max(levels),
            )
        return rh.multilevel_roi_align(
            pool_feats, boxes_flat, batch_idx, output_size,
            tuple(strides[: len(pool_feats)]),
            min_level=min(levels), max_level=max(levels),
        )

    def _box_forward(self, pool_names, pool_feats, boxes_flat, batch_idx,
                     strides, train: bool = False):
        pooled = self._roi_align(pool_names, pool_feats, boxes_flat, batch_idx,
                                 strides, (7, 7), train=train)
        return self.box_predictor(self.box_head(pooled))

    # ------------------------------------------------------------------ #

    def __call__(self, images, targets=None, train: bool = False):
        c = self.cfg
        B, H, W, _ = images.shape
        image_size = (H, W)
        feats = self.backbone(images, train=train)
        anchors, level_ids, strides = self._anchors_and_levels(feats, image_size)
        objectness, deltas = self.rpn_head(feats)
        pool_names, pool_feats = self._pool_levels(feats)

        if train:
            return self._forward_train(
                images, targets, feats, pool_names, pool_feats, anchors, level_ids,
                strides, objectness, deltas, image_size,
            )
        return self._forward_eval(
            feats, pool_names, pool_feats, anchors, level_ids, strides, objectness,
            deltas, image_size,
        )

    # -- eval split at the RoI boundary ---------------------------------- #
    # ``backbone_rpn`` + ``roi_eval`` == ``__call__(train=False)``, but lets
    # serving compile the int8 producer chains (backbone/FPN/RPN head) and
    # the RoI consumer stages as SEPARATE XLA modules. Motivation: the
    # remote-XLA int8-FPN⊕int8-RPN composition pathology (PERF.md round 3 —
    # both int8 producers in ONE module balloon the downstream RoI stages
    # from ~14.5 to ~36.5 ms); a module boundary denies the scheduler the
    # cross-stage fusion it mis-plans. Costs one dispatch + an HBM round
    # trip of the pyramid/logits.

    def backbone_rpn(self, images):
        """Producer half: images -> (feats dict, objectness, deltas)."""
        feats = self.backbone(images, train=False)
        objectness, deltas = self.rpn_head(feats)
        return feats, objectness, deltas

    def roi_eval(self, feats, objectness, deltas, image_size):
        """Consumer half: proposals + RoI heads on precomputed activations."""
        anchors, level_ids, strides = self._anchors_and_levels(feats, image_size)
        pool_names, pool_feats = self._pool_levels(feats)
        return self._forward_eval(
            feats, pool_names, pool_feats, anchors, level_ids, strides,
            objectness, deltas, image_size,
        )

    # ------------------------------------------------------------------ #

    def _forward_train(self, images, targets, feats, pool_names, pool_feats, anchors,
                       level_ids, strides, objectness, deltas, image_size):
        c = self.cfg
        B = images.shape[0]
        rng = self.make_rng("sampler")
        rpn_rng, box_rng = jax.random.split(rng)

        losses = rpn_loss(
            objectness, deltas, anchors, targets["boxes"],
            targets["valid"], rpn_rng,
            c.rpn_batch_size_per_image, c.rpn_positive_fraction,
        )

        proposals, prop_valid = generate_proposals(
            jax.lax.stop_gradient(objectness),
            jax.lax.stop_gradient(deltas),
            anchors, level_ids, image_size,
            c.rpn_pre_nms_top_n_train, c.rpn_post_nms_top_n_train,
            c.rpn_nms_thresh, num_levels=int(level_ids.max()) + 1,
        )

        # per-image sampling of proposals for the box head
        keys = jax.random.split(box_rng, B)
        sample = jax.vmap(
            lambda p, pv, gb, gl, gv, k: rh.select_training_samples(
                p, pv, gb, gl, gv, k,
                c.box_batch_size_per_image, c.box_positive_fraction,
                c.box_fg_iou_thresh, c.box_bg_iou_thresh,
            )
        )
        boxes, cls_t, gt_idx, valid, fg = sample(
            proposals, prop_valid, targets["boxes"], targets["labels"],
            targets["valid"], keys,
        )

        S = boxes.shape[1]
        boxes_flat = boxes.reshape(B * S, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), S)
        class_logits, box_deltas = self._box_forward(
            pool_names, pool_feats, boxes_flat, batch_idx, strides, train=True
        )

        matched_boxes = jnp.take_along_axis(
            targets["boxes"], gt_idx[..., None], axis=1
        ).reshape(B * S, 4)
        losses.update(
            rh.fastrcnn_loss(
                class_logits, box_deltas, boxes_flat,
                cls_t.reshape(-1), matched_boxes,
                valid.reshape(-1), fg.reshape(-1),
            )
        )

        if c.with_mask or c.num_keypoints:
            # torchvision runs the task heads on the sampled POSITIVES only
            # (roi_heads.py subsets proposals to foreground before the
            # mask/keypoint branch); the balanced sampler caps positives at
            # ``batch_size_per_image * positive_fraction``, so that static
            # budget is guaranteed to hold every fg RoI. Subsetting here is
            # loss-exact (the losses average over the SAME fg set) and cuts
            # the task-head + task-RoIAlign + target-projection work by
            # 1/positive_fraction (4x at torchvision defaults); measured
            # step times in PERF.md "Round-5: training".
            # same floor expression as sample_balanced's n_pos_budget —
            # the sampler can never emit more positives than this
            if c.task_heads_on_positives_only:
                P = max(1, int(c.box_batch_size_per_image
                               * c.box_positive_fraction))
                P = min(P, S)
            else:
                P = S  # measurable pre-round-4 baseline (all sampled RoIs)
            # stable fg-first order: argsort(False<True) keeps sampler order
            pos_order = jnp.argsort(~fg, axis=1, stable=True)[:, :P]
            pos_boxes = jnp.take_along_axis(boxes, pos_order[..., None], 1)
            pos_gt_idx = jnp.take_along_axis(gt_idx, pos_order, 1)
            pos_fg = jnp.take_along_axis(fg, pos_order, 1)
            pos_cls = jnp.take_along_axis(cls_t, pos_order, 1)
            pos_boxes_flat = pos_boxes.reshape(B * P, 4)
            pos_batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), P)

        if c.with_mask:
            pooled = self._roi_align(
                pool_names, pool_feats, pos_boxes_flat, pos_batch_idx,
                strides, (c.mask_roi_size, c.mask_roi_size), train=True,
            )
            mask_logits = self.mask_head(pooled)  # (B*P, 28, 28, C)
            gt_masks = jax.vmap(
                lambda m, bx, gi: rh.project_masks_on_boxes(m, bx, gi, 28)
            )(targets["masks"], pos_boxes, pos_gt_idx)
            losses["loss_mask"] = rh.maskrcnn_loss(
                mask_logits, pos_cls.reshape(-1),
                gt_masks.reshape(B * P, 28, 28), pos_fg.reshape(-1),
            )

        if c.num_keypoints:
            pooled = self._roi_align(
                pool_names, pool_feats, pos_boxes_flat, pos_batch_idx,
                strides, (c.keypoint_roi_size, c.keypoint_roi_size),
                train=True,
            )
            kp_logits = self.keypoint_head(pooled)  # (B*P, 56, 56, K)
            gt_kps = jnp.take_along_axis(
                targets["keypoints"], pos_gt_idx[..., None, None], axis=1
            ).reshape(B * P, c.num_keypoints, 3)
            kp_targets, kp_valid = rh.keypoints_to_heatmap_targets(
                gt_kps, pos_boxes_flat, kp_logits.shape[1]
            )
            losses["loss_keypoint"] = rh.keypointrcnn_loss(
                kp_logits, kp_targets, kp_valid, pos_fg.reshape(-1)
            )
        return losses

    # ------------------------------------------------------------------ #

    def _forward_eval(self, feats, pool_names, pool_feats, anchors, level_ids, strides,
                      objectness, deltas, image_size):
        c = self.cfg
        B = objectness.shape[0]
        proposals, prop_valid = generate_proposals(
            objectness, deltas, anchors, level_ids, image_size,
            c.rpn_pre_nms_top_n_test, c.rpn_post_nms_top_n_test,
            c.rpn_nms_thresh, num_levels=int(level_ids.max()) + 1,
        )
        S = proposals.shape[1]
        boxes_flat = proposals.reshape(B * S, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), S)
        class_logits, box_deltas = self._box_forward(
            pool_names, pool_feats, boxes_flat, batch_idx, strides
        )

        if jax.default_backend() != "cpu":
            # one batched Pallas NMS across all images (groups in sublanes)
            det_boxes, det_labels, det_scores, det_valid = (
                rh.postprocess_detections_batch(
                    class_logits.reshape(B, S, -1),
                    box_deltas.reshape(B, S, -1, 4),
                    proposals, prop_valid, image_size,
                    c.box_score_thresh, c.box_nms_thresh,
                    c.box_detections_per_img,
                )
            )
        else:
            post = jax.vmap(
                lambda cl, bd, p, pv: rh.postprocess_detections(
                    cl, bd, p, pv, image_size,
                    c.box_score_thresh, c.box_nms_thresh,
                    c.box_detections_per_img,
                )
            )
            det_boxes, det_labels, det_scores, det_valid = post(
                class_logits.reshape(B, S, -1),
                box_deltas.reshape(B, S, -1, 4),
                proposals, prop_valid,
            )

        out = {
            "boxes": det_boxes,
            "labels": det_labels,
            "scores": det_scores,
            "valid": det_valid,
        }

        D = det_boxes.shape[1]
        det_flat = det_boxes.reshape(B * D, 4)
        det_bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), D)

        if c.with_mask:
            pooled = self._roi_align(
                pool_names, pool_feats, det_flat, det_bidx, strides,
                (c.mask_roi_size, c.mask_roi_size),
            )
            mask_logits = self.mask_head(pooled)  # (B*D, 28, 28, C)
            per_class = jnp.take_along_axis(
                mask_logits,
                det_labels.reshape(B * D)[:, None, None, None].astype(jnp.int32),
                axis=-1,
            )[..., 0]
            out["masks"] = jax.nn.sigmoid(per_class).reshape(B, D, 28, 28)

        if c.num_keypoints:
            pooled = self._roi_align(
                pool_names, pool_feats, det_flat, det_bidx, strides,
                (c.keypoint_roi_size, c.keypoint_roi_size),
            )
            kp_logits = self.keypoint_head(pooled)
            kps, kp_scores = rh.heatmaps_to_keypoints(kp_logits, det_flat)
            out["keypoints"] = kps.reshape(B, D, c.num_keypoints, 3)
            out["keypoints_scores"] = kp_scores.reshape(B, D, c.num_keypoints)
        return out


# --------------------------------------------------------------------------- #
# Factories (reference config-facing names)
# --------------------------------------------------------------------------- #


def maskrcnn_resnet50_fpn(
    num_classes: int = 2,
    box_detections_per_img: int = 3,
    quant=None,
    quant_scope: str = "rpn",
    **overrides,
) -> GeneralizedRCNN:
    """Production body detector/segmenter
    (``configs/mask/mask_rcnn_config.py:60-79``: num_classes=2, 3 det/img).

    ``quant`` (None | "calibrate" | "int8") + ``quant_scope``
    (trunk | fpn | rpn | full): serving int8 PTQ surface — trunk always,
    FPN/RPN per scope (default "rpn", the shipping scope; PERF.md documents
    the fpn×rpn composition pathology behind it)."""
    cfg = RCNNConfig(
        num_classes=num_classes, with_mask=True,
        box_detections_per_img=box_detections_per_img, **overrides,
    )
    backbone = BackboneWithFPN(
        backbone=resnet50(features_only=True, frozen_stats=True, quant=quant),
        quant=quant if quant_scope in ("fpn", "full") else None)
    return GeneralizedRCNN(
        backbone=backbone, cfg=cfg,
        quant=quant if quant_scope in ("rpn", "full") else None)


def keypointrcnn_resnet50_fpn(
    num_classes: int = 2,
    num_keypoints: int = 3,
    box_detections_per_img: int = 1,
    quant=None,
    quant_scope: str = "rpn",
    quant_kp=None,
    **overrides,
) -> GeneralizedRCNN:
    """Production head+landmark detector
    (``configs/keypoint/keypoints_config.py:69-90``: 3 keypoints, 1 det/img).
    torchvision keypointrcnn uses a single-size-per-level anchor set scaled like
    maskrcnn; keep defaults.

    ``quant``/``quant_scope``: int8 PTQ for trunk (+FPN/RPN per scope, default
    "rpn"); ``quant_kp``: int8 PTQ for the keypoint head's 8-conv chain
    (independent knob — it pays off without an int8 backbone)."""
    cfg = RCNNConfig(
        num_classes=num_classes, num_keypoints=num_keypoints,
        box_detections_per_img=box_detections_per_img, **overrides,
    )
    backbone = BackboneWithFPN(
        backbone=resnet50(features_only=True, frozen_stats=True, quant=quant),
        quant=quant if quant_scope in ("fpn", "full") else None)
    return GeneralizedRCNN(
        backbone=backbone, cfg=cfg,
        quant=quant if quant_scope in ("rpn", "full") else None,
        quant_kp=quant_kp)


def swin_tiny_keypoint_rcnn(
    num_classes: int = 2,
    num_keypoints: int = 3,
    window_size: int = 7,
    **overrides,
) -> GeneralizedRCNN:
    """Swin-T keypoint R-CNN (reference ``models/detection/rcnn.py:129-164``
    builds the same from Swin stages as the FPN body)."""
    cfg = RCNNConfig(
        num_classes=num_classes, num_keypoints=num_keypoints,
        box_detections_per_img=1, **overrides,
    )
    backbone = BackboneWithFPN(backbone=swin_t(features_only=True,
                                               window_size=window_size))
    return GeneralizedRCNN(backbone=backbone, cfg=cfg)


def fasterrcnn_resnet50_fpn(num_classes: int = 2, **overrides) -> GeneralizedRCNN:
    cfg = RCNNConfig(num_classes=num_classes, **overrides)
    backbone = BackboneWithFPN(backbone=resnet50(features_only=True,
                                                 frozen_stats=True))
    return GeneralizedRCNN(backbone=backbone, cfg=cfg)


def mobile_net_v3_large_rcnn(**overrides) -> GeneralizedRCNN:
    """Lightweight Faster R-CNN on MobileNetV3-Large, 2-level FPN over the last
    two feature stages + max-pool level, 5-size anchors per level, 1 det/img
    (reference ``models/detection/rcnn.py:13-43``)."""
    from .mobilenet_v3 import mobilenet_v3_large

    kw = dict(
        num_classes=2,
        anchor_sizes=((32, 64, 128, 256, 512),) * 3,
        aspect_ratios=(0.5, 1.0, 2.0),
        rpn_pre_nms_top_n_test=150,
        rpn_post_nms_top_n_test=150,
        box_detections_per_img=1,
    )
    kw.update(overrides)
    cfg = RCNNConfig(**kw)
    backbone = BackboneWithFPN(
        backbone=mobilenet_v3_large(features_only=True, frozen_stats=True),
        in_levels=("c4", "c5"),
    )
    return GeneralizedRCNN(backbone=backbone, cfg=cfg)


def convnetx_tiny_rcnn(**overrides) -> GeneralizedRCNN:
    """ConvNeXt-T Faster R-CNN, 2-level FPN, 10:14 aspect ratios (reference
    ``models/detection/rcnn.py:46-75``; factory name keeps the reference's typo
    for API parity)."""
    from .convnext import convnext_tiny

    kw = dict(
        num_classes=2,
        anchor_sizes=((32, 64, 128, 256, 512),) * 3,
        aspect_ratios=(10 / 14, 1.0, 14 / 10),
        rpn_pre_nms_top_n_test=150,
        rpn_post_nms_top_n_test=150,
        box_detections_per_img=1,
    )
    kw.update(overrides)
    cfg = RCNNConfig(**kw)
    backbone = BackboneWithFPN(
        backbone=convnext_tiny(features_only=True),
        in_levels=("c4", "c5"),
    )
    return GeneralizedRCNN(backbone=backbone, cfg=cfg)


def convnext_tiny_keypoint_rcnn(**overrides) -> GeneralizedRCNN:
    """ConvNeXt-T Keypoint R-CNN over the full 4-level pyramid (reference
    ``models/detection/rcnn.py:78-101``)."""
    from .convnext import convnext_tiny

    kw = dict(num_classes=2, num_keypoints=3, box_detections_per_img=1)
    kw.update(overrides)
    cfg = RCNNConfig(**kw)
    backbone = BackboneWithFPN(backbone=convnext_tiny(features_only=True))
    return GeneralizedRCNN(backbone=backbone, cfg=cfg)


def mobile_net_v3_large_keypoint_rcnn(quant_kp=None, frozen_stats=True,
                                      bn_momentum=0.99,
                                      **overrides) -> GeneralizedRCNN:
    """MobileNetV3-Large Keypoint R-CNN (reference
    ``models/detection/rcnn.py:104-126``).

    ``quant_kp``: int8 PTQ for the keypoint head conv chain (the MBv3 trunk
    itself has no int8 path — it is already cheap, see PERF.md).
    ``frozen_stats``: torchvision FrozenBatchNorm2d parity (ref ``:111``,
    always pretrained there). Training FROM SCRATCH (the offline smoke
    recipe — no pretrained stats exist) needs ``False``: identity frozen
    stats at random init leave the deep narrow trunk un-normalized and it
    never converges (measured: 22 epochs, AP50 pinned at 0). Live-BN-train
    then frozen-serve is exactly torchvision's pretrain→freeze semantics —
    checkpointed batch_stats feed the frozen serving twin unchanged."""
    from .mobilenet_v3 import mobilenet_v3_large

    kw = dict(
        num_classes=2, num_keypoints=3, box_detections_per_img=1,
        anchor_sizes=((32, 64, 128, 256, 512),) * 3,
        aspect_ratios=(0.5, 1.0, 2.0),
    )
    kw.update(overrides)
    cfg = RCNNConfig(**kw)
    backbone = BackboneWithFPN(
        backbone=mobilenet_v3_large(features_only=True,
                                    frozen_stats=frozen_stats,
                                    bn_momentum=bn_momentum),
        in_levels=("c4", "c5"),
    )
    return GeneralizedRCNN(backbone=backbone, cfg=cfg, quant_kp=quant_kp)
