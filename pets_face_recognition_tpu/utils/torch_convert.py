"""torch → flax weight conversion.

Parity evaluation against the reference requires loading its PyTorch checkpoints
(torchvision ``resnet50`` FE trunks, ``maskrcnn``/``keypointrcnn`` state dicts, the
from-scratch Swin — SURVEY.md §7 "Weight-compatibility") into this framework's flax
trees. These converters do tensor-layout translation only:

- conv: ``(O, I, kh, kw)`` → ``(kh, kw, I, O)``;
- dense: ``(O, I)`` → ``(I, O)``;
- batchnorm: weight/bias → scale/bias params; running mean/var → batch_stats.

Input is a ``{name: np.ndarray}`` state dict — call ``state_dict_to_numpy`` on a
loaded torch checkpoint first so this module never imports torch at framework
runtime.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def state_dict_to_numpy(state_dict) -> dict[str, np.ndarray]:
    """Detach a torch state dict to plain numpy (host)."""
    out = {}
    for k, v in state_dict.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_resnet(
    sd: Mapping[str, np.ndarray], prefix: str = ""
) -> tuple[dict, dict]:
    """torchvision ResNet state dict → (params, batch_stats) for ``models.resnet.ResNet``.

    ``prefix`` strips a leading module path (e.g. ``"model.model."`` for reference FE
    checkpoints whose tree is ``SoftmaxBasedMetricLearning.model``).
    """
    params: dict = {}
    stats: dict = {}

    def bn(dst: tuple[str, ...], src: str):
        _set(params, dst + ("scale",), sd[f"{src}.weight"])
        _set(params, dst + ("bias",), sd[f"{src}.bias"])
        _set(stats, dst + ("mean",), sd[f"{src}.running_mean"])
        _set(stats, dst + ("var",), sd[f"{src}.running_var"])

    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    _set(params, ("conv1", "kernel"), _conv(sd["conv1.weight"]))
    bn(("bn1",), "bn1")

    block_keys = sorted(
        {m.group(0) for k in sd for m in [re.match(r"layer(\d+)\.(\d+)", k)] if m}
    )
    for bk in block_keys:
        stage, idx = re.match(r"layer(\d+)\.(\d+)", bk).groups()
        name = f"layer{stage}_{idx}"
        n_convs = len({k for k in sd if re.match(rf"{re.escape(bk)}\.conv\d+\.", k)})
        for c in range(1, n_convs + 1):
            _set(params, (name, f"conv{c}", "kernel"),
                 _conv(sd[f"{bk}.conv{c}.weight"]))
            bn((name, f"bn{c}"), f"{bk}.bn{c}")
        if f"{bk}.downsample.0.weight" in sd:
            _set(params, (name, "downsample_conv", "kernel"),
                 _conv(sd[f"{bk}.downsample.0.weight"]))
            bn((name, "downsample_bn"), f"{bk}.downsample.1")

    if "fc.weight" in sd:
        _set(params, ("fc", "kernel"), _dense(sd["fc.weight"]))
        _set(params, ("fc", "bias"), sd["fc.bias"])
    return params, stats


def convert_fe_embedder(sd: Mapping[str, np.ndarray],
                        prefix: str = "model.") -> tuple[dict, dict]:
    """Reference FE checkpoint (resnet50 + fc→512) → ``models.embedder.EmbeddingModel``.

    Reference FE state dicts live under ``model.`` inside
    ``SoftmaxBasedMetricLearning`` (``losses/__init__.py``); the ``add_margin`` head is
    stripped from shipped checkpoints (``download_models.py:8-9``) and ignored here.
    """
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    backbone_params, backbone_stats = convert_resnet(
        {k: v for k, v in sd.items() if not k.startswith("fc.")}
    )
    params = {"backbone": backbone_params}
    if "fc.weight" in sd:
        params["fc"] = {
            "kernel": _dense(sd["fc.weight"]),
            "bias": sd["fc.bias"],
        }
    return params, {"backbone": backbone_stats}


def convert_swin(sd: Mapping[str, np.ndarray], prefix: str = "") -> dict:
    """Reference from-scratch Swin (berniwal layout, ``models/swin.py``) →
    ``models.swin.SwinTransformer`` params."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: dict = {}
    for stage in range(1, 5):
        sp = f"stage{stage}"
        _set(params, (sp, "patch_partition", "linear", "kernel"),
             _dense(sd[f"{sp}.patch_partition.linear.weight"]))
        _set(params, (sp, "patch_partition", "linear", "bias"),
             sd[f"{sp}.patch_partition.linear.bias"])
        pair = 0
        while f"{sp}.layers.{pair}.0.attention_block.fn.norm.weight" in sd:
            for half, kind in ((0, "regular"), (1, "shifted")):
                src = f"{sp}.layers.{pair}.{half}"
                dst = (sp, f"block{pair}_{kind}")
                _set(params, dst + ("attn_norm", "scale"),
                     sd[f"{src}.attention_block.fn.norm.weight"])
                _set(params, dst + ("attn_norm", "bias"),
                     sd[f"{src}.attention_block.fn.norm.bias"])
                attn = f"{src}.attention_block.fn.fn"
                _set(params, dst + ("attn", "to_qkv", "kernel"),
                     _dense(sd[f"{attn}.to_qkv.weight"]))
                _set(params, dst + ("attn", "pos_embedding"),
                     sd[f"{attn}.pos_embedding"])
                _set(params, dst + ("attn", "to_out", "kernel"),
                     _dense(sd[f"{attn}.to_out.weight"]))
                _set(params, dst + ("attn", "to_out", "bias"),
                     sd[f"{attn}.to_out.bias"])
                _set(params, dst + ("mlp_norm", "scale"),
                     sd[f"{src}.mlp_block.fn.norm.weight"])
                _set(params, dst + ("mlp_norm", "bias"),
                     sd[f"{src}.mlp_block.fn.norm.bias"])
                mlp = f"{src}.mlp_block.fn.fn.net"
                _set(params, dst + ("mlp_fc1", "kernel"), _dense(sd[f"{mlp}.0.weight"]))
                _set(params, dst + ("mlp_fc1", "bias"), sd[f"{mlp}.0.bias"])
                _set(params, dst + ("mlp_fc2", "kernel"), _dense(sd[f"{mlp}.2.weight"]))
                _set(params, dst + ("mlp_fc2", "bias"), sd[f"{mlp}.2.bias"])
            pair += 1
    if "mlp_head.0.weight" in sd:
        _set(params, ("head_norm", "scale"), sd["mlp_head.0.weight"])
        _set(params, ("head_norm", "bias"), sd["mlp_head.0.bias"])
        _set(params, ("head_fc", "kernel"), _dense(sd["mlp_head.1.weight"]))
        _set(params, ("head_fc", "bias"), sd["mlp_head.1.bias"])
    return params


def _deconv(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kh, kw) → flax ConvTranspose kernel
    (kh, kw, out, in) with ``transpose_kernel=True`` (numerically verified)."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_detection_model(
    sd: Mapping[str, np.ndarray],
    with_mask: bool = False,
    num_keypoints: int = 0,
    prefix: str = "",
) -> tuple[dict, dict]:
    """torchvision Mask/Keypoint/Faster R-CNN state dict →
    (params, batch_stats) for ``models.rcnn.GeneralizedRCNN``.

    Handles the production checkpoints' layouts
    (``maskrcnn_resnet50_fpn`` / ``keypointrcnn_resnet50_fpn``):
    ``backbone.body`` (resnet, frozen BN) / ``backbone.fpn`` / ``rpn.head`` /
    ``roi_heads.{box_head, box_predictor, mask_*, keypoint_*}``.
    Frozen BN appears as plain ``weight/bias/running_*`` tensors.
    """
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: dict = {}
    stats: dict = {}

    body = {k[len("backbone.body."):]: v for k, v in sd.items()
            if k.startswith("backbone.body.")}
    p_body, s_body = convert_resnet(body)
    params["backbone"] = {"backbone": p_body}
    stats["backbone"] = {"backbone": s_body}

    fpn: dict = {}
    for i in range(4):
        for tv_name, ours in ((f"backbone.fpn.inner_blocks.{i}", f"inner_{i}"),
                              (f"backbone.fpn.layer_blocks.{i}", f"layer_{i}")):
            # torchvision >=0.12 nests a Conv2dNormActivation: ".0.weight"
            for suffix in (".weight", ".0.weight"):
                if tv_name + suffix in sd:
                    fpn[ours] = {
                        "kernel": _conv(sd[tv_name + suffix]),
                        "bias": sd[tv_name + suffix.replace("weight", "bias")],
                    }
    params["backbone"]["fpn"] = fpn

    rpn: dict = {}
    for tv_name, ours in (("rpn.head.conv", "conv"),
                          ("rpn.head.conv.0.0", "conv"),
                          ("rpn.head.cls_logits", "cls_logits"),
                          ("rpn.head.bbox_pred", "bbox_pred")):
        if f"{tv_name}.weight" in sd:
            rpn[ours] = {"kernel": _conv(sd[f"{tv_name}.weight"]),
                         "bias": sd[f"{tv_name}.bias"]}
    params["rpn"] = rpn

    params["box_head"] = {
        "fc6": {"kernel": _dense(sd["roi_heads.box_head.fc6.weight"]),
                "bias": sd["roi_heads.box_head.fc6.bias"]},
        "fc7": {"kernel": _dense(sd["roi_heads.box_head.fc7.weight"]),
                "bias": sd["roi_heads.box_head.fc7.bias"]},
    }
    params["box_predictor"] = {
        "cls_score": {
            "kernel": _dense(sd["roi_heads.box_predictor.cls_score.weight"]),
            "bias": sd["roi_heads.box_predictor.cls_score.bias"]},
        "bbox_pred": {
            "kernel": _dense(sd["roi_heads.box_predictor.bbox_pred.weight"]),
            "bias": sd["roi_heads.box_predictor.bbox_pred.bias"]},
    }

    if with_mask:
        mask: dict = {}
        for i in range(1, 5):
            key = f"roi_heads.mask_head.mask_fcn{i}"
            if f"{key}.weight" not in sd:  # >=0.12 nested layout
                key = f"roi_heads.mask_head.{i - 1}.0"
            mask[f"mask_fcn{i}"] = {"kernel": _conv(sd[f"{key}.weight"]),
                                    "bias": sd[f"{key}.bias"]}
        mask["conv5_mask"] = {
            "kernel": _deconv(sd["roi_heads.mask_predictor.conv5_mask.weight"]),
            "bias": sd["roi_heads.mask_predictor.conv5_mask.bias"]}
        mask["mask_fcn_logits"] = {
            "kernel": _conv(sd["roi_heads.mask_predictor.mask_fcn_logits.weight"]),
            "bias": sd["roi_heads.mask_predictor.mask_fcn_logits.bias"]}
        params["mask_head"] = mask

    if num_keypoints:
        kp: dict = {}
        for i in range(1, 9):
            # torchvision KeypointRCNNHeads is an nn.Sequential of conv/relu:
            # conv i lives at index 2*(i-1)
            key = f"roi_heads.keypoint_head.{2 * (i - 1)}"
            kp[f"kps_fcn{i}"] = {"kernel": _conv(sd[f"{key}.weight"]),
                                 "bias": sd[f"{key}.bias"]}
        kp["kps_score_lowres"] = {
            "kernel": _deconv(
                sd["roi_heads.keypoint_predictor.kps_score_lowres.weight"]),
            "bias": sd["roi_heads.keypoint_predictor.kps_score_lowres.bias"]}
        params["keypoint_head"] = kp

    return params, stats


def assert_tree_shapes(expected: Any, got: Any, path: str = "") -> None:
    """Recursively check that ``got`` covers ``expected`` with matching shapes."""
    if isinstance(expected, dict):
        for k, v in expected.items():
            if not isinstance(got, dict) or k not in got:
                raise KeyError(f"missing converted weight: {path}/{k}")
            assert_tree_shapes(v, got[k], f"{path}/{k}")
        return
    e, g = np.shape(expected), np.shape(got)
    if e != g:
        raise ValueError(f"shape mismatch at {path}: expected {e}, got {g}")
