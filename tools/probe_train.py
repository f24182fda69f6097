"""Per-stage probe of the detection train steps (VERDICT r3 #4).

Gives `trainer.fit`'s hot loop the same rigor the serving path got: isolated
fwd+bwd jits of cumulative stage prefixes of the Mask/Keypoint R-CNN train
step (isolated jits per stage prefix rather than cumulative-delta subtraction; PERF.md "Timing on the axon backend"), plus
an analytic-ish MFU estimate from XLA's own cost model (``cost_analysis()``
of the CPU-lowered graph counts FLOPs; the TPU wall time divides into it).

Stages (each is a full ``value_and_grad`` + host-pull-forced timing):
  p1  backbone+FPN                 (dummy sum-of-squares loss on the pyramid)
  p2  + RPN head + RPN loss        (targets, balanced sampling, smooth-l1)
  p3  + proposals + box branch     (NMS path, RoI sampling, box RoIAlign+head)
  p4  + task head branch = FULL    (mask or keypoint head on the positive
                                    budget, target projection, loss)
Deltas between consecutive stages localize the cost; `opt` adds the SGD
update. Timing uses chained-state host-pull forcing (PERF.md axon traps).

Usage: python tools/probe_train.py [--kind kp|mask] [--iters 8] [--flops]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PEAK_BF16_TFLOPS = 197.0  # v5e MXU peak (bf16); int8 is 2x


def make_setup(kind: str, bf16: bool = True, all_rois: bool = False):
    import jax
    import jax.numpy as jnp

    from pets_face_recognition_tpu.models.rcnn import (
        keypointrcnn_resnet50_fpn,
        maskrcnn_resnet50_fpn,
    )

    B, S, G = 4, 320, 4
    # all_rois=True: task heads over every sampled RoI (the pre-round-4
    # baseline) instead of the positive budget — the before/after pair for
    # the positive-budget win (VERDICT r4 #4)
    overrides = {"task_heads_on_positives_only": not all_rois}
    model = (keypointrcnn_resnet50_fpn(**overrides) if kind == "kp"
             else maskrcnn_resnet50_fpn(**overrides))
    if bf16:
        inner = model.backbone.backbone.clone(dtype=jnp.bfloat16)
        fpn = model.backbone.clone(dtype=jnp.bfloat16, backbone=inner)
        model = model.clone(dtype=jnp.bfloat16, backbone=fpn)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(B, S, S, 3), jnp.float32)
    x1 = rs.uniform(10, 150, (B, G)); y1 = rs.uniform(10, 150, (B, G))
    boxes = np.stack([x1, y1, x1 + rs.uniform(40, 120, (B, G)),
                      y1 + rs.uniform(40, 120, (B, G))], -1)
    targets = {
        "boxes": jnp.asarray(boxes, jnp.float32),
        "labels": jnp.ones((B, G), jnp.int32),
        "valid": jnp.ones((B, G), bool),
    }
    if kind == "kp":
        kps = boxes[:, :, None, :2] + rs.uniform(5, 35, (B, G, 3, 2))
        targets["keypoints"] = jnp.asarray(
            np.concatenate([kps, np.ones((B, G, 3, 1))], -1), jnp.float32)
    else:
        targets["masks"] = jnp.asarray(rs.rand(B, G, S, S) > 0.5, jnp.float32)

    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda r: model.init(
        {"params": r, "sampler": r}, images, targets, train=True))(rng)
    return model, variables, images, targets, B


def stage_losses(model, stage: str):
    """A ``method=`` callable computing the prefix loss for ``stage``."""
    import jax
    import jax.numpy as jnp

    from pets_face_recognition_tpu.models import roi_heads as rh
    from pets_face_recognition_tpu.models.rpn import (
        generate_proposals,
        rpn_loss,
    )

    def run(m, images, targets):
        c = m.cfg
        B = images.shape[0]
        feats = m.backbone(images, train=True)
        if stage == "p1_backbone_fpn":
            return sum(jnp.sum(jnp.square(f.astype(jnp.float32)))
                       for f in feats.values()) * 1e-6
        anchors, level_ids, strides = m._anchors_and_levels(
            feats, images.shape[1:3])
        objectness, deltas = m.rpn_head(feats)
        rng = m.make_rng("sampler")
        rpn_rng, box_rng = jax.random.split(rng)
        losses = rpn_loss(objectness, deltas, anchors, targets["boxes"],
                          targets["valid"], rpn_rng,
                          c.rpn_batch_size_per_image, c.rpn_positive_fraction)
        if stage == "p2_rpn":
            return sum(losses.values())
        proposals, prop_valid = generate_proposals(
            jax.lax.stop_gradient(objectness), jax.lax.stop_gradient(deltas),
            anchors, level_ids, images.shape[1:3],
            c.rpn_pre_nms_top_n_train, c.rpn_post_nms_top_n_train,
            c.rpn_nms_thresh, num_levels=int(np.asarray(level_ids).max()) + 1)
        if stage == "p2b_proposals":
            # proposals are stop-grad: folding them in at 1e-20 forces the
            # decode+NMS forward without changing the p2 backward, so
            # (p2b - p2) isolates proposal generation
            return sum(losses.values()) + 1e-20 * jnp.sum(proposals)
        keys = jax.random.split(box_rng, B)
        sample = jax.vmap(
            lambda p, pv, gb, gl, gv, k: rh.select_training_samples(
                p, pv, gb, gl, gv, k,
                c.box_batch_size_per_image, c.box_positive_fraction,
                c.box_fg_iou_thresh, c.box_bg_iou_thresh))
        boxes, cls_t, gt_idx, valid, fg = sample(
            proposals, prop_valid, targets["boxes"], targets["labels"],
            targets["valid"], keys)
        if stage == "p2c_sampling":
            # sampling outputs are index/box constants (no grad path), so
            # (p2c - p2b) isolates IoU matrix + matcher + balanced sampler
            return (sum(losses.values()) + 1e-20 * jnp.sum(boxes)
                    + 1e-20 * jnp.sum(cls_t.astype(jnp.float32)))
        S = boxes.shape[1]
        boxes_flat = boxes.reshape(B * S, 4)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), S)
        pool_names, pool_feats = m._pool_levels(feats)
        class_logits, box_deltas = m._box_forward(
            pool_names, pool_feats, boxes_flat, batch_idx, strides,
            train=True)
        matched = jnp.take_along_axis(
            targets["boxes"], gt_idx[..., None], axis=1).reshape(B * S, 4)
        losses.update(rh.fastrcnn_loss(
            class_logits, box_deltas, boxes_flat, cls_t.reshape(-1),
            matched, valid.reshape(-1), fg.reshape(-1)))
        if stage == "p3_box_branch":
            return sum(losses.values())
        raise ValueError(stage)

    return run


def bench_grad(fn, params, extra_vars, images, targets, iters, rngs_seed=7):
    """Host-pull-forced timing of ``value_and_grad(fn)`` (PERF.md traps)."""
    import jax

    @jax.jit
    def step(p, scale):
        def loss_fn(pp):
            return fn(pp) * scale

        loss, grads = jax.value_and_grad(loss_fn)(p)
        leaf = jax.tree_util.tree_leaves(grads)[0]
        return loss, leaf

    loss, leaf = step(params, 1.0)
    float(np.asarray(loss))
    t0 = time.perf_counter()
    acc = None
    for i in range(iters):
        # chained scale: makes each iteration depend on the previous pull-free
        loss, leaf = step(params, 1.0 + 1e-9 * i)
        acc = loss
    float(np.asarray(acc))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", default="kp", choices=("kp", "mask"))
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--no-bf16", action="store_true")
    ap.add_argument("--all-rois", action="store_true",
                    help="task heads over ALL sampled RoIs (pre-round-4 "
                         "baseline) instead of the positive budget")
    ap.add_argument("--flops", action="store_true",
                    help="also count full-step FLOPs via XLA cost analysis "
                         "(lowers the graph on CPU) and report MFU")
    args = ap.parse_args()

    import jax

    from pets_face_recognition_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    model, variables, images, targets, B = make_setup(
        args.kind, bf16=not args.no_bf16, all_rois=args.all_rois)
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    results = {}
    for stage in ("p1_backbone_fpn", "p2_rpn", "p2b_proposals",
                  "p2c_sampling", "p3_box_branch"):
        run = stage_losses(model, stage)

        def fn(p, _run=run):
            return model.apply(
                {"params": p, **other}, images, targets, method=_run,
                rngs={"sampler": jax.random.PRNGKey(7)})

        results[stage] = bench_grad(fn, params, other, images, targets,
                                    args.iters)
        print(f"{stage}: {results[stage]:.1f} ms", flush=True)

    def full(p):
        losses = model.apply({"params": p, **other}, images, targets,
                             train=True, rngs={"sampler": jax.random.PRNGKey(7)})
        return sum(losses.values())

    results["p4_full"] = bench_grad(full, params, other, images, targets,
                                    args.iters)
    print(f"p4_full: {results['p4_full']:.1f} ms", flush=True)

    deltas = {
        "backbone_fpn": results["p1_backbone_fpn"],
        "rpn_head_loss": results["p2_rpn"] - results["p1_backbone_fpn"],
        "proposal_gen": results["p2b_proposals"] - results["p2_rpn"],
        "roi_sampling": results["p2c_sampling"] - results["p2b_proposals"],
        "box_align_head": (results["p3_box_branch"]
                           - results["p2c_sampling"]),
        "task_branch": results["p4_full"] - results["p3_box_branch"],
    }

    out = {"kind": args.kind, "batch": B, "all_rois": args.all_rois,
           "stages_ms": {k: round(v, 1) for k, v in results.items()},
           "deltas_ms": {k: round(v, 1) for k, v in deltas.items()}}

    if args.flops:
        import subprocess
        import sys as _sys

        # lower the full step on CPU in a subprocess (this process owns the
        # TPU backend; cost analysis only needs the HLO)
        code = (
            "import jax, numpy as np; jax.config.update('jax_platforms','cpu')\n"
            "import sys; sys.path.insert(0, '.')\n"
            "from tools.probe_train import make_setup\n"
            f"model, variables, images, targets, B = make_setup({args.kind!r}, bf16=False, all_rois={args.all_rois})\n"
            "params = variables['params']\n"
            "other = {k: v for k, v in variables.items() if k != 'params'}\n"
            "def full(p):\n"
            "    losses = model.apply({'params': p, **other}, images, targets,"
            " train=True, rngs={'sampler': jax.random.PRNGKey(7)})\n"
            "    return sum(losses.values())\n"
            "g = jax.jit(jax.value_and_grad(full))\n"
            "c = g.lower(params).compile().cost_analysis()\n"
            "print('FLOPS', c.get('flops', float('nan')))\n"
        )
        proc = subprocess.run([_sys.executable, "-c", code], cwd=Path(
            __file__).resolve().parent.parent, capture_output=True, text=True,
            timeout=1800)
        flops = None
        for line in proc.stdout.splitlines():
            if line.startswith("FLOPS"):
                flops = float(line.split()[1])
        if flops:
            tflops_step = flops / 1e12
            mfu = tflops_step / (results["p4_full"] / 1000) / PEAK_BF16_TFLOPS
            out["step_tflops"] = round(tflops_step, 2)
            out["mfu_vs_bf16_peak"] = round(mfu, 4)
        else:
            out["flops_error"] = proc.stderr[-400:]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
