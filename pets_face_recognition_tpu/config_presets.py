"""Builders for the production config set.

The reference ships 12 executable configs that differ only in dataset directory,
crop size, and optimizer (SURVEY.md §2.2). Each ``configs/*.py`` file here stays a
thin executable module calling one of these builders and dumping the returned dict
into its globals — same public contract (``model``, ``loss``, ``optimizer``,
``train_dataloader``, ``pair_generator`` …), one implementation.

FE recipe parity (``configs/cat_fe/cat_fe_head.py``):
- dataset: pre-transformed aligned crops, simple scan, min 3 images/identity;
- 50/50 identity split seeded with ``np.random.RandomState(seed).permutation``;
- extra petfinder identities appended to training with ``start_class`` offset;
- labels remapped so train identities are contiguous from 0;
- ``PairGenerator(dataset, 10000, 1, None, seed, val_users)``;
- ResNet-50 → 512-d embedder, ArcFace + focal;
- SGD groups (backbone lr/2, fc lr, margin lr + wd), MultiStepLR [35, 45] × 0.1 —
  or AdamW for the ``simple_fe_*`` variants;
- 50 epochs, train bs 64, test bs 20, thrs ``linspace(0.5, 0.99, 6)``,
  ``far_thr`` list, ``k = [5, 10, 100]``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .data_loading import (
    ConcatDataset,
    DataLoader,
    PairGenerator,
    RecDataset,
    RecSubset,
)
from .data_loading.dataset import simple_init_dataset
from .losses import SoftmaxBasedMetricLearning
from .models import resnet50_embedder
from .utils.optim import detection_sgd_optimizer, fe_adamw_optimizer, fe_sgd_optimizer
from .utils.preprocs import FETrainAug, FEValAug


def build_fe_config(
    dataset_dir: str,
    extra_dataset_dir: str | None = None,
    seed: int = 123,
    n_epochs: int = 50,
    train_batch_size: int = 64,
    test_batch_size: int = 20,
    optimizer_kind: str = "sgd",
    lr: float | None = None,
    crop: int = 220,
    size: int = 224,
    emb_size: int = 512,
    experiment_name: str = "default",
    run_name: str = "run",
    output: str = "results",
    num_workers: int = 8,
    compute_dtype: str = "auto",
    n_pairs: int = 10000,
) -> dict:
    """Build the full FE config dict (reference ``cat_fe_head.py`` recipe).

    ``compute_dtype``: 'auto' = bfloat16 on TPU / float32 elsewhere (params and
    normalization stats stay float32 either way).
    """
    import jax
    import jax.numpy as jnp

    if compute_dtype == "auto":
        dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    else:
        dtype = jnp.dtype(compute_dtype)
    rng_seed = seed
    train_aug = FETrainAug(np.random.RandomState(seed), crop=crop, size=size)
    val_aug = FEValAug()

    dataset = RecDataset(
        Path(dataset_dir), None, 3, init_dataset_method=simple_init_dataset
    )
    perm = np.random.RandomState(seed).permutation(dataset.get_users())
    tr_size = 0.5
    train_users = [perm[i] for i in range(int(len(perm) * tr_size))]
    val_users = [perm[i] for i in range(int(len(perm) * tr_size), len(perm))]
    train_indices = [j for u in train_users for j in dataset.uid_to_indices[u]]
    val_indices = [j for u in val_users for j in dataset.uid_to_indices[u]]
    assert not set(train_indices) & set(val_indices)

    train = RecSubset(dataset, train_indices, train_aug)
    n_extra_classes = 0
    if extra_dataset_dir is not None and Path(extra_dataset_dir).exists():
        extra = RecDataset(
            Path(extra_dataset_dir), None, 3,
            init_dataset_method=simple_init_dataset,
            start_class=len(train_users),
        )
        n_extra_classes = len(extra.get_users())
        train = ConcatDataset(
            (train, RecSubset(extra, list(range(len(extra))), train_aug))
        )
    val = RecSubset(dataset, val_indices, val_aug)
    # remap train identities to contiguous labels (reference cat_fe_head.py:60-61)
    for a, b in enumerate(train_users):
        dataset.label_map[b] = a

    pair_gen = PairGenerator(dataset, n_pairs, 1, None, seed, val_users)
    num_classes = len(train_users) + n_extra_classes

    steps_per_epoch = max(len(train) // train_batch_size, 1)

    def model():
        return resnet50_embedder(embedding_dim=emb_size, dtype=dtype)

    def loss(config, m):
        return SoftmaxBasedMetricLearning(
            model=m, emb_size=emb_size, num_classes=num_classes,
            margin_type="arc", use_focal=True,
        )

    def optimizer(config):
        milestones = [35 * steps_per_epoch, 45 * steps_per_epoch]
        if optimizer_kind == "adamw":
            return fe_adamw_optimizer(lr or 1e-4,
                                      milestones_steps=milestones)
        return fe_sgd_optimizer(lr or 1e-2, milestones_steps=milestones)

    def train_dataloader():
        return DataLoader(train, train_batch_size, shuffle=True, seed=seed,
                          drop_last=True, num_workers=num_workers)

    def val_dataloader():
        return DataLoader(val, test_batch_size, shuffle=False, drop_last=False,
                          num_workers=num_workers)

    def pair_generator(idx):
        if idx == 0:
            return "Val", pair_gen
        if idx == 1:
            return "Val 1", pair_gen
        raise Exception(idx)

    out = Path(output)
    out.mkdir(exist_ok=True)
    return dict(
        seed=rng_seed,
        n_epochs=n_epochs,
        train_batch_size=train_batch_size,
        test_batch_size=test_batch_size,
        emb_size=emb_size,
        num_classes=num_classes,
        thrs=np.linspace(0.5, 0.99, 6),
        far_thr=[0.1, 0.05, 0.03, 0.01, 0.005, 0.001],
        k=[5, 10, 100],
        model=model,
        loss=loss,
        optimizer=optimizer,
        train_dataloader=train_dataloader,
        val_dataloader=val_dataloader,
        pair_generator=pair_generator,
        output=out,
        experiment_name=experiment_name,
        run_name=run_name,
        dataset=dataset,
        mesh_shape=(-1,),
        mesh_axes=("data",),
    )


def build_mask_config(
    data_root: str = "../pets_datasets",
    seed: int = 123,
    n_epochs: int = 65,
    train_batch_size: int = 8,
    test_batch_size: int = 8,
    image_size: tuple[int, int] = (640, 640),
    max_boxes: int = 4,
    output: str = "results",
    num_workers: int = 8,
) -> dict:
    """Mask R-CNN body config (reference ``configs/mask/mask_rcnn_config.py``):
    Oxford-IIIT Pet with trimap-derived body boxes + masks, ResNet-50 FPN, 2
    classes, 3 detections/img, min 320 / max 640 multiscale → fixed 640 letterbox."""
    from .data_loading.oxford import OxfordIIITPet, OxfordSubset
    from .models.rcnn import maskrcnn_resnet50_fpn
    from .losses import SumDetectionLoss
    from .utils.collate import DetectionCollate

    base = OxfordIIITPet(
        Path(data_root) / "oxford-iiit-pet",
        target_types=("body_bbox", "segmentation"),
    )
    n = len(base)
    perm = np.random.RandomState(seed).permutation(n)
    split = int(n * 0.8)
    train_ds = OxfordSubset(base, perm[:split].tolist(), rotate=True,
                            seed=seed)
    val_ds = OxfordSubset(base, perm[split:].tolist())

    collate = DetectionCollate(image_size, max_boxes=max_boxes, with_masks=True)

    def model():
        return maskrcnn_resnet50_fpn(num_classes=2, box_detections_per_img=3)

    def loss(config, m):
        return SumDetectionLoss(model=m)

    def optimizer(config):
        steps = max(split // train_batch_size, 1)
        return detection_sgd_optimizer(
            5e-3, milestones_steps=[40 * steps, 55 * steps])

    def train_dataloader():
        return DataLoader(train_ds, train_batch_size, shuffle=True, seed=seed,
                          drop_last=True, collate_fn=collate,
                          num_workers=num_workers)

    def val_dataloader():
        return DataLoader(val_ds, test_batch_size, shuffle=False,
                          drop_last=True, collate_fn=collate,
                          num_workers=num_workers)

    out = Path(output)
    out.mkdir(exist_ok=True)
    return dict(
        seed=seed, n_epochs=n_epochs,
        train_batch_size=train_batch_size, test_batch_size=test_batch_size,
        image_size=image_size, max_boxes=max_boxes,
        model=model, loss=loss, optimizer=optimizer,
        train_dataloader=train_dataloader, val_dataloader=val_dataloader,
        output=out, experiment_name="Detection", run_name="mask_rcnn",
    )


def build_keypoint_config(
    data_root: str = "../pets_datasets",
    seed: int = 123,
    n_epochs: int = 25,
    train_batch_size: int = 16,
    test_batch_size: int = 8,
    image_size: tuple[int, int] = (640, 640),
    max_boxes: int = 4,
    output: str = "results",
    num_workers: int = 8,
    fixtures_dir: str = ".",
    arch: str = "resnet50",
) -> dict:
    """Keypoint R-CNN head+landmark config (reference
    ``configs/keypoint/keypoints_config.py``): CAT_DATASET 3-landmark files with
    an 80/20 split + rot90 augmentation, concatenated with the two curated
    dog-annotation fixtures (``paths{,2}.pickle``/``others{,2}.pickle`` over
    data_25 images, ref ``:52-64``) when present; 3 keypoints, 1 det/img.

    ``arch``: "resnet50" (production quality model) or "mobile" (the
    reference's lightweight MobileNetV3 serving factory,
    ``models/detection/rcnn.py:104-126``)."""
    import pickle

    from .data_loading import ConcatDataset
    from .data_loading.dataset import SimpleDataset
    from .data_loading.lmd_dataset import CatLMDDataset, CatLMDSubset
    from .models.rcnn import keypointrcnn_resnet50_fpn
    from .losses import SumDetectionLoss
    from .utils.collate import DetectionCollate

    cat_dir = Path(data_root) / "CAT_DATASET"
    if not cat_dir.exists():
        cat_dir = Path(data_root) / "cats"
    base = CatLMDDataset(cat_dir)
    n = len(base)
    perm = np.random.RandomState(seed).permutation(n)
    split = int(n * 0.8)
    train_ds = CatLMDSubset(base, perm[:split].tolist(), rotate90=True,
                            seed=seed)
    val_ds = CatLMDSubset(base, perm[split:].tolist())

    extra_parts = []
    for pa, ot in (("paths.pickle", "others.pickle"),
                   ("paths2.pickle", "others2.pickle")):
        pa_p, ot_p = Path(fixtures_dir) / pa, Path(fixtures_dir) / ot
        if pa_p.exists() and ot_p.exists():
            with open(pa_p, "rb") as f:
                paths = pickle.load(f)
            with open(ot_p, "rb") as f:
                others = pickle.load(f)
            extra_parts.append(SimpleDataset(
                Path(data_root) / "data_25", paths, others, rotate90=True,
                rng=np.random.RandomState(seed),
            ))
    if extra_parts:
        train_ds = ConcatDataset([train_ds, *extra_parts])

    collate = DetectionCollate(image_size, max_boxes=max_boxes,
                               num_keypoints=3)

    def model():
        if arch == "mobile":
            from .models.rcnn import mobile_net_v3_large_keypoint_rcnn

            # live BN for from-scratch smoke training (no pretrained frozen
            # stats offline); serving rebuilds with frozen_stats=True over
            # the SAME checkpoint (batch_stats tree is identical). momentum
            # 0.9: short runs need the running stats to converge in ~100
            # steps (see models/mobilenet_v3.py bn_momentum note)
            return mobile_net_v3_large_keypoint_rcnn(frozen_stats=False,
                                                     bn_momentum=0.9)
        return keypointrcnn_resnet50_fpn(num_classes=2, num_keypoints=3,
                                         box_detections_per_img=1)

    def loss(config, m):
        return SumDetectionLoss(model=m)

    def optimizer(config):
        steps = max(split // train_batch_size, 1)
        return detection_sgd_optimizer(
            5e-3, milestones_steps=[18 * steps, 23 * steps])

    def train_dataloader():
        return DataLoader(train_ds, train_batch_size, shuffle=True, seed=seed,
                          drop_last=True, collate_fn=collate,
                          num_workers=num_workers)

    def val_dataloader():
        return DataLoader(val_ds, test_batch_size, shuffle=False,
                          drop_last=True, collate_fn=collate,
                          num_workers=num_workers)

    out = Path(output)
    out.mkdir(exist_ok=True)
    return dict(
        seed=seed, n_epochs=n_epochs,
        train_batch_size=train_batch_size, test_batch_size=test_batch_size,
        image_size=image_size, max_boxes=max_boxes,
        model=model, loss=loss, optimizer=optimizer,
        train_dataloader=train_dataloader, val_dataloader=val_dataloader,
        output=out, experiment_name="Keypoints",
        run_name=("keypoint_rcnn" if arch == "resnet50"
                  else f"keypoint_rcnn_{arch}"),
    )
