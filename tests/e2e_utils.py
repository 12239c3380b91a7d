"""Synthetic 2-class blob dataset in the reference's on-disk layout
(annotations/{split}/*.npy + img_with_margin_0/{split}/*.npy +
all_images.json) — the integration fixture from SURVEY.md §4 item 3."""

import json
import os

import numpy as np

TINY_EM_CONFIG = """
# Synthetic EM-style smoke config (UNet-ASPP, 2 classes, 24 prototypes).
construct_PPNet.base_architecture = 'unet_aspp'
construct_PPNet.pretrained = False
construct_PPNet.prototype_shape = (24, 8, 1, 1)
construct_PPNet.num_classes = 2
construct_PPNet.prototype_activation_function = 'log'
construct_PPNet.add_on_layers_type = 'deeplab_simple'
construct_PPNet.scale_head_type = None

unet_aspp_features.unet_n_features = 8
unet_aspp_features.unet_base = 8
unet_aspp_features.scales = []
unet_aspp_features.multiscale = True

train.random_seed = 20220227
train.num_devices = 1
train.early_stopping_patience_last_layer = 10
train.start_checkpoint = ''
train.warmup_steps = 0
train.finetune_steps = 4
train.joint_steps = 6
train.warmup_batch_size = 2
train.joint_batch_size = 2
train.data_type = 'em'

PatchClassificationDataset.data_type = 'em'
PatchClassificationDataset.mean = [0.485, 0.456, 0.406]
PatchClassificationDataset.std = [0.229, 0.224, 0.225]
PatchClassificationDataset.image_margin_size = 0
PatchClassificationDataset.window_size = (32, 32)
PatchClassificationDataset.only_19_from_cityscapes = False
PatchClassificationDataset.scales = (0.8, 1.2)

PatchClassificationDataModule.dataloader_n_jobs = 2
PatchClassificationDataModule.train_key = 'train'
PatchClassificationDataModule.data_type = 'em'

PatchClassificationModuleMultiScale.loss_weight_crs_ent = 1.0
PatchClassificationModuleMultiScale.loss_weight_l1 = 1e-4
PatchClassificationModuleMultiScale.loss_weight_kld = 0.25
PatchClassificationModuleMultiScale.joint_optimizer_lr_features = 1e-3
PatchClassificationModuleMultiScale.joint_optimizer_lr_add_on_layers = 1e-3
PatchClassificationModuleMultiScale.joint_optimizer_lr_prototype_vectors = 1e-3
PatchClassificationModuleMultiScale.joint_optimizer_weight_decay = 5e-4
PatchClassificationModuleMultiScale.warm_optimizer_lr_add_on_layers = 1e-3
PatchClassificationModuleMultiScale.warm_optimizer_lr_prototype_vectors = 1e-3
PatchClassificationModuleMultiScale.warm_optimizer_weight_decay = 5e-4
PatchClassificationModuleMultiScale.last_layer_optimizer_lr = 1e-3
PatchClassificationModuleMultiScale.ignore_void_class = True
PatchClassificationModuleMultiScale.poly_lr_power = 0.9
PatchClassificationModuleMultiScale.iter_size = 1
PatchClassificationModuleMultiScale.freeze_type = 'none'

PPNetMultiScale.bottleneck_stride = 1
PPNetMultiScale.patch_classification = True
PPNetMultiScale.num_scales = 4
"""

TINY_GROUP_CONFIG = TINY_EM_CONFIG.replace(
    "construct_PPNet.", "construct_PPNet_Group."
).replace("train.joint_steps = 6", "train.joint_steps = 4") + """
PatchClassificationModuleMultiScale.warm_optimizer_lr_group_projection = 1e-3
PatchClassificationModuleMultiScale.joint_optimizer_lr_group_projection = 1e-3
PatchClassificationModuleMultiScale.loss_weight_group_ent = 0.05
PatchClassificationModuleMultiScale.joint_no_proto = False
PatchClassificationModuleMultiScale.joint_last = True
PPNetMultiScale.num_groups = 3
train.warmup_steps = 3
train.push_proto = False
"""


# ResNet-50 variants of the tiny configs: same synthetic EM-style data,
# DeepLabV2-ResNet50 backbone (deeplab_n_features=16 -> proto depth 16).
# The full-surface TPU smoke (tools/tpu_e2e_smoke.py) uses these so the
# chain can exercise --quant8-static, which requires the ResNet conv
# stack (model_loading.load_model).
def _to_resnet(cfg: str, scope: str) -> str:
    return (cfg
            .replace(f"{scope}.base_architecture = 'unet_aspp'",
                     f"{scope}.base_architecture = "
                     "'deeplabv2_resnet50_multiscale'")
            .replace(f"{scope}.prototype_shape = (24, 8, 1, 1)",
                     f"{scope}.prototype_shape = (24, 16, 1, 1)")
            .replace("unet_aspp_features.unet_n_features = 8\n"
                     "unet_aspp_features.unet_base = 8\n"
                     "unet_aspp_features.scales = []\n"
                     "unet_aspp_features.multiscale = True\n",
                     "deeplabv2_resnet50_features_multiscale."
                     "deeplab_n_features = 16\n"))


TINY_RESNET_CONFIG = _to_resnet(TINY_EM_CONFIG, "construct_PPNet")
TINY_GROUP_RESNET_CONFIG = _to_resnet(TINY_GROUP_CONFIG,
                                      "construct_PPNet_Group")


def build_synthetic_dataset(root: str, n_train: int = 8, n_val: int = 4,
                            size: int = 32, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    index = {}
    for split, n in (("train", n_train), ("val", n_val)):
        ann_dir = os.path.join(root, "annotations", split)
        img_dir = os.path.join(root, "img_with_margin_0", split)
        os.makedirs(ann_dir, exist_ok=True)
        os.makedirs(img_dir, exist_ok=True)
        ids = []
        for i in range(n):
            img_id = f"{split}_img_{i:03d}"
            ids.append(img_id)
            # class 2 blob ("cell") on class 1 background
            label = np.ones((size, size), np.uint8)
            cy, cx = rng.integers(8, size - 8, 2)
            r = int(rng.integers(4, 8))
            yy, xx = np.mgrid[:size, :size]
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            label[blob] = 2
            label[0, :] = 0  # a void stripe
            image = np.zeros((size, size, 3), np.uint8)
            image[..., 0] = 60 + 10 * rng.standard_normal((size, size))
            image[blob] = [200, 180, 40]
            image = np.clip(image + rng.normal(0, 5, image.shape), 0,
                            255).astype(np.uint8)
            np.save(os.path.join(ann_dir, img_id + ".npy"), label)
            np.save(os.path.join(img_dir, img_id + ".npy"), image)
        index[split] = ids
    with open(os.path.join(root, "all_images.json"), "w") as f:
        json.dump(index, f)
    return root
