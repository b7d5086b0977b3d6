#!/usr/bin/env python
"""Generate the shipped experiment configs (5 variants x 3 benchmarks).

Hyperparameters follow the reference experiment suite (reference configs/):
Adam 1e-3, MultiStepLR x0.1 @ (80k, 90k), 100k iterations, batch 8, and the
per-benchmark class weights / lambda schedules. Paths point at this repo's
``datasets/`` root.
"""

import os

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")

COMMON = """\
DATALOADER:
  NUM_WORKERS: 4
OPTIMIZER:
  MODEL_2D:
    TYPE: "Adam"
    BASE_LR: 0.001
  MODEL_3D:
    TYPE: "Adam"
    BASE_LR: 0.001
SCHEDULER:
  TYPE: "MultiStepLR"
  MultiStepLR:
    gamma: 0.1
    milestones: (80000, 90000)
  MAX_ITERATION: {max_iter}
"""

NUSC_WEIGHTS = {
    "usa_singapore": "[2.47956584, 4.26788384, 5.71114131, 3.80241668, 1.]",
    "day_night": "[2.68678412, 4.36182969, 5.47896839, 3.89026883, 1.]",
}
KITTI_WEIGHTS = (
    "[1.89090012, 2.0585112, 3.1970535, 3.1111633, 1., 2.93751704, 1.92053733,\n"
    "                  1.47886874, 1.04654198, 1.78266561]"
)


def nusc_dataset_block(split_src, split_trg, variant, scenario):
    label_mode = '\n    label_mode: "object"'
    src = f"""\
DATASET_SOURCE:
  TYPE: "NuScenesSCN"
  TRAIN: ("{split_src}",)
  NuScenesSCN:
    preprocess_dir: "datasets/nuscenes/preprocess_obj/preprocess"
    nuscenes_dir: "datasets/nuscenes"{label_mode}
"""
    trg_extra = ""
    if variant in ("xmuda_pl", "xmuda_pl_mopa", "xmuda_pl_mopa_x2"):
        ps_dirs = {
            ("usa_singapore", "xmuda_pl"): "ps_label/r1_usa_singapore",
            ("usa_singapore", "xmuda_pl_mopa"): "ps_label/r1_usa_singapore",
            ("usa_singapore", "xmuda_pl_mopa_x2"): "ps_label/r2_usa_singapore",
            ("day_night", "xmuda_pl"): "ps_label/r1_day_night",
            ("day_night", "xmuda_pl_mopa"): "ps_label/r1_day_night",
            ("day_night", "xmuda_pl_mopa_x2"): "ps_label/r2_day_night",
        }
        trg_extra += f'\n    ps_label_dir: "{ps_dirs[(scenario, variant)]}"'
    if variant in ("xmuda_pl_mopa", "xmuda_pl_mopa_x2"):
        trg_extra += """
    use_pc_mm: True
    obj_name_ls: ["person", "bicycle", "motorcycle"]
    obj_root_dir: "datasets/waymo/waymo_extracted/objects"
    sam_mask_dir: "img_mask"
    g_indices_dir: "g_indices"
    ema_input: True"""
    if variant in ("baseline", "xmuda"):
        trg_extra += """
    augmentation:
      rot_z: 0.0"""
    trg_train = f'\n  TRAIN: ("{split_trg}",)' if variant != "baseline" else ""
    trg = f"""\
DATASET_TARGET:
  TYPE: "NuScenesSCN"{trg_train}
  VAL: ("val_{scenario.split('_')[1] if scenario == 'usa_singapore' else 'night'}",)
  TEST: ("test_{scenario.split('_')[1] if scenario == 'usa_singapore' else 'night'}",)
  NuScenesSCN:
    preprocess_dir: "datasets/nuscenes/preprocess_obj/preprocess"
    nuscenes_dir: "datasets/nuscenes"{label_mode}{trg_extra}
"""
    return src + trg


def kitti_dataset_block(variant):
    trg_extra = ""
    if variant in ("xmuda_pl", "xmuda_pl_mopa", "xmuda_pl_mopa_x2"):
        ps = {"xmuda_pl": "r1_ps_label", "xmuda_pl_mopa": "r1_ps_label",
              "xmuda_pl_mopa_x2": "r2_ps_label"}[variant]
        trg_extra += f'\n    ps_label_dir: "{ps}"'
    if variant in ("xmuda_pl_mopa", "xmuda_pl_mopa_x2"):
        trg_extra += """
    use_pc_mm: True
    obj_name_ls: ["person", "bicycle", "motorcycle"]
    obj_root_dir: "datasets/waymo/waymo_extracted/objects"
    sam_mask_dir: "img_mask"
    g_indices_dir: "g_indices"
    ema_input: True"""
    if variant != "xmuda_pl":
        trg_extra += """
    augmentation:
      rot_z: 0.0"""
    trg_train = '\n  TRAIN: ("train",)' if variant != "baseline" else ""
    return f"""\
DATASET_SOURCE:
  TYPE: "A2D2SCN"
  TRAIN: ("train",)
  A2D2SCN:
    preprocess_dir: "datasets/a2d2/preprocess"
DATASET_TARGET:
  TYPE: "SemanticKITTISCN"{trg_train}
  VAL: ("val",)
  TEST: ("test",)
  SemanticKITTISCN:
    root_dir: "datasets/semantic_kitti"{trg_extra}
"""


def model_block(num_classes, dual_head):
    dh = "\n  DUAL_HEAD: True" if dual_head else ""
    return f"""\
MODEL_2D:
  TYPE: "UNetResNet34"
  NUM_CLASSES: {num_classes}{dh}
MODEL_3D:
  TYPE: "SCN"
  NUM_CLASSES: {num_classes}{dh}
"""


def train_block(weights, variant, scenario):
    xmuda = ""
    pcmm = ""
    if scenario == "a2d2_semantic_kitti":
        lam_src, lam_trg, lam_mm = 0.1, 0.01, 0.1
        ema_start = 70000
    else:
        lam_src, lam_trg, lam_mm = 1.0, 0.1, 1.0
        ema_start = 60000
    if variant != "baseline":
        xmuda = f"""
  XMUDA:
    lambda_xm_src: {lam_src}
    lambda_xm_trg: {lam_trg}"""
    if variant in ("xmuda_pl", "xmuda_pl_mopa", "xmuda_pl_mopa_x2"):
        xmuda += "\n    lambda_pl: 1.0"
    if variant in ("xmuda_pl_mopa", "xmuda_pl_mopa_x2"):
        ema_xm_prob = 0.9 if (variant.endswith("x2") and scenario == "usa_singapore") else 0.7
        if variant.endswith("x2") and scenario == "day_night":
            ema_start = 50000
        proj = ""
        if scenario != "a2d2_semantic_kitti":
            proj = """
    proj_W: 1080
    proj_H: 32
    fov_up: 0.17453
    fov_down: -0.52360"""
        pcmm = f"""
  PC_MM:
    z_disc: 0.3
    insert_mode: "ground"
    search_voxel_size: 0.5
    lambda_pc_mm: {lam_mm}
    lambda_sam_cons: 0.01
    use_proj: True
    dis_range: (0, 15){proj}
    ema_start_iter: {ema_start}
    ema_alpha_teacher: 0.999
    ema_update_period: 1
    ema_xm_prob: {ema_xm_prob}
    use_class_weights: True"""
    return f"""\
TRAIN:
  BATCH_SIZE: 8
  SUMMARY_PERIOD: 50
  CHECKPOINT_PERIOD: 5000
  CLASS_WEIGHTS: {weights}{xmuda}{pcmm}
"""


def val_block(scenario):
    bs = 32 if scenario != "a2d2_semantic_kitti" else 1
    return f"""\
VAL:
  BATCH_SIZE: {bs}
  PERIOD: 5000
OUTPUT_DIR: "exp"
"""


def main():
    variants = ["baseline", "xmuda", "xmuda_pl", "xmuda_pl_mopa", "xmuda_pl_mopa_x2"]
    for scenario in ["usa_singapore", "day_night", "a2d2_semantic_kitti"]:
        for variant in variants:
            max_iter = 100000
            if scenario == "day_night" and variant == "xmuda_pl_mopa_x2":
                max_iter = 50000
            parts = []
            if scenario == "a2d2_semantic_kitti":
                parts.append(model_block(10, variant != "baseline"))
                parts.append(kitti_dataset_block(variant))
                weights = KITTI_WEIGHTS
                out_dir = os.path.join(ROOT, "a2d2_semantic_kitti")
            else:
                parts.append(model_block(5, variant != "baseline"))
                src = "train_usa" if scenario == "usa_singapore" else "train_day"
                trg = "train_singapore" if scenario == "usa_singapore" else "train_night"
                parts.append(nusc_dataset_block(src, trg, variant, scenario))
                weights = NUSC_WEIGHTS[scenario]
                out_dir = os.path.join(ROOT, "nuscenes", scenario)
            parts.append(COMMON.format(max_iter=max_iter))
            parts.append(train_block(weights, variant, scenario))
            parts.append(val_block(scenario))
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, variant + ".yaml"), "w") as f:
                f.write("".join(parts))
    print("configs written")


if __name__ == "__main__":
    main()
